"""Slab conv3d kernel: interpret-mode parity with the XLA conv."""

import numpy as np
import jax
import jax.numpy as jnp

from lt_tpu.ops.pallas.conv3d import conv3d_same, fold_bn


def test_conv3d_matches_xla():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 8, 8).astype(np.float32)) * 0.1
    bias = jnp.asarray(rng.randn(8).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    ref = jnp.maximum(ref, 0)

    got = conv3d_same(x, w, bias, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3d_residual_fusion_matches_xla():
    """Fused skip-add + relu (the Res3DBlock tail) == unfused XLA chain."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 8, 8).astype(np.float32)) * 0.1
    bias = jnp.asarray(rng.randn(8).astype(np.float32))
    skip = jnp.asarray(rng.randn(1, 8, 8, 8, 8).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias + skip
    ref = jnp.maximum(ref, 0)

    got = conv3d_same(x, w, bias, relu=True, residual=skip, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3d_bf16_and_rect():
    """bf16 compute + non-cubic volume (Y != Z exercises both shift kinds)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 16, 8, 4), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 8) * 0.1, jnp.bfloat16)

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)

    got = conv3d_same(x, w, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-2, rtol=1e-2)


def test_fold_bn_exact():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32)) * 0.2
    cb = jnp.asarray(rng.randn(4).astype(np.float32))
    scale = jnp.asarray(rng.rand(4).astype(np.float32) + 0.5)
    bn_b = jnp.asarray(rng.randn(4).astype(np.float32))
    mean = jnp.asarray(rng.randn(4).astype(np.float32))
    var = jnp.asarray(rng.rand(4).astype(np.float32) + 0.1)

    conv = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + cb
    ref = scale * (conv - mean) / jnp.sqrt(var + 1e-5) + bn_b

    wf, bf = fold_bn(w, cb, scale, bn_b, mean, var)
    got = jax.lax.conv_general_dilated(
        x, wf, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bf
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
