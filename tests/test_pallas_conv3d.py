"""Slab conv3d kernel: interpret-mode parity with the XLA conv."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


@pytest.mark.parametrize("k", [3, 7])
def test_conv3d_as_z2d_matches_direct(rng, k):
    """The z-stacked 2D training conv == the direct 3D conv (the flagship
    training path rides XLA's image-conv implementation, round-3 profile)."""
    import jax.numpy as jnp

    from lt_tpu.models.v2v import conv3d_as_z2d

    b, s, cin, cout = 2, 8, 6, 5
    x = jnp.asarray(rng.randn(b, s, s, s, cin), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, k, cin, cout) * 0.1, jnp.float32)
    p = k // 2
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((p, p),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = conv3d_as_z2d(x, w, p, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # gradients flow (slab-stack backward + 2D conv grads)
    g = jax.grad(lambda xx: jnp.sum(conv3d_as_z2d(xx, w, p, jnp.float32)
                                    ** 2))(x)
    g_ref = jax.grad(lambda xx: jnp.sum(jax.lax.conv_general_dilated(
        xx, w, (1, 1, 1), ((p, p),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
