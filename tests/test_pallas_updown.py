"""Parity tests for the pool/upsample kernels vs the flax/XLA modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lt_tpu.models.backbone import BN_EPS
from lt_tpu.models.v2v import Upsample3DBlock, pool3d
from lt_tpu.ops.pallas.updown import (max_pool3d_2x, pack_upsample_weights,
                                      upsample3d_2x)


@pytest.mark.parametrize("impl", ["reshape", "strided"])
@pytest.mark.parametrize("shape", [(2, 8, 8, 8, 32), (1, 4, 16, 8, 64)])
def test_max_pool3d_2x(rng, shape, impl):
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    ref = pool3d(x)
    got = max_pool3d_2x(x, interpret=True, impl=impl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("shape", [(2, 8, 8, 8, 32), (1, 4, 16, 8, 64),
                                   (2, 4, 6, 16, 32)])
def test_max_pool3d_2x_lanes(rng, shape):
    # max + 0/1 selection matmuls are exact value copies, so lanes must
    # match the XLA pool bit-for-bit even in bf16.
    x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    ref = pool3d(x)
    got = max_pool3d_2x(x, interpret=True, impl="lanes")
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


@pytest.mark.parametrize("cin,cout", [(64, 32), (128, 64)])
def test_upsample3d_2x_lanes(rng, cin, cout):
    b, s = 2, 8
    x = jnp.asarray(rng.randn(b, s, s, s, cin), jnp.bfloat16)
    w8 = jnp.asarray(rng.randn(cin, 8 * cout) * 0.1, jnp.float32)
    bias = jnp.tile(jnp.asarray(rng.randn(cout) * 0.1, jnp.float32), 8)
    ref = upsample3d_2x(x, w8, bias, interpret=True, impl="strided")
    got = upsample3d_2x(x, w8, bias, interpret=True, impl="lanes")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_upsample3d_2x(rng):
    b, s, cin, cout = 2, 8, 64, 32
    x = jnp.asarray(rng.randn(b, s, s, s, cin), jnp.float32)
    block = Upsample3DBlock(cout)
    variables = block.init(jax.random.PRNGKey(0), x, False)
    stats = variables["batch_stats"]["bn"]["BatchNorm_0"]
    stats["mean"] = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    stats["var"] = jnp.asarray(1.0 + 0.3 * rng.rand(cout), jnp.float32)
    ref = block.apply(variables, x, False)

    p = variables["params"]
    bn_p = p["bn"]["BatchNorm_0"]
    w8, bias = pack_upsample_weights(
        p["kernel"], p["bias"], bn_p["scale"], bn_p["bias"],
        stats["mean"], stats["var"], eps=BN_EPS)
    got = upsample3d_2x(x, w8, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_upsample3d_2x_fused_skip_add(rng):
    """skip= fuses the decoder's `up(x) + skip` into the kernel finalize."""
    b, s, cin, cout = 2, 8, 64, 32
    x = jnp.asarray(rng.randn(b, s, s, s, cin), jnp.float32)
    skip = jnp.asarray(rng.randn(b, 2 * s, 2 * s, 2 * s, cout) * 0.5,
                       jnp.float32)
    w8 = jnp.asarray(rng.randn(cin, 8 * cout) * 0.1, jnp.float32)
    bias = jnp.tile(jnp.asarray(rng.randn(cout) * 0.1, jnp.float32), 8)
    ref = upsample3d_2x(x, w8, bias, interpret=True) + skip
    got = upsample3d_2x(x, w8, bias, interpret=True, skip=skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
