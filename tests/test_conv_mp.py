"""Interpret-mode parity tests for the multi-plane conv kernels
(lt_tpu/ops/pallas/conv_mp.py) vs plain XLA compositions.

Reference semantics: Basic3DBlock / Res3DBlock of
/root/reference/mvn/models/v2v.py:7-42 with BatchNorm pre-folded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lt_tpu.ops.pallas.conv_mp import conv3d_mp, res3d_block_mp


def _conv_ref(x, w, b, relu=False):
    k = w.shape[0]
    p = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((p, p),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    return jax.nn.relu(y) if relu else y


@pytest.mark.parametrize("k,s", [(3, 2), (3, 4), (7, 2), (7, 4), (5, 2)])
@pytest.mark.parametrize("fold", [1, None])
def test_conv3d_mp_matches_xla(rng, k, s, fold):
    b, sx, sy, sz, cin, cout = 2, 8, 5, 6, 3, 4
    x = jnp.asarray(rng.randn(b, sx, sy, sz, cin), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, k, cin, cout) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    ref = _conv_ref(x, w, bias, relu=True)
    got = conv3d_mp(x, w, bias, s=s, relu=True, interpret=True,
                    force_fold=fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s", [2, 4])
@pytest.mark.parametrize("fold", [1, None])
def test_res3d_mp_identity_skip(rng, s, fold):
    b, side, c = 2, 8, 5
    x = jnp.asarray(rng.randn(b, side, side, side, c), jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    y1 = _conv_ref(x, w1, b1, relu=True)
    ref = jax.nn.relu(_conv_ref(y1, w2, b2) + x)
    got = res3d_block_mp(x, w1, b1, w2, b2, s=s, interpret=True,
                         force_fold=fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_res3d_mp_proj_skip_and_tail(rng):
    """Projection skip (cin != c) + fused per-voxel tail matmuls."""
    b, side, cin, c = 2, 8, 3, 5
    x = jnp.asarray(rng.randn(b, side, side, side, cin), jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, 3, cin, c) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    ws = jnp.asarray(rng.randn(cin, c) * 0.1, jnp.float32)
    bs = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    wt = jnp.asarray(rng.randn(c, 4) * 0.1, jnp.float32)
    bt = jnp.asarray(rng.randn(4) * 0.1, jnp.float32)

    y1 = _conv_ref(x, w1, b1, relu=True)
    sk = jnp.einsum("bxyzc,cd->bxyzd", x, ws) + bs
    blk = jax.nn.relu(_conv_ref(y1, w2, b2) + sk)
    ref = jax.nn.relu(jnp.einsum("bxyzc,cd->bxyzd", blk, wt) + bt)
    got = res3d_block_mp(x, w1, b1, w2, b2, skip_proj=(ws, bs),
                         tail=((wt, bt, True),), s=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_res3d_mp_matches_s2_kernel(rng):
    """The parametric kernel at s=2 == the round-2 s=2 kernel."""
    from lt_tpu.ops.pallas.res3d import res3d_block_fused

    b, side, c = 2, 8, 5
    x = jnp.asarray(rng.randn(b, side, side, side, c), jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    ref = res3d_block_fused(x, w1, b1, w2, b2, interpret=True)
    got = res3d_block_mp(x, w1, b1, w2, b2, s=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
