"""Parity tests for the complete-output-quad Res3D kernel (res3d_q4.py).

Runs in interpreter mode on CPU; the same kernel is hardware-validated by
tests_hw/test_hw_parity.py and the flagship bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lt_tpu.models.backbone import BN_EPS
from lt_tpu.models.v2v import Res3DBlock
from lt_tpu.ops.pallas.conv3d import fold_bn
from lt_tpu.ops.pallas.res3d_q4 import res3d_block_q4
from tests.test_pallas_res3d import _folded_res_params, _init_res_block


@pytest.mark.parametrize("side,batch", [(8, 2), (16, 1), (12, 2)])
def test_res3d_q4_matches_flax(rng, side, batch):
    c = 32
    x, block, variables = _init_res_block(rng, c, side, batch=batch)
    ref = block.apply(variables, x, False)

    w1, b1, w2, b2 = _folded_res_params(variables, c)
    got = res3d_block_q4(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_res3d_q4_projection_skip(rng):
    """Cin != Cout: the 1x1x1 projection skip + skip-BN folding path."""
    cin, c, side = 16, 32, 8
    x = jnp.asarray(rng.randn(2, side, side, side, cin), jnp.float32)
    block = Res3DBlock(c)
    variables = block.init(jax.random.PRNGKey(0), x, False)
    stats = variables["batch_stats"]
    for bn in stats:
        stats[bn]["BatchNorm_0"]["mean"] = jnp.asarray(
            rng.randn(c) * 0.1, jnp.float32)
        stats[bn]["BatchNorm_0"]["var"] = jnp.asarray(
            1.0 + 0.3 * rng.rand(c), jnp.float32)
    ref = block.apply(variables, x, False)

    w1, b1, w2, b2 = _folded_res_params(variables, c)
    params = variables["params"]
    bn_p = params["skip_bn"]["BatchNorm_0"]
    bn_s = variables["batch_stats"]["skip_bn"]["BatchNorm_0"]
    ws, bs = fold_bn(params["skip_conv"]["kernel"],
                     params["skip_conv"].get("bias"),
                     bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"],
                     eps=BN_EPS)
    got = res3d_block_q4(x, w1, b1, w2, b2,
                         skip_proj=(ws.reshape(cin, c), bs),
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_res3d_q4_with_tail(rng):
    """Res block + two k1 Basic blocks + output conv == fused tail."""
    c, side, n_out = 32, 8, 17
    x, block, variables = _init_res_block(rng, c, side)
    y = block.apply(variables, x, False)

    tail = []
    y_ref = y
    for co, relu_t in [(c, True), (n_out, False)]:
        wt = jnp.asarray(rng.randn(y_ref.shape[-1], co) * 0.2, jnp.float32)
        bt = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
        y_ref = y_ref @ wt + bt
        if relu_t:
            y_ref = jax.nn.relu(y_ref)
        tail.append((wt, bt, relu_t))

    w1, b1, w2, b2 = _folded_res_params(variables, c)
    got = res3d_block_q4(x, w1, b1, w2, b2, tail=tail, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_res3d_q4_matches_s2_kernel(rng):
    """Same packed weights through both schedules agree exactly-ish."""
    from lt_tpu.ops.pallas.res3d import res3d_block_fused

    c, side = 32, 8
    x = jnp.asarray(rng.randn(2, side, side, side, c), jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    ref = res3d_block_fused(x, w1, b1, w2, b2, interpret=True)
    got = res3d_block_q4(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
