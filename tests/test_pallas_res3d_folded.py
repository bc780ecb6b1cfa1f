"""Parity tests for the z-folded Res3DBlock kernel (interpret mode).

The folded layout was the round-2 ROADMAP candidate for breaking the C=32
shape wall; hardware measurement (ROADMAP r3) showed in-kernel small-M
matmuls cap at ~40-50 TFLOP/s so it does NOT beat the res3d.py kernel at
flagship shapes — the kernel is kept as a verified, documented lever (and
the pad-free folded layout insight feeds the training path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lt_tpu.models.backbone import BN_EPS
from lt_tpu.models.v2v import Res3DBlock
from lt_tpu.ops.pallas.conv3d import fold_bn
from lt_tpu.ops.pallas.res3d_folded import res3d_block_folded


def _setup(rng, c=32, side=8, batch=2):
    x = jnp.asarray(rng.randn(batch, side, side, side, c), jnp.float32)
    block = Res3DBlock(c)
    variables = block.init(jax.random.PRNGKey(0), x, False)
    stats = variables["batch_stats"]
    for bn in stats:
        stats[bn]["BatchNorm_0"]["mean"] = jnp.asarray(
            rng.randn(c) * 0.1, jnp.float32)
        stats[bn]["BatchNorm_0"]["var"] = jnp.asarray(
            1.0 + 0.3 * rng.rand(c), jnp.float32)
    params = variables["params"]

    def fold(conv_name, bn_name):
        return fold_bn(params[conv_name]["kernel"],
                       params[conv_name].get("bias"),
                       params[bn_name]["BatchNorm_0"]["scale"],
                       params[bn_name]["BatchNorm_0"]["bias"],
                       stats[bn_name]["BatchNorm_0"]["mean"],
                       stats[bn_name]["BatchNorm_0"]["var"], eps=BN_EPS)

    w1, b1 = fold("conv1", "bn1")
    w2, b2 = fold("conv2", "bn2")
    ref = block.apply(variables, x, False)
    return x, (w1, b1, w2, b2), ref


@pytest.mark.parametrize("force_fold", [1, 2])
def test_folded_matches_flax(rng, force_fold):
    x, (w1, b1, w2, b2), ref = _setup(rng)
    got = res3d_block_folded(x, w1, b1, w2, b2, interpret=True,
                             force_fold=force_fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_folded_with_tail(rng):
    """Fused block-diagonal 1x1x1 tail (Basic3D k=1 / output conv)."""
    x, (w1, b1, w2, b2), ref = _setup(rng)
    wt = jnp.asarray(rng.randn(32, 16) * 0.2, jnp.float32)
    bt = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    got = res3d_block_folded(x, w1, b1, w2, b2,
                             tail=[(wt, bt, True)], interpret=True)
    expect = jnp.maximum(jnp.einsum("bxyzc,co->bxyzo", ref, wt) + bt, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-4, atol=2e-4)
