"""Parity tests for the fused Res3D block kernel vs the flax/XLA modules.

Runs in interpreter mode on CPU; the same kernel is hardware-validated by
benchmarks/bench_res3d.py and the flagship bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lt_tpu.models.backbone import BN_EPS
from lt_tpu.models.v2v import Basic3DBlock, Conv3D, Res3DBlock
from lt_tpu.ops.pallas.conv3d import fold_bn
from lt_tpu.ops.pallas.res3d import res3d_block_fused, res3d_chain_fused


def _folded_res_params(variables, c):
    """Extract (w1, b1, w2, b2) with inference BN folded, from Res3DBlock."""
    params = variables["params"]
    stats = variables["batch_stats"]

    def fold(conv_name, bn_name):
        w = params[conv_name]["kernel"]
        b = params[conv_name].get("bias")
        bn_p = params[bn_name]["BatchNorm_0"]
        bn_s = stats[bn_name]["BatchNorm_0"]
        return fold_bn(w, b, bn_p["scale"], bn_p["bias"], bn_s["mean"],
                       bn_s["var"], eps=BN_EPS)

    w1, b1 = fold("conv1", "bn1")
    w2, b2 = fold("conv2", "bn2")
    return w1, b1, w2, b2


def _init_res_block(rng, c, side, batch=2):
    x = jnp.asarray(rng.randn(batch, side, side, side, c), jnp.float32)
    block = Res3DBlock(c)
    variables = block.init(jax.random.PRNGKey(0), x, False)
    # Randomize BN stats so folding is actually exercised.
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    stats = variables["batch_stats"]
    for bn in stats:
        stats[bn]["BatchNorm_0"]["mean"] = jnp.asarray(
            rng.randn(c) * 0.1, jnp.float32)
        stats[bn]["BatchNorm_0"]["var"] = jnp.asarray(
            1.0 + 0.3 * rng.rand(c), jnp.float32)
    return x, block, variables


@pytest.mark.parametrize("side", [8, 16])
def test_res3d_fused_matches_flax(rng, side):
    c = 32
    x, block, variables = _init_res_block(rng, c, side)
    ref = block.apply(variables, x, False)

    w1, b1, w2, b2 = _folded_res_params(variables, c)
    got = res3d_block_fused(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_res3d_fused_projection_skip(rng):
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
    got = res3d_block_fused(x, w1, b1, w2, b2,
                            skip_proj=(ws.reshape(cin, c), bs),
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_res3d_fused_with_tail(rng):
    """Res block + two k1 Basic blocks + output conv == fused tail."""
    c, side, n_out = 32, 8, 17
    x, block, variables = _init_res_block(rng, c, side)
    y = block.apply(variables, x, False)

    tail = []
    y_ref = y
    for i, (co, relu_t) in enumerate([(c, True), (n_out, False)]):
        wt = jnp.asarray(rng.randn(y_ref.shape[-1], co) * 0.2, jnp.float32)
        bt = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
        y_ref = y_ref @ wt + bt
        if relu_t:
            y_ref = jax.nn.relu(y_ref)
        tail.append((wt, bt, relu_t))

    w1, b1, w2, b2 = _folded_res_params(variables, c)
    got = res3d_block_fused(x, w1, b1, w2, b2, tail=tail, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pairs", [1, 2])
def test_res3d_fused_pairs_per_step(rng, pairs):
    """Both schedules (one pair / two pairs per grid step) agree with flax;
    side=12 exercises non-power-of-two quad counts."""
    c = 32
    x, block, variables = _init_res_block(rng, c, side=12, batch=1)
    ref = block.apply(variables, x, False)

    w1, b1, w2, b2 = _folded_res_params(variables, c)
    got = res3d_block_fused(x, w1, b1, w2, b2, interpret=True,
                            pairs_per_step=pairs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_res3d_fused_fold1_mask_free_taps(rng):
    """fold=1 takes the mask-free dy-shift tap path (the production 64^3
    configuration, yz >= 4096); pin it at a small shape via force_fold
    (ADVICE r2: this branch was only reachable at flagship sizes)."""
    c = 32
    x, block, variables = _init_res_block(rng, c, side=8, batch=2)
    ref = block.apply(variables, x, False)

    w1, b1, w2, b2 = _folded_res_params(variables, c)
    got = res3d_block_fused(x, w1, b1, w2, b2, interpret=True, force_fold=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_res3d_fused_emit_pooled(rng):
    """emit_pooled second output == MaxPool3d(2)(x) (m2 schedule)."""
    import flax.linen as nn

    c = 32
    x, block, variables = _init_res_block(rng, c, side=8, batch=2)
    ref_out = block.apply(variables, x, False)
    ref_pool = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))

    w1, b1, w2, b2 = _folded_res_params(variables, c)
    got, pooled = res3d_block_fused(x, w1, b1, w2, b2, interpret=True,
                                    emit_pooled=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref_pool),
                               rtol=0, atol=0)


@pytest.mark.parametrize("n_blocks", [1, 2, 3])
def test_res3d_chain_fused(rng, n_blocks):
    """K chained identity-skip blocks in one kernel == K sequential flax
    blocks (the V2V front_res1..3 pattern)."""
    c = 32
    x, block, variables = _init_res_block(rng, c, side=8, batch=2)
    ref = x
    blocks = []
    vs = variables
    for i in range(n_blocks):
        if i > 0:
            _, block, vs = _init_res_block(
                np.random.RandomState(100 + i), c, side=8, batch=2)
        ref = block.apply(vs, ref, False)
        w1, b1, w2, b2 = _folded_res_params(vs, c)
        blocks.append((w1, b1, w2, b2))

    got = res3d_chain_fused(jnp.asarray(np.asarray(ref) * 0 +
                                        np.asarray(x)), blocks,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_res3d_chain_fused_emit_pooled(rng):
    """Chain emit_pooled: out == K sequential blocks, pooled ==
    MaxPool3d(2) of the LAST block's input (the encoder's ``skip =
    skip_res1(x); x = pool(x)`` pattern when the front chain extends into
    skip_res1, v2v.py:104-105)."""
    import flax.linen as nn

    c, n_blocks = 32, 3
    x, block, variables = _init_res_block(rng, c, side=8, batch=2)
    ref = x
    blocks = []
    vs = variables
    for i in range(n_blocks):
        if i > 0:
            _, block, vs = _init_res_block(
                np.random.RandomState(200 + i), c, side=8, batch=2)
        last_in = ref
        ref = block.apply(vs, ref, False)
        w1, b1, w2, b2 = _folded_res_params(vs, c)
        blocks.append((w1, b1, w2, b2))
    ref_pool = nn.max_pool(last_in, (2, 2, 2), strides=(2, 2, 2))

    got, pooled = res3d_chain_fused(x, blocks, interpret=True,
                                    emit_pooled=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref_pool),
                               rtol=5e-4, atol=5e-4)


def test_res3d_chain_fused_first_proj(rng):
    """Chain headed by a width-changing block (V2V front_res1, 16->32
    with a folded 1x1x1 projection skip) == sequential flax blocks; with
    emit_pooled, pooled == MaxPool3d(2) of the LAST block's input."""
    import flax.linen as nn

    cin, c, side, n_blocks = 16, 32, 8, 3
    x = jnp.asarray(rng.randn(2, side, side, side, cin), jnp.float32)
    block0 = Res3DBlock(c)
    vs0 = block0.init(jax.random.PRNGKey(1), x, False)
    stats = vs0["batch_stats"]
    for bn in stats:
        stats[bn]["BatchNorm_0"]["mean"] = jnp.asarray(
            rng.randn(c) * 0.1, jnp.float32)
        stats[bn]["BatchNorm_0"]["var"] = jnp.asarray(
            1.0 + 0.3 * rng.rand(c), jnp.float32)
    ref = block0.apply(vs0, x, False)
    w1, b1, w2, b2 = _folded_res_params(vs0, c)
    p0 = vs0["params"]
    bn_p = p0["skip_bn"]["BatchNorm_0"]
    bn_s = vs0["batch_stats"]["skip_bn"]["BatchNorm_0"]
    ws, bs = fold_bn(p0["skip_conv"]["kernel"],
                     p0["skip_conv"].get("bias"),
                     bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"],
                     eps=BN_EPS)
    blocks = [(w1, b1, w2, b2, (ws.reshape(cin, c), bs))]

    for i in range(1, n_blocks):
        _, block, vs = _init_res_block(
            np.random.RandomState(300 + i), c, side=side, batch=2)
        last_in = ref
        ref = block.apply(vs, ref, False)
        blocks.append(_folded_res_params(vs, c))
    ref_pool = nn.max_pool(last_in, (2, 2, 2), strides=(2, 2, 2))

    got = res3d_chain_fused(x, blocks, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)

    got2, pooled = res3d_chain_fused(x, blocks, interpret=True,
                                     emit_pooled=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref_pool),
                               rtol=5e-4, atol=5e-4)


def test_upsample_res3d_fused(rng):
    """ConvTranspose3d(2,2)+BN+ReLU + skip-add + Res3D + tail in one
    kernel == the sequential flax modules (the V2V decoder's final
    ``up(x) + skip1`` chained into the back section, v2v.py:126-169)."""
    from lt_tpu.models.v2v import Upsample3DBlock
    from lt_tpu.ops.pallas.res3d import upsample_res3d_fused
    from lt_tpu.ops.pallas.updown import pack_upsample_weights

    cin, c, side = 64, 32, 4  # small volume side; output side 8
    x = jnp.asarray(rng.randn(2, side, side, side, cin), jnp.float32)
    skip = jnp.asarray(rng.randn(2, 2 * side, 2 * side, 2 * side, c),
                       jnp.float32)

    up = Upsample3DBlock(c)
    uvs = up.init(jax.random.PRNGKey(3), x, False)
    ubs = uvs["batch_stats"]["bn"]["BatchNorm_0"]
    ubs["mean"] = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    ubs["var"] = jnp.asarray(1.0 + 0.3 * rng.rand(c), jnp.float32)
    ref = up.apply(uvs, x, False, skip)

    _, block, bvs = _init_res_block(np.random.RandomState(42), c,
                                    side=2 * side, batch=2)
    ref = block.apply(bvs, ref, False)

    tail = []
    for i, (co, relu_t) in enumerate([(c, True), (17, False)]):
        wt = jnp.asarray(rng.randn(ref.shape[-1], co) * 0.2, jnp.float32)
        bt = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
        ref = ref @ wt + bt
        if relu_t:
            ref = jax.nn.relu(ref)
        tail.append((wt, bt, relu_t))

    up_p = uvs["params"]
    up_bn = up_p["bn"]["BatchNorm_0"]
    w8, b8 = pack_upsample_weights(up_p["kernel"], up_p["bias"],
                                   up_bn["scale"], up_bn["bias"],
                                   ubs["mean"], ubs["var"], eps=BN_EPS)
    blocks = [_folded_res_params(bvs, c)]
    got = upsample_res3d_fused(x, w8, b8, skip, blocks, tail=tuple(tail),
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_enc_pair_chain_shapes(rng):
    """The V2V deep-level encoder pairs (enc_pair in models/v2v.py:
    ``x = res(x); skip = skip_res(x); x = pool(x)`` as ONE proj-headed
    chain) at their real edge shapes: widening 32->64 and the nq=1 case
    (side 4, the L5 pair's volume)."""
    import flax.linen as nn

    for cin, c, side in [(32, 64, 8), (128, 128, 4)]:
        x = jnp.asarray(rng.randn(2, side, side, side, cin), jnp.float32)
        block0 = Res3DBlock(c)
        vs0 = block0.init(jax.random.PRNGKey(7), x, False)
        for bn in vs0["batch_stats"]:
            vs0["batch_stats"][bn]["BatchNorm_0"]["mean"] = jnp.asarray(
                rng.randn(c) * 0.1, jnp.float32)
            vs0["batch_stats"][bn]["BatchNorm_0"]["var"] = jnp.asarray(
                1.0 + 0.3 * rng.rand(c), jnp.float32)
        mid = block0.apply(vs0, x, False)
        p0 = list(_folded_res_params(vs0, c))
        if cin != c:
            bn_p = vs0["params"]["skip_bn"]["BatchNorm_0"]
            bn_s = vs0["batch_stats"]["skip_bn"]["BatchNorm_0"]
            ws, bs = fold_bn(vs0["params"]["skip_conv"]["kernel"],
                             vs0["params"]["skip_conv"].get("bias"),
                             bn_p["scale"], bn_p["bias"],
                             bn_s["mean"], bn_s["var"], eps=BN_EPS)
            p0.append((ws.reshape(cin, c), bs))
        _, block1, vs1 = _init_res_block(np.random.RandomState(17), c,
                                         side=side, batch=2)
        ref_skip = block1.apply(vs1, mid, False)
        ref_pool = nn.max_pool(mid, (2, 2, 2), strides=(2, 2, 2))

        got_skip, got_pool = res3d_chain_fused(
            x, [tuple(p0), _folded_res_params(vs1, c)],
            interpret=True, emit_pooled=True)
        np.testing.assert_allclose(np.asarray(got_skip),
                                   np.asarray(ref_skip),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(got_pool),
                                   np.asarray(ref_pool),
                                   rtol=5e-4, atol=5e-4)


def test_dec_pair_chain_shapes(rng):
    """The V2V deep-level decoder pairs (dec_pair in models/v2v.py:
    ``x = up(x) + skip; x = res(x)`` as ONE kernel) at their real edge
    shapes: xs=2 with cin == c == 128 (the up5 pair) and the widening-down
    16^3 -> 32^3 C=64 case (the up2 pair)."""
    from lt_tpu.models.v2v import Upsample3DBlock
    from lt_tpu.ops.pallas.res3d import upsample_res3d_fused
    from lt_tpu.ops.pallas.updown import pack_upsample_weights

    for cin, c, side in [(128, 128, 2), (128, 64, 4)]:
        x = jnp.asarray(rng.randn(2, side, side, side, cin), jnp.float32)
        skip = jnp.asarray(
            rng.randn(2, 2 * side, 2 * side, 2 * side, c), jnp.float32)
        up = Upsample3DBlock(c)
        uvs = up.init(jax.random.PRNGKey(3), x, False)
        ubs = uvs["batch_stats"]["bn"]["BatchNorm_0"]
        ubs["mean"] = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        ubs["var"] = jnp.asarray(1.0 + 0.3 * rng.rand(c), jnp.float32)
        ref = up.apply(uvs, x, False, skip)
        _, block, bvs = _init_res_block(np.random.RandomState(23), c,
                                        side=2 * side, batch=2)
        ref = block.apply(bvs, ref, False)

        up_p = uvs["params"]
        up_bn = up_p["bn"]["BatchNorm_0"]
        w8, b8 = pack_upsample_weights(up_p["kernel"], up_p["bias"],
                                       up_bn["scale"], up_bn["bias"],
                                       ubs["mean"], ubs["var"], eps=BN_EPS)
        got = upsample_res3d_fused(x, w8, b8, skip,
                                   [_folded_res_params(bvs, c)],
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)


def test_chain_vmem_estimators():
    """The VMEM-stack estimators that drive batch-fold selection and the
    pallas/XLA feasibility gates (round-5 fix for the f32 eval OOM).

    Calibration anchors, measured on v5e (round-5 OOM dumps):
    - f32 32^3 batch-8 upsample chain at fold 8: 144.3 MB (> the 128 MB
      physical VMEM — the crash the estimator must predict);
    - f32 flagship (64^3) front chain at fold 1: 111.3 MB, which exceeds
      the axon compiler's ~109 MB scoped limit -> must gate infeasible;
    - bf16 flagship front chain: well under 100 MB -> must stay feasible.
    """
    import jax.numpy as jnp

    from lt_tpu.ops.pallas.res3d import (chain_feasible, chain_stack_bytes,
                                         ups_chain_feasible,
                                         ups_chain_stack_bytes)

    mb = 1024 * 1024
    # The r4 heuristic's fold=8 choice at the 32^3 f32 eval: estimator
    # must flag it as over-physical (measured 144.3 MB).
    est = ups_chain_stack_bytes(8, 32 * 32, 32, 32, 17, 1, jnp.float32)
    assert 130 * mb < est < 160 * mb, est / mb
    # A reduced fold must fit.
    assert ups_chain_stack_bytes(2, 32 * 32, 32, 32, 17, 1,
                                 jnp.float32) < 96 * mb
    # f32 flagship front chain (meas. 111.3 MB > ~109 axon): infeasible.
    assert not chain_feasible(8, 64, 64, 32, 32, 3, jnp.float32,
                              emit_pooled=True)
    est = chain_stack_bytes(1, 64 * 64, 32, 32, 3, jnp.float32, True)
    assert 96 * mb < est < 125 * mb, est / mb
    # bf16 flagship front chain: feasible (the shipping bench path).
    assert chain_feasible(8, 64, 64, 32, 32, 3, jnp.bfloat16,
                          emit_pooled=True)
    # bf16 flagship upsample-headed back chain: feasible.
    assert ups_chain_feasible(8, 64, 64, 32, 32, 17, 1, jnp.bfloat16)
