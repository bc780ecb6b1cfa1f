"""Compiled-mode parity of every Pallas kernel vs its XLA reference, on TPU.

The pytest suite runs the kernels in interpret mode on CPU — it cannot
catch Mosaic lowering regressions (strided-op dtype limits, reshape
support, layout bugs).  This script is the one-command hardware check:

    python benchmarks/hw_parity.py        # prints PASS/FAIL per kernel

Tolerances are bf16-scale (the hot path's compute dtype).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

FAILURES = []


def check(name: str, got, ref, tol: float):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    scale = max(1.0, float(np.abs(ref).max()))
    err = float(np.abs(got - ref).max()) / scale
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: rel err {err:.3e} "
          f"(tol {tol:g})", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import os

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    # --- pool / upsample (ops/pallas/updown.py) ---
    from lt_tpu.ops.pallas.updown import (max_pool3d_2x,
                                          pack_upsample_weights,
                                          upsample3d_2x)

    for shape in [(1, 64, 64, 64, 32), (1, 4, 4, 4, 128)]:
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        got = jax.jit(max_pool3d_2x)(x)
        ref = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        check(f"pool2x {shape}", got, ref, 0.0)

    for (b, s, cin, cout) in [(1, 2, 128, 128), (1, 32, 64, 32)]:
        x = jnp.asarray(rng.randn(b, s, s, s, cin), jnp.bfloat16)
        k = jnp.asarray(rng.randn(2, 2, 2, cout, cin) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
        scale = jnp.asarray(1 + 0.1 * rng.rand(cout), jnp.float32)
        bn_b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
        mean = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
        var = jnp.asarray(1 + 0.3 * rng.rand(cout), jnp.float32)
        w8, b8 = pack_upsample_weights(k, bias, scale, bn_b, mean, var)
        got = jax.jit(lambda x: upsample3d_2x(x, w8, b8))(x)
        y = jax.lax.conv_transpose(
            x.astype(jnp.float32), k, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            transpose_kernel=True)
        y = ((y + bias - mean) / np.sqrt(np.asarray(var) + 1e-5)
             * scale + bn_b)
        check(f"upsample2x ({s}^3 {cin}->{cout})", got,
              jnp.maximum(y, 0), 2e-2)

    # --- whole V2V: pallas kernels vs the XLA path ---
    from lt_tpu.models.v2v import V2VModel

    x = jnp.asarray(rng.randn(1, 64, 64, 64, 32), jnp.bfloat16)
    model = V2VModel(17, jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           x.astype(jnp.float32), False)
    got = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x)
    os.environ["LT_TPU_DISABLE_PALLAS_RES3D"] = "1"
    ref = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x)
    os.environ.pop("LT_TPU_DISABLE_PALLAS_RES3D")
    check("V2V full (res3d+pool+upsample fused)", got, ref, 2e-2)

    # --- unproject: fused-aggregation kernel vs the XLA gather path ---
    from lt_tpu.ops import volumetric as vol_ops
    from lt_tpu.ops.pallas import unproject as pu
    from __graft_entry__ import _example_batch

    b, v, h, w, c, s = 2, 4, 96, 96, 32, 32
    _, proj, keypoints = _example_batch(b, v, 384, 17)
    proj_hm = jnp.asarray(proj) * jnp.asarray([[0.25], [0.25], [1.0]])
    feats = jnp.asarray(rng.randn(b, v, h, w, c), jnp.float32)
    base = jnp.asarray(keypoints[:, 6])
    thetas = jnp.zeros((b,), jnp.float32)
    affine = vol_ops.coord_volume_affine(base, 2500.0, s, thetas)
    coords = vol_ops.build_coord_volumes(base, 2500.0, s, thetas)
    for method in ("softmax", "sum", "max"):
        got = jax.jit(lambda f, p, a, m=method: pu.unproject_heatmaps_affine(
            f, p, a, s, m, fuse_aggregation=True))(feats, proj_hm, affine)
        ref = jax.jit(lambda f, p, cv, m=method: jnp.moveaxis(
            vol_ops.unproject_heatmaps(f, p, cv, m), 1, 1))(
                feats, proj_hm, coords)
        check(f"unproject+agg [{method}]", got, ref, 5e-3)

    # --- unfused transposed sampler + banded backward gradient ---
    gw = jnp.asarray(rng.randn(b, c, s ** 3).astype(np.float32))

    def loss_t(f):
        out = pu.unproject_heatmaps_affine(f, proj_hm, affine, s, "sum")
        return jnp.sum(out.reshape(b, c, -1) * gw)

    def loss_xla(f):
        out = vol_ops.unproject_heatmaps(f, proj_hm, coords, "sum")
        return jnp.sum(jnp.moveaxis(out, 1, 1).reshape(b, c, -1) * gw)

    g1 = jax.jit(jax.grad(loss_t))(feats)
    g2 = jax.jit(jax.grad(loss_xla))(feats)
    check("unproject banded backward grad", g1, g2, 2e-2)

    print("\n" + ("ALL PASS" if not FAILURES else
                  f"{len(FAILURES)} FAILURES: {FAILURES}"), flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
