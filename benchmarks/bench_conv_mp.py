"""Hardware sweep of the multi-plane conv kernels vs the round-2 fused path.

Times the dominant V2V shapes (flagship batch 8, bf16):
  - Res3D 32->32 @64^3 (the 5 blocks that cap V2V today)
  - Res3D 32->64 @32^3 / 64->64 @32^3
  - Basic3D k7 32->16 @64^3 (front conv)
for ``res3d_block_mp``/``conv3d_mp`` at s in {2, 4, 8}, against
``res3d_block_fused`` (s=2 plane-pair) and the XLA conv, with a hardware
parity check on every variant.

    python benchmarks/bench_conv_mp.py [--batch 8]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed(fn, *args, iters=30):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        _sync(out)
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return max((time.perf_counter() - t0 - rtt) / iters, 0.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lt_tpu.models.v2v import Basic3DBlock
    from lt_tpu.ops.pallas.conv_mp import conv3d_mp, res3d_block_mp
    from lt_tpu.ops.pallas.res3d import res3d_block_fused

    print("backend:", jax.default_backend(), jax.devices())
    b = args.batch
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    def rnd(*shape):
        return jnp.asarray(rng.randn(*shape) * 0.1, dt)

    # ---- Res3D blocks ----
    res_cases = [
        ("res3d 32->32 @64", 64, 32, 32),
        ("res3d 32->64 @32", 32, 32, 64),
        ("res3d 64->64 @32", 32, 64, 64),
        ("res3d 64->128 @16", 16, 64, 128),
    ]
    for name, side, cin, c in res_cases:
        x = rnd(b, side, side, side, cin)
        w1, b1 = rnd(3, 3, 3, cin, c), rnd(c)
        w2, b2 = rnd(3, 3, 3, c, c), rnd(c)
        skip = None if cin == c else (rnd(cin, c), rnd(c))
        flops = 2 * b * side**3 * 27 * c * (cin + c) + (
            0 if skip is None else 2 * b * side**3 * cin * c)

        fused = jax.jit(lambda x: res3d_block_fused(
            x, w1, b1, w2, b2, skip_proj=skip))
        t0 = timed(fused, x, iters=args.iters)
        ref = np.asarray(fused(x), np.float32)
        print(f"{name:20s} fused(s2): {t0*1e3:7.2f} ms "
              f"{flops/t0/1e12:6.1f} TF/s")

        for s in (2, 4, 8):
            if side % s:
                continue
            mp = jax.jit(lambda x, s=s: res3d_block_mp(
                x, w1, b1, w2, b2, skip_proj=skip, s=s))
            try:
                got = np.asarray(mp(x), np.float32)
            except Exception as e:  # noqa: BLE001
                print(f"{name:20s}    mp(s{s}): FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}")
                continue
            err = np.abs(got - ref).max()
            t = timed(mp, x, iters=args.iters)
            print(f"{name:20s}    mp(s{s}): {t*1e3:7.2f} ms "
                  f"{flops/t/1e12:6.1f} TF/s  maxerr {err:.3e}")

    # ---- k7 front conv ----
    side, cin, cout = 64, 32, 16
    x = rnd(b, side, side, side, cin)
    w, bia = rnd(7, 7, 7, cin, cout), rnd(cout)
    flops = 2 * b * side**3 * 343 * cin * cout

    mod = Basic3DBlock(cout, 7, dt)
    variables = mod.init(jax.random.PRNGKey(0), x, False)
    base = jax.jit(lambda v, x: mod.apply(v, x, False))
    t0 = timed(base, variables, x, iters=args.iters)
    print(f"{'k7 32->16 @64 blk':20s} model    : {t0*1e3:7.2f} ms "
          f"{flops/t0/1e12:6.1f} TF/s  (conv+BN+relu)")
    # parity target: plain XLA conv + bias + relu with the same weights
    pad = ((3, 3),) * 3
    ref = np.maximum(np.asarray(jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1, 1), pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        + bia.astype(jnp.float32), np.float32), 0.0)
    for s in (2, 4):
        mp = jax.jit(lambda x, s=s: conv3d_mp(x, w, bia, s=s, relu=True))
        try:
            got = np.asarray(mp(x), np.float32)
        except Exception as e:  # noqa: BLE001
            print(f"{'k7 32->16 @64':20s}    mp(s{s}): FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}")
            continue
        err = np.abs(got - ref).max()
        t = timed(mp, x, iters=args.iters)
        print(f"{'k7 32->16 @64':20s}    mp(s{s}): {t*1e3:7.2f} ms "
              f"{flops/t/1e12:6.1f} TF/s  maxerr {err:.3e}")


if __name__ == "__main__":
    main()
