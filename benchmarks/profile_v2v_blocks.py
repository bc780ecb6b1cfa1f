"""Per-block timing of the V2V hourglass as the model executes it (XLA).

Times every distinct (side, cin, cout, kind) block of ``V2VModel`` at the
flagship batch so conv-kernel effort goes to the blocks that dominate.

    python benchmarks/profile_v2v_blocks.py [--batch 8]
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
    # One final-sync RTT rides on the whole loop, not on every iteration.
    return max((time.perf_counter() - t0 - rtt) / iters, 0.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args()

    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lt_tpu.models.v2v import (Basic3DBlock, Res3DBlock, Upsample3DBlock,
                                   pool3d)

    print("backend:", jax.default_backend(), jax.devices())
    b = args.batch
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    # (name, side, cin, module or fn)
    blocks = [
        ("front_basic k7 32->16 @64", 64, 32, Basic3DBlock(16, 7, dt)),
        ("front_res 32->32 @64 (x3)", 64, 32, Res3DBlock(32, dt)),
        ("skip_res1 32->32 @64", 64, 32, Res3DBlock(32, dt)),
        ("enc_res1 32->64 @32", 32, 32, Res3DBlock(64, dt)),
        ("skip/enc 64->64 @32 (x2)", 32, 64, Res3DBlock(64, dt)),
        ("enc_res2 64->128 @16", 16, 64, Res3DBlock(128, dt)),
        ("128->128 @16 (x2)", 16, 128, Res3DBlock(128, dt)),
        ("128->128 @8 (x3)", 8, 128, Res3DBlock(128, dt)),
        ("128->128 @4 (x5)", 4, 128, Res3DBlock(128, dt)),
        ("128->128 @2 (x2)", 2, 128, Res3DBlock(128, dt)),
        ("up5..2 128->128 @4..16", 8, 128, Upsample3DBlock(128, dt)),
        ("up2 128->64 @32", 16, 128, Upsample3DBlock(64, dt)),
        ("dec_res1 64->64 @32", 32, 64, Res3DBlock(64, dt)),
        ("up1 64->32 @64", 32, 64, Upsample3DBlock(32, dt)),
        ("back_res 32->32 @64", 64, 32, Res3DBlock(32, dt)),
        ("back_basic k1 32->32 @64 (x2)", 64, 32, Basic3DBlock(32, 1, dt)),
        ("pool @64 32ch", 64, 32, None),
    ]
    total = 0.0
    for name, side, cin, mod in blocks:
        x = jnp.asarray(rng.randn(b, side, side, side, cin), dt)
        if mod is None:
            fn = jax.jit(pool3d)
            t = timed(fn, x)
        else:
            variables = mod.init(jax.random.PRNGKey(0), x, False)

            def apply(v, x, m=mod):
                return m.apply(v, x, False)

            fn = jax.jit(apply)
            t = timed(fn, variables, x)
        total += t * 1000
        print(f"{name:32s}: {t*1e3:7.2f} ms")
    print(f"(sum of listed, x1 each)      : {total:7.2f} ms")


if __name__ == "__main__":
    main()
