"""Hardware benchmark: fused Res3D kernel vs the XLA flax block.

    python benchmarks/bench_res3d.py
"""

from __future__ import annotations

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
    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lt_tpu.models.v2v import Res3DBlock
    from lt_tpu.ops.pallas.res3d import res3d_block_fused
    from tests.test_pallas_res3d import _folded_res_params

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)
    b, side, c = 8, 64, 32
    x32 = jnp.asarray(rng.randn(b, side, side, side, c), jnp.float32)
    x = x32.astype(jnp.bfloat16)

    block = Res3DBlock(c, jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(0), x, False)
    w1, b1, w2, b2 = _folded_res_params(variables, c)

    # Force the true XLA conv path for the reference leg (the model
    # block routes to the pallas kernel by default on TPU since round 2).
    import os

    os.environ["LT_TPU_DISABLE_PALLAS_RES3D"] = "1"
    xla = jax.jit(lambda v, x: block.apply(v, x, False))
    t_xla = timed(xla, variables, x)
    os.environ.pop("LT_TPU_DISABLE_PALLAS_RES3D")
    print(f"XLA Res3DBlock 32ch @64^3 b8 : {t_xla*1e3:7.2f} ms")

    fused = jax.jit(lambda x, w1, b1, w2, b2: res3d_block_fused(
        x, w1, b1, w2, b2))
    t_f = timed(fused, x, w1, b1, w2, b2)
    print(f"Fused pallas res3d           : {t_f*1e3:7.2f} ms "
          f"({t_xla/t_f:.2f}x)")

    # numeric check on hardware (bf16 tolerance)
    ref = np.asarray(xla(variables, x), np.float32)
    got = np.asarray(fused(x, w1, b1, w2, b2), np.float32)
    scale = max(1.0, np.abs(ref).max())
    print("max rel diff vs XLA bf16:", np.abs(ref - got).max() / scale)

    # chained: 3 blocks back to back (the front_res section)
    def chain_x(v, x):
        for _ in range(3):
            x = block.apply(v, x, False)
        return x

    def chain_f(x, w1, b1, w2, b2):
        for _ in range(3):
            x = res3d_block_fused(x, w1, b1, w2, b2)
        return x

    os.environ["LT_TPU_DISABLE_PALLAS_RES3D"] = "1"
    t_cx = timed(jax.jit(chain_x), variables, x)
    os.environ.pop("LT_TPU_DISABLE_PALLAS_RES3D")
    t_cf = timed(jax.jit(chain_f), x, w1, b1, w2, b2)
    print(f"XLA   3-chain: {t_cx*1e3:7.2f} ms | fused 3-chain: "
          f"{t_cf*1e3:7.2f} ms ({t_cx/t_cf:.2f}x)")


if __name__ == "__main__":
    main()
