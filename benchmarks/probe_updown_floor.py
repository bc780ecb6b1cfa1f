"""Probe the real per-op floor for the pool/upsample shapes.

Times (a) a pure HBM copy of the pool input, (b) N pools chained inside
ONE jit (amortizes dispatch), (c) same for upsample — separates per-call
dispatch overhead from actual kernel time.
"""

from __future__ import annotations

import functools
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

    from lt_tpu.ops.pallas.updown import max_pool3d_2x

    print("backend:", jax.default_backend(), jax.devices())
    b = 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, 64, 64, 64, 32), jnp.bfloat16)

    # (a) pure copy: 134 MB read + 134 MB write.
    copy = jax.jit(lambda v: v * jnp.bfloat16(1.0000001))
    t = timed(copy, x, iters=50)
    print(f"copy 134MB r+w          : {t*1e3:7.2f} ms "
          f"({2 * x.nbytes / t / 1e9:.0f} GB/s)")

    # (b) N chained pools in one jit: isolates per-dispatch overhead.
    for impl in ("strided", "lanes"):
        pool = functools.partial(max_pool3d_2x, impl=impl)

        def chained(v, n=10, _pool=pool):
            # re-expand with broadcast so every iteration sees 64^3 again
            for _ in range(n):
                y = _pool(v)
                v = jnp.concatenate([y, y], -1)  # (B,32,32,32,64)
                v = v.reshape(b, 32, 32, 64, 32)
                v = jnp.concatenate(
                    [v, v], 2).reshape(b, 32, 64, 64, 32)
                v = jnp.concatenate([v, v], 1)
            return v

        f = jax.jit(functools.partial(chained))
        t = timed(f, x, iters=20)
        print(f"10x pool[{impl:8s}] 1 jit : {t*1e3:7.2f} ms "
              f"-> {t/10*1e3:5.2f} ms/pool incl. re-expand")


if __name__ == "__main__":
    main()
