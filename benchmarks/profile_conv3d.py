"""Microbenchmark: what does XLA achieve on V2V's conv shapes on this chip?

Times each distinct (grid, cin, cout) conv shape in V2V @ 64^3 and a matmul
with the same im2col FLOPs, to locate the utilization gap the Pallas conv
kernel must close (ROADMAP lever 1).
"""

import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices())

    b = 8
    dt = jnp.bfloat16
    shapes = [
        # (side, cin, cout, k): V2V conv inventory per EncoderDecoder level
        (64, 32, 32, 3),
        (64, 16, 32, 3),
        (64, 32, 16, 7),
        (32, 32, 64, 3),
        (32, 64, 64, 3),
        (16, 64, 128, 3),
        (16, 128, 128, 3),
        (8, 128, 128, 3),
        (64, 32, 17, 1),
    ]
    rng = np.random.RandomState(0)
    for side, cin, cout, k in shapes:
        x = jnp.asarray(rng.randn(b, side, side, side, cin), dt)
        w = jnp.asarray(rng.randn(k, k, k, cin, cout) * 0.05, dt)
        pad = ((k // 2, k // 2),) * 3 if k > 1 else "VALID"

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        cf = jax.jit(conv)
        t = timeit(cf, x, w)
        flops = 2 * (k ** 3) * cin * cout * b * side ** 3
        print(f"conv {side}^3 cin={cin:3d} cout={cout:3d} k={k}: "
              f"{t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TFLOP/s")

        # im2col-equivalent matmul: (b*side^3, k^3*cin) @ (k^3*cin, cout)
        m = b * side ** 3
        kk = (k ** 3) * cin
        a = jnp.asarray(rng.randn(m, kk), dt)
        ww = jnp.asarray(rng.randn(kk, cout) * 0.05, dt)
        mm = jax.jit(lambda a, ww: a @ ww)
        t2 = timeit(mm, a, ww)
        print(f"  matmul ({m}, {kk}) @ ({kk}, {cout}):  "
              f"{t2*1e3:7.3f} ms  {flops/t2/1e12:6.1f} TFLOP/s")

        # widened matmul: same M/K, N=3*cout (the rolling-Q shape)
        ww3 = jnp.asarray(rng.randn(kk // 3, 3 * cout) * 0.05, dt)
        a3 = jnp.asarray(rng.randn(m, kk // 3), dt)
        mm3 = jax.jit(lambda a, ww: a @ ww)
        t3 = timeit(mm3, a3, ww3)
        print(f"  matmul ({m}, {kk//3}) @ ({kk//3}, {3*cout}):  "
              f"{t3*1e3:7.3f} ms  {flops/t3/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
