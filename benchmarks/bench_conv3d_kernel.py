"""HW benchmark + parity: the Pallas slab conv vs XLA's conv3d."""

import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=20):
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
    from lt_tpu.ops.pallas.conv3d import conv3d_same

    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)

    for side, cin, cout, b, dt in [
        (64, 32, 32, 8, jnp.bfloat16),
        (64, 16, 32, 8, jnp.bfloat16),
        (64, 32, 32, 8, jnp.float32),
        (32, 64, 64, 8, jnp.bfloat16),
    ]:
        if 3 * cout > 128:
            print(f"skip {side}^3 {cin}->{cout}: 3*cout > 128")
            continue
        x = jnp.asarray(rng.randn(b, side, side, side, cin), dt)
        w = jnp.asarray(rng.randn(3, 3, 3, cin, cout) * 0.05, dt)
        bias = jnp.asarray(rng.randn(cout), jnp.float32)

        def xla(x, w, bias):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), ((1, 1),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y + bias, 0).astype(dt)

        def pallas(x, w, bias):
            return conv3d_same(x, w, bias, relu=True, out_dtype=dt)

        fx = jax.jit(xla)
        fp = jax.jit(pallas)

        ref = np.asarray(fx(x, w, bias), np.float32)
        got = np.asarray(fp(x, w, bias), np.float32)
        err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
        tx = timeit(fx, x, w, bias)
        tp = timeit(fp, x, w, bias)
        flops = 2 * 27 * cin * cout * b * side ** 3
        print(f"{side}^3 {cin}->{cout} {dt.__name__}: XLA {tx*1e3:7.3f} ms "
              f"({flops/tx/1e12:5.1f}T)  pallas {tp*1e3:7.3f} ms "
              f"({flops/tp/1e12:5.1f}T)  speedup {tx/tp:4.2f}x  "
              f"rel-err {err:.2e}")


if __name__ == "__main__":
    main()
