"""On-chip timing of the V2V pool/upsample kernels vs XLA at flagship shapes.

    python benchmarks/bench_updown.py [--batch 8] [--iters 30]

Times (a) max_pool3d_2x 'strided' vs 'reshape' vs XLA reduce-window at
64^3 x 32ch, and (b) upsample3d_2x (32^3, 64->32ch -> 64^3) vs XLA
conv_transpose — the two non-res3d 64^3 stages of the fused V2V path.
"""

from __future__ import annotations

import argparse
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
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from lt_tpu.ops.pallas.updown import (max_pool3d_2x,
                                          pack_upsample_weights,
                                          upsample3d_2x)

    print("backend:", jax.default_backend(), jax.devices())
    b = args.batch
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, 64, 64, 64, 32), jnp.bfloat16)

    pool_strided = jax.jit(functools.partial(max_pool3d_2x, impl="strided"))
    pool_reshape = jax.jit(functools.partial(max_pool3d_2x, impl="reshape"))
    pool_lanes = jax.jit(functools.partial(max_pool3d_2x, impl="lanes"))
    pool_xla = jax.jit(lambda v: nn.max_pool(v, (2, 2, 2),
                                             strides=(2, 2, 2)))
    for name, fn in [("pool strided", pool_strided),
                     ("pool reshape", pool_reshape),
                     ("pool lanes", pool_lanes),
                     ("pool XLA", pool_xla)]:
        t = timed(fn, x, iters=args.iters)
        print(f"{name:24s}: {t*1e3:7.2f} ms")
    np.testing.assert_allclose(np.asarray(pool_strided(x), np.float32),
                               np.asarray(pool_reshape(x), np.float32))
    np.testing.assert_allclose(np.asarray(pool_strided(x), np.float32),
                               np.asarray(pool_lanes(x), np.float32))
    np.testing.assert_allclose(np.asarray(pool_strided(x), np.float32),
                               np.asarray(pool_xla(x), np.float32))

    # Upsample: 32^3 64ch -> 64^3 32ch (decoder_upsample1 shape).
    cin, cout = 64, 32
    xu = jnp.asarray(rng.randn(b, 32, 32, 32, cin), jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(2, 2, 2, cout, cin), jnp.float32) * 0.1
    bias = jnp.asarray(rng.randn(cout), jnp.float32) * 0.1
    scale = jnp.ones((cout,), jnp.float32)
    bn_bias = jnp.zeros((cout,), jnp.float32)
    mean = jnp.zeros((cout,), jnp.float32)
    var = jnp.ones((cout,), jnp.float32)
    w8, b8 = pack_upsample_weights(kernel, bias, scale, bn_bias, mean, var)

    up_strided = jax.jit(lambda v, w, bb: upsample3d_2x(v, w, bb,
                                                        impl="strided"))
    up_lanes = jax.jit(lambda v, w, bb: upsample3d_2x(v, w, bb,
                                                      impl="lanes"))

    def up_xla(v, k, bb):
        y = jax.lax.conv_transpose(
            v, k.astype(v.dtype), strides=(2, 2, 2),
            padding=((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            transpose_kernel=True)
        return nn.relu(y + bb.astype(y.dtype))

    up_xla = jax.jit(up_xla)
    t = timed(up_strided, xu, w8, b8, iters=args.iters)
    print(f"{'up1 strided':24s}: {t*1e3:7.2f} ms")
    t = timed(up_lanes, xu, w8, b8, iters=args.iters)
    print(f"{'up1 lanes':24s}: {t*1e3:7.2f} ms")
    t = timed(up_xla, xu, kernel, bias, iters=args.iters)
    print(f"{'up1 XLA':24s}: {t*1e3:7.2f} ms")
    ref = np.asarray(up_xla(xu, kernel, bias), np.float32)
    for name, fn in [("up strided", up_strided), ("up lanes", up_lanes)]:
        a = np.asarray(fn(xu, w8, b8), np.float32)
        print(f"{name} max|delta| vs XLA:", np.abs(a - ref).max())


if __name__ == "__main__":
    main()
