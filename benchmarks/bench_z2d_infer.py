"""Hardware benchmark: can the z-stacked 2D conv formulation beat the
fused Pallas res3d kernel at INFERENCE?

Compares, at the flagship 32ch @ 64^3 batch-8 bf16 res-block shape:
  a) fused Pallas res3d block (current inference path)
  b) z2d res block: two conv3d_as_z2d convs with BN folded to scale/bias,
     relu, skip-add — all XLA (rides the tuned 2D image-conv path)
  c) single z2d conv vs single direct XLA 3D conv (shape wall probe)

    python benchmarks/bench_z2d_infer.py
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

    from lt_tpu.models.v2v import conv3d_as_z2d
    from lt_tpu.ops.pallas.res3d import res3d_block_fused

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    b, side, c = 8, 64, 32
    x = jnp.asarray(rng.randn(b, side, side, side, c), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)

    gflop = 2 * 2 * b * side**3 * 27 * c * c / 1e9

    # a) fused pallas block
    @jax.jit
    def pallas_block(x):
        return res3d_block_fused(x, w1.astype(jnp.bfloat16), b1,
                                 w2.astype(jnp.bfloat16), b2,
                                 out_dtype=jnp.bfloat16)

    dt = timed(pallas_block, x)
    print(f"pallas fused block : {dt*1e3:7.2f} ms  {gflop/dt/1e3:6.1f} TF/s",
          flush=True)

    # b) z2d block (XLA 2D convs, BN folded into bias here for timing)
    @jax.jit
    def z2d_block(x):
        r = conv3d_as_z2d(x, w1, 1, jnp.bfloat16) + b1.astype(jnp.bfloat16)
        r = jax.nn.relu(r)
        r = conv3d_as_z2d(r, w2, 1, jnp.bfloat16) + b2.astype(jnp.bfloat16)
        return jax.nn.relu(r + x)

    dt = timed(z2d_block, x)
    print(f"z2d block (XLA 2D) : {dt*1e3:7.2f} ms  {gflop/dt/1e3:6.1f} TF/s",
          flush=True)

    # c) single-conv probes
    @jax.jit
    def z2d_conv(x):
        return conv3d_as_z2d(x, w1, 1, jnp.bfloat16)

    @jax.jit
    def xla_conv3d(x):
        return jax.lax.conv_general_dilated(
            x, w1.astype(jnp.bfloat16), (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    g1 = gflop / 2
    dt = timed(z2d_conv, x)
    print(f"z2d single conv    : {dt*1e3:7.2f} ms  {g1/dt/1e3:6.1f} TF/s",
          flush=True)
    dt = timed(xla_conv3d, x)
    print(f"xla direct conv3d  : {dt*1e3:7.2f} ms  {g1/dt/1e3:6.1f} TF/s",
          flush=True)

    # chained: 3 z2d blocks back-to-back (does XLA keep the slab layout?)
    @jax.jit
    def z2d_chain(x):
        for _ in range(3):
            x = z2d_block(x)
        return x

    @jax.jit
    def pallas_chain(x):
        for _ in range(3):
            x = pallas_block(x)
        return x

    dt = timed(z2d_chain, x)
    print(f"z2d chain x3       : {dt*1e3:7.2f} ms  {3*gflop/dt/1e3:6.1f} TF/s",
          flush=True)
    dt = timed(pallas_chain, x)
    print(f"pallas chain x3    : {dt*1e3:7.2f} ms  {3*gflop/dt/1e3:6.1f} TF/s",
          flush=True)


if __name__ == "__main__":
    main()
