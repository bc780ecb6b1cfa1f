"""Microbenchmark: fused unprojection kernel across tile/band configs.

Times ``unproject_heatmaps_affine`` (fused aggregation path) on the real
chip for the flagship shapes while sweeping the voxel tile size and column
band width, to locate the kernel's governing cost (per-step overhead vs
one-hot matmul FLOPs, which scale with band_width).

    python benchmarks/bench_unproject.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import functools

    import jax
    import jax.numpy as jnp

    from lt_tpu.ops.pallas.unproject import unproject_heatmaps_affine

    print("backend:", jax.default_backend(), jax.devices())
    b, v, h, w, c, s = 8, 4, 96, 96, 32, 64
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, v, h, w, c), jnp.bfloat16)

    # Ring cameras (heatmap pixel units) + centered grid affine.
    proj = np.zeros((b, v, 3, 4), np.float32)
    for vv in range(v):
        ang = 2 * np.pi * vv / v
        center = np.array([4000 * np.cos(ang), 4000 * np.sin(ang), 1500.0])
        z = -center / np.linalg.norm(center)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        t = -R @ center.reshape(3, 1)
        K = np.array([[384 * 1.2 / 4, 0, 48.0], [0, 384 * 1.2 / 4, 48.0],
                      [0, 0, 1.0]])
        proj[:, vv] = K @ np.hstack([R, t])
    side = 2500.0
    ga = np.zeros((b, 3, 4), np.float32)
    ga[:, :, :3] = np.eye(3) * (side / (s - 1))
    ga[:, :, 3] = -side / 2
    proj = jnp.asarray(proj)
    ga = jnp.asarray(ga)

    for tile, bw in [(256, 16), (256, 8), (256, 32), (256, None), (128, 16),
                     (512, 16), (1024, 16), (256, 12)]:
        fn = jax.jit(functools.partial(
            unproject_heatmaps_affine, grid_size=s,
            volume_aggregation_method="softmax", tile=tile, band_width=bw,
            channels_last=True, fuse_aggregation=True))
        try:
            t = timed(fn, feats, proj, ga)
            print(f"tile={tile:5d} bw={str(bw):>4}: {t*1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"tile={tile:5d} bw={str(bw):>4}: FAILED {type(e).__name__}:"
                  f" {str(e)[:200]}")


if __name__ == "__main__":
    main()
