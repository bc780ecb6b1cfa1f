"""Per-stage timing of the volumetric pipeline on the current backend.

Times each stage of the flagship forward separately (backbone / process /
unproject / V2V / soft-argmax) so optimization effort goes where the
milliseconds are.  Run on the real chip:

    python benchmarks/profile_stages.py [--batch 8] [--layers 152]
        [--image 384] [--volume 64] [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    """Scalar device->host fetch: the only reliable sync under axon."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def timed(fn, *args, iters=10):
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
    return max(time.perf_counter() - t0 - rtt, 1e-9) / iters, out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--layers", type=int, default=152)
    parser.add_argument("--image", type=int, default=384)
    parser.add_argument("--volume", type=int, default=64)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _example_batch
    from lt_tpu.models.backbone import PoseResNet
    from lt_tpu.models.v2v import V2VModel
    from lt_tpu.ops import heatmaps as hm_ops
    from lt_tpu.ops import volumetric as vol_ops

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b, v, j = args.batch, 4, 17
    images, proj, keypoints = _example_batch(b, v, args.image, j)
    images = jnp.asarray(images.reshape((b * v,) + images.shape[2:]))
    proj = jnp.asarray(proj)

    backbone = PoseResNet(num_joints=j, num_layers=args.layers,
                          compute_dtype=dtype)
    bvars = jax.jit(backbone.init)(jax.random.PRNGKey(0), images[:1])

    bb = jax.jit(lambda v, x: backbone.apply(v, x, train=False)[1])
    t_bb, features = timed(bb, bvars, images, iters=args.iters)

    import flax.linen as nn

    proc = nn.Conv(32, (1, 1), dtype=dtype, param_dtype=jnp.float32)
    pvars = jax.jit(proc.init)(jax.random.PRNGKey(1), features[:1])
    pf = jax.jit(lambda v, x: proc.apply(v, x))
    t_proc, feats32 = timed(pf, pvars, features, iters=args.iters)

    hm_h = feats32.shape[1]
    feats_views = feats32.reshape((b, v) + feats32.shape[1:])
    base = jnp.asarray(keypoints[:, 6 % j])
    coords = vol_ops.build_coord_volumes(base, 2500.0, args.volume)
    proj_hm = proj * jnp.asarray([hm_h / args.image, hm_h / args.image, 1.0]
                                 )[:, None]

    if jax.default_backend() == "tpu":
        # The production path: fused Pallas unprojection + in-kernel
        # softmax aggregation (NDHWC out).
        from lt_tpu.ops.pallas import unproject as pallas_unproject

        grid_affine = vol_ops.coord_volume_affine(base, 2500.0, args.volume)
        unproj = jax.jit(lambda f, p, g: jnp.moveaxis(
            pallas_unproject.unproject_heatmaps_affine(
                f, p, g, args.volume, "softmax", fuse_aggregation=True,
                channels_last=True), -1, 1))
        t_unproj, volumes = timed(unproj, feats_views, proj_hm, grid_affine,
                                  iters=args.iters)
    else:
        unproj = jax.jit(lambda f, p, c: vol_ops.unproject_heatmaps(
            f, p, c, "softmax"))
        t_unproj, volumes = timed(unproj, feats_views, proj_hm, coords,
                                  iters=args.iters)

    v2v = V2VModel(output_channels=j, compute_dtype=dtype)
    volumes_ndhwc = jnp.moveaxis(volumes, 1, -1)
    vvars = jax.jit(v2v.init)(jax.random.PRNGKey(2), volumes_ndhwc[:1])
    vv = jax.jit(lambda v, x: v2v.apply(v, x, train=False))
    t_v2v, out_vol = timed(vv, vvars, volumes_ndhwc, iters=args.iters)

    sam = jax.jit(lambda vol, c: hm_ops.integrate_tensor_3d_with_coordinates(
        jnp.moveaxis(vol, -1, 1), c)[0])
    t_sam, _ = timed(sam, out_vol, coords, iters=args.iters)

    total = t_bb + t_proc + t_unproj + t_v2v + t_sam
    print(f"devices: {jax.devices()}")
    print(f"batch={b} views={v} image={args.image} volume={args.volume} "
          f"layers={args.layers} dtype={args.dtype}")
    for name, t in (("backbone", t_bb), ("process_features", t_proc),
                    ("unproject", t_unproj), ("v2v", t_v2v),
                    ("softargmax3d", t_sam)):
        print(f"  {name:18s} {t * 1e3:9.2f} ms  ({100 * t / total:5.1f}%)")
    print(f"  {'TOTAL':18s} {total * 1e3:9.2f} ms  "
          f"-> {b / total:.1f} frames/s")


if __name__ == "__main__":
    main()
