"""Quantify the bf16-vs-f32 eval delta of the flagship volumetric model.

MPJPE parity budget is 0.1 mm (BASELINE.md); this measures how much of it
bf16 compute consumes: same weights, same synthetic inputs, keypoints from
the f32 forward vs the bf16 forward.  Record the number in ROADMAP.md.

Run on the real chip: python benchmarks/bf16_delta.py [--layers 152]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--layers", type=int, default=152)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--image", type=int, default=384)
    parser.add_argument("--volume", type=int, default=64)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _example_batch
    from lt_tpu.models.triangulation import VolumetricTriangulationNet

    j, v = 17, 4
    images, proj, keypoints = _example_batch(args.batch, v, args.image, j)

    import os

    outs = {}
    legs = (("f32", jnp.float32, True), ("bf16_xla", jnp.bfloat16, True),
            ("bf16", jnp.bfloat16, False))
    for name, dt, disable_pallas in legs:
        # The f32 leg is the precision REFERENCE: force the XLA conv path
        # (Mosaic dots run at DEFAULT precision regardless of input dtype,
        # so a pallas f32 leg would not be a true f32 baseline).  The
        # bf16_xla leg separates the dtype contribution from the pallas-
        # kernel contribution.
        if disable_pallas:
            os.environ["LT_TPU_DISABLE_PALLAS_RES3D"] = "1"
        else:
            os.environ.pop("LT_TPU_DISABLE_PALLAS_RES3D", None)
        model = VolumetricTriangulationNet(
            num_joints=j, num_layers=args.layers, volume_size=args.volume,
            cuboid_side=2500.0, volume_aggregation_method="softmax",
            kind="mpii", compute_dtype=dt)
        variables = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
            jnp.asarray(images[:1]), jnp.asarray(proj[:1]),
            jnp.asarray(keypoints[:1]))
        if "f32" in outs:  # identical weights for both runs
            variables = prev_variables  # noqa: F821
        prev_variables = variables

        def fwd(variables, images, proj, kp):
            return model.apply(variables, images, proj, kp,
                               train=False).keypoints_3d

        kp = jax.jit(fwd)(variables, jnp.asarray(images), jnp.asarray(proj),
                          jnp.asarray(keypoints))
        outs[name] = np.asarray(kp, np.float64)
        print(f"{name}: keypoints computed")

    for leg in ("bf16_xla", "bf16"):
        per_joint = np.sqrt(((outs[leg] - outs["f32"]) ** 2).sum(-1))
        print(f"{leg}-vs-f32 keypoint delta: mean {per_joint.mean():.4f} mm, "
              f"p95 {np.percentile(per_joint, 95):.4f} mm, "
              f"max {per_joint.max():.4f} mm "
              f"(volume {args.volume}^3, cuboid 2500 mm -> voxel "
              f"{2500 / (args.volume - 1):.1f} mm)")


if __name__ == "__main__":
    main()
