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


def _load_trained(config_path: str, checkpoint_dir: str):
    """Restore a trained lt_tpu experiment (trained-weights legs).

    Returns (config, variables, batch): the experiment's config, its newest
    epoch checkpoint's params/batch_stats, and one val batch of the
    synthetic data it was trained on (peaked heatmaps — the regime the
    random-weight measurement cannot reach, VERDICT r2 weak #6).
    """
    from lt_tpu.data.batch import BatchIterator
    from lt_tpu.engine import train as engine
    from lt_tpu.engine import factory
    from lt_tpu.utils import cfg as cfg_lib

    config = cfg_lib.load_config(config_path)
    model = factory.make_model(config)
    _, val_ds = engine.make_datasets(config, is_train=False)
    it = BatchIterator(val_ds, batch_size=config.opt.get(
        "val_batch_size", config.opt.batch_size), shuffle=False,
        drop_last=False)
    batch = next(it.epoch(0))
    params, batch_stats = engine.init_model_state(config, model, batch)
    state, _ = engine.build_train_state(config, params, batch_stats)
    state, _ = engine.resolve_resume(checkpoint_dir, state)
    return config, {"params": state.params,
                    "batch_stats": state.batch_stats}, batch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--layers", type=int, default=152)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--image", type=int, default=384)
    parser.add_argument("--volume", type=int, default=64)
    parser.add_argument("--config", default=None,
                        help="experiment yaml (trained-weights mode)")
    parser.add_argument("--checkpoint", default=None,
                        help="trained experiment dir (trained-weights mode)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lt_tpu.models.triangulation import VolumetricTriangulationNet

    trained = None
    if args.checkpoint:
        assert args.config, "--checkpoint requires --config"
        config, trained, tbatch = _load_trained(args.config, args.checkpoint)
        m = config.model
        args.layers = m.backbone.num_layers
        args.volume = m.volume_size
        j = m.backbone.num_joints
        images = tbatch["images"]
        proj = tbatch["proj_matrices"]
        keypoints = tbatch["keypoints_3d"][:, :, :3]
        cuboid = m.cuboid_side
        agg = m.volume_aggregation_method
        kind = m.kind
        print(f"trained-weights mode: layers={args.layers} "
              f"volume={args.volume} batch={images.shape[0]}")
    else:
        from __graft_entry__ import _example_batch

        j = 17
        images, proj, keypoints = _example_batch(args.batch, 4, args.image, j)
        cuboid, agg, kind = 2500.0, "softmax", "mpii"

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
            cuboid_side=cuboid, volume_aggregation_method=agg,
            kind=kind, compute_dtype=dt)
        if trained is not None:
            variables = trained
        else:
            variables = jax.jit(model.init)(
                {"params": jax.random.PRNGKey(0),
                 "aug": jax.random.PRNGKey(1)},
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
