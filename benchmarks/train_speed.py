"""Flagship training-step speed + HBM traffic on one chip.

Measures the reference configuration (ResNet-152 @ 384^2, 4 views, 64^3
volume, batch 5, remat, bf16 compute) train step: wall time per step and
XLA cost-analysis bytes accessed (the training path is HBM-bandwidth
bound, ROADMAP "Training speed").

Run: python benchmarks/train_speed.py [--batch 5] [--iters 5]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--layers", type=int, default=152)
    ap.add_argument("--volume", type=int, default=64)
    ap.add_argument("--image", type=int, default=384)
    args = ap.parse_args()

    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lt_tpu.engine.factory import make_criterion, make_optimizer
    from lt_tpu.engine.steps import TrainState, make_train_step
    from lt_tpu.models.triangulation import VolumetricTriangulationNet
    from lt_tpu.utils.cfg import AttrDict
    from __graft_entry__ import _example_batch

    print("backend:", jax.default_backend(), flush=True)
    b, v, num_joints = args.batch, 4, 17
    config = AttrDict({
        "kind": "human36m",
        "opt": {"criterion": "MAE", "lr": 1e-4,
                "use_volumetric_ce_loss": True,
                "volumetric_ce_loss_weight": 0.01,
                "scale_keypoints_3d": 0.1,
                "remat": True},
        "model": {"name": "vol", "use_gt_pelvis": True,
                  "backbone": {"num_joints": num_joints,
                               "num_layers": args.layers}},
    })
    model = VolumetricTriangulationNet(
        num_joints=num_joints, num_layers=args.layers,
        volume_size=args.volume, cuboid_side=2500.0,
        volume_aggregation_method="softmax", kind="mpii",
        compute_dtype=jnp.bfloat16, remat=True)
    criterion = make_criterion(config)

    images, proj, keypoints = _example_batch(b, v, args.image, num_joints)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        jnp.asarray(images[:1]), jnp.asarray(proj[:1]),
        jnp.asarray(keypoints[:1]))
    optimizer = make_optimizer(config, variables["params"], "vol")
    state = TrainState(variables["params"], variables.get("batch_stats", {}),
                       optimizer.init(variables["params"]),
                       jnp.zeros((), jnp.int32))
    batch = {
        "images": jnp.asarray(images),
        "proj_matrices": jnp.asarray(proj),
        "keypoints_3d": jnp.asarray(np.concatenate(
            [keypoints, np.ones(keypoints.shape[:2] + (1,), np.float32)],
            -1)),
        "keypoints_validity": jnp.asarray(
            np.ones(keypoints.shape[:2] + (1,), np.float32)),
        "view_mask": jnp.asarray(np.ones((b, v), np.float32)),
    }

    train_step = make_train_step(model, "vol", criterion, optimizer, config)

    lowered = jax.jit(
        lambda s, bt, r: train_step(s, bt, r)).lower(
            state, batch, jax.random.PRNGKey(2))
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print(f"flops: {ca.get('flops', 0)/1e12:.2f} TFLOP, "
              f"bytes accessed: {ca.get('bytes accessed', 0)/1e9:.1f} GB",
              flush=True)
    except Exception as e:
        print("cost analysis unavailable:", e, flush=True)

    def _sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    state, metrics = compiled(state, batch, jax.random.PRNGKey(2))
    _sync(metrics)
    t0 = time.time()
    for i in range(args.iters):
        state, metrics = compiled(state, batch, jax.random.PRNGKey(2))
    _sync(metrics)
    dt = (time.time() - t0) / args.iters
    print(f"train step (b{b}, {args.layers}@{args.image}, "
          f"{args.volume}^3): {dt*1e3:.0f} ms/step "
          f"({b/dt:.2f} samples/s), loss={float(metrics['total_loss']):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
