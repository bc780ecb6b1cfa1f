"""Engine behavior tests: frozen final layer, LR groups, grad clip, resume."""

import numpy as np
import jax
import jax.numpy as jnp

from lt_tpu.engine import factory
from lt_tpu.engine.steps import TrainState, make_eval_step, make_train_step
from lt_tpu.models.triangulation import VolumetricTriangulationNet
from lt_tpu.utils.cfg import AttrDict


def _setup():
    config = AttrDict({
        "kind": "human36m",
        "opt": {"criterion": "MAE", "lr": 1e-3,
                "process_features_lr": 1e-2, "volume_net_lr": 1e-2,
                "use_volumetric_ce_loss": True,
                "volumetric_ce_loss_weight": 0.01,
                "scale_keypoints_3d": 0.1, "grad_clip": 1.0},
        "model": {"name": "vol",
                  "backbone": {"num_joints": 7, "num_layers": 18}},
    })
    model = VolumetricTriangulationNet(
        num_joints=7, num_layers=18, volume_size=32, kind="mpii")
    rng = np.random.RandomState(0)
    b, v = 2, 2
    batch = {
        "images": jnp.asarray(rng.randn(b, v, 64, 64, 3).astype(np.float32)),
        "proj_matrices": jnp.asarray(
            rng.randn(b, v, 3, 4).astype(np.float32)),
        "keypoints_3d": jnp.asarray(np.concatenate(
            [rng.uniform(-300, 300, (b, 7, 3)),
             np.ones((b, 7, 1))], -1).astype(np.float32)),
        "keypoints_validity": jnp.ones((b, 7, 1)),
        "view_mask": jnp.ones((b, v)),
        "pred_keypoints_3d": jnp.asarray(
            rng.uniform(-300, 300, (b, 7, 3)).astype(np.float32)),
    }
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        batch["images"], batch["proj_matrices"],
        batch["pred_keypoints_3d"])
    return config, model, dict(variables), batch


def test_train_step_freezes_final_layer_and_updates_rest():
    config, model, variables, batch = _setup()
    criterion = factory.make_criterion(config)
    optimizer = factory.make_optimizer(config, variables["params"], "vol")
    state = TrainState(variables["params"], variables["batch_stats"],
                       optimizer.init(variables["params"]),
                       jnp.zeros((), jnp.int32))
    train_step = make_train_step(model, "vol", criterion, optimizer, config)
    import copy

    before_final = np.asarray(
        state.params["backbone"]["final_layer"]["kernel"]).copy()
    before_conv1 = np.asarray(
        state.params["backbone"]["conv1"]["kernel"]).copy()
    before_v2v = np.asarray(
        state.params["volume_net"]["front_basic"]["conv"]["kernel"]).copy()

    new_state, metrics = train_step(state, batch, jax.random.PRNGKey(2))

    # final_layer frozen (triangulation.py:235-236 semantics).
    np.testing.assert_array_equal(
        np.asarray(new_state.params["backbone"]["final_layer"]["kernel"]),
        before_final)
    # other groups updated.
    assert not np.allclose(
        np.asarray(new_state.params["backbone"]["conv1"]["kernel"]),
        before_conv1)
    assert not np.allclose(
        np.asarray(new_state.params["volume_net"]["front_basic"]["conv"]
                   ["kernel"]), before_v2v)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    assert "volumetric_ce_loss" in metrics
    assert float(metrics["grad_norm_times_lr"]) >= 0


def test_use_gt_pelvis_overrides_predictions():
    """use_gt_pelvis must anchor the cuboid at the GT pelvis even when
    pred_keypoints_3d is present (triangulation.py:286-294)."""
    config, model, variables, batch = _setup()
    criterion = factory.make_criterion(config)
    state = TrainState(variables["params"], variables["batch_stats"], None,
                       jnp.zeros((), jnp.int32))

    # Both keys present and very different: the flag decides.
    config.model.use_gt_pelvis = True
    eval_step = make_eval_step(model, "vol", criterion, config)
    _, metrics = eval_step(state, batch)
    # base_point == GT pelvis -> base_point_l2 is exactly 0.
    np.testing.assert_allclose(float(metrics["base_point_l2"]), 0.0,
                               atol=1e-5)

    config.model.use_gt_pelvis = False
    eval_step_pred = make_eval_step(model, "vol", criterion, config)
    _, metrics_pred = eval_step_pred(state, batch)
    assert float(metrics_pred["base_point_l2"]) > 1.0  # anchored at preds


def test_eval_step_deterministic():
    config, model, variables, batch = _setup()
    criterion = factory.make_criterion(config)
    state = TrainState(variables["params"], variables["batch_stats"], None,
                       jnp.zeros((), jnp.int32))
    eval_step = make_eval_step(model, "vol", criterion, config)
    kp1, m1 = eval_step(state, batch)
    kp2, m2 = eval_step(state, batch)
    np.testing.assert_array_equal(np.asarray(kp1), np.asarray(kp2))
    assert kp1.shape == (2, 7, 3)
