"""Backbone .npz fixture: roundtrip + init_model_state wiring."""

import numpy as np

from lt_tpu.utils import fixture


def test_npz_roundtrip(tmp_path):
    params = {"conv1": {"kernel": np.random.RandomState(0)
                        .randn(3, 3, 3, 8).astype(np.float32)},
              "bn1": {"scale": np.ones(8, np.float32)}}
    stats = {"bn1": {"mean": np.zeros(8, np.float32),
                     "var": np.ones(8, np.float32)}}
    path = str(tmp_path / "bb.npz")
    fixture.save_backbone_npz(path, params, stats)
    back = fixture.load_backbone_npz(path)
    # f16 export: equal to f16 precision, dtype restored to f32.
    np.testing.assert_allclose(back["params"]["conv1"]["kernel"],
                               params["conv1"]["kernel"], atol=1e-3)
    assert back["params"]["conv1"]["kernel"].dtype == np.float32
    np.testing.assert_array_equal(back["batch_stats"]["bn1"]["var"],
                                  stats["bn1"]["var"])


def test_init_model_state_loads_npz_backbone(tmp_path):
    """model.backbone.checkpoint: *.npz merges shape-matching leaves into
    the fresh init (missing leaves — e.g. a dropped final_layer — keep
    their fresh values)."""
    import jax

    from lt_tpu.data.batch import collate
    from lt_tpu.data.synthetic import SyntheticMultiViewDataset
    from lt_tpu.engine import factory
    from lt_tpu.engine.train import init_model_state
    from lt_tpu.utils.cfg import AttrDict

    config = AttrDict({
        "kind": "human36m",
        "opt": {"criterion": "MAE", "lr": 1e-3},
        "model": {"name": "alg", "use_confidences": False,
                  "backbone": {"num_joints": 5, "num_layers": 18,
                               "init_weights": True, "checkpoint": ""}}})
    ds = SyntheticMultiViewDataset(n_samples=2, n_views=2, num_joints=5,
                                   image_size=64)
    batch = collate([ds[0], ds[1]])

    model = factory.make_model(config)
    params0, stats0 = init_model_state(config, model, batch, seed=0)

    # Export a perturbed backbone as the fixture; drop final_layer.
    bb = jax.tree.map(lambda x: np.asarray(x) + 0.25,
                      params0["backbone"])
    bb = dict(bb)
    dropped_final = bb.pop("final_layer")
    path = str(tmp_path / "fix.npz")
    fixture.save_backbone_npz(path, bb, stats0["backbone"])

    config.model.backbone.checkpoint = path
    params1, stats1 = init_model_state(config, model, batch, seed=0)

    # Stem kernel came from the fixture (+0.25 at f16 tolerance)...
    k0 = np.asarray(params0["backbone"]["conv1"]["kernel"])
    k1 = np.asarray(params1["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(k1, k0 + 0.25, atol=2e-3)
    # ...while the dropped final_layer kept its fresh init.
    f0 = np.asarray(params0["backbone"]["final_layer"]["kernel"])
    f1 = np.asarray(params1["backbone"]["final_layer"]["kernel"])
    np.testing.assert_array_equal(f0, f1)
    assert not np.allclose(f0, np.asarray(dropped_final["kernel"]) + 0.25)


def test_init_model_state_loads_npz_whole_model(tmp_path):
    """model.checkpoint: *.npz merges a FULL-model fixture (backbone +
    heads) into the fresh init — the committed-fixture path the e2e
    volumetric test fine-tunes from (reference whole-model init,
    train.py:406-413)."""
    import jax

    from lt_tpu.data.batch import collate
    from lt_tpu.data.synthetic import SyntheticMultiViewDataset
    from lt_tpu.engine import factory
    from lt_tpu.engine.train import init_model_state
    from lt_tpu.utils.cfg import AttrDict

    config = AttrDict({
        "kind": "human36m",
        "opt": {"criterion": "MAE", "lr": 1e-3},
        "model": {"name": "alg", "use_confidences": False,
                  "init_weights": False, "checkpoint": "",
                  "backbone": {"num_joints": 5, "num_layers": 18}}})
    ds = SyntheticMultiViewDataset(n_samples=2, n_views=2, num_joints=5,
                                   image_size=64)
    batch = collate([ds[0], ds[1]])

    model = factory.make_model(config)
    params0, stats0 = init_model_state(config, model, batch, seed=0)

    shifted = jax.tree.map(lambda x: np.asarray(x) + 0.125, params0)
    path = str(tmp_path / "model.npz")
    fixture.save_model_npz(path, shifted, stats0)

    config.model.init_weights = True
    config.model.checkpoint = path
    params1, _ = init_model_state(config, model, batch, seed=0)

    k0 = np.asarray(params0["backbone"]["conv1"]["kernel"])
    k1 = np.asarray(params1["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(k1, k0 + 0.125, atol=2e-3)
