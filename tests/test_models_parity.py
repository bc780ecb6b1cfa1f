"""Numeric parity tests: flax modules vs the reference PyTorch modules.

These tests import the reference implementation (read-only at
/root/reference) to generate golden outputs, load its random ``state_dict``
through ``lt_tpu.utils.torch_import``, and require the flax forward pass to
match to fp32 tolerance. Skipped when the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not available")

if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def _state_dict_np(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("num_layers,alg_conf", [(18, False), (50, True)])
def test_pose_resnet_matches_reference(num_layers, alg_conf):
    import torch
    from mvn.models import pose_resnet as ref_pr

    from lt_tpu.models.backbone import PoseResNet, RESNET_SPEC
    from lt_tpu.utils import torch_import

    torch.manual_seed(0)
    block, layers = ref_pr.resnet_spec[num_layers]
    num_joints = 5
    ref = ref_pr.PoseResNet(block, layers, num_joints,
                            alg_confidences=alg_conf, vol_confidences=False)
    ref.eval()

    x = torch.randn(2, 3, 128, 128) if alg_conf else torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        hm_t, feat_t, alg_t, _ = ref(x)

    variables = torch_import.import_pose_resnet(
        _state_dict_np(ref), num_layers=num_layers, num_joints=num_joints)
    model = PoseResNet(num_joints=num_joints, num_layers=num_layers,
                       alg_confidences=alg_conf)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    hm, feat, alg, _ = model.apply(variables, x_j, train=False)

    np.testing.assert_allclose(np.asarray(hm).transpose(0, 3, 1, 2),
                               hm_t.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(feat).transpose(0, 3, 1, 2),
                               feat_t.numpy(), atol=2e-3, rtol=1e-3)
    if alg_conf:
        np.testing.assert_allclose(np.asarray(alg), alg_t.numpy(),
                                   atol=2e-3, rtol=1e-3)


def test_v2v_matches_reference():
    import torch
    from mvn.models.v2v import V2VModel as RefV2V

    from lt_tpu.models.v2v import V2VModel
    from lt_tpu.utils import torch_import

    torch.manual_seed(1)
    ref = RefV2V(4, 3)
    ref.eval()
    x = torch.randn(1, 4, 32, 32, 32)
    with torch.no_grad():
        y_t = ref(x).numpy()  # (1, 3, 32, 32, 32)

    variables = torch_import.import_v2v(_state_dict_np(ref))
    model = V2VModel(output_channels=3)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    y = model.apply(variables, x_j, train=False)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 4, 1, 2, 3), y_t,
                               atol=2e-3, rtol=1e-3)


def test_losses_match_reference():
    import torch
    from mvn.models import loss as ref_loss

    from lt_tpu.models import losses

    rng = np.random.RandomState(3)
    pred = rng.randn(4, 17, 3).astype(np.float32) * 100
    gt = rng.randn(4, 17, 3).astype(np.float32) * 100
    val = (rng.rand(4, 17, 1) > 0.2).astype(np.float32)

    pairs = [
        (ref_loss.KeypointsMSELoss(), losses.keypoints_mse_loss),
        (ref_loss.KeypointsMSESmoothLoss(400),
         lambda p, g, v: losses.keypoints_mse_smooth_loss(p, g, v, 400.0)),
        (ref_loss.KeypointsMAELoss(), losses.keypoints_mae_loss),
        (ref_loss.KeypointsL2Loss(), losses.keypoints_l2_loss),
    ]
    for ref_fn, fn in pairs:
        expected = ref_fn(torch.tensor(pred), torch.tensor(gt),
                          torch.tensor(val)).item()
        got = float(fn(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(val)))
        np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_volumetric_ce_loss_matches_reference():
    import torch
    from mvn.models.loss import VolumetricCELoss

    from lt_tpu.models import losses
    from lt_tpu.ops import volumetric as vol_ops

    rng = np.random.RandomState(4)
    b, j, s = 2, 5, 8
    base = rng.uniform(-100, 100, (b, 3)).astype(np.float32)
    coords = np.asarray(vol_ops.build_coord_volumes(
        jnp.asarray(base), 500.0, s))
    logits = rng.randn(b, j, s, s, s).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).reshape(b, j, -1).sum(
        -1)[..., None, None, None]
    gt = (base[:, None] + rng.uniform(-200, 200, (b, j, 3))).astype(np.float32)
    val = np.ones((b, j, 1), np.float32)

    expected = VolumetricCELoss()(
        torch.tensor(coords), torch.tensor(probs), torch.tensor(gt),
        torch.tensor(val)).item()
    got = float(losses.volumetric_ce_loss(
        jnp.asarray(coords), jnp.asarray(probs), jnp.asarray(gt),
        jnp.asarray(val)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_integrate_ops_match_reference():
    import torch
    from mvn.utils import op as ref_op

    from lt_tpu.ops import heatmaps

    rng = np.random.RandomState(5)
    hm = rng.randn(2, 6, 24, 20).astype(np.float32)

    for softmax in (True, False):
        coords_t, maps_t = ref_op.integrate_tensor_2d(
            torch.tensor(hm) * 100.0, softmax)
        coords, maps = heatmaps.integrate_tensor_2d(
            jnp.asarray(hm) * 100.0, softmax)
        np.testing.assert_allclose(np.asarray(coords), coords_t.numpy(),
                                   atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(maps), maps_t.numpy(),
                                   atol=1e-5, rtol=1e-4)

    vol = rng.randn(2, 4, 10, 12, 14).astype(np.float32)
    coords_t, vols_t = ref_op.integrate_tensor_3d(torch.tensor(vol) * 10, True)
    coords, vols = heatmaps.integrate_tensor_3d(jnp.asarray(vol) * 10, True)
    np.testing.assert_allclose(np.asarray(coords), coords_t.numpy(),
                               atol=1e-3, rtol=1e-4)

    cv = rng.randn(2, 10, 12, 14, 3).astype(np.float32) * 100
    coords_t, _ = ref_op.integrate_tensor_3d_with_coordinates(
        torch.tensor(vol) * 10, torch.tensor(cv), True)
    coords, _ = heatmaps.integrate_tensor_3d_with_coordinates(
        jnp.asarray(vol) * 10, jnp.asarray(cv), True)
    np.testing.assert_allclose(np.asarray(coords), coords_t.numpy(),
                               atol=1e-2, rtol=1e-4)


def _image_space_cameras(n_views, image_size, rng):
    """Synthetic ring cameras with intrinsics in image pixel space."""
    from tests.conftest import make_synthetic_cameras

    proj, R, t, K = make_synthetic_cameras(n_views, rng)
    scale = np.array([[image_size / 96.0], [image_size / 96.0], [1.0]],
                     np.float32)
    return proj * scale, R, t, K * scale


@pytest.mark.slow
def test_algebraic_model_matches_reference():
    """Full AlgebraicTriangulationNet forward vs triangulation.py:131-200
    with identical random weights."""
    import torch
    from mvn.models.triangulation import AlgebraicTriangulationNet as RefAlg

    from lt_tpu.models.triangulation import AlgebraicTriangulationNet
    from lt_tpu.utils import torch_import
    from lt_tpu.utils.cfg import AttrDict

    torch.manual_seed(7)
    num_joints, num_layers, b, v, img = 5, 18, 2, 3, 128
    config = AttrDict({"model": {
        "use_confidences": True, "heatmap_softmax": True,
        "heatmap_multiplier": 100.0,
        "backbone": {"name": "resnet18", "style": "simple",
                     "init_weights": False, "checkpoint": "",
                     "num_joints": num_joints, "num_layers": num_layers}}})
    ref = RefAlg(config, device="cpu")
    ref.eval()

    rng = np.random.RandomState(11)
    proj, *_ = _image_space_cameras(v, img, rng)
    proj_b = np.broadcast_to(proj, (b, v, 3, 4)).astype(np.float32)
    images = rng.randn(b, v, 3, img, img).astype(np.float32)

    with torch.no_grad():
        kp3d_t, kp2d_t, hm_t, conf_t = ref(
            torch.tensor(images), torch.tensor(proj_b), {})

    variables = torch_import.import_algebraic_model(
        _state_dict_np(ref), num_layers, num_joints)
    model = AlgebraicTriangulationNet(num_joints=num_joints,
                                      num_layers=num_layers,
                                      use_confidences=True)
    out = model.apply(variables, jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
                      jnp.asarray(proj_b), train=False)

    np.testing.assert_allclose(np.asarray(out.confidences), conf_t.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.keypoints_2d), kp2d_t.numpy(),
                               atol=5e-2, rtol=1e-3)
    # Random-weight heatmaps put every view's soft-argmax near the image
    # center, so the triangulated point sits ~7 m out on near-parallel rays
    # — an ill-conditioned DLT where fp32 backbone noise amplifies.  The
    # chain wiring is still pinned tight by the 2D/confidence asserts above;
    # exact DLT math has its own recovery tests (test_geometry.py).
    np.testing.assert_allclose(np.asarray(out.keypoints_3d), kp3d_t.numpy(),
                               atol=2.0, rtol=5e-3)


@pytest.mark.slow
def test_volumetric_model_matches_reference():
    """Full VolumetricTriangulationNet forward vs triangulation.py:203-355
    with identical random weights (eval mode: rotation theta = 0)."""
    import torch
    from mvn.models.triangulation import VolumetricTriangulationNet as RefVol
    from mvn.utils.multiview import Camera as RefCamera

    from lt_tpu.models.triangulation import VolumetricTriangulationNet
    from lt_tpu.utils import torch_import
    from lt_tpu.utils.cfg import AttrDict

    torch.manual_seed(9)
    # volume_size >= 32: the reference V2V encoder max-pools 5 times.
    num_joints, num_layers, b, v, img, vol = 7, 18, 1, 2, 128, 32
    config = AttrDict({"model": {
        "volume_aggregation_method": "softmax", "volume_softmax": True,
        "volume_multiplier": 1.0, "volume_size": vol,
        "cuboid_side": 2000.0, "kind": "mpii", "use_gt_pelvis": True,
        "heatmap_softmax": True, "heatmap_multiplier": 100.0,
        "backbone": {"name": "resnet18", "style": "simple",
                     "init_weights": False, "checkpoint": "",
                     "num_joints": num_joints, "num_layers": num_layers}}})
    ref = RefVol(config, device="cpu")
    ref.eval()

    rng = np.random.RandomState(13)
    proj, R, t, K = _image_space_cameras(v, img, rng)
    images = rng.randn(b, v, 3, img, img).astype(np.float32)
    keypoints = rng.uniform(-300, 300, (b, num_joints, 4)).astype(np.float32)

    cameras = [[RefCamera(R[vi], t[vi], K[vi], None, str(vi))
                for _ in range(b)] for vi in range(v)]
    batch = {"cameras": cameras, "keypoints_3d": keypoints}

    with torch.no_grad():
        kp3d_t, _, volumes_t, _, _, coords_t, base_t = ref(
            torch.tensor(images), torch.tensor(np.broadcast_to(
                proj, (b, v, 3, 4)).astype(np.float32)), batch)

    variables = torch_import.import_volumetric_model(
        _state_dict_np(ref), num_layers, num_joints)
    model = VolumetricTriangulationNet(
        num_joints=num_joints, num_layers=num_layers, volume_size=vol,
        cuboid_side=2000.0, volume_aggregation_method="softmax", kind="mpii")
    out = model.apply(
        variables, jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(np.broadcast_to(proj, (b, v, 3, 4)).astype(np.float32)),
        jnp.asarray(keypoints), train=False,
        rotation_thetas=jnp.zeros((b,), jnp.float32))

    np.testing.assert_allclose(np.asarray(out.base_points), base_t.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.coord_volumes),
                               coords_t.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.volumes), volumes_t.numpy(),
                               atol=2e-3, rtol=1e-3)
    # World-mm 3D points within 0.1 mm (the BASELINE.md MPJPE budget).
    np.testing.assert_allclose(np.asarray(out.keypoints_3d), kp3d_t.numpy(),
                               atol=0.1, rtol=1e-3)


@pytest.mark.slow
def test_pose_resnet152_matches_reference():
    """ResNet-152 import + forward parity: exercises the 36-block scanned
    layer3 import path (pose_resnet.py:177-181 spec)."""
    import torch
    from mvn.models import pose_resnet as ref_pr

    from lt_tpu.models.backbone import PoseResNet
    from lt_tpu.utils import torch_import

    torch.manual_seed(2)
    block, layers = ref_pr.resnet_spec[152]
    num_joints = 3
    ref = ref_pr.PoseResNet(block, layers, num_joints,
                            alg_confidences=False, vol_confidences=True)
    ref.eval()

    x = torch.randn(1, 3, 128, 128)  # GAP heads need >= 4x4 at layer4
    with torch.no_grad():
        hm_t, feat_t, _, vol_t = ref(x)

    variables = torch_import.import_pose_resnet(
        _state_dict_np(ref), num_layers=152, num_joints=num_joints)
    model = PoseResNet(num_joints=num_joints, num_layers=152,
                       alg_confidences=False, vol_confidences=True)
    hm, feat, _, volc = model.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)

    np.testing.assert_allclose(np.asarray(hm).transpose(0, 3, 1, 2),
                               hm_t.numpy(), atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(feat).transpose(0, 3, 1, 2),
                               feat_t.numpy(), atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(volc), vol_t.numpy(),
                               atol=5e-3, rtol=1e-3)


def test_unproject_matches_reference_grid_sample(rng):
    """Golden test of the unprojection against the reference op.py:99-166."""
    import torch
    from mvn.utils import op as ref_op

    from lt_tpu.ops import volumetric as vol_ops
    from tests.conftest import make_synthetic_cameras

    proj, *_ = make_synthetic_cameras(3, rng)
    b, v, c, h, w, s = 2, 3, 4, 16, 16, 8
    heatmaps_nchw = rng.randn(b, v, c, h, w).astype(np.float32)
    proj_b = np.broadcast_to(proj[:v], (b, v, 3, 4)).copy().astype(np.float32)
    base = rng.uniform(-100, 100, (b, 3)).astype(np.float32)
    coords = np.asarray(vol_ops.build_coord_volumes(jnp.asarray(base),
                                                    2500.0, s))

    for method in ("sum", "max", "softmax", "conf"):
        conf = rng.rand(b, v, c).astype(np.float32)
        ref = ref_op.unproject_heatmaps(
            torch.tensor(heatmaps_nchw), torch.tensor(proj_b),
            torch.tensor(coords), volume_aggregation_method=method,
            vol_confidences=torch.tensor(conf)).numpy()
        got = np.asarray(vol_ops.unproject_heatmaps(
            jnp.asarray(heatmaps_nchw.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(proj_b), jnp.asarray(coords),
            volume_aggregation_method=method,
            vol_confidences=jnp.asarray(conf)))
        np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3,
                                   err_msg=f"method={method}")


def test_bf16_batchnorm_drift_pinned():
    """Regression threshold for bf16 BN numerics (ADVICE r2): our BatchNorm
    normalizes in the input dtype (memory lever; PyTorch AMP keeps BN f32),
    so pin the resulting keypoint drift of a full bf16 backbone forward vs
    f32 — future dtype changes must not silently compound it."""
    import jax

    from lt_tpu.models.backbone import PoseResNet
    from lt_tpu.ops.heatmaps import integrate_tensor_2d

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)

    def forward(dtype):
        model = PoseResNet(num_joints=8, num_layers=18,
                           compute_dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0), images, False)
        # Shift BN stats off init defaults so the normalize has real work.
        stats = jax.tree_util.tree_map(lambda a: a, variables["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": stats}
        heatmaps, _, _, _ = model.apply(variables, images, False)
        kp, _ = integrate_tensor_2d(heatmaps.astype(jnp.float32) * 100.0)
        return np.asarray(kp)

    kp_f32 = forward(jnp.float32)
    kp_bf16 = forward(jnp.bfloat16)
    drift = np.abs(kp_bf16 - kp_f32)
    # Pinned budget in heatmap pixels (16x16 heatmap here): measured
    # mean 0.047 / max 0.34 on this fixture; ~2-3x headroom before failing.
    assert drift.mean() < 0.15, drift.mean()
    assert drift.max() < 0.75, drift.max()


def test_s2d_stem_matches_direct_conv(monkeypatch):
    """StemConv's space-to-depth formulation (LT_TPU_S2D_STEM=1) is the
    SAME convolution: zero-front-padded k7 -> k8 regrouped to k4/s1 over
    2x2-folded channels.  Exact up to summation order."""
    import jax
    import jax.numpy as jnp

    from lt_tpu.models.backbone import StemConv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 48, 3), jnp.float32)
    stem = StemConv(8)
    variables = stem.init(jax.random.PRNGKey(0), x)
    ref = stem.apply(variables, x)
    monkeypatch.setenv("LT_TPU_S2D_STEM", "1")
    got = stem.apply(variables, x)
    assert got.shape == ref.shape == (2, 16, 24, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
