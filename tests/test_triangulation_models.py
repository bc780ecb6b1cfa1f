"""Model-family tests: RANSAC core behavior, forward shapes, grads, jit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lt_tpu.models import triangulation as tri
from lt_tpu.ops import geometry
from tests.conftest import make_synthetic_cameras


def test_ransac_rejects_outlier_view(rng):
    proj, *_ = make_synthetic_cameras(4, rng)
    pts3d = rng.uniform(-300, 300, size=(6, 3)).astype(np.float32)
    pts2d = np.asarray(geometry.project_points(
        jnp.asarray(proj), jnp.asarray(pts3d)[None]))    # (V, 6, 2)
    pts2d = pts2d.swapaxes(0, 1)                         # (6, V, 2)

    # Corrupt view 2 far beyond the 15px inlier threshold.
    pts_bad = pts2d.copy()
    pts_bad[:, 2] += 300.0

    pm = jnp.broadcast_to(jnp.asarray(proj), (6, 4, 3, 4))
    rec = np.asarray(tri.ransac_triangulate(pm, jnp.asarray(pts_bad)))
    np.testing.assert_allclose(rec, pts3d, atol=1.0)

    # Plain DLT on the same corrupted data is much worse.
    plain = np.asarray(geometry.triangulate_point_dlt(pm, jnp.asarray(pts_bad)))
    assert np.abs(plain - pts3d).max() > 10.0


def test_ransac_direct_optimization_reduces_error(rng):
    proj, *_ = make_synthetic_cameras(4, rng)
    pts3d = rng.uniform(-300, 300, size=(5, 3)).astype(np.float32)
    pts2d = np.asarray(geometry.project_points(
        jnp.asarray(proj), jnp.asarray(pts3d)[None])).swapaxes(0, 1)
    noisy = pts2d + rng.randn(*pts2d.shape).astype(np.float32) * 2.0

    pm = jnp.broadcast_to(jnp.asarray(proj), (5, 4, 3, 4))
    rec_no = np.asarray(tri.ransac_triangulate(
        pm, jnp.asarray(noisy), direct_optimization=False))
    rec_go = np.asarray(tri.ransac_triangulate(
        pm, jnp.asarray(noisy), direct_optimization=True))
    err_no = np.linalg.norm(rec_no - pts3d, axis=-1).mean()
    err_go = np.linalg.norm(rec_go - pts3d, axis=-1).mean()
    assert np.isfinite(err_go)
    assert err_go <= err_no * 1.5  # refinement must not blow up


@pytest.fixture(scope="module")
def small_setup(request):
    rng = np.random.RandomState(11)
    proj, *_ = make_synthetic_cameras(4, rng)
    b, v = 2, 4
    # 128px min: the GAP confidence head double-maxpools the /32 trunk
    images = rng.randn(b, v, 128, 128, 3).astype(np.float32)
    # Projections in conftest are heatmap(96)-space; treat as image space.
    proj_b = np.broadcast_to(proj, (b, v, 3, 4)).astype(np.float32)
    return jnp.asarray(images), jnp.asarray(proj_b)


def test_algebraic_forward_shapes_and_grad(small_setup):
    images, proj = small_setup
    model = tri.AlgebraicTriangulationNet(num_joints=5, num_layers=18)
    variables = model.init(jax.random.PRNGKey(0), images, proj)
    out = model.apply(variables, images, proj)

    b, v = images.shape[:2]
    assert out.keypoints_3d.shape == (b, 5, 3)
    assert out.keypoints_2d.shape == (b, v, 5, 2)
    assert out.heatmaps.shape == (b, v, 5, 32, 32)
    assert out.confidences.shape == (b, v, 5)
    assert np.isfinite(np.asarray(out.keypoints_3d)).all()
    # Confidences normalized over views (+ eps floor).
    np.testing.assert_allclose(np.asarray(out.confidences.sum(axis=1)),
                               1.0 + 4e-5, atol=1e-5)

    def loss_fn(params):
        o = model.apply({**variables, "params": params}, images, proj,
                        train=False)
        return jnp.sum(o.keypoints_3d ** 2) * 1e-6

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0.0


def test_algebraic_view_mask(small_setup):
    images, proj = small_setup
    model = tri.AlgebraicTriangulationNet(num_joints=5, num_layers=18)
    variables = model.init(jax.random.PRNGKey(0), images, proj)

    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 1, 1]], jnp.float32)
    out = model.apply(variables, images, proj, view_mask=mask)
    # Masked view's confidence is exactly zero (the 1e-5 floor applies only
    # to present views), so its DLT rows vanish.
    conf = np.asarray(out.confidences)
    assert conf[0, 3].max() == 0.0
    assert np.isfinite(np.asarray(out.keypoints_3d)).all()


def test_algebraic_view_mask_equals_dropped_view(small_setup):
    """Masking view k == physically removing it (reference ragged-collate
    semantics, /root/reference/mvn/datasets/utils.py:15-22)."""
    images, proj = small_setup
    model = tri.AlgebraicTriangulationNet(num_joints=5, num_layers=18)
    variables = model.init(jax.random.PRNGKey(0), images, proj)

    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 1, 0]], jnp.float32)
    out_masked = model.apply(variables, images, proj, view_mask=mask)
    out_dropped = model.apply(variables, images[:, :3], proj[:, :3])
    np.testing.assert_allclose(np.asarray(out_masked.keypoints_3d),
                               np.asarray(out_dropped.keypoints_3d),
                               rtol=1e-5, atol=1e-3)


def test_ransac_view_mask_equals_dropped_view(rng):
    """ransac_triangulate with a masked view == calling it without the view."""
    proj, *_ = make_synthetic_cameras(5, rng)
    pts3d = rng.uniform(-300, 300, size=(6, 3)).astype(np.float32)
    pts2d = np.asarray(geometry.project_points(
        jnp.asarray(proj), jnp.asarray(pts3d)[None])).swapaxes(0, 1)
    noisy = (pts2d + rng.randn(*pts2d.shape).astype(np.float32) * 2.0)
    # Masked view 2 carries garbage points + identity-ish projection, like a
    # missing H36M view after static-shape collate (data/human36m.py:150).
    noisy_bad = noisy.copy()
    noisy_bad[:, 2] = 1e4
    pm_bad = np.broadcast_to(proj, (6, 5, 3, 4)).copy()
    pm_bad[:, 2] = np.eye(3, 4, dtype=np.float32)

    keep = [0, 1, 3, 4]
    mask = np.zeros((6, 5), np.float32)
    mask[:, keep] = 1.0

    for opt in (False, True):
        rec_masked = np.asarray(tri.ransac_triangulate(
            jnp.asarray(pm_bad), jnp.asarray(noisy_bad),
            direct_optimization=opt, view_mask=jnp.asarray(mask)))
        rec_dropped = np.asarray(tri.ransac_triangulate(
            jnp.asarray(pm_bad[:, keep]), jnp.asarray(noisy_bad[:, keep]),
            direct_optimization=opt))
        np.testing.assert_allclose(rec_masked, rec_dropped,
                                   rtol=1e-5, atol=1e-3)


def test_ransac_model_view_mask_equals_dropped_view(small_setup):
    images, proj = small_setup
    model = tri.RANSACTriangulationNet(num_joints=5, num_layers=18,
                                       direct_optimization=False)
    variables = model.init(jax.random.PRNGKey(0), images, proj)

    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 1, 0]], jnp.float32)
    out_masked = model.apply(variables, images, proj, view_mask=mask)
    out_dropped = model.apply(variables, images[:, :3], proj[:, :3])
    np.testing.assert_allclose(np.asarray(out_masked.keypoints_3d),
                               np.asarray(out_dropped.keypoints_3d),
                               rtol=1e-5, atol=1e-3)


def test_volumetric_forward_shapes(small_setup):
    images, proj = small_setup
    b = images.shape[0]
    model = tri.VolumetricTriangulationNet(
        num_joints=5, num_layers=18, volume_size=32, cuboid_side=2500.0,
        volume_aggregation_method="softmax", kind="mpii")
    pelvis = jnp.asarray(np.random.RandomState(1).uniform(
        -200, 200, (b, 7, 4)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        images, proj, pelvis)
    out = model.apply(variables, images, proj, pelvis)

    assert out.keypoints_3d.shape == (b, 5, 3)
    assert out.volumes.shape == (b, 5, 32, 32, 32)
    assert out.coord_volumes.shape == (b, 32, 32, 32, 3)
    assert out.base_points.shape == (b, 3)
    np.testing.assert_allclose(np.asarray(out.base_points),
                               np.asarray(pelvis[:, 6, :3]))
    # Volumes are post-softmax probabilities.
    np.testing.assert_allclose(
        np.asarray(out.volumes.reshape(b, 5, -1).sum(-1)), 1.0, atol=1e-3)
    # Keypoints land inside the cuboid around the pelvis.
    assert (np.abs(np.asarray(out.keypoints_3d - out.base_points[:, None]))
            <= 2500.0).all()

    # Training mode draws a random rotation from the 'aug' stream.
    out_t = model.apply(variables, images, proj, pelvis, train=True,
                        rngs={"aug": jax.random.PRNGKey(2)},
                        mutable=["batch_stats"])[0]
    assert not np.allclose(np.asarray(out_t.coord_volumes),
                           np.asarray(out.coord_volumes))


def test_ransac_model_forward(small_setup):
    images, proj = small_setup
    model = tri.RANSACTriangulationNet(num_joints=5, num_layers=18,
                                       direct_optimization=False)
    variables = model.init(jax.random.PRNGKey(0), images, proj)
    out = model.apply(variables, images, proj)
    b, v = images.shape[:2]
    assert out.keypoints_3d.shape == (b, 5, 3)
    assert out.confidences.shape == (b, v, 5)
    assert np.asarray(out.confidences).max() == 0.0
    assert np.isfinite(np.asarray(out.keypoints_3d)).all()


def test_algebraic_jit(small_setup):
    images, proj = small_setup
    model = tri.AlgebraicTriangulationNet(num_joints=5, num_layers=18)
    variables = model.init(jax.random.PRNGKey(0), images, proj)

    @jax.jit
    def fwd(vs, im, pm):
        return model.apply(vs, im, pm).keypoints_3d

    a = fwd(variables, images, proj)
    b = fwd(variables, images, proj)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
