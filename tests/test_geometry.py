"""Geometry core tests: closed-form cases + parity with the DLT formulas.

Reference semantics being checked (not imported): mvn/utils/multiview.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lt_tpu.ops import geometry
from tests.conftest import make_synthetic_cameras


def test_homogeneous_roundtrip(rng):
    pts = rng.randn(10, 3).astype(np.float32)
    homo = geometry.euclidean_to_homogeneous(jnp.asarray(pts))
    assert homo.shape == (10, 4)
    np.testing.assert_allclose(np.asarray(homo[:, 3]), 1.0)
    back = geometry.homogeneous_to_euclidean(homo)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-6)


def test_camera_projection_and_updates():
    R = np.eye(3)
    t = np.array([1.0, 2.0, 3.0])
    K = np.array([[100.0, 0, 50], [0, 120.0, 60], [0, 0, 1]])
    cam = geometry.Camera.create(R, t, K)

    P = np.asarray(cam.projection)
    np.testing.assert_allclose(P, K @ np.hstack([R, t.reshape(3, 1)]),
                               rtol=1e-6)

    # Crop shifts principal point (multiview.py:23-31).
    cam2 = cam.update_after_crop((10.0, 20.0, 90.0, 100.0))
    assert float(cam2.K[0, 2]) == pytest.approx(40.0)
    assert float(cam2.K[1, 2]) == pytest.approx(40.0)

    # Resize scales f and c (multiview.py:33-44).
    cam3 = cam2.update_after_resize((80, 80), (40, 40))
    assert float(cam3.K[0, 0]) == pytest.approx(50.0)
    assert float(cam3.K[1, 1]) == pytest.approx(60.0)
    assert float(cam3.K[0, 2]) == pytest.approx(20.0)


def test_project_points_matches_manual(rng):
    proj, *_ = make_synthetic_cameras(2)
    pts = rng.uniform(-500, 500, size=(7, 3)).astype(np.float32)
    got = np.asarray(geometry.project_points(jnp.asarray(proj[0]),
                                             jnp.asarray(pts)))
    homo = np.hstack([pts, np.ones((7, 1), np.float32)])
    exp = (homo @ proj[0].T)
    exp = exp[:, :2] / exp[:, 2:3]
    # fp32 projection numerators are ~1e5; allow fp32-scale absolute error.
    np.testing.assert_allclose(got, exp, rtol=1e-2, atol=0.05)


def test_smallest_eigenvector_matches_eigh(rng):
    A = rng.randn(64, 4, 4).astype(np.float64)
    M = (A @ A.transpose(0, 2, 1)).astype(np.float32)
    v = np.asarray(geometry.smallest_eigenvector_sym4(jnp.asarray(M)))
    w, V = np.linalg.eigh(M)
    expected = V[:, :, 0]
    # Compare up to sign.
    dots = np.abs(np.sum(v * expected, axis=-1))
    norms = np.linalg.norm(v, axis=-1) * np.linalg.norm(expected, axis=-1)
    np.testing.assert_allclose(dots / norms, 1.0, atol=1e-4)


def test_triangulation_exact_recovery(rng):
    """DLT must recover points exactly from noiseless projections."""
    proj, *_ = make_synthetic_cameras(4, rng)
    pts3d = rng.uniform(-400, 400, size=(17, 3)).astype(np.float32)
    pts2d = np.stack([
        np.asarray(geometry.project_points(jnp.asarray(p), jnp.asarray(pts3d)))
        for p in proj
    ])  # (V, 17, 2)

    # The TPU-native Jacobi path is the accurate one (~1e-4 mm on this data);
    # jnp.linalg.svd in fp32 is markedly less accurate on the ill-scaled DLT
    # columns, so it only gets a loose cross-check tolerance.
    for method, atol in (("jacobi", 0.1), ("svd", 5.0)):
        rec = np.asarray(geometry.triangulate_point_dlt(
            jnp.broadcast_to(jnp.asarray(proj), (17, 4, 3, 4)),
            jnp.asarray(pts2d.swapaxes(0, 1)), method=method))
        np.testing.assert_allclose(rec, pts3d, atol=atol)


def test_triangulate_batch_shapes_and_confidence(rng):
    proj, *_ = make_synthetic_cameras(4, rng)
    b, v, j = 3, 4, 17
    pts3d = rng.uniform(-400, 400, size=(b, j, 3)).astype(np.float32)
    proj_b = np.broadcast_to(proj, (b, v, 3, 4)).copy()
    pts2d = np.asarray(geometry.project_points(
        jnp.asarray(proj_b), jnp.asarray(pts3d)[:, None]))  # (b, v, j, 2)

    # Corrupt view 0 and give it zero confidence: result must still be exact.
    pts2d_bad = pts2d.copy()
    pts2d_bad[:, 0] += 40.0
    conf = np.ones((b, v, j), np.float32)
    conf[:, 0] = 1e-6

    rec = np.asarray(geometry.triangulate_batch_dlt(
        jnp.asarray(proj_b), jnp.asarray(pts2d_bad), jnp.asarray(conf)))
    assert rec.shape == (b, j, 3)
    np.testing.assert_allclose(rec, pts3d, atol=1.0)

    # With equal confidences, corrupted view shifts the answer.
    rec_bad = np.asarray(geometry.triangulate_batch_dlt(
        jnp.asarray(proj_b), jnp.asarray(pts2d_bad)))
    assert np.abs(rec_bad - pts3d).max() > 1.0


def test_triangulation_jacobi_vs_svd_noisy(rng):
    proj, *_ = make_synthetic_cameras(4, rng)
    b, v, j = 2, 4, 17
    pts3d = rng.uniform(-400, 400, size=(b, j, 3)).astype(np.float32)
    proj_b = np.broadcast_to(proj, (b, v, 3, 4)).copy()
    pts2d = np.asarray(geometry.project_points(
        jnp.asarray(proj_b), jnp.asarray(pts3d)[:, None]))
    pts2d = pts2d + rng.randn(*pts2d.shape).astype(np.float32) * 0.5

    r1 = np.asarray(geometry.triangulate_batch_dlt(
        jnp.asarray(proj_b), jnp.asarray(pts2d), method="jacobi"))
    r2 = np.asarray(geometry.triangulate_batch_dlt(
        jnp.asarray(proj_b), jnp.asarray(pts2d), method="svd"))
    np.testing.assert_allclose(r1, r2, atol=5.0)


def test_triangulation_matches_numpy_reference(rng):
    """Cross-check against the host-side numpy DLT (multiview.py:113-138)."""
    proj, *_ = make_synthetic_cameras(4, rng)
    pts3d = rng.uniform(-300, 300, size=(5, 3)).astype(np.float32)
    pts2d = np.asarray(geometry.project_points(
        jnp.asarray(proj), jnp.asarray(pts3d)[None]))  # (v, 5, 2)
    pts2d = pts2d + rng.randn(*pts2d.shape).astype(np.float32)

    for i in range(5):
        ref = geometry.triangulate_point_dlt_np(proj, pts2d[:, i])
        got = np.asarray(geometry.triangulate_point_dlt(
            jnp.asarray(proj), jnp.asarray(pts2d[:, i])))
        np.testing.assert_allclose(got, ref, atol=0.5)


def test_triangulation_is_differentiable(rng):
    proj, *_ = make_synthetic_cameras(4, rng)
    pts3d = rng.uniform(-300, 300, size=(3,)).astype(np.float32)
    pts2d = np.asarray(geometry.project_points(jnp.asarray(proj),
                                               jnp.asarray(pts3d)[None, None]))
    pts2d = pts2d[:, 0]  # (V, 2)

    def loss(points, conf):
        p = geometry.triangulate_point_dlt(jnp.asarray(proj), points, conf)
        return jnp.sum(p ** 2)

    g_pts, g_conf = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(pts2d), jnp.ones((4,), jnp.float32))
    assert np.all(np.isfinite(np.asarray(g_pts)))
    assert np.all(np.isfinite(np.asarray(g_conf)))
    assert np.abs(np.asarray(g_pts)).max() > 0


def test_reprojection_error(rng):
    proj, *_ = make_synthetic_cameras(3, rng)
    pts3d = rng.uniform(-300, 300, size=(6, 3)).astype(np.float32)
    pts2d = np.asarray(geometry.project_points(jnp.asarray(proj),
                                               jnp.asarray(pts3d)[None]))
    err = np.asarray(geometry.reprojection_error(
        jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(proj)))
    assert err.shape == (6, 3)
    np.testing.assert_allclose(err, 0.0, atol=1e-2)

    # Shift one view by 2px -> error 1.0 there (the 1/2 factor).
    pts2d_shift = pts2d.copy()
    pts2d_shift[1, :, 0] += 2.0
    err = np.asarray(geometry.reprojection_error(
        jnp.asarray(pts3d), jnp.asarray(pts2d_shift), jnp.asarray(proj)))
    np.testing.assert_allclose(err[:, 1], 1.0, atol=1e-2)
    np.testing.assert_allclose(err[:, 0], 0.0, atol=1e-2)
