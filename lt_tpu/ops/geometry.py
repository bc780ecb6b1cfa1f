"""Multi-view geometry core: cameras, projective transforms, DLT triangulation.

Functional parity targets (reference: /root/reference/mvn/utils/multiview.py):
  - ``Camera`` (multiview.py:5-52)               -> :class:`Camera` pytree
  - homogeneous converters (multiview.py:55-86)  -> :func:`euclidean_to_homogeneous`,
                                                    :func:`homogeneous_to_euclidean`
  - projection (multiview.py:89-110)             -> :func:`project_points`
  - DLT triangulation (multiview.py:113-183)     -> :func:`triangulate_point_dlt`,
                                                    :func:`triangulate_batch_dlt`
  - reprojection error (multiview.py:186-193)    -> :func:`reprojection_error`

TPU-first design notes
----------------------
The reference triangulates each (sample, joint) with its own 2V x 4
``torch.svd`` inside a Python double loop (multiview.py:171-183).  Here the
DLT normal-matrix ``M = A^T A`` is a tiny symmetric 4x4, so the null vector is
the eigenvector of ``M`` with the smallest eigenvalue.  We compute it with a
fixed-sweep cyclic Jacobi eigensolver written in pure ``jnp`` elementwise ops:
it vectorizes over an arbitrary leading batch (B x J problems at once), runs
entirely on the VPU with static control flow (XLA-friendly, no dynamic
shapes), and is differentiable end-to-end.  A ``jnp.linalg.svd`` path is kept
for cross-checking (``method='svd'``).

The homogeneous solution's sign is arbitrary; it cancels in the
homogeneous->euclidean division, matching the reference's ``-vh[:, 3]``
convention (multiview.py:165) numerically.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Camera
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera pytree. Batchable: all fields may carry leading dims.

    Fields mirror the reference ``Camera`` (multiview.py:5-52): rotation ``R``
    (..., 3, 3), translation ``t`` (..., 3, 1), intrinsics ``K`` (..., 3, 3)
    and optional distortion ``dist`` (..., 5).  Unlike the reference (a
    mutable numpy holder updated in place), this is an immutable pytree —
    crop/resize return new cameras, so the ops trace cleanly under ``jit``.
    """

    R: jnp.ndarray
    t: jnp.ndarray
    K: jnp.ndarray
    dist: Optional[jnp.ndarray] = None

    @staticmethod
    def create(R, t, K, dist=None) -> "Camera":
        R = jnp.asarray(R, jnp.float32)
        t = jnp.asarray(t, jnp.float32).reshape(R.shape[:-2] + (3, 1))
        K = jnp.asarray(K, jnp.float32)
        d = None if dist is None else jnp.asarray(dist, jnp.float32)
        return Camera(R=R, t=t, K=K, dist=d)

    @property
    def extrinsics(self) -> jnp.ndarray:
        """[R | t] of shape (..., 3, 4)."""
        return jnp.concatenate([self.R, self.t], axis=-1)

    @property
    def projection(self) -> jnp.ndarray:
        """K @ [R | t] of shape (..., 3, 4). (multiview.py:46-52)"""
        return jnp.matmul(self.K, self.extrinsics,
                          precision=jax.lax.Precision.HIGHEST)

    def update_after_crop(self, bbox) -> "Camera":
        """Shift the principal point for a (left, upper, right, lower) crop.

        Mirrors multiview.py:23-31. ``bbox`` may carry leading batch dims in
        its last axis of size 4.
        """
        bbox = jnp.asarray(bbox, jnp.float32)
        left, upper = bbox[..., 0], bbox[..., 1]
        shift = jnp.zeros(self.K.shape, self.K.dtype)
        shift = shift.at[..., 0, 2].set(left)
        shift = shift.at[..., 1, 2].set(upper)
        return dataclasses.replace(self, K=self.K - shift)

    def update_after_resize(self, image_shape, new_image_shape) -> "Camera":
        """Scale focal lengths / principal point for a resize.

        Mirrors multiview.py:33-44; shapes are (height, width).
        """
        height, width = image_shape
        new_height, new_width = new_image_shape
        sx = jnp.asarray(new_width / width, self.K.dtype)
        sy = jnp.asarray(new_height / height, self.K.dtype)
        scale = jnp.ones(self.K.shape, self.K.dtype)
        scale = scale.at[..., 0, 0].set(sx)
        scale = scale.at[..., 0, 2].set(sx)
        scale = scale.at[..., 1, 1].set(sy)
        scale = scale.at[..., 1, 2].set(sy)
        return dataclasses.replace(self, K=self.K * scale)


# ---------------------------------------------------------------------------
# Homogeneous coordinates
# ---------------------------------------------------------------------------


def euclidean_to_homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    """(..., M) -> (..., M + 1) by appending ones. (multiview.py:55-69)"""
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    return jnp.concatenate([points, ones], axis=-1)


def homogeneous_to_euclidean(points: jnp.ndarray) -> jnp.ndarray:
    """(..., M + 1) -> (..., M) by dividing by the last coordinate.

    (multiview.py:72-86).  Like the reference, division by zero is the
    caller's responsibility.
    """
    return points[..., :-1] / points[..., -1:]


def project_points(proj_matrix: jnp.ndarray, points_3d: jnp.ndarray,
                   convert_back_to_euclidean: bool = True) -> jnp.ndarray:
    """Project (..., N, 3) world points through (..., 3, 4) matrices.

    Mirrors multiview.py:89-110 without distortion. Leading dims broadcast.
    """
    homo = euclidean_to_homogeneous(points_3d)
    result = jnp.einsum("...nk,...jk->...nj", homo, proj_matrix,
                        precision=jax.lax.Precision.HIGHEST)
    if convert_back_to_euclidean:
        result = homogeneous_to_euclidean(result)
    return result


# ---------------------------------------------------------------------------
# Smallest eigenvector of a symmetric 4x4 via fixed-sweep cyclic Jacobi
# ---------------------------------------------------------------------------

_JACOBI_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _safe_half_atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """0.5 * atan2(y, x), with zero value AND zero gradient at the origin."""
    safe = (jnp.abs(y) + jnp.abs(x)) > 1e-30
    y_ = jnp.where(safe, y, 0.0)
    x_ = jnp.where(safe, x, 1.0)
    return 0.5 * jnp.arctan2(y_, x_)


def _jacobi_sweep(A: jnp.ndarray, V: jnp.ndarray):
    """One full cyclic sweep over all 6 off-diagonal pairs.

    The pair indices are static Python ints, so every rotation unrolls into
    fused elementwise VPU ops over the batch dims of ``A`` (..., 4, 4).
    """
    for (p, q) in _JACOBI_PAIRS:
        apq = A[..., p, q]
        app = A[..., p, p]
        aqq = A[..., q, q]
        theta = _safe_half_atan2(2.0 * apq, aqq - app)
        c = jnp.cos(theta)
        s = jnp.sin(theta)
        cb = c[..., None]
        sb = s[..., None]

        # A <- G^T A G with G = Givens(p, q, theta).
        row_p = A[..., p, :]
        row_q = A[..., q, :]
        new_row_p = cb * row_p - sb * row_q
        new_row_q = sb * row_p + cb * row_q
        A = A.at[..., p, :].set(new_row_p).at[..., q, :].set(new_row_q)

        col_p = A[..., :, p]
        col_q = A[..., :, q]
        new_col_p = cb * col_p - sb * col_q
        new_col_q = sb * col_p + cb * col_q
        A = A.at[..., :, p].set(new_col_p).at[..., :, q].set(new_col_q)

        vcol_p = V[..., :, p]
        vcol_q = V[..., :, q]
        V = V.at[..., :, p].set(cb * vcol_p - sb * vcol_q)
        V = V.at[..., :, q].set(sb * vcol_p + cb * vcol_q)
    return A, V


def smallest_eigenvector_sym4(M: jnp.ndarray, n_sweeps: int = 8) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of symmetric (..., 4, 4) ``M``.

    Fixed-iteration cyclic Jacobi: static control flow, arbitrary batch dims,
    differentiable.  8 sweeps drive off-diagonals of a 4x4 to ~machine eps.
    """
    A = M
    V = jnp.broadcast_to(jnp.eye(4, dtype=M.dtype), M.shape)
    for _ in range(n_sweeps):
        A, V = _jacobi_sweep(A, V)
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    idx = jnp.argmin(diag, axis=-1)
    return jnp.take_along_axis(V, idx[..., None, None].repeat(4, axis=-2),
                               axis=-1)[..., 0]


# ---------------------------------------------------------------------------
# DLT triangulation
# ---------------------------------------------------------------------------


def dlt_design_matrix(proj_matrices: jnp.ndarray, points: jnp.ndarray,
                      confidences: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Build the weighted DLT system A of shape (..., V, 2, 4).

    Row pairs ``x * P[2] - P[0]`` and ``y * P[2] - P[1]`` scaled by per-view
    confidence, mirroring multiview.py:159-161.

    Args:
      proj_matrices: (..., V, 3, 4) projection matrices.
      points: (..., V, 2) image points.
      confidences: optional (..., V) weights in [0, 1].
    """
    A = proj_matrices[..., 2:3, :] * points[..., :, None]
    A = A - proj_matrices[..., :2, :]
    if confidences is not None:
        A = A * confidences[..., None, None]
    return A


def triangulate_point_dlt(proj_matrices: jnp.ndarray, points: jnp.ndarray,
                          confidences: Optional[jnp.ndarray] = None,
                          method: str = "jacobi") -> jnp.ndarray:
    """Triangulate 3D points from V views by confidence-weighted DLT.

    Vectorized equivalent of multiview.py:141-168; any leading batch dims are
    supported (the reference loops per (sample, joint), multiview.py:171-183).

    Args:
      proj_matrices: (..., V, 3, 4).
      points: (..., V, 2) pixel coordinates.
      confidences: optional (..., V).
      method: 'jacobi' (TPU-native normal-matrix eigensolver) or 'svd'
        (jnp.linalg.svd of A, for cross-checking).

    Returns:
      (..., 3) triangulated euclidean points.
    """
    A = dlt_design_matrix(proj_matrices, points, confidences)
    A = A.reshape(A.shape[:-3] + (-1, 4))  # (..., 2V, 4)
    if method == "jacobi":
        M = jnp.einsum("...ki,...kj->...ij", A, A,
                       precision=jax.lax.Precision.HIGHEST)
        v = smallest_eigenvector_sym4(M)
    elif method == "svd":
        _, _, vh = jnp.linalg.svd(A, full_matrices=False)
        v = -vh[..., 3, :]  # sign matches multiview.py:165; cancels below
    else:
        raise ValueError(f"Unknown method: {method}")
    return homogeneous_to_euclidean(v)


def triangulate_batch_dlt(proj_matrices: jnp.ndarray, points: jnp.ndarray,
                          confidences: Optional[jnp.ndarray] = None,
                          method: str = "jacobi") -> jnp.ndarray:
    """Batched DLT over (B, V, J, 2) points — one fused call, no loops.

    Replaces the reference's Python double loop over batch x joints
    (multiview.py:171-183).

    Args:
      proj_matrices: (B, V, 3, 4).
      points: (B, V, J, 2).
      confidences: optional (B, V, J).

    Returns:
      (B, J, 3).
    """
    pm = proj_matrices[:, None, :, :, :]            # (B, 1, V, 3, 4)
    pts = points.swapaxes(1, 2)                     # (B, J, V, 2)
    conf = None if confidences is None else confidences.swapaxes(1, 2)
    return triangulate_point_dlt(pm, pts, conf, method=method)


def reprojection_error(keypoints_3d: jnp.ndarray, keypoints_2d: jnp.ndarray,
                       proj_matrices: jnp.ndarray) -> jnp.ndarray:
    """Half-euclidean reprojection error per (point, view).

    Mirrors multiview.py:186-193 (including the 1/2 factor).

    Args:
      keypoints_3d: (..., N, 3).
      keypoints_2d: (..., V, N, 2).
      proj_matrices: (..., V, 3, 4).

    Returns:
      (..., N, V) error matrix.
    """
    # Broadcast keypoints over the view axis: (..., 1, N, 3) x (..., V, 3, 4).
    projected = project_points(proj_matrices, keypoints_3d[..., None, :, :])
    # projected: (..., V, N, 2)
    err = 0.5 * jnp.sqrt(jnp.sum((keypoints_2d - projected) ** 2, axis=-1))
    return err.swapaxes(-1, -2)


# ---------------------------------------------------------------------------
# Numpy helpers (host-side parity with the reference's numpy twin)
# ---------------------------------------------------------------------------


def triangulate_point_dlt_np(proj_matrices: np.ndarray,
                             points: np.ndarray) -> np.ndarray:
    """Host-side numpy DLT (parity with multiview.py:113-138)."""
    n_views = len(proj_matrices)
    A = np.zeros((2 * n_views, 4))
    for j in range(n_views):
        A[j * 2 + 0] = points[j][0] * proj_matrices[j][2, :] - proj_matrices[j][0, :]
        A[j * 2 + 1] = points[j][1] * proj_matrices[j][2, :] - proj_matrices[j][1, :]
    _, _, vh = np.linalg.svd(A, full_matrices=False)
    p = vh[3, :]
    return p[:3] / p[3]
