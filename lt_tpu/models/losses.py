"""Keypoint and volumetric losses.

Functional parity target: /root/reference/mvn/models/loss.py — the five loss
classes (:7-80) as pure functions.  All are masked by per-joint validity and
normalized by the valid count exactly like the reference (with the
``max(1, count)`` floor).

TPU-first design notes
----------------------
``volumetric_ce_loss`` replaces the reference's per-(sample, joint) Python
loop with a CPU argmin sync every step (loss.py:61-77) by a single vectorized
distance-argmin + gather over the whole batch — no host round-trip, fully
inside the jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _valid_count(validity: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(1.0, jnp.sum(validity))


def keypoints_mse_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                       validity: jnp.ndarray) -> jnp.ndarray:
    """Masked MSE (loss.py:7-15). pred/gt: (B, J, D); validity: (B, J, 1)."""
    dimension = pred.shape[-1]
    loss = jnp.sum((gt - pred) ** 2 * validity)
    return loss / (dimension * _valid_count(validity))


def keypoints_mse_smooth_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                              validity: jnp.ndarray,
                              threshold: float = 400.0) -> jnp.ndarray:
    """Masked MSE with magnitude clamp (loss.py:17-28).

    Squared errors above ``threshold`` are compressed to
    ``diff**0.1 * threshold**0.9``.
    """
    dimension = pred.shape[-1]
    diff = (gt - pred) ** 2 * validity
    # where-trick: feed pow() an always-safe argument so the untaken branch
    # cannot poison gradients with inf * 0 = NaN.
    safe = jnp.where(diff > threshold, diff, threshold)
    diff = jnp.where(diff > threshold,
                     jnp.power(safe, 0.1) * threshold ** 0.9,
                     diff)
    return jnp.sum(diff) / (dimension * _valid_count(validity))


def keypoints_mae_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                       validity: jnp.ndarray) -> jnp.ndarray:
    """Masked MAE (loss.py:31-39)."""
    dimension = pred.shape[-1]
    loss = jnp.sum(jnp.abs(gt - pred) * validity)
    return loss / (dimension * _valid_count(validity))


def keypoints_l2_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                      validity: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint euclidean distance — the metric 'loss' (loss.py:42-49)."""
    sq = jnp.sum((gt - pred) ** 2 * validity, axis=2)
    loss = jnp.sum(jnp.sqrt(jnp.maximum(sq, 0.0)))
    return loss / _valid_count(validity)


def volumetric_ce_loss(coord_volumes: jnp.ndarray, volumes_pred: jnp.ndarray,
                       keypoints_gt: jnp.ndarray,
                       validity: jnp.ndarray) -> jnp.ndarray:
    """-log p at the voxel nearest each GT joint (loss.py:52-80), vectorized.

    Args:
      coord_volumes: (B, X, Y, Z, 3) world-mm voxel centers.
      volumes_pred: (B, J, X, Y, Z) post-softmax probability volumes.
      keypoints_gt: (B, J, 3) world-mm ground truth.
      validity: (B, J, 1) binary validity.

    Note: like the reference (loss.py:77), the denominator counts *all*
    (sample, joint) pairs, not just valid ones.
    """
    b, j = volumes_pred.shape[:2]
    n = volumes_pred.shape[2] * volumes_pred.shape[3] * volumes_pred.shape[4]

    coords = coord_volumes.reshape(b, 1, n, 3)
    gt = keypoints_gt[:, :, None, :]
    # Squared distance is monotone in distance — same argmin, no sqrt needed.
    dists = jnp.sum((coords - gt) ** 2, axis=-1)          # (B, J, N)
    min_idx = lax.stop_gradient(jnp.argmin(dists, axis=-1))  # (B, J)

    vols_flat = volumes_pred.reshape(b, j, n)
    p = jnp.take_along_axis(vols_flat, min_idx[..., None], axis=-1)[..., 0]
    loss = validity[..., 0] * (-jnp.log(p + 1e-6))
    return jnp.sum(loss) / (b * j)


CRITERIA = {
    "MSE": keypoints_mse_loss,
    "MSESmooth": keypoints_mse_smooth_loss,
    "MAE": keypoints_mae_loss,
}


def make_criterion(name: str, mse_smooth_threshold: float = 400.0):
    """Criterion factory mirroring train.py:416-425."""
    if name == "MSESmooth":
        return lambda p, g, v: keypoints_mse_smooth_loss(
            p, g, v, mse_smooth_threshold)
    return CRITERIA[name]
