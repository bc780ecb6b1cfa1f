"""Differentiable heatmap integration (soft-argmax) and Gaussian rendering.

Functional parity targets (reference: /root/reference/mvn/utils/op.py):
  - ``integrate_tensor_2d`` (op.py:11-47)   -> :func:`integrate_tensor_2d`
  - ``integrate_tensor_3d`` (op.py:50-81)   -> :func:`integrate_tensor_3d`
  - ``integrate_tensor_3d_with_coordinates`` (op.py:84-96)
                                            -> :func:`integrate_tensor_3d_with_coordinates`
  - Gaussian rendering (op.py:169-196)      -> :func:`render_points_as_2d_gaussians`

All functions are pure ``jnp``: they ``jit``/``vmap``/``grad`` cleanly and the
softmax + expectation reductions fuse into a handful of VPU passes.  Softmax
and expectations are computed in float32 regardless of the input dtype (the
backbone may run in bfloat16; sub-pixel coordinate expectations need fp32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(x_flat: jnp.ndarray, softmax: bool) -> jnp.ndarray:
    """Softmax over the last axis, or relu (mass normalized by the caller)."""
    x_flat = x_flat.astype(jnp.float32)
    if softmax:
        return jax.nn.softmax(x_flat, axis=-1)
    return jax.nn.relu(x_flat)


def integrate_tensor_2d(heatmaps: jnp.ndarray, softmax: bool = True):
    """Soft-argmax over 2D heatmaps.

    Mirrors op.py:11-47: flatten H*W, softmax (or relu with mass
    normalization), marginalize into per-axis mass vectors, and take the
    expectation over the coordinate index.

    Args:
      heatmaps: (..., H, W) — typically (B, J, H, W).
      softmax: if False, uses relu + explicit mass normalization.

    Returns:
      (coordinates (..., 2) as (x, y), normalized heatmaps (..., H, W)).
    """
    *lead, h, w = heatmaps.shape
    flat = _normalize(heatmaps.reshape(*lead, h * w), softmax)
    maps = flat.reshape(*lead, h, w)

    mass_x = maps.sum(axis=-2)  # (..., W)
    mass_y = maps.sum(axis=-1)  # (..., H)

    x = (mass_x * jnp.arange(w, dtype=jnp.float32)).sum(axis=-1)
    y = (mass_y * jnp.arange(h, dtype=jnp.float32)).sum(axis=-1)

    if not softmax:
        x = x / mass_x.sum(axis=-1)
        y = y / mass_y.sum(axis=-1)

    return jnp.stack([x, y], axis=-1), maps


def integrate_tensor_3d(volumes: jnp.ndarray, softmax: bool = True):
    """Soft-argmax over 3D volumes in index space. Mirrors op.py:50-81.

    Args:
      volumes: (..., X, Y, Z).

    Returns:
      (coordinates (..., 3) as (x, y, z) voxel indices, normalized volumes).
    """
    *lead, xs, ys, zs = volumes.shape
    flat = _normalize(volumes.reshape(*lead, xs * ys * zs), softmax)
    vols = flat.reshape(*lead, xs, ys, zs)

    mass_x = vols.sum(axis=(-2, -1))    # (..., X)
    mass_y = vols.sum(axis=(-3, -1))    # (..., Y)
    mass_z = vols.sum(axis=(-3, -2))    # (..., Z)

    x = (mass_x * jnp.arange(xs, dtype=jnp.float32)).sum(axis=-1)
    y = (mass_y * jnp.arange(ys, dtype=jnp.float32)).sum(axis=-1)
    z = (mass_z * jnp.arange(zs, dtype=jnp.float32)).sum(axis=-1)

    if not softmax:
        x = x / mass_x.sum(axis=-1)
        y = y / mass_y.sum(axis=-1)
        z = z / mass_z.sum(axis=-1)

    return jnp.stack([x, y, z], axis=-1), vols


def integrate_tensor_3d_with_coordinates(volumes: jnp.ndarray,
                                         coord_volumes: jnp.ndarray,
                                         softmax: bool = True):
    """Soft-argmax over 3D volumes in *world* coordinates.

    Mirrors op.py:84-96 — the variant actually used by the volumetric model:
    per-voxel softmax over the whole volume, then the expectation against a
    per-sample coordinate volume (``einsum("bnxyz,bxyzc->bnc")``).

    Args:
      volumes: (B, J, X, Y, Z) joint volumes.
      coord_volumes: (B, X, Y, Z, 3) world coordinates of each voxel (mm).

    Returns:
      (keypoints (B, J, 3) in world mm, normalized volumes (B, J, X, Y, Z)).
    """
    b, j, xs, ys, zs = volumes.shape
    flat = _normalize(volumes.reshape(b, j, -1), softmax)
    vols = flat.reshape(b, j, xs, ys, zs)
    coords = jnp.einsum("bnxyz,bxyzc->bnc", vols,
                        coord_volumes.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)
    return coords, vols


def integrate_tensor_3d_with_coordinates_channels_last(
        volumes: jnp.ndarray, coord_volumes: jnp.ndarray,
        softmax: bool = True):
    """Channels-last twin of :func:`integrate_tensor_3d_with_coordinates`.

    Takes (B, X, Y, Z, J) volumes (the native layout coming out of the NDHWC
    V2V net) — avoids two full-volume transposes on the hot path.

    Returns:
      (keypoints (B, J, 3), normalized volumes (B, J, X, Y, Z)).
    """
    b, xs, ys, zs, j = volumes.shape
    flat = volumes.reshape(b, xs * ys * zs, j)
    cv = coord_volumes.reshape(b, -1, 3).astype(jnp.float32)
    if softmax:
        # Normalize AFTER the reductions: E[x] = (sum e*x) / (sum e) with
        # e = exp(l - max).  Equal to einsum(softmax(l), x) up to float
        # associativity, but the normalized (B, N, J) f32 volume is never
        # materialized in HBM — XLA fuses the exp into both reductions
        # (the volume may also arrive in bf16 and upcast in-register).
        mx = jax.lax.stop_gradient(
            flat.max(axis=1, keepdims=True)).astype(jnp.float32)
        e = jnp.exp(flat.astype(jnp.float32) - mx)
        den = e.sum(axis=1)                              # (B, J)
        num = jnp.einsum("bnj,bnc->bjc", e, cv,
                         precision=jax.lax.Precision.HIGHEST)
        coords = num / den[..., None]
        vols = e / den[:, None, :]
    else:
        e = jax.nn.relu(flat.astype(jnp.float32))
        coords = jnp.einsum("bnj,bnc->bjc", e, cv,
                            precision=jax.lax.Precision.HIGHEST)
        vols = e
    vols = vols.reshape(b, xs, ys, zs, j)
    return coords, jnp.moveaxis(vols, -1, 1)


def gaussian_2d_pdf(coords: jnp.ndarray, means: jnp.ndarray,
                    sigmas: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Axis-aligned 2D Gaussian density. Mirrors op.py:169-175.

    Args:
      coords, means, sigmas: (..., 2) broadcastable arrays.
    """
    z = ((coords[..., 0] - means[..., 0]) ** 2 / sigmas[..., 0] ** 2
         + (coords[..., 1] - means[..., 1]) ** 2 / sigmas[..., 1] ** 2)
    pdf = jnp.exp(-z / 2.0)
    if normalize:
        pdf = pdf / (2 * jnp.pi * sigmas[..., 0] * sigmas[..., 0])
    return pdf


def render_points_as_2d_gaussians(points: jnp.ndarray, sigmas: jnp.ndarray,
                                  image_shape, normalize: bool = True
                                  ) -> jnp.ndarray:
    """Render (..., N, 2) points as (..., N, H, W) Gaussian images.

    Mirrors op.py:178-196 but vectorized via broadcasting instead of
    repeat/reshape round-trips.
    """
    h, w = image_shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xx, yy], axis=-1)  # (H, W, 2) as (x, y)
    return gaussian_2d_pdf(grid, points[..., None, None, :],
                           sigmas[..., None, None, :], normalize=normalize)
