"""The three triangulation model families: RANSAC / algebraic / volumetric.

Functional parity target: /root/reference/mvn/models/triangulation.py —
``RANSACTriangulationNet`` (:17-128), ``AlgebraicTriangulationNet``
(:131-200), ``VolumetricTriangulationNet`` (:203-355).

TPU-first design notes
----------------------
- All three are flax modules over NHWC images (B, V, H, W, 3); the view axis
  folds into batch for the backbone exactly like the reference
  (triangulation.py:154, 250) but with one reshape instead of view-juggling.
- The volumetric model's per-sample host-side work (camera deepcopy +
  intrinsic rescale, coordinate-volume building, random rotation:
  triangulation.py:272-341) is fully traced: intrinsic rescale is a diagonal
  premultiply of the projection matrices, the rotation angle comes from a
  flax RNG stream ('aug'), and volume construction is one broadcasted iota.
- RANSAC runs entirely on device: every view pair is triangulated in one
  vmapped DLT call (the reference draws 10 random pairs on CPU,
  triangulation.py:84-97 — evaluating all C(V,2) pairs deterministically
  dominates that), inliers are picked by reprojection threshold, and the
  optional direct optimization is a fixed-iteration IRLS/Gauss-Newton Huber
  refinement replacing scipy.optimize.least_squares
  (triangulation.py:115-126). No host round-trips.
- Variable view counts: the reference drops missing views at collate time
  (ragged shapes). TPU needs static shapes, so every entry point accepts an
  optional ``view_mask`` (B, V) that removes masked views from confidence
  normalization, DLT weighting, and volume aggregation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lt_tpu.models.backbone import PoseResNet
from lt_tpu.models.v2v import V2VModel
from lt_tpu.ops import geometry, heatmaps as hm_ops, volumetric as vol_ops


class AlgebraicOutput(NamedTuple):
    keypoints_3d: jnp.ndarray       # (B, J, 3) world mm
    keypoints_2d: jnp.ndarray       # (B, V, J, 2) image px
    heatmaps: jnp.ndarray           # (B, V, J, h, w) post-softmax
    confidences: jnp.ndarray        # (B, V, J)


class VolumetricOutput(NamedTuple):
    keypoints_3d: jnp.ndarray       # (B, J, 3) world mm
    features: jnp.ndarray           # (B, V, h, w, C) processed features
    volumes: jnp.ndarray            # (B, J, S, S, S) post-softmax
    vol_confidences: Optional[jnp.ndarray]  # (B, V, 32) or None
    coord_volumes: jnp.ndarray      # (B, S, S, S, 3)
    base_points: jnp.ndarray        # (B, 3)


class RansacOutput(NamedTuple):
    keypoints_3d: jnp.ndarray       # (B, J, 3)
    keypoints_2d: jnp.ndarray       # (B, V, J, 2)
    heatmaps: jnp.ndarray           # (B, V, J, h, w) raw
    confidences: jnp.ndarray        # (B, V, J) zeros plug (triangulation.py:59)


def select_base_points(keypoints_3d: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Pelvis base point per sample (triangulation.py:291-294).

    Args:
      keypoints_3d: (B, J, >=3) gt or predicted keypoints.
      kind: 'coco' (mean of joints 11, 12), 'mpii' (joint 6), or 'cmu'
        (COCO19 bodyCenter, joint 2 — beyond-parity CMU Panoptic support).
    """
    if kind == "coco":
        return (keypoints_3d[:, 11, :3] + keypoints_3d[:, 12, :3]) / 2.0
    if kind == "mpii":
        return keypoints_3d[:, 6, :3]
    if kind == "cmu":
        return keypoints_3d[:, 2, :3]
    raise ValueError(f"Unknown kind: {kind}")


def rescale_proj_to_heatmap(proj_matrices: jnp.ndarray, image_shape,
                            heatmap_shape) -> jnp.ndarray:
    """Rescale image-space projection matrices to heatmap pixel space.

    Traced equivalent of the reference's per-camera deepcopy +
    ``update_after_resize`` loop (triangulation.py:272-278): left-multiply by
    diag(sx, sy, 1) with sx = hm_w / img_w, sy = hm_h / img_h.
    """
    ih, iw = image_shape
    hh, hw = heatmap_shape
    scale = jnp.asarray([hw / iw, hh / ih, 1.0], jnp.float32)
    return proj_matrices * scale[..., :, None]


def _upscale_keypoints(keypoints: jnp.ndarray, heatmap_shape,
                       image_shape) -> jnp.ndarray:
    """Heatmap-space (x, y) -> image-space (triangulation.py:181-184)."""
    hh, hw = heatmap_shape
    ih, iw = image_shape
    return keypoints * jnp.asarray([iw / hw, ih / hh], jnp.float32)


# ---------------------------------------------------------------------------
# Algebraic
# ---------------------------------------------------------------------------


class AlgebraicTriangulationNet(nn.Module):
    """Backbone -> 2D soft-argmax -> confidence-weighted DLT.

    Mirrors triangulation.py:131-200 with the batched-SVD loop replaced by
    one fused DLT solve over (B, J).
    """

    num_joints: int = 17
    num_layers: int = 152
    style: str = "simple"
    use_confidences: bool = True
    heatmap_softmax: bool = True
    heatmap_multiplier: float = 100.0
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.backbone = PoseResNet(
            num_joints=self.num_joints, num_layers=self.num_layers,
            style=self.style, alg_confidences=self.use_confidences,
            vol_confidences=False, compute_dtype=self.compute_dtype)

    def __call__(self, images: jnp.ndarray, proj_matrices: jnp.ndarray,
                 train: bool = False,
                 view_mask: Optional[jnp.ndarray] = None) -> AlgebraicOutput:
        """Args:
          images: (B, V, H, W, 3) normalized images.
          proj_matrices: (B, V, 3, 4) in *image* pixel space.
          view_mask: optional (B, V) validity of each view.
        """
        b, v = images.shape[:2]
        image_shape = images.shape[2:4]

        flat = images.reshape((b * v,) + images.shape[2:])
        raw_heatmaps, _, alg_conf, _ = self.backbone(flat, train=train)
        j = raw_heatmaps.shape[-1]
        heatmap_shape = raw_heatmaps.shape[1:3]

        # NHWC -> (B, V, J, h, w)
        raw = raw_heatmaps.reshape((b, v) + raw_heatmaps.shape[1:])
        raw = jnp.moveaxis(raw, -1, 2)

        keypoints_2d, soft_heatmaps = hm_ops.integrate_tensor_2d(
            raw * self.heatmap_multiplier, self.heatmap_softmax)

        if self.use_confidences:
            conf = alg_conf.reshape(b, v, j)
        else:
            conf = jnp.ones((b, v, j), jnp.float32)

        # Normalize across views + stability floor (triangulation.py:173-174).
        # With a view_mask, the floor is applied only to present views: a
        # masked view then carries *exactly* zero DLT weight, which zeroes its
        # design-matrix rows — identical to physically dropping the view (the
        # reference's ragged collate, datasets/utils.py:15-22, never passes
        # missing views at all).
        if view_mask is not None:
            vm = view_mask.astype(conf.dtype)[:, :, None]
            conf = conf * vm
            conf = conf / jnp.maximum(conf.sum(axis=1, keepdims=True), 1e-12)
            conf = conf + 1e-5 * vm
        else:
            conf = conf / jnp.maximum(conf.sum(axis=1, keepdims=True), 1e-12)
            conf = conf + 1e-5

        keypoints_2d = _upscale_keypoints(keypoints_2d, heatmap_shape,
                                          image_shape)
        keypoints_3d = geometry.triangulate_batch_dlt(
            proj_matrices, keypoints_2d, conf)

        return AlgebraicOutput(keypoints_3d, keypoints_2d, soft_heatmaps, conf)


# ---------------------------------------------------------------------------
# Volumetric
# ---------------------------------------------------------------------------


class VolumetricTriangulationNet(nn.Module):
    """Backbone features -> unprojection -> V2V -> volumetric soft-argmax.

    Mirrors triangulation.py:203-355.  The backbone's ``final_layer`` is
    frozen by the optimizer mask in the training driver (the reference sets
    requires_grad=False, triangulation.py:235-236).
    """

    num_joints: int = 17
    num_layers: int = 152
    style: str = "simple"
    volume_aggregation_method: str = "softmax"
    volume_softmax: bool = True
    volume_multiplier: float = 1.0
    volume_size: int = 64
    cuboid_side: float = 2500.0
    kind: str = "mpii"
    transfer_cmu_to_human36m: bool = False
    use_pallas_unproject: bool = True
    remat: bool = False
    compute_dtype: Any = jnp.float32
    #: Optional ``jax.sharding.NamedSharding`` splitting the volume's X axis
    #: across the mesh (lt_tpu.parallel.spatial.volume_sharding): GSPMD then
    #: runs one sample's V2V across several chips (halo exchanges + reduced
    #: soft-argmax inserted by the partitioner).  Single-device Pallas
    #: kernels gate themselves off when set.
    volume_axis_sharding: Any = None

    def setup(self):
        self.backbone = PoseResNet(
            num_joints=self.num_joints, num_layers=self.num_layers,
            style=self.style, alg_confidences=False,
            vol_confidences=self.volume_aggregation_method.startswith("conf"),
            compute_dtype=self.compute_dtype, remat=self.remat)
        self.process_features = nn.Conv(32, (1, 1), name="process_features",
                                        dtype=self.compute_dtype,
                                        param_dtype=jnp.float32)
        # Per-block remat only: an outer nested checkpoint around the whole
        # V2V was measured SLOWER (1015 -> 1400 ms/step at flagship b5) --
        # the extra full-forward recompute costs more than the padded
        # boundary saves it avoids.
        self.volume_net = V2VModel(output_channels=self.num_joints,
                                   compute_dtype=self.compute_dtype,
                                   remat=self.remat)

    def __call__(self, images: jnp.ndarray, proj_matrices: jnp.ndarray,
                 pelvis_keypoints: jnp.ndarray, train: bool = False,
                 view_mask: Optional[jnp.ndarray] = None,
                 rotation_thetas: Optional[jnp.ndarray] = None
                 ) -> VolumetricOutput:
        """Args:
          images: (B, V, H, W, 3) normalized images.
          proj_matrices: (B, V, 3, 4) in *image* pixel space.
          pelvis_keypoints: (B, J, >=3) keypoints used only to find the
            pelvis — GT when use_gt_pelvis, else the algebraic model's
            predictions (triangulation.py:286-294).
          rotation_thetas: optional (B,) cuboid rotation angles. When
            ``train`` and not given, drawn U[0, 2pi) from the 'aug' RNG
            stream (triangulation.py:317-321).
        """
        b, v = images.shape[:2]
        image_shape = images.shape[2:4]

        flat = images.reshape((b * v,) + images.shape[2:])
        _, features, _, vol_conf = self.backbone(flat, train=train)
        heatmap_shape = features.shape[1:3]

        if vol_conf is not None:
            vol_conf = vol_conf.reshape(b, v, -1)
            if self.volume_aggregation_method == "conf_norm":
                denom = vol_conf.sum(axis=1, keepdims=True)
                vol_conf = vol_conf / jnp.maximum(denom, 1e-12)

        proj_hm = rescale_proj_to_heatmap(proj_matrices, image_shape,
                                          heatmap_shape)

        base_points = select_base_points(pelvis_keypoints, self.kind)

        if rotation_thetas is None:
            if train:
                rotation_thetas = jax.random.uniform(
                    self.make_rng("aug"), (b,), maxval=2.0 * jnp.pi)
            else:
                rotation_thetas = jnp.zeros((b,), jnp.float32)
        axis = (0.0, 1.0, 0.0) if self.kind == "coco" else (0.0, 0.0, 1.0)
        coord_volumes = vol_ops.build_coord_volumes(
            base_points, self.cuboid_side, self.volume_size, rotation_thetas,
            axis=axis,
            transfer_cmu_to_human36m=self.transfer_cmu_to_human36m)

        features = self.process_features(features)
        features = features.reshape((b, v) + features.shape[1:])

        # The kernel is differentiable via custom_vjp (backward = transposed
        # row-mix; gradients flow to features, which is exhaustive here:
        # cameras/coordinate volumes are inputs, not parameters).
        if (self.use_pallas_unproject and jax.default_backend() != "cpu"
                and self.volume_axis_sharding is None):
            # Fused gather-free kernel (lt_tpu.ops.pallas.unproject): the
            # coordinate volume is affine in the grid index, so the kernel
            # only needs a 3x4 matrix per (batch, view).
            from lt_tpu.ops.pallas import unproject as pallas_unproject

            grid_affine = vol_ops.coord_volume_affine(
                base_points, self.cuboid_side, self.volume_size,
                rotation_thetas, axis=axis,
                transfer_cmu_to_human36m=self.transfer_cmu_to_human36m)
            # The cross-view aggregation fuses into the kernel (no
            # (B, V, N, C) HBM round-trip) for inference AND for training
            # on softmax/sum without confidences: sample_views_agg's custom
            # VJP recomputes the per-view samples inside the backward
            # instead of saving them as a remat residual — the f32 softmax
            # residual is what kept reference batch-5 training 0.5 GB over
            # one chip's HBM (ROADMAP "Training memory").  conf/max still
            # aggregate unfused in the compute dtype when training.
            fuse = (not train) or (
                self.volume_aggregation_method in ("softmax", "sum")
                and vol_conf is None)
            # Aggregated volume in the compute dtype everywhere: it only
            # feeds the V2V net (which casts anyway); halves the
            # channels-last relayout and (training) the remat residual.
            agg_dtype = (self.compute_dtype
                         if self.compute_dtype != jnp.float32 else None)
            volumes = pallas_unproject.unproject_heatmaps_affine(
                features, proj_hm, grid_affine, self.volume_size,
                volume_aggregation_method=self.volume_aggregation_method,
                vol_confidences=vol_conf, view_mask=view_mask,
                fuse_aggregation=fuse,
                aggregation_dtype=agg_dtype,
                channels_last=True)  # kernel scan order IS NDHWC: zero-copy
        else:
            volumes = vol_ops.unproject_heatmaps(
                features, proj_hm, coord_volumes,
                volume_aggregation_method=self.volume_aggregation_method,
                vol_confidences=vol_conf, view_mask=view_mask)
            volumes = jnp.moveaxis(volumes, 1, -1)

        if self.volume_axis_sharding is not None:
            # Spatial sharding (lt_tpu.parallel.spatial): annotate the
            # volume's X split here and GSPMD partitions the whole V2V —
            # halo exchanges at slab edges, re-replication of the tiny deep
            # levels, reduced soft-argmax — with no manual collectives.
            from lt_tpu.models.v2v import force_xla
            from lt_tpu.parallel.spatial import constrain_volume

            volumes = constrain_volume(volumes, self.volume_axis_sharding)
            with force_xla():  # pallas_call is single-device; use XLA convs
                volumes = self.volume_net(volumes, train)
            volumes = constrain_volume(volumes, self.volume_axis_sharding)
        else:
            volumes = self.volume_net(volumes, train)  # positional remat arg

        # Channels-last soft-argmax avoids transposing the full volume; the
        # (B, J, S, S, S) volumes output (for the CE loss / vis) is produced
        # inside and DCE'd by XLA on inference paths that don't consume it.
        keypoints_3d, volumes = \
            hm_ops.integrate_tensor_3d_with_coordinates_channels_last(
                volumes * self.volume_multiplier, coord_volumes,
                softmax=self.volume_softmax)

        return VolumetricOutput(keypoints_3d, features, volumes, vol_conf,
                                coord_volumes, base_points)


# ---------------------------------------------------------------------------
# RANSAC
# ---------------------------------------------------------------------------


def _pair_indices(n_views: int):
    return [(i, k) for i in range(n_views) for k in range(i + 1, n_views)]


def ransac_triangulate(proj_matrices: jnp.ndarray, points: jnp.ndarray,
                       reprojection_error_epsilon: float = 15.0,
                       direct_optimization: bool = True,
                       n_gn_iters: int = 5,
                       huber_delta: float = 1.0,
                       view_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Device-side RANSAC triangulation over all view pairs.

    Deterministic, statically shaped replacement for the CPU RANSAC of
    triangulation.py:72-128: triangulate every C(V,2) pair with the DLT core,
    score inlier sets by reprojection error < epsilon, re-triangulate with
    the best 0/1 inlier weighting, then (optionally) refine with a fixed
    number of Huber-IRLS Gauss-Newton steps instead of
    scipy.optimize.least_squares.

    Args:
      proj_matrices: (..., V, 3, 4).
      points: (..., V, 2).
      view_mask: optional (..., V) view validity. Masked views never form
        pair candidates, never count as inliers, and carry zero weight in the
        re-triangulation and GN refinement — output equals physically
        dropping the view (the reference only ever triangulates over present
        views: its ragged collate removes missing ones,
        datasets/utils.py:15-22). Needs >= 2 unmasked views per point.

    Returns:
      (..., 3) triangulated points.
    """
    v = points.shape[-2]
    pairs = _pair_indices(v)

    # Pair candidate triangulations: weight DLT rows 0/1 per pair.
    pair_masks = jnp.zeros((len(pairs), v), jnp.float32)
    for pi, (i, k) in enumerate(pairs):
        pair_masks = pair_masks.at[pi, i].set(1.0).at[pi, k].set(1.0)

    if view_mask is not None:
        vm = jnp.broadcast_to(view_mask.astype(jnp.float32),
                              points.shape[:-1])         # (..., V)
        # A pair is admissible iff both of its views are present.
        bpair = pair_masks.reshape(
            (len(pairs),) + (1,) * (points.ndim - 2) + (v,))
        pair_valid = jnp.all(bpair <= vm[None], axis=-1)  # (P, ...)
    else:
        vm = None
        pair_valid = None

    def tri_with_weights(w):
        return geometry.triangulate_point_dlt(proj_matrices, points, w)

    candidates = jax.vmap(
        lambda m: tri_with_weights(jnp.broadcast_to(m, points.shape[:-1])))(
            pair_masks)                                  # (P, ..., 3)

    # Reprojection error of each candidate to every view (multiview.py:186-193
    # semantics incl. the 1/2 factor).
    reproj = geometry.project_points(
        proj_matrices, candidates[..., None, None, :])   # (P, ..., V, 1, 2)
    err = 0.5 * jnp.sqrt(jnp.sum(
        (reproj[..., 0, :] - points) ** 2, axis=-1))     # (P, ..., V)
    err = jnp.nan_to_num(err, nan=1e9, posinf=1e9, neginf=1e9)

    inliers = (err < reprojection_error_epsilon).astype(jnp.float32)
    inliers = jnp.maximum(inliers, pair_masks.reshape(
        (len(pairs),) + (1,) * (points.ndim - 2) + (v,)))
    if vm is not None:
        inliers = inliers * vm[None]                     # drop masked views
    counts = inliers.sum(axis=-1)                        # (P, ...)
    if pair_valid is not None:
        counts = jnp.where(pair_valid, counts, -1.0)     # never pick invalid

    best = jnp.argmax(counts, axis=0)                    # (...)
    best_mask = jnp.take_along_axis(
        jnp.moveaxis(inliers, 0, -2), best[..., None, None], axis=-2
    )[..., 0, :]                                         # (..., V)

    point = tri_with_weights(best_mask)

    if direct_optimization:
        def gn_step(x, _):
            # Per-view reprojection residual vector (masked to inliers).
            def per_point_res(xp, pm, pts, mask):
                proj = geometry.project_points(pm, xp[None])[..., 0, :]
                r = (proj - pts) * mask[..., None]
                return r.reshape(-1)

            def huber_weights(r2):
                a = jnp.sqrt(jnp.maximum(r2, 1e-12))
                return jnp.where(a <= huber_delta, 1.0, huber_delta / a)

            flat_x = x.reshape(-1, 3)
            flat_pm = jnp.broadcast_to(
                proj_matrices, x.shape[:-1] + (v, 3, 4)).reshape(-1, v, 3, 4)
            flat_pts = jnp.broadcast_to(
                points, x.shape[:-1] + (v, 2)).reshape(-1, v, 2)
            flat_mask = best_mask.reshape(-1, v)

            def one(xp, pm, pts, mask):
                def res_fn(xx):
                    return per_point_res(xx, pm, pts, mask)

                r = res_fn(xp)
                r2 = (r.reshape(v, 2) ** 2).sum(-1)
                w = jnp.repeat(huber_weights(r2), 2)
                Jm = jax.jacfwd(res_fn)(xp)              # (2V, 3)
                JtJ = (Jm * w[:, None]).T @ Jm + 1e-6 * jnp.eye(3)
                g = (Jm * w[:, None]).T @ r
                return xp - jnp.linalg.solve(JtJ, g)

            new = jax.vmap(one)(flat_x, flat_pm, flat_pts, flat_mask)
            return new.reshape(x.shape), None

        point, _ = jax.lax.scan(gn_step, point, None, length=n_gn_iters)

    return point


class RANSACTriangulationNet(nn.Module):
    """Backbone -> hard argmax -> device-side RANSAC (triangulation.py:17-128)."""

    num_joints: int = 17
    num_layers: int = 152
    style: str = "simple"
    direct_optimization: bool = True
    reprojection_error_epsilon: float = 15.0
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.backbone = PoseResNet(
            num_joints=self.num_joints, num_layers=self.num_layers,
            style=self.style, alg_confidences=False, vol_confidences=False,
            compute_dtype=self.compute_dtype)

    def __call__(self, images: jnp.ndarray, proj_matrices: jnp.ndarray,
                 train: bool = False,
                 view_mask: Optional[jnp.ndarray] = None) -> RansacOutput:
        b, v = images.shape[:2]
        image_shape = images.shape[2:4]

        flat = images.reshape((b * v,) + images.shape[2:])
        raw_heatmaps, _, _, _ = self.backbone(flat, train=train)
        j = raw_heatmaps.shape[-1]
        hh, hw = raw_heatmaps.shape[1:3]

        raw = raw_heatmaps.reshape((b, v) + raw_heatmaps.shape[1:])
        raw = jnp.moveaxis(raw, -1, 2)                   # (B, V, J, h, w)

        # Hard argmax (triangulation.py:45-46): integer (x, y).
        flat_idx = jnp.argmax(raw.reshape(b, v, j, -1), axis=-1)
        keypoints_2d = jnp.stack(
            [(flat_idx % hw).astype(jnp.float32),
             (flat_idx // hw).astype(jnp.float32)], axis=-1)
        keypoints_2d = _upscale_keypoints(keypoints_2d, (hh, hw), image_shape)

        pts = keypoints_2d.swapaxes(1, 2)                # (B, J, V, 2)
        pm = jnp.broadcast_to(proj_matrices[:, None],
                              (b, j, v, 3, 4))
        vm = None
        if view_mask is not None:
            vm = jnp.broadcast_to(view_mask[:, None, :], (b, j, v))
        keypoints_3d = ransac_triangulate(
            pm, pts, self.reprojection_error_epsilon,
            self.direct_optimization, view_mask=vm)

        confidences = jnp.zeros((b, v, j), jnp.float32)  # plug (:59)
        return RansacOutput(keypoints_3d, keypoints_2d, raw, confidences)
