"""Jitted train/eval steps over a device mesh.

Functional parity target: the reference hot loop (/root/reference/train.py
:154-365 — see SURVEY.md §3.2) rebuilt as pure functions:

- one fused ``train_step`` = forward + loss (criterion + optional weighted
  volumetric CE) + grads + Adam update + metric scalars, compiled once;
- gradient all-reduce over ICI is implicit: parameters are replicated and
  batches sharded over the mesh, so XLA inserts the collective (replacing
  DDP's backward-hook allreduce, train.py:453);
- the single-view pelvis-relative transform (train.py:201-213) happens
  in-trace when the static view count is 1;
- no ``autograd.detect_anomaly`` tax: NaN checks are a debug config flag
  (``jax.debug_nans``), off by default (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from lt_tpu.models import losses


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _model_outputs(model, model_name, variables, batch, train, rngs,
                   use_gt_pelvis: bool = False):
    """Dispatch the model forward over a prepared batch dict."""
    images = batch["images"]
    proj = batch["proj_matrices"]
    view_mask = batch.get("view_mask")
    if model_name == "vol":
        # Pelvis source (triangulation.py:286-294): GT keypoints when
        # use_gt_pelvis, else the algebraic model's precomputed predictions.
        if use_gt_pelvis:
            pelvis = batch["keypoints_3d"]
        else:
            pelvis = batch.get("pred_keypoints_3d", batch["keypoints_3d"])
        return model.apply(variables, images, proj, pelvis, train=train,
                           view_mask=view_mask, rngs=rngs,
                           mutable=["batch_stats"] if train else False)
    out = model.apply(variables, images, proj, train=train,
                      view_mask=view_mask, rngs=rngs,
                      mutable=["batch_stats"] if train else False)
    return out


def _single_view_relative(kp_pred, kp_gt, base_joint: int):
    """Pelvis-relative transform for the 1-view case (train.py:201-213)."""
    j = kp_gt.shape[1]
    mask = (jnp.arange(j) != base_joint).astype(kp_gt.dtype)[None, :, None]
    gt = kp_gt - kp_gt[:, base_joint:base_joint + 1] * mask
    pred = kp_pred - kp_pred[:, base_joint:base_joint + 1] * mask
    return pred, gt


def compute_losses(model_name: str, criterion, config, out, batch):
    """Criterion + optional volumetric CE, with reference scaling."""
    kp_pred = out.keypoints_3d
    kp_gt = batch["keypoints_3d"][:, :, :3]
    validity = (batch["keypoints_validity"] > 0.0).astype(jnp.float32)
    scale = config.opt.get("scale_keypoints_3d", 1.0)

    n_views = batch["images"].shape[1]
    if n_views == 1:
        base_joint = 6 if config.get("kind", "human36m") == "human36m" else 11
        kp_pred, kp_gt = _single_view_relative(kp_pred, kp_gt, base_joint)

    metrics = {}
    loss = criterion(kp_pred * scale, kp_gt * scale, validity)
    metrics[config.opt.criterion] = loss
    total = loss

    if model_name == "vol" and config.opt.get("use_volumetric_ce_loss", False):
        ce = losses.volumetric_ce_loss(out.coord_volumes, out.volumes,
                                       kp_gt, validity)
        metrics["volumetric_ce_loss"] = ce
        total = total + config.opt.get("volumetric_ce_loss_weight", 1.0) * ce

    if model_name == "vol" and hasattr(out, "base_points"):
        # base_point_l2 (train.py:251-263): distance between the cuboid
        # anchor and the GT pelvis, in scaled keypoint units.
        kind = config.model.get("kind", "mpii")
        n_joints = kp_gt.shape[1]
        if kind == "coco" and n_joints > 12:
            gt_base = (kp_gt[:, 11] + kp_gt[:, 12]) / 2.0
        elif kind != "coco" and n_joints > 6:
            gt_base = kp_gt[:, 6]
        else:
            gt_base = None
        if gt_base is not None:
            diff = (out.base_points - gt_base) * scale
            # Per-sample weighting: samples with zero valid joints (e.g. the
            # padded eval tail, engine/train.py _device_batch) are excluded.
            w = (validity.sum(axis=(1, 2)) > 0.0).astype(jnp.float32)
            metrics["base_point_l2"] = (
                jnp.sum(jnp.sqrt((diff ** 2).sum(-1)) * w)
                / jnp.maximum(w.sum(), 1.0))

    metrics["total_loss"] = total
    metrics["l2"] = losses.keypoints_l2_loss(kp_pred * scale, kp_gt * scale,
                                             validity)
    return total, metrics


def make_train_step(model, model_name: str, criterion, optimizer, config
                    ) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics)."""

    use_gt_pelvis = bool(config.model.get("use_gt_pelvis", False))

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        rngs = {"aug": jax.random.fold_in(rng, state.step)}

        def forward(params, batch_stats, batch, rngs):
            variables = {"params": params, "batch_stats": batch_stats}
            return _model_outputs(model, model_name, variables, batch, True,
                                  rngs, use_gt_pelvis=use_gt_pelvis)

        if config.opt.get("remat") and model_name != "vol":
            # Rematerialization for models without built-in per-block remat
            # (the volumetric model remats each backbone/V2V block itself —
            # see factory.make_model; an outer checkpoint on top would ADD
            # saved residuals instead of removing them).
            forward = jax.checkpoint(
                forward,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

        def loss_fn(params):
            out, mutated = forward(params, state.batch_stats, batch, rngs)
            total, metrics = compute_losses(model_name, criterion, config,
                                            out, batch)
            return total, (metrics, mutated["batch_stats"])

        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)

        # Reference semantics (train.py:240-242): L2 norm of the *trainable*
        # gradients, measured after clipping, times lr.
        from lt_tpu.engine import factory as _factory

        labels = _factory._label_params(state.params, model_name)
        trainable = jax.tree.map(
            lambda g, l: g * float(l != "frozen"), grads, labels)
        norm = optax.global_norm(trainable)
        if config.opt.get("grad_clip") is not None:
            norm = jnp.minimum(norm, config.opt.grad_clip / config.opt.lr)
        metrics["grad_norm_times_lr"] = norm * config.opt.lr
        new_state = TrainState(new_params, new_stats, new_opt_state,
                               state.step + 1)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_vis_step(model, model_name: str, config) -> Callable:
    """Jitted full-output forward for tensorboard panels: (state, batch) ->
    the model's output NamedTuple (heatmaps/volumes/confidences included)."""
    use_gt_pelvis = bool(config.model.get("use_gt_pelvis", False))

    def vis_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        return _model_outputs(model, model_name, variables, batch, False,
                              None, use_gt_pelvis=use_gt_pelvis)

    return jax.jit(vis_step)


def make_eval_step(model, model_name: str, criterion, config) -> Callable:
    """Build the jitted eval step: (state, batch) -> (keypoints, metrics)."""
    use_gt_pelvis = bool(config.model.get("use_gt_pelvis", False))

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        out = _model_outputs(model, model_name, variables, batch, False, None,
                             use_gt_pelvis=use_gt_pelvis)
        _, metrics = compute_losses(model_name, criterion, config, out, batch)
        return out.keypoints_3d, metrics

    return jax.jit(eval_step)
