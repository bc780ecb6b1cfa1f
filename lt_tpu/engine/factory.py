"""Factories: config -> model / criterion / optimizer.

Functional parity target: /root/reference/train.py — model dict (:400-404),
criterion dict (:416-425), Adam with per-module LR groups (:430-439), the
``grad_clip / lr`` clipping convention (:238-239), and the volumetric
model's frozen backbone final_layer (triangulation.py:235-236, realized here
as a zero-update optax mask instead of requires_grad).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import optax

from lt_tpu.models import losses
from lt_tpu.models.triangulation import (
    AlgebraicTriangulationNet,
    RANSACTriangulationNet,
    VolumetricTriangulationNet,
)

MODEL_NAMES = ("ransac", "alg", "vol")


def make_model(config, mesh=None):
    """Build the configured model family (train.py:400-404).

    ``mesh``: optional ``jax.sharding.Mesh`` used only when the config sets
    ``model.volume_axis_sharding: true`` (spatial sharding of the volume's X
    axis across the mesh, lt_tpu/parallel/spatial.py — a beyond-reference
    extension; the reference's only strategy is DDP).
    """
    m = config.model
    name = m.name
    compute_dtype = (jnp.bfloat16 if config.get("bf16", m.get("bf16", False))
                     else jnp.float32)
    backbone = m.backbone
    common = dict(num_joints=backbone.num_joints,
                  num_layers=backbone.num_layers,
                  style=backbone.get("style", "simple"),
                  compute_dtype=compute_dtype)
    if name == "alg":
        return AlgebraicTriangulationNet(
            use_confidences=m.get("use_confidences", True),
            heatmap_softmax=m.get("heatmap_softmax", True),
            heatmap_multiplier=m.get("heatmap_multiplier", 100.0),
            **common)
    if name == "vol":
        sharding = None
        if m.get("volume_axis_sharding") and mesh is not None:
            from lt_tpu.parallel.spatial import volume_sharding

            sharding = volume_sharding(mesh)
        return VolumetricTriangulationNet(
            remat=bool(config.opt.get("remat", False)),
            volume_aggregation_method=m.get("volume_aggregation_method",
                                            "softmax"),
            volume_softmax=m.get("volume_softmax", True),
            volume_multiplier=m.get("volume_multiplier", 1.0),
            volume_size=m.get("volume_size", 64),
            cuboid_side=m.get("cuboid_side", 2500.0),
            kind=m.get("kind", "mpii"),
            transfer_cmu_to_human36m=m.get("transfer_cmu_to_human36m", False),
            volume_axis_sharding=sharding,
            **common)
    if name == "ransac":
        return RANSACTriangulationNet(
            direct_optimization=m.get("direct_optimization", True),
            **common)
    raise ValueError(f"Unknown model name: {name}")


def make_criterion(config):
    """Criterion factory (train.py:416-425)."""
    return losses.make_criterion(
        config.opt.criterion, config.opt.get("mse_smooth_threshold", 400.0))


def _label_params(params, model_name: str):
    """Assign an LR-group label to every parameter leaf."""

    def label_tree(tree, path=()):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                out[k] = label_tree(v, p)
            else:
                out[k] = _label_for(p, model_name)
        return out

    return label_tree(params)


def _label_for(path: Tuple[str, ...], model_name: str) -> str:
    if model_name == "vol":
        if path[0] == "backbone" and path[1] == "final_layer":
            return "frozen"  # triangulation.py:235-236
        if path[0] == "backbone":
            return "backbone"
        if path[0] == "process_features":
            return "process_features"
        if path[0] == "volume_net":
            return "volume_net"
    return "backbone"


def make_optimizer(config, params, model_name: str):
    """Adam with per-module LR groups + reference grad-clip convention.

    vol: backbone lr, process_features_lr, volume_net_lr (train.py:430-439);
    otherwise a single Adam(lr). ``grad_clip`` is interpreted as
    ``clip_global_norm(grad_clip / lr)`` (train.py:238-239).
    """
    opt_cfg = config.opt
    lr = opt_cfg.lr

    labels = _label_params(params, model_name)
    transforms = {
        "backbone": optax.adam(lr),
        "process_features": optax.adam(
            opt_cfg.get("process_features_lr", lr)),
        "volume_net": optax.adam(opt_cfg.get("volume_net_lr", lr)),
        "frozen": optax.set_to_zero(),
    }
    tx = optax.multi_transform(transforms, labels)

    if opt_cfg.get("grad_clip") is not None:
        # Frozen params have no gradients in the reference (requires_grad=
        # False), so they must not contribute to the clip norm: zero them
        # before clip_by_global_norm.
        import jax

        frozen_mask = jax.tree.map(lambda l: l == "frozen", labels)
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), frozen_mask),
            optax.clip_by_global_norm(opt_cfg.grad_clip / lr), tx)
    return tx
