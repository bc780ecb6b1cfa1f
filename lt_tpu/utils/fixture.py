"""Compact .npz backbone fixtures: export/import of backbone params.

The reference's volumetric workflow never starts from a random backbone —
it chains from a pretrained 2D pose net (/root/reference/train.py:406-413,
pose_resnet.py:321-377 loads a .pth).  The container has no MPII/ImageNet
weights and tests run on the CPU mesh where pretraining is hours, so the
synthetic-domain equivalent is a small committed fixture: a backbone
trained by benchmarks/pretrain_backbone_2d.py on the TPU chip, exported
here as float16 (the vol stage fine-tunes on top, so f16 rounding is
irrelevant — measured: identical convergence).

Consumed by ``engine.train.init_model_state`` via
``model.backbone.checkpoint: path/to/fixture.npz``.
"""

from __future__ import annotations

import numpy as np


def _flatten(tree: dict, prefix: str = ""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_backbone_npz(path: str, params: dict, batch_stats: dict,
                      dtype=np.float16) -> None:
    """Save a backbone's params + batch_stats as one compressed .npz.

    ``params``/``batch_stats``: the backbone SUBTREES (not the full model).
    Weights are cast to ``dtype`` (default f16 — fixtures are fine-tuning
    inits, not parity checkpoints).
    """
    flat = {}
    for section, tree in (("params", params), ("batch_stats", batch_stats)):
        for k, v in _flatten(tree, section).items():
            flat[k] = v.astype(dtype)
    np.savez_compressed(path, **flat)


def load_backbone_npz(path: str) -> dict:
    """-> {"params": {...}, "batch_stats": {...}} as float32 nested dicts."""
    with np.load(path) as data:
        flat = {k: data[k].astype(np.float32) for k in data.files}
    tree = _unflatten(flat)
    return {"params": tree.get("params", {}),
            "batch_stats": tree.get("batch_stats", {})}
