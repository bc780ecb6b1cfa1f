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
    inits, not parity checkpoints).  batch_stats stay f32: BN running
    VARIANCES of a trained V2V exceed the f16 max (measured r5: several
    volume_net vars overflowed to inf at f16), and the stats are a tiny
    fraction of the bytes.
    """
    flat = {}
    for k, v in _flatten(params, "params").items():
        flat[k] = v.astype(dtype)
    for k, v in _flatten(batch_stats, "batch_stats").items():
        flat[k] = v.astype(np.float32)
    np.savez_compressed(path, **flat)


def load_backbone_npz(path: str) -> dict:
    """-> {"params": {...}, "batch_stats": {...}} as float32 nested dicts."""
    with np.load(path) as data:
        flat = {k: data[k].astype(np.float32) for k in data.files}
    tree = _unflatten(flat)
    return {"params": tree.get("params", {}),
            "batch_stats": tree.get("batch_stats", {})}


# The format is tree-agnostic: the same flatten/f16/npz applies to a FULL
# model's variables (backbone + process_features + volume_net ...), which
# is what the committed e2e-test fixture stores (the reference's
# model.checkpoint whole-model init, train.py:406-413, with an .npz
# source instead of a .pth).
save_model_npz = save_backbone_npz
load_model_npz = load_backbone_npz
