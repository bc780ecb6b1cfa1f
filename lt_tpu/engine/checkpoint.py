"""Orbax checkpointing: params + batch stats + optimizer state + step.

The reference only saves ``state_dict`` per epoch and can't resume mid-run
(train.py:465-469; SURVEY.md §5).  Here a checkpoint is the full train state,
so training resumes exactly; PyTorch ``.pth`` files from the reference
model zoo are imported via ``lt_tpu.utils.torch_import`` instead.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def save_checkpoint(directory: str, state, name: str = "state"):
    """Save a TrainState pytree under ``directory/name``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, name))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state._asdict(), force=True)


def restore_checkpoint(directory: str, state_template, name: str = "state"):
    """Restore a TrainState saved by :func:`save_checkpoint`.

    ``state_template`` provides the tree structure/shardings (an existing
    TrainState with correctly-shaped arrays).
    """
    import orbax.checkpoint as ocp

    from lt_tpu.engine.steps import TrainState

    path = os.path.abspath(os.path.join(directory, name))
    template = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, state_template._asdict())
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    return TrainState(**restored)


def restore_raw(directory: str, name: str = "state"):
    """Restore a checkpoint WITHOUT a template (raw numpy pytree).

    Used for cross-model transfers — e.g. initializing the volumetric
    model's backbone from a trained algebraic run's checkpoint (the
    reference's own vol workflow: human36m_vol_softmax.yaml points
    model.backbone.checkpoint at a pretrained alg model) — where the full
    source TrainState structure isn't available to build a template.

    Backend-agnostic: the saved sharding metadata is ignored and every
    leaf restores as a host numpy array — a checkpoint written on the TPU
    restores on the CPU mesh (fixture export, CPU-mesh tests) and vice
    versa.
    """
    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, name))
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata.tree
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args))


def resolve_checkpoint_dir(path: str) -> str:
    """Accept an experiment dir, its checkpoints/ dir, or an epoch dir."""
    if os.path.isdir(os.path.join(path, "state")):
        return path
    cdir = path if os.path.basename(path) == "checkpoints" else os.path.join(
        path, "checkpoints")
    latest = latest_epoch_dir(cdir)
    if latest is None:
        raise FileNotFoundError(f"no checkpoints under {path}")
    return latest


def latest_epoch_dir(checkpoints_dir: str) -> Optional[str]:
    """Find the newest {epoch:04d} checkpoint directory, if any."""
    if not os.path.isdir(checkpoints_dir):
        return None
    epochs = [d for d in os.listdir(checkpoints_dir) if d.isdigit()]
    if not epochs:
        return None
    return os.path.join(checkpoints_dir, max(epochs, key=int))
