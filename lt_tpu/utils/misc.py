"""Small metric helpers (parity: /root/reference/mvn/utils/misc.py:9-40)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class AverageMeter:
    """Running average (misc.py:13-27)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def calc_gradient_norm(grads) -> jnp.ndarray:
    """Global L2 norm of a gradient pytree (misc.py:30-40)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
