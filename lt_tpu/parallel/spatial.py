"""Volume-axis (spatial) sharding of the 3D volume across the mesh.

A performance extension beyond reference parity (SURVEY.md §2.4: the
reference has nothing comparable — its only strategy is DDP): split the
(B, X, Y, Z, C) voxel volume's X axis over the mesh so ONE sample's 64^3
V2V runs across several chips.  Data parallelism is the throughput
strategy; this is the latency/memory strategy — e.g. serving a single
request, or growing the volume past one chip's HBM.

The TPU-native mechanism is GSPMD: we only *annotate* the volume with
``jax.lax.with_sharding_constraint`` at the V2V boundary, and XLA's SPMD
partitioner propagates the split through the conv stack, inserting the
halo exchanges (collective-permutes on ICI) each 3x3x3 conv needs at slab
edges and the all-reduces the volumetric soft-argmax needs — there is no
hand-written halo code to get wrong.  Deep hourglass levels whose pooled X
extent drops below the mesh size are automatically re-replicated by the
partitioner (they are tiny).

Used via :class:`lt_tpu.models.triangulation.VolumetricTriangulationNet`'s
``volume_axis_sharding`` field (the XLA unprojection path; the fused Pallas
kernels are single-device and gate themselves off under spatial sharding).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def volume_sharding(mesh: Mesh, axis_name: str = "data",
                    batch_axis: Optional[str] = None) -> NamedSharding:
    """Sharding for a (B, X, Y, Z, C) volume: X split over ``axis_name``.

    ``batch_axis`` optionally also shards B (hybrid data x spatial meshes).
    """
    return NamedSharding(mesh, P(batch_axis, axis_name))


def constrain_volume(volume: jax.Array, sharding: Optional[NamedSharding]
                     ) -> jax.Array:
    """Annotate a volume with its sharding inside jit (no-op if None)."""
    if sharding is None:
        return volume
    return jax.lax.with_sharding_constraint(volume, sharding)
