"""lt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for learnable
triangulation of human pose.

This is a from-scratch rebuild of the capabilities of
karfly/learnable-triangulation-pytorch (ICCV 2019), designed TPU-first:

- Geometry core (``lt_tpu.ops.geometry``): camera pytrees, projective
  transforms, and confidence-weighted DLT triangulation implemented as a
  batched 4x4 symmetric Jacobi eigensolver (fully ``vmap``-able, no per-point
  SVD loops, no host sync).
- Differentiable ops (``lt_tpu.ops.heatmaps`` / ``lt_tpu.ops.volumetric``):
  2D/3D soft-argmax and projective volume unprojection as vectorized XLA
  programs, with fused Pallas kernels for the hot paths.
- Models (``lt_tpu.models``): PoseResNet backbone, V2V 3D hourglass, and the
  three triangulation model families (ransac / algebraic / volumetric) as
  flax modules over NHWC/NDHWC layouts.
- Data (``lt_tpu.data``): Human3.6M multiview dataset (same labels .npy
  schema as the reference) plus a synthetic multiview dataset for testing
  without the 200 GiB corpus.
- Parallelism (``lt_tpu.parallel``): ``jax.sharding.Mesh`` + ``pjit`` data
  parallel training with gradient ``pmean`` over ICI, replacing the
  reference's DDP/NCCL path.
- Engine (``lt_tpu.engine``): config system, train/eval loops, Orbax
  checkpointing (params + optimizer state + step — true resume, which the
  reference lacks), metrics and tensorboard logging.

Reference layer map: see /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"

from lt_tpu.ops import geometry, heatmaps, volumetric  # noqa: F401
