"""Pallas TPU kernel: 3x3x3 stride-1 'same' 3D convolution for V2V inference.

XLA's conv3d runs V2V's 32-channel blocks at ~15% MXU utilization (output
channels fill only 32 of 128 lanes).  This kernel restores utilization by
restructuring the conv as, per input x-plane, ONE matmul whose output
columns are all (dx-tap, out-channel) pairs:

    P (Y*Z, 9*Cin)  @  W2 (9*Cin, 3*Cout)  ->  Q (Y*Z, 3*Cout)

P stacks the 9 in-plane (dy, dz) taps along lanes (masked rolls of the
VMEM-resident plane); Q's dx-blocks accumulate into the three output planes
the input plane contributes to — entirely in VMEM, so the intermediate
never touches HBM (the failure mode of the same decomposition in XLA).

The x-slab halo comes from two extra single-plane BlockSpecs whose index
maps clamp at the volume edges; the kernel zeroes them there, which IS the
conv's zero padding.  Inference-only by design: BatchNorm folds exactly
into the conv weights (``fold_bn``), making conv+BN+ReLU one kernel call;
training keeps the XLA conv path (autodiff).

STATUS (round 1): numerically correct (interpret-mode tests below match the
XLA conv to 4e-6) but NOT yet wired into V2VModel — on hardware the row
rolls dominate (pltpu.roll lowers arbitrary sublane rotates slowly, and its
bf16 path is unusable because bitcast packs sublane pairs), leaving it only
~1.25x over XLA's conv at 32 channels before the f32-roll fix tipped VMEM
over budget.  Round-2 plan: build the 9 taps with (y, z*c)-layout lane
shifts (aligned 32-lane rotates) instead of sublane rolls, which removes
the f32 staging and the VMEM pressure at once.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_rows(plane: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Circular row shift. pltpu.roll only handles 32-bit data, and its
    bitcast packs along *sublanes* (a bf16->int32 bitcast halves the row
    count, so row shifts land wrong); roll in f32 instead."""
    if plane.dtype != jnp.float32:
        return pltpu.roll(plane.astype(jnp.float32), shift, 0)
    return pltpu.roll(plane, shift, 0)


def _conv3d_kernel(x_plane, w_ref, b_ref, o_ref, q_a, q_b, *,
                   size_x: int, yz: int, size_y: int, size_z: int,
                   cin: int, cout: int, relu: bool):
    """One (batch, plane) grid step of the rolling-Q conv.

    Step j processes input plane j-1 (clamped; zero-substituted beyond the
    borders == the conv's zero padding).  q_a/q_b are persistent VMEM
    scratch holding Q of the two previous planes; output plane j-2 is
    finalized once all three of its tap blocks exist.  The output block
    index map clamps j-2 into range, so steps j < 2 revisit (and are
    overwritten in) the first block before it is ever flushed.
    """
    j = pl.program_id(1)

    plane = x_plane[0, 0]                              # (Y*Z, Cin)
    border = jnp.logical_or(j == 0, j == size_x + 1)
    plane = jnp.where(border, jnp.zeros_like(plane), plane)

    # (dy, dz) tap validity over the flattened (y, z) rows.
    r = jax.lax.broadcasted_iota(jnp.int32, (yz, 1), 0)
    z_of_r = r % size_z
    y_of_r = r // size_z

    # Accumulate over 3-tap groups: bounds the live patch buffer to
    # (Y*Z, 3*Cin) instead of (Y*Z, 9*Cin) (VMEM budget).
    offsets = [(dy, dz) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    q = None
    for g in range(3):
        taps = []
        for dy, dz in offsets[3 * g:3 * g + 3]:
            delta = dy * size_z + dz
            shifted = _roll_rows(plane, (-delta) % yz)
            valid = ((y_of_r + dy >= 0) & (y_of_r + dy < size_y)
                     & (z_of_r + dz >= 0) & (z_of_r + dz < size_z))
            taps.append(jnp.where(valid, shifted, jnp.zeros_like(shifted)))
        p = jnp.concatenate(taps, axis=-1).astype(x_plane.dtype)  # (YZ,3Cin)
        part = jax.lax.dot_general(
            p, w_ref[3 * g * cin:(3 * g + 3) * cin, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (Y*Z, 3*Cout)
        q = part if q is None else q + part

    @pl.when(j >= 2)
    def _():
        out = (q_a[:, 0:cout].astype(jnp.float32)
               + q_b[:, cout:2 * cout].astype(jnp.float32)
               + q[:, 2 * cout:3 * cout] + b_ref[0])
        if relu:
            out = jnp.maximum(out, 0.0)
        o_ref[0, 0] = out.astype(o_ref.dtype)

    q_a[...] = q_b[...]
    q_b[...] = q.astype(q_b.dtype)


def conv3d_same(x: jnp.ndarray, weights: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None, relu: bool = False,
                interpret: bool = False) -> jnp.ndarray:
    """3x3x3 stride-1 zero-pad-1 conv over NDHWC input via the slab kernel.

    Args:
      x: (B, X, Y, Z, Cin).
      weights: (3, 3, 3, Cin, Cout) standard param layout.
      bias: optional (Cout,) - added before the optional fused ``relu``
        (fold BN in with :func:`fold_bn`).

    Returns:
      (B, X, Y, Z, Cout) float32.
    """
    b, size_x, size_y, size_z, cin = x.shape
    cout = weights.shape[-1]
    yz = size_y * size_z

    # (kx, ky, kz, ci, co) -> rows (dy, dz, ci), cols (dx, co).
    w2 = jnp.transpose(weights, (1, 2, 3, 0, 4)).reshape(9 * cin, 3 * cout)
    w2 = w2.astype(x.dtype)
    b2 = (jnp.zeros((1, cout), jnp.float32) if bias is None
          else bias.reshape(1, cout).astype(jnp.float32))

    kernel = functools.partial(
        _conv3d_kernel, size_x=size_x, yz=yz, size_y=size_y, size_z=size_z,
        cin=cin, cout=cout, relu=relu)

    x4 = x.reshape(b, size_x, yz, cin)

    out = pl.pallas_call(
        kernel,
        grid=(b, size_x + 2),
        in_specs=[
            # Step j reads input plane j-1 (clamped; kernel zeroes borders).
            pl.BlockSpec((1, 1, yz, cin),
                         lambda bb, j: (bb, jnp.clip(j - 1, 0, size_x - 1),
                                        0, 0)),
            pl.BlockSpec((9 * cin, 3 * cout), lambda bb, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda bb, j: (0, 0)),
        ],
        # Output plane j-2 (clamped): steps j < 2 revisit block 0 unwritten;
        # it is only flushed after j == 2 has written it.
        out_specs=pl.BlockSpec((1, 1, yz, cout),
                               lambda bb, j: (bb, jnp.clip(j - 2, 0,
                                                           size_x - 1),
                                              0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, size_x, yz, cout), jnp.float32),
        # Rolling-Q scratch rides in the compute dtype: halves VMEM in the
        # bf16 fast path (f32 partials only matter for the parity path).
        scratch_shapes=[
            pltpu.VMEM((yz, 3 * cout), x.dtype),
            pltpu.VMEM((yz, 3 * cout), x.dtype),
        ],
        interpret=interpret,
    )(x4, w2, b2)

    return out.reshape(b, size_x, size_y, size_z, cout)


def fold_bn(weights: jnp.ndarray, conv_bias: Optional[jnp.ndarray],
            scale: jnp.ndarray, bn_bias: jnp.ndarray, mean: jnp.ndarray,
            var: jnp.ndarray, eps: float = 1e-5):
    """Fold inference BatchNorm into conv weights/bias (exact).

    y = scale * (conv(x) + b - mean) / sqrt(var + eps) + bn_bias
      = conv(x; W * g) + (b - mean) * g + bn_bias,  g = scale / sqrt(var+eps)
    """
    g = scale / jnp.sqrt(var + eps)
    w = weights * g
    b = conv_bias if conv_bias is not None else jnp.zeros_like(mean)
    return w, (b - mean) * g + bn_bias
