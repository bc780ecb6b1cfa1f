"""Pallas TPU kernel: 3x3x3 stride-1 'same' 3D convolution for V2V inference.

XLA's conv3d runs V2V's 32-channel blocks at ~10 TFLOP/s on v5e (measured,
benchmarks/profile_conv3d.py): the 32 output channels fill only 32 of the
MXU's 128 output lanes, and the implicit im2col A-matrix round-trips HBM.
This kernel restructures the conv so that, per input x-plane, there is ONE
VMEM-resident matmul whose output columns are all (dx-tap, out-channel)
pairs:

    P (Y*Z, 9*Cin)  @  W2 (9*Cin, 3*Cout)  ->  Q (Y*Z, 3*Cout)

P stacks the 9 in-plane (dy, dz) taps along lanes; Q's dx-blocks accumulate
into the three output planes the input plane contributes to — entirely in
VMEM, so the im2col intermediate never touches HBM.  The same matmul shape
measured 20.6 TFLOP/s even WITH the HBM round-trip, i.e. >= 2x the XLA conv
before counting the saved traffic.

Tap construction (the round-1 bottleneck — 9 generic sublane rotates were
as slow as the matmul) is hierarchical:

  - dz = +-1: two row shifts by one row (unaligned; genuinely expensive),
    computed once on the input plane;
  - dy = +-1: row shifts by +-size_z rows — a multiple of the 8-row vreg
    sublane count, so Mosaic lowers them to vreg selection (near-free) —
    applied to the three dz bases.

Shifts are zero-filled static-slice concats; (dy, dz) taps that cross the
y/z borders are masked off, which IS the conv's zero padding.  The x-halo
comes from the grid: step j processes input plane j-1 (clamped at the
edges and zeroed), and output plane j-2 is finalized from the rolling
q_a/q_b scratch once all three of its dx contributions exist.

Fusions: bias add (fold BatchNorm in with :func:`fold_bn`), optional
residual add (the Res3DBlock skip), optional ReLU — all at the finalize
step, so conv+BN+add+ReLU is one kernel.  Inference-only by design;
training keeps the XLA conv path (autodiff).

Functional parity target: the 3x3x3 convs of /root/reference/mvn/models/
v2v.py:7-42 (Basic3DBlock / Res3DBlock bodies).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_shift_up(x: jnp.ndarray, delta: int) -> jnp.ndarray:
    """Shift rows so out[r] = x[r + delta], zero-filled at the ends.

    ``delta`` multiple of 8 (the f32 sublane count) => pure vreg selection.
    """
    if delta == 0:
        return x
    zeros = jnp.zeros((abs(delta),) + x.shape[1:], x.dtype)
    if delta > 0:
        return jnp.concatenate([x[delta:], zeros], axis=0)
    return jnp.concatenate([zeros, x[:delta]], axis=0)


def _conv3d_kernel(x_plane, w_ref, b_ref, o_ref, q_a, q_b, *,
                   batch: int, size_x: int, yz: int, size_y: int,
                   size_z: int, cin: int, cout: int, relu: bool,
                   residual: bool):
    """One x-plane grid step of the rolling-Q conv.

    The whole batch rides in the matmul rows (M = B*Y*Z): row r of the
    plane is (b, y, z) = (r // YZ, (r // Z) % Y, r % Z).  The (dy, dz) tap
    shifts wrap across batch boundaries exactly where the y/z border masks
    zero them, so batching changes nothing but the M dimension.
    """
    if residual:
        x_plane, r_plane = x_plane[:2]
    j = pl.program_id(1)
    rows = batch * yz

    plane = x_plane[:, 0].reshape(rows, cin)           # (B*Y*Z, Cin)
    border = jnp.logical_or(j == 0, j == size_x + 1)
    plane = jnp.where(border, jnp.zeros_like(plane), plane)

    # (dy, dz) tap validity over the flattened (b, y, z) rows.
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    z_of_r = r % size_z
    y_of_r = (r // size_z) % size_y

    # One matmul per dz group bounds the live patch buffer to (Y*Z, 3*Cin)
    # instead of (Y*Z, 9*Cin) — the VMEM budget on v5e is ~16 MB.
    # P rows must match W2's (dz, dy, ci) row order.
    q = None
    for g, dz in enumerate((-1, 0, 1)):
        # dz base: out[r] = plane[r + dz] (unaligned shift for +-1).
        base = _row_shift_up(plane, dz)
        z_ok = (z_of_r + dz >= 0) & (z_of_r + dz < size_z)
        taps = []
        for dy in (-1, 0, 1):
            t = _row_shift_up(base, dy * size_z)       # vreg-aligned
            valid = z_ok & (y_of_r + dy >= 0) & (y_of_r + dy < size_y)
            taps.append(jnp.where(valid, t, jnp.zeros_like(t)))
        p = jnp.concatenate(taps, axis=-1)             # (Y*Z, 3*Cin)
        part = jax.lax.dot_general(
            p, w_ref[3 * g * cin:3 * (g + 1) * cin, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        q = part if q is None else q + part

    @pl.when(j >= 2)
    def _():
        out = (q_a[:, 0:cout].astype(jnp.float32)
               + q_b[:, cout:2 * cout].astype(jnp.float32)
               + q[:, 2 * cout:3 * cout] + b_ref[0])
        if residual:
            out = out + r_plane[:, 0].reshape(rows, cout).astype(jnp.float32)
        if relu:
            out = jnp.maximum(out, 0.0)
        o_ref[:, 0] = out.astype(o_ref.dtype).reshape(batch, yz, cout)

    q_a[...] = q_b[...]
    q_b[...] = q.astype(q_b.dtype)


def conv3d_same(x: jnp.ndarray, weights: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None, relu: bool = False,
                residual: Optional[jnp.ndarray] = None,
                out_dtype=None,
                interpret: bool = False) -> jnp.ndarray:
    """3x3x3 stride-1 zero-pad-1 conv over NDHWC input via the slab kernel.

    Args:
      x: (B, X, Y, Z, Cin).
      weights: (3, 3, 3, Cin, Cout) standard param layout.
      bias: optional (Cout,) — added before ``residual``/``relu`` (fold BN
        in with :func:`fold_bn`).
      relu: fuse a ReLU after bias/residual.
      residual: optional (B, X, Y, Z, Cout) skip tensor added pre-ReLU
        (Res3DBlock fusion).
      out_dtype: output dtype (default: x.dtype).

    Returns:
      (B, X, Y, Z, Cout).
    """
    b, size_x, size_y, size_z, cin = x.shape
    cout = weights.shape[-1]
    yz = size_y * size_z
    out_dtype = out_dtype or x.dtype

    # (kx, ky, kz, ci, co) -> rows (dz, dy, ci), cols (dx, co).
    w2 = jnp.transpose(weights, (2, 1, 3, 0, 4)).reshape(9 * cin, 3 * cout)
    w2 = w2.astype(x.dtype)
    b2 = (jnp.zeros((1, cout), jnp.float32) if bias is None
          else bias.reshape(1, cout).astype(jnp.float32))

    # Fold as many batch items into the matmul rows as VMEM affords:
    # bigger M amortizes per-step overhead and fills the MXU pipeline.
    # Budget (bytes/row of a fold): plane + 3 taps + P + 2x rolling-Q
    # scratch + in/out double buffers, x element size.
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    per_row = (cin * 6 + 3 * cin + 3 * cout * 4) * itemsize + 16 * cout
    fold = b
    while fold > 1 and (fold * yz * per_row > 48 * 1024 * 1024
                        or b % fold != 0):
        fold -= 1
    groups = b // fold

    kernel = functools.partial(
        _conv3d_kernel, batch=fold, size_x=size_x, yz=yz, size_y=size_y,
        size_z=size_z, cin=cin, cout=cout, relu=relu,
        residual=residual is not None)

    x4 = x.reshape(b, size_x, yz, cin)

    in_specs = [
        # Step (g, j) reads input plane j-1 (clamped; kernel zeroes
        # borders) across the fold's batch items.
        pl.BlockSpec((fold, 1, yz, cin),
                     lambda g, j: (g, jnp.clip(j - 1, 0, size_x - 1), 0, 0)),
    ]
    operands = [x4]
    if residual is not None:
        # The residual joins at finalize time: plane j-2 (clamped).
        in_specs.append(pl.BlockSpec(
            (fold, 1, yz, cout),
            lambda g, j: (g, jnp.clip(j - 2, 0, size_x - 1), 0, 0)))
        operands.append(residual.reshape(b, size_x, yz, cout))
    in_specs += [
        pl.BlockSpec((9 * cin, 3 * cout), lambda g, j: (0, 0)),
        pl.BlockSpec((1, cout), lambda g, j: (0, 0)),
    ]
    operands += [w2, b2]

    if residual is not None:
        # Pack x/residual planes through one kernel argument tuple.
        def kernel_wrapped(x_ref, r_ref, w_ref, b_ref, o_ref, q_a, q_b):
            return _conv3d_kernel(
                (x_ref, r_ref), w_ref, b_ref, o_ref, q_a, q_b,
                batch=fold, size_x=size_x, yz=yz, size_y=size_y,
                size_z=size_z, cin=cin, cout=cout, relu=relu, residual=True)

        kernel = kernel_wrapped

    out = pl.pallas_call(
        kernel,
        grid=(groups, size_x + 2),
        in_specs=in_specs,
        # Output plane j-2 (clamped): steps j < 2 revisit block 0 unwritten;
        # it is only flushed after j == 2 has written it (and the group
        # transitions flush stale rolling-Q state through the same warmup).
        out_specs=pl.BlockSpec((fold, 1, yz, cout),
                               lambda g, j: (g, jnp.clip(j - 2, 0,
                                                         size_x - 1), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, size_x, yz, cout), out_dtype),
        # Rolling-Q scratch rides in the compute dtype: halves VMEM in the
        # bf16 fast path (f32 partials only matter for the f32 parity path).
        scratch_shapes=[
            pltpu.VMEM((fold * yz, 3 * cout), x.dtype),
            pltpu.VMEM((fold * yz, 3 * cout), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # Sequential grid: the rolling-Q scratch carries state across j.
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)

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
