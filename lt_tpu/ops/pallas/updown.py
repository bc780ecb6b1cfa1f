"""Pallas TPU kernels: 2x max-pool and 2x transposed-conv upsampling for V2V.

Functional parity targets: ``Pool3DBlock`` (/root/reference/mvn/models/
v2v.py:45-51, MaxPool3d(2)) and ``Upsample3DBlock`` (v2v.py:54-66,
ConvTranspose3d(k=2, s=2) + BN + ReLU).

These exist to keep the V2V inference hot path custom-call-to-custom-call:
XLA's reduce-window/conv-transpose between the fused Res3D kernels forces
layout conversions at every pallas<->XLA boundary (the in-context cost
measured in round 1).  Both kernels are elementwise/VPU-light:

- pool: per output x-plane, max of two input planes, then z- and y-pair
  reductions as single-dim strided loads from f32 VMEM scratch (the only
  strided access Mosaic lowers);
- upsample: per input x-plane, one (M, Cin) @ (Cin, Cout) matmul per
  (dx, dy, dz) tap (k=2, s=2 transposed conv touches each output voxel
  exactly once), z-/y-interleaved via pairs of strided stores into VMEM
  scratch; folded BN + ReLU fused on the way out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lt_tpu.ops.pallas.conv3d import _row_shift_up


def _pool_kernel(x_a, x_b, o_ref, s1, s2, *, batch: int, yz: int,
                 size_y: int, size_z: int, c: int):
    # Mosaic constraints shape this kernel: strided slicing only works on
    # memory refs (not computed values), only with 32-bit elements, and
    # only along a single non-lane dim — so each pair-reduction round-trips
    # through f32 VMEM scratch (max is exact, so no drift) and the y pairs
    # use a 3D view so the stride stays on a leading dim.
    rows = batch * yz
    s1[...] = jnp.maximum(x_a[:, 0].reshape(rows, c),
                          x_b[:, 0].reshape(rows, c)).astype(jnp.float32)
    # z pairs: rows are (b, y, z) with z fastest.
    a = jnp.maximum(s1[::2], s1[1::2])               # (rows/2, C)
    # y pairs: view as (B*Y, Z/2, C); stride 2 over the leading (b, y) dim
    # pairs adjacent y (Y even, so pairs never straddle b).
    s2[...] = a.reshape(batch * size_y, size_z // 2, c)
    b2 = jnp.maximum(s2[::2], s2[1::2])              # (B*Y/2, Z/2, C)
    o_ref[:, 0] = b2.reshape(batch, yz // 4, c).astype(o_ref.dtype)


def _pool_kernel_reshape(x_a, x_b, o_ref, *, batch: int, yz: int,
                         size_y: int, size_z: int, c: int):
    # Pair reduction via row shifts + leading-dim split reshapes on VALUES
    # (both Mosaic-supported): no f32 scratch round trips, stays in the
    # input dtype end-to-end (max is exact).  Lanes stay C throughout —
    # narrow-lane sublane->lane merges don't lower on this image.
    rows = batch * yz
    m = jnp.maximum(x_a[:, 0].reshape(rows, c), x_b[:, 0].reshape(rows, c))
    # z pairs: rows are (b, y, z) with z fastest; neighbor-max then keep
    # even z rows via a split reshape.
    mz = jnp.maximum(m, _row_shift_up(m, 1))
    a = mz.reshape(rows // 2, 2, c)[:, 0]            # (b*y*z/2, C)
    # y pairs: adjacent y rows are size_z//2 apart now.
    my = jnp.maximum(a, _row_shift_up(a, size_z // 2))
    b2 = my.reshape(batch * size_y // 2, 2, (size_z // 2), c)[:, 0]
    o_ref[:, 0] = b2.reshape(batch, yz // 4, c).astype(o_ref.dtype)


def _pool_kernel_lanes(x_a, x_b, se_ref, so_ref, o_ref, *, fold: int,
                       r_in: int, size_y: int, zq: int):
    """Lane-dense pool: rows (b, y, zq), 128 lanes = (g z-slices, C).

    The strided impl round-trips (rows, C) arrays that Mosaic pads to 128
    lanes — 4x the nominal bytes at C=32.  Here the contiguous
    (Y, Z, C) plane is viewed as (Y*Z/g, 128) with g = 128//C z-slices per
    row, so every op is lane-dense:

    - x pairs: plain max of the two plane blocks;
    - z pairs: two constant 0/1 selection matmuls (exact value copies
      through the MXU — bf16 only) pick the even/odd z lane groups, then
      one max;
    - y pairs: row shift by zq (= Z//g rows) + max, keep even-y rows via a
      leading-dim split reshape.
    """
    m = jnp.maximum(x_a[:, 0], x_b[:, 0]).reshape(fold * r_in, 128)
    qa = jax.lax.dot_general(m, se_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    qb = jax.lax.dot_general(m, so_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mz = jnp.maximum(qa, qb)                          # (rows, 64)
    my = jnp.maximum(mz, _row_shift_up(mz, zq))
    keep = my.reshape(fold * size_y // 2, 2, zq, 64)[:, 0]
    o_ref[:, 0] = keep.reshape(fold, r_in // 2, 64).astype(o_ref.dtype)


def max_pool3d_2x(x: jnp.ndarray, interpret: bool = False,
                  impl: str = None) -> jnp.ndarray:
    """MaxPool3d(kernel=2, stride=2) over (B, X, Y, Z, C), all dims even.

    ``impl``: 'strided' (default; the round-2 f32 scratch path, verified
    on hardware), 'lanes' (128-lane-dense views, z pairs via exact
    selection matmuls — measured a TIE with strided standalone on v5e
    (1.96 vs 1.97 ms at b8 64^3x32) and SLOWER in-context because of the
    (b, x, r, 128) view relayouts at the kernel boundary; kept opt-in via
    LT_TPU_POOL_LANES=1) or 'reshape' (shift-max + split-reshape
    decimation, LT_TPU_POOL_RESHAPE=1).  The standalone op is ~4x off the
    measured 321 GB/s copy floor regardless of impl — the remaining cost
    is not lane padding.
    """
    import os

    b, size_x, size_y, size_z, c = x.shape
    assert size_x % 2 == 0 and size_y % 2 == 0 and size_z % 2 == 0, x.shape
    yz = size_y * size_z
    g = 128 // c if c in (32, 64) else 0
    lanes_ok = (g >= 2 and size_z % (2 * g) == 0
                and x.dtype == jnp.bfloat16)
    if impl is None:
        impl = ("lanes" if lanes_ok and os.environ.get("LT_TPU_POOL_LANES")
                else "reshape" if os.environ.get("LT_TPU_POOL_RESHAPE")
                else "strided")

    if impl == "lanes":
        assert lanes_ok or interpret, (x.shape, x.dtype)
        r_in = yz // g                         # 128-lane rows per x-plane
        zq = size_z // g                       # rows per y
        sel = np.zeros((2, 128, 64), np.float32)
        for p in range(g // 2):
            for i in range(c):
                sel[0, (2 * p) * c + i, p * c + i] = 1.0
                sel[1, (2 * p + 1) * c + i, p * c + i] = 1.0
        se = jnp.asarray(sel[0], x.dtype)
        so = jnp.asarray(sel[1], x.dtype)
        fold = b
        while fold > 1 and (fold * r_in * 128 * 16 > 48 * 1024 * 1024
                            or b % fold != 0):
            fold -= 1
        kernel = functools.partial(_pool_kernel_lanes, fold=fold, r_in=r_in,
                                   size_y=size_y, zq=zq)
        x3 = x.reshape(b, size_x, r_in, 128)
        out = pl.pallas_call(
            kernel,
            grid=(b // fold, size_x // 2),
            in_specs=[
                pl.BlockSpec((fold, 1, r_in, 128),
                             lambda g_, j: (g_, 2 * j, 0, 0)),
                pl.BlockSpec((fold, 1, r_in, 128),
                             lambda g_, j: (g_, 2 * j + 1, 0, 0)),
                pl.BlockSpec((128, 64), lambda g_, j: (0, 0)),
                pl.BlockSpec((128, 64), lambda g_, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((fold, 1, r_in // 2, 64),
                                   lambda g_, j: (g_, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (b, size_x // 2, r_in // 2, 64), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x3, x3, se, so)
        return out.reshape(b, size_x // 2, size_y // 2, size_z // 2, c)

    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    # VMEM scratches/blocks are lane-padded to 128 (a (M, 32) f32 scratch
    # occupies 4x its nominal bytes) — budget with the padded width.
    c_pad = ((c + 127) // 128) * 128
    fold = b
    while fold > 1 and (fold * yz * c_pad * 8 * itemsize > 40 * 1024 * 1024
                        or b % fold != 0):
        fold -= 1

    if impl == "reshape":
        kernel = functools.partial(_pool_kernel_reshape, batch=fold, yz=yz,
                                   size_y=size_y, size_z=size_z, c=c)
        scratch = []
    else:
        kernel = functools.partial(_pool_kernel, batch=fold, yz=yz,
                                   size_y=size_y, size_z=size_z, c=c)
        scratch = [
            pltpu.VMEM((fold * yz, c), jnp.float32),
            pltpu.VMEM((fold * size_y, size_z // 2, c), jnp.float32),
        ]
    x4 = x.reshape(b, size_x, yz, c)
    out = pl.pallas_call(
        kernel,
        grid=(b // fold, size_x // 2),
        in_specs=[
            pl.BlockSpec((fold, 1, yz, c), lambda g, j: (g, 2 * j, 0, 0)),
            pl.BlockSpec((fold, 1, yz, c),
                         lambda g, j: (g, 2 * j + 1, 0, 0)),
        ],
        out_specs=pl.BlockSpec((fold, 1, yz // 4, c),
                               lambda g, j: (g, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, size_x // 2, yz // 4, c),
                                       x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x4, x4)
    return out.reshape(b, size_x // 2, size_y // 2, size_z // 2, c)


def _upsample_kernel(x_ref, w_ref, b_ref, *rest, batch: int,
                     yz: int, size_y: int, size_z: int, cin: int,
                     cout: int, fuse_skip: bool):
    # Mosaic supports strided loads/stores only on refs, in f32, along a
    # single non-lane dim — so each 2x interleave is a pair of strided
    # stores into VMEM scratch (z pairs on a 2D view, y pairs on a 3D view
    # so the stride stays on a leading dim).  One matmul per (dx, dy, dz)
    # tap keeps everything else as plain values.
    if fuse_skip:
        skip_ref, o_ref, zb, yb = rest
    else:
        o_ref, zb, yb = rest
        skip_ref = None
    rows = batch * yz
    plane = x_ref[:, 0].reshape(rows, cin)

    def tap(t):
        q = jax.lax.dot_general(plane, w_ref[t], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.maximum(q + b_ref[t], 0.0)        # (rows, Cout) f32

    for dx in (0, 1):
        vs = []
        for dy in (0, 1):
            base = dx * 4 + dy * 2
            zb[::2] = tap(base)                      # z-interleave
            zb[1::2] = tap(base + 1)
            vs.append(zb[...].reshape(batch * size_y, 2 * size_z, cout))
        yb[::2] = vs[0]                              # y-interleave
        yb[1::2] = vs[1]
        out = yb[...].reshape(batch, 4 * yz, cout)
        if skip_ref is not None:
            # Residual skip-add fused after BN+ReLU (v2v.py:126-136: the
            # decoder's `x = up(x) + skip` — one less full-volume HBM pass).
            out = out + skip_ref[:, 0, dx].astype(jnp.float32)
        o_ref[:, 0, dx] = out.astype(o_ref.dtype)


def _upsample_kernel_lanes(x_ref, w_ref, b_ref, o_ref, *, fold: int,
                           size_y: int, zq: int):
    """Lane-dense 2x upsample: one dense(-ish) 128x128 matmul per (dx, dy).

    Input plane viewed as (Y*zq, 128) with lanes (zr, Cin); the packed
    weight for (dx, dy) maps lane (zr, ci) -> (2*zr + dz, co), so each
    output row is exactly one GEMM of the matching input row — dz lands in
    the output lane index.  The output block's (dx, y, dy, zq, lane) axes
    make the interleave a pure layout statement: o[:, 0, dx, :, dy] is the
    (y_out = 2y + dy)-comb of out x-plane 2j + dx, and the final reshape
    to (B, 2X, 2Y, 2Z, Cout) is contiguous.
    """
    rows = fold * size_y * zq
    plane = x_ref[:, 0].reshape(rows, 128)
    for dx in (0, 1):
        for dy in (0, 1):
            q = jax.lax.dot_general(
                plane, w_ref[2 * dx + dy], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            q = jnp.maximum(q + b_ref[0], 0.0)
            o_ref[:, 0, dx, :, dy] = q.astype(o_ref.dtype).reshape(
                fold, size_y, zq, 128)


def upsample3d_2x(x: jnp.ndarray, w8: jnp.ndarray, bias: jnp.ndarray,
                  interpret: bool = False, impl: str = None,
                  skip: jnp.ndarray = None) -> jnp.ndarray:
    """Fused ConvTranspose3d(2, 2) + folded BN + ReLU [+ skip add].

    Args:
      x: (B, X, Y, Z, Cin).
      w8: (Cin, 8*Cout) packed taps, column block (dx*4 + dy*2 + dz)*Cout
        (:func:`pack_upsample_weights`), BN scale pre-folded.
      bias: (8*Cout,) — conv bias + folded BN offset, tiled per tap block.
      skip: optional (B, 2X, 2Y, 2Z, Cout) residual added after the ReLU
        (the decoder's `up(x) + skip`, v2v.py:126-136), fused so the
        skip-add costs no extra HBM pass.

    Returns:
      (B, 2X, 2Y, 2Z, Cout) in x.dtype.
    """
    import os

    b, size_x, size_y, size_z, cin = x.shape
    cout = w8.shape[1] // 8
    yz = size_y * size_z
    if skip is not None:
        impl = "strided"  # skip fusion implemented on the default path

    # 'lanes' (one dense 128x128 matmul per (dx, dy)) measured SLOWER than
    # 'strided' on v5e (2.67 vs 2.17 ms at b8 32^3 64->32ch): the four
    # full-plane GEMM passes re-read the input and the (dx, dy)-interleaved
    # output block costs a strided write.  Kept opt-in (LT_TPU_UP_LANES=1).
    g_in = 128 // cin if cin in (32, 64, 128) else 0
    lanes_ok = (g_in >= 1 and cout * 2 * g_in == 128
                and size_z % max(g_in, 1) == 0
                and x.dtype == jnp.bfloat16)
    if impl is None:
        impl = ("lanes" if lanes_ok and os.environ.get("LT_TPU_UP_LANES")
                else "strided")

    if impl == "lanes":
        assert lanes_ok or interpret, (x.shape, x.dtype, cout)
        zq = size_z // g_in                     # 128-lane rows per y
        r_in = size_y * zq                      # rows per x-plane
        # (Cin, 8*Cout) tap columns (dx*4 + dy*2 + dz) -> per-(dx, dy)
        # (128, 128) lane maps: rows (zr, ci), cols (2*zr + dz, co).
        w_taps = w8.reshape(cin, 2, 2, 2, cout)
        w4 = np.zeros((4, 128, 128), np.float32)
        w4 = jnp.asarray(w4)
        for dx in (0, 1):
            for dy in (0, 1):
                for zr in range(g_in):
                    for dz in (0, 1):
                        w4 = w4.at[2 * dx + dy,
                                   zr * cin:(zr + 1) * cin,
                                   (2 * zr + dz) * cout:
                                   (2 * zr + dz + 1) * cout].set(
                                       w_taps[:, dx, dy, dz])
        # Same folded bias for every tap: tile Cout across the 128 lanes.
        b128 = jnp.tile(bias[:cout], 128 // cout).reshape(1, 128)
        fold = b
        while fold > 1 and (fold * r_in * 128 * 24 > 48 * 1024 * 1024
                            or b % fold != 0):
            fold -= 1
        kernel = functools.partial(_upsample_kernel_lanes, fold=fold,
                                   size_y=size_y, zq=zq)
        out = pl.pallas_call(
            kernel,
            grid=(b // fold, size_x),
            in_specs=[
                pl.BlockSpec((fold, 1, r_in, 128),
                             lambda g_, j: (g_, j, 0, 0)),
                pl.BlockSpec((4, 128, 128), lambda g_, j: (0, 0, 0)),
                pl.BlockSpec((1, 128), lambda g_, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (fold, 1, 2, size_y, 2, zq, 128),
                lambda g_, j: (g_, j, 0, 0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (b, size_x, 2, size_y, 2, zq, 128), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x.reshape(b, size_x, r_in, 128), w4.astype(x.dtype),
          b128.astype(jnp.float32))
        return out.reshape(b, 2 * size_x, 2 * size_y, 2 * size_z, cout)

    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    cin_pad = ((cin + 127) // 128) * 128
    cout_pad = ((cout + 127) // 128) * 128
    per_row = (cin_pad * itemsize + 8 * cout_pad * itemsize  # in/out blocks
               + 2 * cout_pad * 4 + 8 * cout_pad * 4) * 2    # zb + yb, x2
    fold = b
    while fold > 1 and (fold * yz * per_row > 48 * 1024 * 1024
                        or b % fold != 0):
        fold -= 1

    kernel = functools.partial(_upsample_kernel, batch=fold, yz=yz,
                               size_y=size_y, size_z=size_z, cin=cin,
                               cout=cout, fuse_skip=skip is not None)
    in_specs = [
        pl.BlockSpec((fold, 1, yz, cin), lambda g, j: (g, j, 0, 0)),
        pl.BlockSpec((8, cin, cout), lambda g, j: (0, 0, 0)),
        pl.BlockSpec((8, 1, cout), lambda g, j: (0, 0, 0)),
    ]
    operands = [x.reshape(b, size_x, yz, cin),
                w8.reshape(cin, 8, cout).transpose(1, 0, 2).astype(x.dtype),
                bias.reshape(8, 1, cout).astype(jnp.float32)]
    if skip is not None:
        in_specs.append(pl.BlockSpec((fold, 1, 2, 4 * yz, cout),
                                     lambda g, j: (g, j, 0, 0, 0)))
        operands.append(skip.reshape(b, size_x, 2, 4 * yz, cout))
    out = pl.pallas_call(
        kernel,
        grid=(b // fold, size_x),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((fold, 1, 2, 4 * yz, cout),
                               lambda g, j: (g, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, size_x, 2, 4 * yz, cout),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * fold * yz, cout), jnp.float32),
            pltpu.VMEM((2 * fold * size_y, 2 * size_z, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, 2 * size_x, 2 * size_y, 2 * size_z, cout)


def pack_upsample_weights(kernel: jnp.ndarray, conv_bias, scale, bn_bias,
                          mean, var, eps: float = 1e-5):
    """Fold BN into the flax Upsample3DBlock params and pack for the kernel.

    ``kernel``: (2, 2, 2, Cout, Cin) as declared by Upsample3DBlock (used
    with ``lax.conv_transpose(..., transpose_kernel=True)``).  For k=2,
    s=2, p=0 each output voxel (2x+dx, 2y+dy, 2z+dz) receives exactly
    in[x, y, z] * K[dx, dy, dz], so the packed matrix's (dx, dy, dz) column
    block is ``kernel[dx, dy, dz].T`` (Cin, Cout), scaled by the BN fold.
    """
    _, _, _, cout, cin = kernel.shape
    g = scale / jnp.sqrt(var + eps)
    cols = []
    bvals = []
    base = (conv_bias if conv_bias is not None
            else jnp.zeros((cout,), kernel.dtype))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cols.append(kernel[dx, dy, dz].T * g)    # (Cin, Cout)
                bvals.append((base - mean) * g + bn_bias)
    return jnp.concatenate(cols, axis=1), jnp.concatenate(bvals)
