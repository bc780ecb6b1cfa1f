"""Multi-plane Pallas TPU conv kernels: s input x-planes per MXU pass.

Functional parity targets: ``Basic3DBlock`` (/root/reference/mvn/models/
v2v.py:7-17, here the k=7 V2V front conv) and ``Res3DBlock`` (v2v.py:20-42),
inference only (training uses the autodiff XLA path).

Why s > 2
---------
The fused res3d kernel (ops/pallas/res3d.py) packs TWO x-planes per grid
step: its GEMM is (M, 18*Cin) @ (18*Cin, 4*Cout) — 576 x 128 at 32
channels.  Measured on v5e, MXU efficiency keeps rising well past that
shape: the same kernel structure at 64ch/128ch (K = 1152/2304, N = 256/512)
runs at 118/148 true TFLOP/s while the 32ch blocks sit at ~39 (see
benchmarks/profile_v2v_blocks.py).  Packing s planes per step scales the
32-channel GEMM to (M, s*9*C) @ (s*9*C, (s+2)*C) at density 3/(s+2):

    s=2:  576 x 128  @ 75% density   (the round-2 kernel)
    s=4: 1152 x 192  @ 50% density
    s=6: 1728 x 256  @ 37.5% density

Dense-rate growth beats the density loss up to s ~ 4-6 for C=32 (measured
by benchmarks/bench_conv_mp.py; the gate picks the sweep winner).  The same
packing applied to the k=7 front conv gives (M, s*49*Cin) @ (s*49*Cin,
(s+6)*Cout) — 3136 x 128 at s=2 with 87.5% density, vs the z-decomposed
XLA conv's 56 TF/s wall.

Schedule (one conv, kernel size k = 2h+1, plane offset off = (s - h % s) % s,
lag L = (off + h) / s, grid j = 0 .. X/s + L - 1):

  step j reads input planes  s*j - off .. s*j - off + s - 1   [zero-masked]
  q = taps @ packed-w:       contributions to output planes
                             base .. base + s + 2h - 1,  base = s*(j-L)
  finalize planes base + m (m < s)  =  q[:, m] + keep[m]     [keep: m < 2h]
  keep <- q[:, s + n] (+ old keep[s + n] if s + n < 2h),  n < 2h

The fused Res3D block chains two of these with conv2 lagging conv1 by one
step: conv2's s input y1 planes are (s-1) saved from the previous step's
finalize plus the first plane finalized this step.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lt_tpu.ops.pallas.conv3d import _row_shift_up


def pack_weights_mp(weights: jnp.ndarray, s: int) -> jnp.ndarray:
    """(k, k, k, Cin, Cout) -> (s*k*k*Cin, (s+2h)*Cout) multi-plane matrix.

    Row (dy, dz, pi, ci), column (ob, co): tap kx = pi - ob + 2h (zero
    when out of [0, k-1]); pi indexes the step's s input planes, ob its
    s + 2h output-plane contributions.  Row order matches the hierarchical
    tap tree of :func:`_taps_mp` (dy outermost).
    """
    k, _, _, cin, cout = weights.shape
    h = (k - 1) // 2
    assert k == 2 * h + 1, k
    nb = s + 2 * h
    w2 = jnp.zeros((k, k, s, cin, nb, cout), weights.dtype)
    for pi in range(s):
        for ob in range(nb):
            kx = pi - ob + 2 * h
            if 0 <= kx <= k - 1:
                # rows (dy, dz, ci) <- W[kx, ky=dy, kz=dz]
                w2 = w2.at[:, :, pi, :, ob, :].set(weights[kx])
    return w2.reshape(s * k * k * cin, nb * cout)


def _taps_mp(planes, *, k: int, size_y: int, size_z: int, rows: int,
             fold: int, split_dy: bool = False):
    """The s*k*k masked (dy, dz) taps of s planes, concatenated on lanes.

    Row r of a plane is (b, y, z) = (r // YZ, (r // Z) % Y, r % Z).  Built
    as a hierarchy — planes -> k dz bases -> k dy shifts — so every shift
    and mask moves a full-width lane-dense strip instead of one padded
    (rows, C) plane (Mosaic pads narrow arrays to 128 lanes).  Row order
    (dy, dz, pi, ci), matching :func:`pack_weights_mp`.

    With ``fold == 1`` the dy shifts cannot cross a batch boundary, so
    their zero-fill IS the y mask and only dz != 0 levels need a where.
    """
    h = (k - 1) // 2
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    z_of_r = r % size_z
    y_of_r = (r // size_z) % size_y
    pp = jnp.concatenate(list(planes), axis=-1)         # (rows, s*C)
    bases = []
    for dz in range(-h, h + 1):
        base = _row_shift_up(pp, dz)
        if dz != 0:
            z_ok = (z_of_r + dz >= 0) & (z_of_r + dz < size_z)
            base = jnp.where(z_ok, base, jnp.zeros_like(base))
        bases.append(base)
    dk = jnp.concatenate(bases, axis=-1)                # (rows, k*s*C)
    taps = []
    for dy in range(-h, h + 1):
        t = _row_shift_up(dk, dy * size_z)
        if fold != 1 and dy != 0:
            y_ok = (y_of_r + dy >= 0) & (y_of_r + dy < size_y)
            t = jnp.where(y_ok, t, jnp.zeros_like(t))
        taps.append(t)
    if split_dy:
        return taps                                     # k x (rows, k*s*C)
    return jnp.concatenate(taps, axis=-1)               # (rows, s*k*k*C)


def _dot(lhs, rhs):
    return jax.lax.dot_general(lhs, rhs, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _conv_mp_kernel(*refs, s: int, k: int, off: int, lag: int, batch: int,
                    size_x: int, yz: int, size_y: int, size_z: int,
                    cin: int, cout: int, relu: bool):
    """One grid step of the single multi-plane conv (k7 front path)."""
    h = (k - 1) // 2
    x_refs = refs[:s]
    w_ref, b_ref, o_ref, keep = refs[s:s + 4]
    j = pl.program_id(1)
    rows = batch * yz

    planes = []
    for pi in range(s):
        p = x_refs[pi][:, 0].reshape(rows, cin)
        plane_id = s * j + pi - off
        valid = jnp.logical_and(plane_id >= 0, plane_id <= size_x - 1)
        planes.append(jnp.where(valid, p, jnp.zeros_like(p)))

    import os

    if os.environ.get("LT_TPU_MP_DY_ACCUM"):
        # k dots of K = k*s*Cin accumulated, skipping the (rows, s*k*k*Cin)
        # tap concat (for k=7 that concat is 25 MB/step of VPU copies; the
        # per-chunk K=448 pads to 512, +14% MXU).
        strips = _taps_mp(planes, k=k, size_y=size_y, size_z=size_z,
                          rows=rows, fold=batch, split_dy=True)
        kc = k * s * cin
        q = _dot(strips[0], w_ref[0:kc, :])
        for i in range(1, k):
            q = q + _dot(strips[i], w_ref[kc * i:kc * (i + 1), :])
    else:
        q = _dot(_taps_mp(planes, k=k, size_y=size_y, size_z=size_z,
                          rows=rows, fold=batch),
                 w_ref[...])                    # (rows, (s+2h)*cout) f32

    keep_old = keep[...].astype(jnp.float32)
    keep_old = jnp.where(j == 0, jnp.zeros_like(keep_old), keep_old)

    @pl.when(j >= lag)
    def _():
        b = b_ref[0]
        for m in range(s):
            val = q[:, m * cout:(m + 1) * cout]
            if m < 2 * h:
                val = val + keep_old[:, m * cout:(m + 1) * cout]
            val = val + b
            if relu:
                val = jnp.maximum(val, 0.0)
            o_ref[:, 0, m] = val.astype(o_ref.dtype).reshape(
                batch, yz, cout)

    parts = []
    for n in range(2 * h):
        part = q[:, (s + n) * cout:(s + n + 1) * cout]
        if s + n < 2 * h:
            part = part + keep_old[:, (s + n) * cout:(s + n + 1) * cout]
        parts.append(part)
    keep[...] = jnp.concatenate(parts, axis=-1).astype(keep.dtype)


def conv3d_mp(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, *,
              s: int = 2, relu: bool = False, out_dtype=None,
              interpret: bool = False, force_fold: int = None):
    """Multi-plane fused conv3d (+bias [+ReLU]), same padding, odd k.

    Args:
      x: (B, X, Y, Z, Cin), X divisible by s.
      w: (k, k, k, Cin, Cout) — BN pre-folded for the Basic3D path.
      b: (Cout,).
    """
    bsz, size_x, size_y, size_z, cin = x.shape
    k = w.shape[0]
    h = (k - 1) // 2
    cout = w.shape[-1]
    assert size_x % s == 0, (size_x, s)
    yz = size_y * size_z
    off = (s - h % s) % s
    lag = (off + h) // s
    out_dtype = out_dtype or x.dtype

    wp = pack_weights_mp(w, s).astype(x.dtype)
    br = b.reshape(1, cout).astype(jnp.float32)

    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    nb = s + 2 * h
    per_row = (s * k * k * cin * itemsize          # taps
               + nb * cout * 4                     # q
               + 2 * h * cout * 4                  # keep
               + s * (cin + cout) * itemsize)      # in/out blocks
    budget = 56 * 1024 * 1024 * 2 // itemsize
    fold = force_fold if force_fold is not None else (
        1 if yz >= 4096 else bsz)
    assert bsz % fold == 0, (bsz, fold)
    while fold > 1 and (fold * yz * per_row > budget or bsz % fold != 0):
        fold -= 1
    groups = bsz // fold
    rows = fold * yz

    x4 = x.reshape(bsz, size_x, yz, cin)
    nxs = size_x // s

    in_specs = [
        pl.BlockSpec((fold, 1, yz, cin),
                     functools.partial(
                         lambda pi, g, j: (
                             g, jnp.clip(s * j + pi - off, 0, size_x - 1),
                             0, 0), pi))
        for pi in range(s)
    ]
    in_specs += [
        pl.BlockSpec((s * k * k * cin, nb * cout), lambda g, j: (0, 0)),
        pl.BlockSpec((1, cout), lambda g, j: (0, 0)),
    ]

    kernel = functools.partial(
        _conv_mp_kernel, s=s, k=k, off=off, lag=lag, batch=fold,
        size_x=size_x, yz=yz, size_y=size_y, size_z=size_z, cin=cin,
        cout=cout, relu=relu)

    out = pl.pallas_call(
        kernel,
        grid=(groups, nxs + lag),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (fold, 1, s, yz, cout),
            lambda g, j: (g, jnp.clip(j - lag, 0, nxs - 1), 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, nxs, s, yz, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, 2 * h * cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*([x4] * s + [wp, br]))

    return out.reshape(bsz, size_x, size_y, size_z, cout)


def _res3d_mp_kernel(*refs, s: int, batch: int, size_x: int, yz: int,
                     size_y: int, size_z: int, cin: int, c: int,
                     tail_relu: Tuple[bool, ...], out_c: int,
                     skip_proj: bool):
    """One grid step of the fused multi-plane Res3D block (k=3, h=1)."""
    rest = list(refs)
    x_refs = rest[:s]
    x_skip, w1_ref, w2_ref, b1_ref, b2_ref = rest[s:s + 5]
    rest = rest[s + 5:]
    if skip_proj:
        ws_ref, bs_ref = rest[:2]
        rest = rest[2:]
    n_tail = len(tail_relu)
    tail_refs = rest[:2 * n_tail]
    o_ref, keep1, keep2, hist = rest[2 * n_tail:]
    j = pl.program_id(1)
    rows = batch * yz
    off = s - 1        # k=3: off = (s - 1 % s) % s = s - 1
    nxs = size_x // s

    # ---- conv1 on input planes s*j - off .. s*j - off + s - 1 ----
    planes = []
    for pi in range(s):
        p = x_refs[pi][:, 0].reshape(rows, cin)
        plane_id = s * j + pi - off
        valid = jnp.logical_and(plane_id >= 0, plane_id <= size_x - 1)
        planes.append(jnp.where(valid, p, jnp.zeros_like(p)))
    q1 = _dot(_taps_mp(planes, k=3, size_y=size_y, size_z=size_z,
                       rows=rows, fold=batch),
              w1_ref[...])                          # (rows, (s+2)*c) f32

    # finalize y1 planes s*(j-1) + m (m < s): q1 + keep1 + BN1 + ReLU
    b1 = b1_ref[0]
    keep1_old = keep1[...].astype(jnp.float32)
    y1 = []
    for m in range(s):
        val = q1[:, m * c:(m + 1) * c]
        if m < 2:
            val = val + keep1_old[:, m * c:(m + 1) * c]
        y1.append(jnp.maximum(val + b1, 0.0))
    keep1[...] = jnp.concatenate(
        [q1[:, (s + n) * c:(s + n + 1) * c] for n in range(2)],
        axis=-1).astype(keep1.dtype)

    # ---- conv2 on y1 planes s*(j-1) - off .. s*(j-1) - off + s - 1 ----
    # = (s-1) planes saved from step j-1's finalize + this step's y1[0].
    dt = hist.dtype
    hist_old = hist[...]
    y1_planes = []
    for pi in range(s):
        plane_id = s * (j - 1) + pi - off
        if pi < s - 1:
            p = hist_old[:, pi * c:(pi + 1) * c]
        else:
            p = y1[0].astype(dt)
        valid = jnp.logical_and(plane_id >= 0, plane_id <= size_x - 1)
        y1_planes.append(jnp.where(valid, p, jnp.zeros((rows, c), dt)))
    if s > 1:
        hist[...] = jnp.concatenate(
            [y1[m].astype(dt) for m in range(1, s)], axis=-1)
    q2 = _dot(_taps_mp(y1_planes, k=3, size_y=size_y, size_z=size_z,
                       rows=rows, fold=batch),
              w2_ref[...])

    # finalize y2 planes s*(j-2) + m: q2 + keep2 + BN2 + skip + ReLU [+tail]
    keep2_old = keep2[...].astype(jnp.float32)

    @pl.when(j >= 2)
    def _():
        b2 = b2_ref[0]
        for m in range(s):
            sk = x_skip[:, 0, m].reshape(rows, cin)
            if skip_proj:
                sk = _dot(sk.astype(ws_ref.dtype), ws_ref[...]) + bs_ref[0]
            else:
                sk = sk.astype(jnp.float32)
            val = q2[:, m * c:(m + 1) * c]
            if m < 2:
                val = val + keep2_old[:, m * c:(m + 1) * c]
            out = jnp.maximum(val + b2 + sk, 0.0)
            for i, relu_t in enumerate(tail_relu):
                wt = tail_refs[2 * i][...]
                bt = tail_refs[2 * i + 1][0]
                out = _dot(out.astype(wt.dtype), wt) + bt
                if relu_t:
                    out = jnp.maximum(out, 0.0)
            o_ref[:, 0, m] = out.astype(o_ref.dtype).reshape(
                batch, yz, out_c)

    keep2[...] = jnp.concatenate(
        [q2[:, (s + n) * c:(s + n + 1) * c] for n in range(2)],
        axis=-1).astype(keep2.dtype)


def res3d_block_mp(
        x: jnp.ndarray,
        w1: jnp.ndarray, b1: jnp.ndarray,
        w2: jnp.ndarray, b2: jnp.ndarray,
        skip_proj=None,
        tail: Sequence[Tuple[jnp.ndarray, jnp.ndarray, bool]] = (),
        s: int = 4, out_dtype=None, interpret: bool = False,
        force_fold: int = None) -> jnp.ndarray:
    """Fused Res3DBlock, s input planes per grid step (see module doc).

    Same contract as :func:`lt_tpu.ops.pallas.res3d.res3d_block_fused`
    (BN pre-folded weights, optional projection skip, optional per-voxel
    matmul tail), with X divisible by s.
    """
    b, size_x, size_y, size_z, cin = x.shape
    assert size_x % s == 0, (size_x, s)
    yz = size_y * size_z
    c = w1.shape[-1]
    assert skip_proj is not None or cin == c, (cin, c)
    out_c = tail[-1][0].shape[-1] if tail else c
    out_dtype = out_dtype or x.dtype
    nb = s + 2

    w1p = pack_weights_mp(w1, s).astype(x.dtype)
    w2p = pack_weights_mp(w2, s).astype(x.dtype)
    b1r = b1.reshape(1, c).astype(jnp.float32)
    b2r = b2.reshape(1, c).astype(jnp.float32)

    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    per_row = ((s * 9 * c * itemsize + nb * c * 4) * 2   # taps + q, 2 convs
               + 4 * c * 4                               # keeps
               + (s - 1) * c * itemsize                  # history
               + s * (cin + out_c) * itemsize)           # in/out blocks
    budget = 56 * 1024 * 1024 * 2 // itemsize
    fold = force_fold if force_fold is not None else (
        1 if yz >= 4096 else b)
    assert b % fold == 0, (b, fold)
    while fold > 1 and (fold * yz * per_row > budget or b % fold != 0):
        fold -= 1
    groups = b // fold
    rows = fold * yz
    nxs = size_x // s
    off = s - 1

    x4 = x.reshape(b, size_x, yz, cin)
    x5 = x.reshape(b, nxs, s, yz, cin)

    in_specs = [
        pl.BlockSpec((fold, 1, yz, cin),
                     functools.partial(
                         lambda pi, g, j: (
                             g, jnp.clip(s * j + pi - off, 0, size_x - 1),
                             0, 0), pi))
        for pi in range(s)
    ]
    in_specs += [
        # skip planes: s-plane block j-2 (clamped)
        pl.BlockSpec((fold, 1, s, yz, cin),
                     lambda g, j: (g, jnp.clip(j - 2, 0, nxs - 1), 0, 0, 0)),
        pl.BlockSpec((s * 9 * cin, nb * c), lambda g, j: (0, 0)),
        pl.BlockSpec((s * 9 * c, nb * c), lambda g, j: (0, 0)),
        pl.BlockSpec((1, c), lambda g, j: (0, 0)),
        pl.BlockSpec((1, c), lambda g, j: (0, 0)),
    ]
    operands = [x4] * s + [x5, w1p, w2p, b1r, b2r]

    if skip_proj is not None:
        ws, bs = skip_proj
        operands += [ws.astype(x.dtype),
                     bs.reshape(1, c).astype(jnp.float32)]
        in_specs += [
            pl.BlockSpec((cin, c), lambda g, j: (0, 0)),
            pl.BlockSpec((1, c), lambda g, j: (0, 0)),
        ]

    for (wt, bt, _relu_t) in tail:
        ci, co = wt.shape
        operands += [wt.astype(x.dtype),
                     bt.reshape(1, co).astype(jnp.float32)]
        in_specs += [
            pl.BlockSpec((ci, co), lambda g, j: (0, 0)),
            pl.BlockSpec((1, co), lambda g, j: (0, 0)),
        ]

    kernel = functools.partial(
        _res3d_mp_kernel, s=s, batch=fold, size_x=size_x, yz=yz,
        size_y=size_y, size_z=size_z, cin=cin, c=c,
        tail_relu=tuple(bool(t[2]) for t in tail),
        out_c=out_c, skip_proj=skip_proj is not None)

    out = pl.pallas_call(
        kernel,
        grid=(groups, nxs + 2),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (fold, 1, s, yz, out_c),
            lambda g, j: (g, jnp.clip(j - 2, 0, nxs - 1), 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nxs, s, yz, out_c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, 2 * c), jnp.float32),       # conv1 keep
            pltpu.VMEM((rows, 2 * c), jnp.float32),       # conv2 keep
            pltpu.VMEM((rows, max(s - 1, 1) * c), x.dtype),  # y1 history
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)

    return out.reshape(b, size_x, size_y, size_z, out_c)
