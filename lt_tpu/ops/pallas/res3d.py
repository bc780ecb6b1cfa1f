"""Fused Pallas TPU kernel: one whole V2V Res3DBlock per pass.

Functional parity target: ``Res3DBlock`` of /root/reference/mvn/models/
v2v.py:20-42 (two 3x3x3 convs + BN + ReLU with identity skip), plus an
optional fused tail of 1x1x1 convs (``Basic3DBlock`` k=1, v2v.py:7-17, and
the V2V output conv) applied at the finalize step.

Why one kernel per block
------------------------
The five 32-channel Res3D blocks at 64^3 are ~60% of V2V's inference time
(benchmarks/profile_v2v_blocks.py: 16.5 ms each under XLA at batch 8).
XLA's conv3d fills only 32 of the MXU's 128 output lanes, and round 1
showed per-conv Pallas calls lose their standalone win to layout
conversions at every pallas<->XLA boundary.  This kernel:

- processes TWO input x-planes per grid step ("s=2 multi-plane"): the
  matmul becomes (M, 18*Cin) @ (18*Cin, 4*Cout) — 576x128 for 32
  channels — a far better MXU shape than the per-plane
  (M, 288) @ (288, 96) decomposition (measured shape table in ROADMAP.md),
  at 75% useful density;
- chains BOTH convs of the block inside the kernel with a two-plane lag,
  so the intermediate activation never touches HBM and there are no
  XLA boundaries between the convs;
- folds inference BatchNorm into the weights, applies ReLUs and the
  identity skip at finalize, and optionally runs a tail of per-voxel
  (1x1x1 conv + bias [+ ReLU]) matmuls on the finalized planes.

Rolling schedule (X = depth, steps j = 0 .. X/2+1):

  step j reads input planes (2j-1, 2j)          [zeroed outside 0..X-1]
  conv1 finalizes y1 planes (2j-2, 2j-1) = prevQ1[,2C:4C] + curQ1[,0:2C]
  conv2 consumes y1 pair (2j-3, 2j-2), finalizes y2 planes (2j-4, 2j-3)
  output block j-2 <- tail(relu(y2 + b2 + skip))        [written j >= 2]

Inference-only by design; training keeps the XLA conv path (autodiff).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from lt_tpu.ops.pallas.conv3d import _row_shift_up  # noqa: E402  shared helper


def pack_weights_s2(weights: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) -> (18*Cin, 4*Cout) for the s=2 plane-pair matmul.

    Row (dy, dz, pi, ci), column (ob, co): the weight tap with
    dx = pi - ob + 1 (kx = dx + 1), zero when |dx| > 1.  pi indexes the
    step's two input planes (2j-1, 2j); ob indexes its four output-plane
    contributions (2j-2 .. 2j+1).  The row order matches the hierarchical
    tap tree of :func:`_taps_pair` (dy outermost).
    """
    k, _, _, cin, cout = weights.shape
    assert k == 3, k
    w2 = jnp.zeros((3, 3, 2, cin, 4, cout), weights.dtype)
    for pi in range(2):
        for ob in range(4):
            kx = pi - ob + 2
            if 0 <= kx <= 2:
                # rows (dy, dz, ci) <- W[kx, ky=dy, kz=dz]
                w2 = w2.at[:, :, pi, :, ob, :].set(weights[kx])
    return w2.reshape(18 * cin, 4 * cout)


def _taps_pair(p0, p1, *, size_y: int, size_z: int, rows: int,
               fold: int = 0, split_dy: bool = False):
    """The 18 masked (dy, dz) taps of a plane pair, concatenated on lanes.

    Row r of a plane is (b, y, z) = (r // YZ, (r // Z) % Y, r % Z); shifts
    that wrap across batch/y boundaries are exactly where the masks zero.

    Built as a hierarchy — pair -> 3 dz bases -> 3 dy shifts — so every
    shift/mask op moves a full-width strip instead of one 32-lane plane:
    Mosaic pads narrow arrays to 128 lanes, so 18 separate (rows, C) shifts
    cost ~4x their nominal bytes while the tree's wide intermediates are
    lane-dense.  Row order (dy, dz, pi, ci), matching
    :func:`pack_weights_s2`.

    With ``fold == 1`` (one batch sample per step) the dy shifts cannot
    cross a batch boundary, so their zero-fill IS the y mask and only the
    dz != 0 levels need a where.

    ``split_dy=True`` returns the 3 per-dy strips (rows, 6C) unconcatenated
    so the caller can accumulate three K=6C dots instead of one K=18C dot —
    skipping the materialization of the (rows, 18C) concat.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    z_of_r = r % size_z
    y_of_r = (r // size_z) % size_y
    pp = jnp.concatenate([p0, p1], axis=-1)               # (rows, 2C)
    bases = []
    for dz in (-1, 0, 1):
        base = _row_shift_up(pp, dz)
        if dz != 0:
            z_ok = (z_of_r + dz >= 0) & (z_of_r + dz < size_z)
            base = jnp.where(z_ok, base, jnp.zeros_like(base))
        bases.append(base)
    d3 = jnp.concatenate(bases, axis=-1)                  # (rows, 6C)
    taps = []
    for dy in (-1, 0, 1):
        t = _row_shift_up(d3, dy * size_z)                # vreg-aligned
        if fold != 1 and dy != 0:
            y_ok = (y_of_r + dy >= 0) & (y_of_r + dy < size_y)
            t = jnp.where(y_ok, t, jnp.zeros_like(t))
        taps.append(t)
    if split_dy:
        return taps
    return jnp.concatenate(taps, axis=-1)                 # (rows, 18*C)


def _res3d_kernel(x_a, x_b, x_skip, w1_ref, w2_ref, b1_ref, b2_ref,
                  *rest, batch: int, size_x: int, yz: int, size_y: int,
                  size_z: int, cin: int, c: int,
                  tail_relu: Tuple[bool, ...], out_c: int,
                  skip_proj: bool):
    """One s=2 grid step of the fused Res3D block (see module docstring)."""
    n_tail = len(tail_relu)
    rest = list(rest)
    if skip_proj:
        ws_ref, bs_ref = rest[:2]
        rest = rest[2:]
    tail_refs = rest[:2 * n_tail]
    o_ref, q1k, q2k, r1p = rest[2 * n_tail:]
    j = pl.program_id(1)
    rows = batch * yz
    half = size_x // 2

    def dot(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ---- conv1 on input planes (2j-1, 2j) ----
    p0 = x_a[:, 0].reshape(rows, cin)
    p1 = x_b[:, 0].reshape(rows, cin)
    p0 = jnp.where(jnp.logical_or(j == 0, j == half + 1),
                   jnp.zeros_like(p0), p0)          # plane 2j-1 out of range
    p1 = jnp.where(j >= half, jnp.zeros_like(p1), p1)        # plane 2j
    q1 = dot(_taps_pair(p0, p1, size_y=size_y, size_z=size_z, rows=rows,
                        fold=batch),
             w1_ref[...])                                    # (rows, 4C) f32

    # finalize y1 planes (2j-2, 2j-1), fused BN1 (folded) + ReLU
    b1 = b1_ref[0]
    y1_a = jnp.maximum(q1k[:, 0:c].astype(jnp.float32) + q1[:, 0:c] + b1, 0.0)
    y1_b = jnp.maximum(q1k[:, c:2 * c].astype(jnp.float32) + q1[:, c:2 * c]
                       + b1, 0.0)
    q1k[...] = q1[:, 2 * c:4 * c].astype(q1k.dtype)

    # ---- conv2 on y1 planes (2j-3, 2j-2) ----
    dt = r1p.dtype
    r0 = r1p[...]                                   # y1 plane 2j-3 (saved)
    r0 = jnp.where(j < 2, jnp.zeros_like(r0), r0)
    r1 = jnp.where(jnp.logical_or(j < 1, j == half + 1),
                   jnp.zeros((rows, c), dt), y1_a.astype(dt))  # plane 2j-2
    r1p[...] = y1_b.astype(dt)                      # save plane 2j-1
    q2 = dot(_taps_pair(r0, r1, size_y=size_y, size_z=size_z, rows=rows,
                        fold=batch),
             w2_ref[...])

    # finalize y2 planes (2j-4, 2j-3): BN2 (folded) + skip + ReLU
    @pl.when(j >= 2)
    def _():
        b2 = b2_ref[0]
        sk_a = x_skip[:, 0, 0].reshape(rows, cin)
        sk_b = x_skip[:, 0, 1].reshape(rows, cin)
        if skip_proj:
            # 1x1x1 projection skip + folded skip-BN (v2v.py:29-37).
            ws = ws_ref[...]
            bs = bs_ref[0]
            sk_a = dot(sk_a.astype(ws.dtype), ws) + bs
            sk_b = dot(sk_b.astype(ws.dtype), ws) + bs
        else:
            sk_a = sk_a.astype(jnp.float32)
            sk_b = sk_b.astype(jnp.float32)
        out_a = jnp.maximum(q2k[:, 0:c].astype(jnp.float32) + q2[:, 0:c]
                            + b2 + sk_a, 0.0)
        out_b = jnp.maximum(q2k[:, c:2 * c].astype(jnp.float32)
                            + q2[:, c:2 * c] + b2 + sk_b, 0.0)
        for i, relu_t in enumerate(tail_relu):
            wt = tail_refs[2 * i][...]
            bt = tail_refs[2 * i + 1][0]
            out_a = dot(out_a.astype(wt.dtype), wt) + bt
            out_b = dot(out_b.astype(wt.dtype), wt) + bt
            if relu_t:
                out_a = jnp.maximum(out_a, 0.0)
                out_b = jnp.maximum(out_b, 0.0)
        o_ref[:, 0, 0] = out_a.astype(o_ref.dtype).reshape(batch, yz, out_c)
        o_ref[:, 0, 1] = out_b.astype(o_ref.dtype).reshape(batch, yz, out_c)

    q2k[...] = q2[:, 2 * c:4 * c].astype(q2k.dtype)


def _res3d_kernel_m2(x_a0, x_a1, x_b0, x_b1, x_skip, w1_ref, w2_ref,
                     b1_ref, b2_ref, *rest, batch: int, size_x: int,
                     yz: int, size_y: int, size_z: int, cin: int, c: int,
                     tail_relu: Tuple[bool, ...], out_c: int,
                     skip_proj: bool, dy_accum: bool = False,
                     emit_pooled: bool = False):
    """Two plane-pairs per grid step: pair A = (4J-1, 4J), B = (4J+1,
    4J+2); finalizes a complete quad (4J-4 .. 4J-1) per step.  Halves the
    step count, the keep-buffer round trips and the finalize overhead per
    plane vs :func:`_res3d_kernel`; grid = X/4 + 1.

    ``emit_pooled``: also writes MaxPool3d(2)(x) as a second output — the
    V2V encoder pools the SAME tensor the skip block consumes
    (v2v.py:73-84: ``skipN = skip_res(x); x = pool(x)``), and the input
    quad is already resident as the skip block, so the pooled planes cost
    two in-VMEM pair-max + decimation passes instead of a separate kernel
    launch re-reading the full volume from HBM.
    """
    n_tail = len(tail_relu)
    rest = list(rest)
    if skip_proj:
        ws_ref, bs_ref = rest[:2]
        rest = rest[2:]
    tail_refs = rest[:2 * n_tail]
    if emit_pooled:
        o_ref, po_ref, q1k, q2k, r1p = rest[2 * n_tail:]
    else:
        o_ref, q1k, q2k, r1p = rest[2 * n_tail:]
    j = pl.program_id(1)
    rows = batch * yz
    nq = size_x // 4

    def dot(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def conv_pair(p0, p1, w_ref, ch):
        """Tap tree + GEMM for one plane pair against one weight ref.

        ``dy_accum``: three K=6C dots accumulated instead of one K=18C dot
        — the (rows, 18C) tap concat is never materialized (one less
        full-width VPU copy level per pair).
        """
        strips = _taps_pair(p0, p1, size_y=size_y, size_z=size_z,
                            rows=rows, fold=batch, split_dy=dy_accum)
        if not dy_accum:
            return dot(strips, w_ref[...])
        acc = dot(strips[0], w_ref[0:6 * ch, :])
        for i in (1, 2):
            acc = acc + dot(strips[i], w_ref[6 * ch * i:6 * ch * (i + 1), :])
        return acc

    # ---- conv1 on pairs A = (4J-1, 4J), B = (4J+1, 4J+2) ----
    pA0 = x_a0[:, 0].reshape(rows, cin)
    pA1 = x_a1[:, 0].reshape(rows, cin)
    pB0 = x_b0[:, 0].reshape(rows, cin)
    pB1 = x_b1[:, 0].reshape(rows, cin)
    pA0 = jnp.where(j == 0, jnp.zeros_like(pA0), pA0)       # plane 4J-1
    drain = j >= nq
    pA1 = jnp.where(drain, jnp.zeros_like(pA1), pA1)        # plane 4J
    pB0 = jnp.where(drain, jnp.zeros_like(pB0), pB0)        # plane 4J+1
    pB1 = jnp.where(drain, jnp.zeros_like(pB1), pB1)        # plane 4J+2
    q1a = conv_pair(pA0, pA1, w1_ref, cin)                  # (rows, 4C) f32
    q1b = conv_pair(pB0, pB1, w1_ref, cin)

    # finalize y1 planes (4J-2 .. 4J+1): keep + cross-pair sums + BN1 + ReLU
    b1 = b1_ref[0]
    k1 = q1k[...].astype(jnp.float32)
    k1 = jnp.where(j == 0, jnp.zeros_like(k1), k1)
    y1 = [
        jnp.maximum(k1[:, 0:c] + q1a[:, 0:c] + b1, 0.0),            # 4J-2
        jnp.maximum(k1[:, c:2 * c] + q1a[:, c:2 * c] + b1, 0.0),    # 4J-1
        jnp.maximum(q1a[:, 2 * c:3 * c] + q1b[:, 0:c] + b1, 0.0),   # 4J
        jnp.maximum(q1a[:, 3 * c:4 * c] + q1b[:, c:2 * c] + b1,
                    0.0),                                           # 4J+1
    ]
    q1k[...] = q1b[:, 2 * c:4 * c].astype(q1k.dtype)

    # ---- conv2 on y1 pairs A = (4J-3, 4J-2), B = (4J-1, 4J) ----
    dt = r1p.dtype
    r0a = r1p[...]                                  # y1 plane 4J-3 (saved)
    r0a = jnp.where(j < 1, jnp.zeros_like(r0a), r0a)
    r1a = jnp.where(j < 1, jnp.zeros((rows, c), dt), y1[0].astype(dt))
    r0b = jnp.where(j < 1, jnp.zeros((rows, c), dt), y1[1].astype(dt))
    r1b = jnp.where(drain, jnp.zeros((rows, c), dt), y1[2].astype(dt))
    r1p[...] = y1[3].astype(dt)                     # save plane 4J+1
    q2a = conv_pair(r0a, r1a, w2_ref, c)
    q2b = conv_pair(r0b, r1b, w2_ref, c)

    # finalize y2 quad (4J-4 .. 4J-1): BN2 (folded) + skip + ReLU [+ tail]
    @pl.when(j >= 1)
    def _():
        b2 = b2_ref[0]
        k2 = q2k[...].astype(jnp.float32)
        vals = [
            k2[:, 0:c] + q2a[:, 0:c],                       # 4J-4
            k2[:, c:2 * c] + q2a[:, c:2 * c],               # 4J-3
            q2a[:, 2 * c:3 * c] + q2b[:, 0:c],              # 4J-2
            q2a[:, 3 * c:4 * c] + q2b[:, c:2 * c],          # 4J-1
        ]
        for m in range(4):
            sk = x_skip[:, 0, m].reshape(rows, cin)
            if skip_proj:
                sk = dot(sk.astype(ws_ref.dtype), ws_ref[...]) + bs_ref[0]
            else:
                sk = sk.astype(jnp.float32)
            out = jnp.maximum(vals[m] + b2 + sk, 0.0)
            for i, relu_t in enumerate(tail_relu):
                wt = tail_refs[2 * i][...]
                bt = tail_refs[2 * i + 1][0]
                out = dot(out.astype(wt.dtype), wt) + bt
                if relu_t:
                    out = jnp.maximum(out, 0.0)
            o_ref[:, 0, m] = out.astype(o_ref.dtype).reshape(
                batch, yz, out_c)

        if emit_pooled:
            # MaxPool3d(2) of the input quad (pair-max + split-reshape
            # decimation, see updown._pool_kernel_reshape): pooled out
            # planes (2(J-1), 2(J-1)+1).
            for m in (0, 1):
                pa = x_skip[:, 0, 2 * m].reshape(rows, cin)
                pb = x_skip[:, 0, 2 * m + 1].reshape(rows, cin)
                mx = jnp.maximum(pa, pb)
                mz = jnp.maximum(mx, _row_shift_up(mx, 1))
                a2 = mz.reshape(rows // 2, 2, cin)[:, 0]
                my = jnp.maximum(a2, _row_shift_up(a2, size_z // 2))
                b4 = my.reshape(batch * size_y // 2, 2, size_z // 2,
                                cin)[:, 0]
                po_ref[:, 0, m] = b4.reshape(batch, yz // 4,
                                             cin).astype(po_ref.dtype)

    q2k[...] = q2b[:, 2 * c:4 * c].astype(q2k.dtype)


def _m2_step(ji, w4, scr3, pA0, pA1, pB0, pB1, skip_get, *, nq: int,
             c: int, rows: int, size_y: int, size_z: int, fold: int):
    """One identity-skip Res3D block's m2 step on pre-masked plane values.

    Shared by the chain kernels (:func:`_res3d_kernel_m2_chain`,
    :func:`_ups_res3d_kernel`): conv1 over the (pA, pB) plane pairs with
    the q1 keep carry, conv2 over the ReLU'd pair with the q2 keep carry,
    finalize quad ``ji - 1`` as relu(vals + b2 + skip).  Returns the
    4 x (rows, c) f32 post-ReLU quad — garbage when ji < 1, masked by the
    consumer's plane-id checks.
    """
    w1_ref, w2_ref, b1_ref, b2_ref = w4
    q1k, q2k, r1p = scr3

    def dot(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def conv_pair(p0, p1, w_ref):
        return dot(_taps_pair(p0, p1, size_y=size_y, size_z=size_z,
                              rows=rows, fold=fold), w_ref[...])

    def zif(cond, v):
        return jnp.where(cond, jnp.zeros_like(v), v)

    q1a = conv_pair(pA0, pA1, w1_ref)
    q1b = conv_pair(pB0, pB1, w1_ref)
    b1 = b1_ref[0]
    k1 = q1k[...].astype(jnp.float32)
    k1 = zif(ji <= 0, k1)
    y1 = [
        jnp.maximum(k1[:, 0:c] + q1a[:, 0:c] + b1, 0.0),
        jnp.maximum(k1[:, c:2 * c] + q1a[:, c:2 * c] + b1, 0.0),
        jnp.maximum(q1a[:, 2 * c:3 * c] + q1b[:, 0:c] + b1, 0.0),
        jnp.maximum(q1a[:, 3 * c:4 * c] + q1b[:, c:2 * c] + b1, 0.0),
    ]
    q1k[...] = q1b[:, 2 * c:4 * c].astype(q1k.dtype)

    dt = r1p.dtype
    r0a = zif(ji < 1, r1p[...])
    r1a = zif(ji < 1, y1[0]).astype(dt)
    r0b = zif(ji < 1, y1[1]).astype(dt)
    r1b = zif(ji >= nq, y1[2]).astype(dt)
    r1p[...] = y1[3].astype(dt)
    q2a = conv_pair(r0a, r1a, w2_ref)
    q2b = conv_pair(r0b, r1b, w2_ref)

    b2 = b2_ref[0]
    k2 = q2k[...].astype(jnp.float32)
    k2 = zif(ji <= 0, k2)
    vals = [
        k2[:, 0:c] + q2a[:, 0:c],
        k2[:, c:2 * c] + q2a[:, c:2 * c],
        q2a[:, 2 * c:3 * c] + q2b[:, 0:c],
        q2a[:, 3 * c:4 * c] + q2b[:, c:2 * c],
    ]
    q2k[...] = q2b[:, 2 * c:4 * c].astype(q2k.dtype)
    return [jnp.maximum(vals[m] + b2 + skip_get(m), 0.0)
            for m in range(4)]


def _res3d_kernel_m2_chain(x_a0, x_a1, x_b0, x_b1, x_skip, *rest,
                           n_blocks: int, batch: int, size_x: int, yz: int,
                           size_y: int, size_z: int, c: int,
                           emit_pooled: bool = False, cin: int = None,
                           first_proj: bool = False):
    """K identity-skip Res3D blocks chained in ONE kernel (m2 schedule).

    Block i runs the m2 schedule shifted by i grid steps: its conv
    consumes block i-1's quad finalized THIS step (still in registers)
    plus a one-step history buffer that doubles as its skip source — the
    inter-block volume never round-trips HBM (VERDICT r3 ask #1; target
    semantics /root/reference/mvn/models/v2v.py:20-42 applied to the V2V
    front section's consecutive 32-channel blocks).

    Per block i: local step ji = j - i; conv1 reads input planes
    4*ji-1 .. 4*ji+2 (block 0 from the HBM refs, block i>=1 from
    [hist_quad_i[3], prev_quad[0:3]]), finalize covers its output quad
    ji-1; hist_quad_i <- prev block's current quad at step end (it holds
    the skip quad AND next step's pA0).  Only block K-1 writes the output
    (quad j - K, valid j >= K); grid = X/4 + K.
    """
    cin = c if cin is None else cin
    rest = list(rest)
    w_refs = rest[:4 * n_blocks]
    idx = 4 * n_blocks
    if first_proj:
        ws_ref, bs_ref = rest[idx:idx + 2]
        idx += 2
    if emit_pooled:
        o_ref, po_ref = rest[idx:idx + 2]
        scr = rest[idx + 2:]
    else:
        o_ref = rest[idx]
        scr = rest[idx + 1:]
    j = pl.program_id(1)
    rows = batch * yz
    nq = size_x // 4

    def dot(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def conv_pair(p0, p1, w_ref):
        return dot(_taps_pair(p0, p1, size_y=size_y, size_z=size_z,
                              rows=rows, fold=batch), w_ref[...])

    def zif(cond, v):
        return jnp.where(cond, jnp.zeros_like(v), v)

    def block_step(i, pA0, pA1, pB0, pB1, skip_get):
        """One block's m2 step on pre-masked planes; returns the finalized
        quad (4 x (rows, c) f32, post-ReLU) — garbage when ji < 1, masked
        by the consumer's plane-id checks."""
        return _m2_step(j - i, w_refs[4 * i:4 * i + 4],
                        scr[3 * i:3 * i + 3], pA0, pA1, pB0, pB1, skip_get,
                        nq=nq, c=c, rows=rows, size_y=size_y,
                        size_z=size_z, fold=batch)

    # Block 0: inputs/skip from the HBM refs (width cin; proj skip when
    # the chain starts at a width-changing block, e.g. V2V front_res1).
    def skip0(m):
        sk = x_skip[:, 0, m].reshape(rows, cin)
        if first_proj:
            return dot(sk.astype(ws_ref.dtype), ws_ref[...]) + bs_ref[0]
        return sk.astype(jnp.float32)

    pA0 = zif(j == 0, x_a0[:, 0].reshape(rows, cin))
    drain0 = j >= nq
    pA1 = zif(drain0, x_a1[:, 0].reshape(rows, cin))
    pB0 = zif(drain0, x_b0[:, 0].reshape(rows, cin))
    pB1 = zif(drain0, x_b1[:, 0].reshape(rows, cin))
    quad = block_step(0, pA0, pA1, pB0, pB1, skip0)

    prev_quad = None
    for i in range(1, n_blocks):
        hq = scr[3 * n_blocks + (i - 1)]
        ji = j - i
        if i == n_blocks - 1:
            prev_quad = quad  # last block's input quad (local step j-K+1)
        hist = hq[...]                                   # quad ji-1
        pA0 = zif(jnp.logical_or(ji < 1, ji > nq),
                  hist[:, 3 * c:4 * c])                  # plane 4*ji-1
        drain = jnp.logical_or(ji < 0, ji >= nq)
        dt = hq.dtype
        pA1 = zif(drain, quad[0]).astype(dt)
        pB0 = zif(drain, quad[1]).astype(dt)
        pB1 = zif(drain, quad[2]).astype(dt)
        new_hist = jnp.concatenate(quad, axis=-1).astype(dt)
        quad = block_step(i, pA0, pA1, pB0, pB1,
                          lambda m, h=hist: h[:, m * c:(m + 1) * c]
                          .astype(jnp.float32))
        hq[...] = new_hist

    @pl.when(j >= n_blocks)
    def _():
        for m in range(4):
            o_ref[:, 0, m] = quad[m].astype(o_ref.dtype).reshape(
                batch, yz, c)

    if emit_pooled:
        # MaxPool3d(2) of the LAST block's input quad — the V2V encoder
        # pools the same tensor its skip block consumes (v2v.py:104-105:
        # ``skip_x1 = skip_res1(x); x = pool1(x)``).  Block K-2 finalizes
        # that quad (local step j-K+1) THIS step, so pool it from the
        # fresh post-ReLU values (clean zero-offset layouts — lane slices
        # of the hist buffer fail Mosaic relayout in the row shifts)
        # one grid step before o_ref's write of the same quad.  Pair-max
        # + split-reshape decimation as in :func:`_res3d_kernel_m2`;
        # pooled out planes (2q, 2q+1) for quad q = j - (K-1).
        assert prev_quad is not None, "emit_pooled chain needs >= 2 blocks"
        pool_scr = scr[4 * n_blocks - 1:]

        @pl.when(jnp.logical_and(j >= n_blocks - 1,
                                 j <= nq + n_blocks - 2))
        def _():
            for m in (0, 1):
                # Stage the x-pair max through scratch: the quad values
                # are lane-offset slices of the (rows, 4C) GEMM outputs
                # and Mosaic cannot relayout offsets through the concat
                # inside _row_shift_up (elementwise max handles them; a
                # full-ref read comes back zero-offset).
                pool_scr[m][...] = jnp.maximum(prev_quad[2 * m],
                                               prev_quad[2 * m + 1])
            for m in (0, 1):
                mx = pool_scr[m][...]
                mz = jnp.maximum(mx, _row_shift_up(mx, 1))
                a2 = mz.reshape(rows // 2, 2, c)[:, 0]
                my = jnp.maximum(a2, _row_shift_up(a2, size_z // 2))
                b4 = my.reshape(batch * size_y // 2, 2, size_z // 2,
                                c)[:, 0]
                po_ref[:, 0, m] = b4.reshape(batch, yz // 4,
                                             c).astype(po_ref.dtype)


def _lane_bytes(c: int, itemsize: int) -> int:
    """VMEM bytes per (row, c) element row: lanes pad to multiples of 128.

    A (rows, c) buffer with c <= 128 occupies a full 128-lane tile per row
    — the 4x inflation for c=32 is exactly what the r5 eval-step OOM dump
    showed (window 'unpadded' 4 MB reported as 32 MB = x4 lanes x2
    buffers)."""
    return ((c + 127) // 128) * 128 * itemsize


def _isz(dt) -> int:
    return 2 if jnp.dtype(dt) == jnp.bfloat16 else 4


# Register-allocator spill slots scale with the rows resident in one grid
# step: the r5 OOM dump measured 49.3 MB of spills at rows=8192/f32
# (~6 KB/row) and the estimator below reproduces the f32 flagship chain's
# measured 111.3 MB stack within 2%.  Model: ~1536 bytes/row/itemsize.
_SPILL_PER_ROW = 1536

#: Stack budget for choosing the batch fold.  The physical VMEM is 128 MB
#: and the axon remote compiler has been observed to enforce ~109 MB of
#: scoped headroom — 96 MB leaves slack for compiler drift (the ~10%
#: guideline, SKILL.md).
_CHAIN_SAFE_BYTES = 96 * 1024 * 1024


def chain_stack_bytes(fold: int, yz: int, cin: int, c: int, n_blocks: int,
                      dtype, emit_pooled: bool = False,
                      out_dtype=None) -> int:
    """Estimated VMEM stack of :func:`res3d_chain_fused` at a given fold.

    Terms: scratch keeps/hist (lane-padded), 2x-buffered in/out windows
    (lane-padded — the dominant cost at c=32), and a spill-slot proxy.
    Calibrated against the f32 flagship front chain (est 113 MB vs
    111.3 MB measured) and the r5 32^3 eval OOM (est ~140 vs 144 MB)."""
    i = _isz(dtype)
    io = _isz(out_dtype or dtype)
    ki = 4 if jnp.dtype(dtype) == jnp.float32 else i
    rows = fold * yz
    scratch = n_blocks * (2 * _lane_bytes(2 * c, ki) + _lane_bytes(c, i))
    scratch += (n_blocks - 1) * _lane_bytes(4 * c, i)
    if emit_pooled:
        scratch += 2 * _lane_bytes(c, 4)
    xw = 4 * 2 * _lane_bytes(cin, i)          # 4 plane inputs, 2 buffers
    x5 = 4 * 2 * _lane_bytes(cin, i)          # quad input window
    outw = 4 * 2 * _lane_bytes(c, io)
    poolw = 2 * _lane_bytes(c, io) // 2 if emit_pooled else 0
    spill = _SPILL_PER_ROW * i
    return rows * (scratch + xw + x5 + outw + poolw + spill)


def ups_chain_stack_bytes(fold: int, yz: int, cin: int, c: int,
                          out_c: int, n_blocks: int, dtype,
                          out_dtype=None) -> int:
    """Estimated VMEM stack of :func:`upsample_res3d_fused` (see
    :func:`chain_stack_bytes`; yz here is the POST-upsample plane size).
    Reproduces the r5 32^3 f32 eval OOM (est ~140 MB vs 144.3 measured,
    fold 8) and stays comfortably under budget at the flagship shape."""
    i = _isz(dtype)
    io = _isz(out_dtype or dtype)
    ki = 4 if jnp.dtype(dtype) == jnp.float32 else i
    rows = fold * yz
    scratch = n_blocks * (2 * _lane_bytes(2 * c, ki) + _lane_bytes(c, i)
                          + _lane_bytes(4 * c, i))
    scratch += _lane_bytes(c, 4) // 2 + _lane_bytes(c, 4)   # zb + yb
    xw = 2 * 2 * _lane_bytes(cin, i) // 4     # two x windows, yzs = yz/4
    skipw = 4 * 2 * _lane_bytes(c, i)
    outw = 4 * 2 * _lane_bytes(out_c, io)
    spill = _SPILL_PER_ROW * i
    return rows * (scratch + xw + skipw + outw + spill)


def chain_feasible(batch: int, size_y: int, size_z: int, cin: int, c: int,
                   n_blocks: int, dtype, emit_pooled: bool = False) -> bool:
    """True if res3d_chain_fused fits VMEM at its smallest fold (1)."""
    return chain_stack_bytes(1, size_y * size_z, cin, c, n_blocks, dtype,
                             emit_pooled) <= _CHAIN_SAFE_BYTES


def ups_chain_feasible(batch: int, size_y: int, size_z: int, cin: int,
                       c: int, out_c: int, n_blocks: int, dtype) -> bool:
    """True if upsample_res3d_fused fits VMEM at fold 1 (post-upsample
    size_y/size_z)."""
    return ups_chain_stack_bytes(1, size_y * size_z, cin, c, out_c,
                                 n_blocks, dtype) <= _CHAIN_SAFE_BYTES


def res3d_chain_fused(x: jnp.ndarray, blocks,
                      out_dtype=None, interpret: bool = False,
                      force_fold: int = None, emit_pooled: bool = False):
    """K consecutive identity-skip Res3D blocks in ONE pallas_call.

    Args:
      x: (B, X, Y, Z, C) with X % 4 == 0.
      blocks: sequence of (w1, b1, w2, b2) folded per-block params, all
        with Cin == Cout == C (identity skips — the V2V front_res1..3 /
        consecutive same-width pattern, v2v.py:141-180).  The FIRST block
        may instead be (w1, b1, w2, b2, (ws, bs)): a width-changing block
        with a folded 1x1x1 projection skip (V2V front_res1, 16 -> 32),
        in which case x has Cin == w1.shape[-2].
      emit_pooled: also return ``MaxPool3d(2)`` of the LAST block's input
        (the encoder's ``skip = res(x); x = pool(x)`` pattern when the
        chain ends in ``skip_res1``) — requires >= 2 blocks.

    Returns:
      (B, X, Y, Z, C); with ``emit_pooled``, ``(out, pooled)`` where
      pooled is (B, X/2, Y/2, Z/2, C).
    """
    import os

    b, size_x, size_y, size_z, cin = x.shape
    assert size_x % 4 == 0, size_x
    n_blocks = len(blocks)
    assert n_blocks >= 1
    first_proj = len(blocks[0]) == 5
    c = blocks[0][0].shape[-1]
    assert first_proj or cin == c, (cin, c)
    yz = size_y * size_z
    out_dtype = out_dtype or x.dtype
    keep_dtype = (jnp.float32 if os.environ.get("LT_TPU_RES3D_F32_KEEPS")
                  or x.dtype == jnp.float32 else x.dtype)

    # Start from the measured-good heuristic (fold=1 at pipeline-filling
    # planes, batch-folded below — larger folds at yz >= 4096 measured
    # SLOWER: 115.7 -> 114.2 fps when the budget alone allowed fold 2 at
    # the flagship decoder), then REDUCE until the estimated VMEM stack
    # (lane-padded windows + scratch + spill proxy, chain_stack_bytes)
    # fits.  The unbudgeted heuristic OOMed the f32 32^3 eval step at
    # batch 8: 144.3 MB of 128 MB physical (round-5 log).
    fold = force_fold if force_fold is not None else (
        1 if yz >= 4096 else b)
    assert b % fold == 0, (b, fold)
    if force_fold is None:
        while fold > 1 and (b % fold != 0 or chain_stack_bytes(
                fold, yz, cin, c, n_blocks, x.dtype, emit_pooled,
                out_dtype) > _CHAIN_SAFE_BYTES):
            fold -= 1
    groups = b // fold
    rows = fold * yz
    nq = size_x // 4

    x4 = x.reshape(b, size_x, yz, cin)
    x5 = x.reshape(b, nq, 4, yz, cin)
    in_specs = [
        pl.BlockSpec((fold, 1, yz, cin),
                     functools.partial(
                         lambda d, g, j: (
                             g, jnp.clip(4 * j + d, 0, size_x - 1),
                             0, 0), d))
        for d in (-1, 0, 1, 2)
    ]
    in_specs += [
        pl.BlockSpec((fold, 1, 4, yz, cin),
                     lambda g, j: (g, jnp.clip(j - 1, 0, nq - 1), 0, 0, 0)),
    ]
    operands = [x4, x4, x4, x4, x5]
    for bi, blk in enumerate(blocks):
        w1, b1, w2, b2 = blk[:4]
        ci = cin if bi == 0 else c  # block 0 may widen (proj skip)
        operands += [pack_weights_s2(w1).astype(x.dtype),
                     pack_weights_s2(w2).astype(x.dtype),
                     b1.reshape(1, c).astype(jnp.float32),
                     b2.reshape(1, c).astype(jnp.float32)]
        in_specs += [
            pl.BlockSpec((18 * ci, 4 * c), lambda g, j: (0, 0)),
            pl.BlockSpec((18 * c, 4 * c), lambda g, j: (0, 0)),
            pl.BlockSpec((1, c), lambda g, j: (0, 0)),
            pl.BlockSpec((1, c), lambda g, j: (0, 0)),
        ]
    if first_proj:
        ws, bs = blocks[0][4]
        operands += [ws.astype(x.dtype),
                     bs.reshape(1, c).astype(jnp.float32)]
        in_specs += [pl.BlockSpec((cin, c), lambda g, j: (0, 0)),
                     pl.BlockSpec((1, c), lambda g, j: (0, 0))]

    if emit_pooled:
        assert n_blocks >= 2 and size_y % 2 == 0 and size_z % 2 == 0

    kernel = functools.partial(
        _res3d_kernel_m2_chain, n_blocks=n_blocks, batch=fold,
        size_x=size_x, yz=yz, size_y=size_y, size_z=size_z, c=c,
        emit_pooled=emit_pooled, cin=cin, first_proj=first_proj)

    scratch = []
    for _ in range(n_blocks):
        scratch += [pltpu.VMEM((rows, 2 * c), keep_dtype),
                    pltpu.VMEM((rows, 2 * c), keep_dtype),
                    pltpu.VMEM((rows, c), x.dtype)]
    for _ in range(n_blocks - 1):
        scratch.append(pltpu.VMEM((rows, 4 * c), x.dtype))
    if emit_pooled:
        scratch += [pltpu.VMEM((rows, c), jnp.float32) for _ in range(2)]

    out_specs = pl.BlockSpec(
        (fold, 1, 4, yz, c),
        lambda g, j: (g, jnp.clip(j - n_blocks, 0, nq - 1), 0, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, nq, 4, yz, c), out_dtype)
    if emit_pooled:
        out_specs = [out_specs, pl.BlockSpec(
            (fold, 1, 2, yz // 4, c),
            lambda g, j: (g, jnp.clip(j - (n_blocks - 1), 0, nq - 1),
                          0, 0, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, nq, 2, yz // 4, c), x.dtype)]

    out = pl.pallas_call(
        kernel,
        grid=(groups, nq + n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # 115 MB of the 128 MB physical: the f32 flagship chain's
            # measured stack is 111.3 MB (the bf16 one is well under
            # 100 MB) — the same headroom reasoning as the upsample chain
            # below.
            vmem_limit_bytes=115 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)

    if emit_pooled:
        out, pooled = out
        return (out.reshape(b, size_x, size_y, size_z, c),
                pooled.reshape(b, size_x // 2, size_y // 2, size_z // 2, c))
    return out.reshape(b, size_x, size_y, size_z, c)


def res3d_block_fused(
        x: jnp.ndarray,
        w1: jnp.ndarray, b1: jnp.ndarray,
        w2: jnp.ndarray, b2: jnp.ndarray,
        skip_proj=None,
        tail: Sequence[Tuple[jnp.ndarray, jnp.ndarray, bool]] = (),
        out_dtype=None, interpret: bool = False,
        force_fold: int = None, pairs_per_step: int = None,
        dy_accum: bool = None, emit_pooled: bool = False):
    """Fused Res3DBlock: relu(bn2(conv2(relu(bn1(conv1(x))))) + skip) [+tail].

    Args:
      x: (B, X, Y, Z, Cin) with even X.
      w1: (3, 3, 3, Cin, C); w2: (3, 3, 3, C, C) — BN pre-folded
        (:func:`lt_tpu.ops.pallas.conv3d.fold_bn`).
      b1, b2: (C,) folded biases.
      skip_proj: None for the identity skip (requires Cin == C), else
        (ws (Cin, C), bs (C,)) — the folded 1x1x1 projection skip.
      tail: optional sequence of (w (C_i, C_o), b (C_o,), relu) per-voxel
        matmuls applied after the block (fused Basic3D k=1 / output conv).
      pairs_per_step: 2 processes two plane-pairs per grid step (X % 4
        == 0 required), halving step count and keep-buffer round trips;
        default picks 2 whenever X allows it.
      emit_pooled: also return MaxPool3d(2)(x) computed from the resident
        skip blocks (m2 schedule only) — the V2V ``skip = res(x); x =
        pool(x)`` pattern without a separate pool kernel launch.

    Returns:
      (B, X, Y, Z, C_out) where C_out is the last tail width (or C);
      with ``emit_pooled``, a tuple ``(out, pooled)`` where pooled is
      (B, X/2, Y/2, Z/2, Cin).
    """
    b, size_x, size_y, size_z, cin = x.shape
    assert size_x % 2 == 0, size_x
    if pairs_per_step is None:
        pairs_per_step = 2 if size_x % 4 == 0 else 1
    assert pairs_per_step in (1, 2), pairs_per_step
    m2 = pairs_per_step == 2 and size_x % 4 == 0
    yz = size_y * size_z
    c = w1.shape[-1]
    assert skip_proj is not None or cin == c, (cin, c)
    out_c = tail[-1][0].shape[-1] if tail else c
    out_dtype = out_dtype or x.dtype

    w1p = pack_weights_s2(w1).astype(x.dtype)
    w2p = pack_weights_s2(w2).astype(x.dtype)
    b1r = b1.reshape(1, c).astype(jnp.float32)
    b2r = b2.reshape(1, c).astype(jnp.float32)

    # VMEM budget via the calibrated estimator (chain_stack_bytes with
    # n_blocks=1), with the single-block kernel's spill/temporary factor
    # DOUBLED: its bf16 32^3 batch-8 graph overflowed the 100 MB stack cap
    # at fold 8 (r5 bf16_delta compile) even though the chain-calibrated
    # estimate was ~82 MB — the m2 single-block schedule (proj skip,
    # standalone pool, per-plane tap masks) spills roughly 2x the chain's
    # per-row bytes.  The doubled proxy puts that shape at ~132 MB > the
    # 96 MB budget, so it folds down to 4 (measured-safe), while leaving
    # the fold=1 flagship plane untouched.
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4

    def est(f):
        return (chain_stack_bytes(f, yz, cin, c, 1, x.dtype,
                                  emit_pooled, out_dtype)
                + f * yz * _SPILL_PER_ROW * itemsize)

    # fold=1 at large planes: M=YZ rows already fills the MXU pipeline and
    # the batch-boundary-free taps skip 16 of 18 VPU masks per plane pair.
    # ``force_fold`` overrides the heuristic (tests pin the fold=1 mask-free
    # tap path at small shapes, where interpret mode is cheap).
    fold = force_fold if force_fold is not None else (
        1 if yz >= 4096 else b)
    assert b % fold == 0, (b, fold)
    while fold > 1 and (est(fold) > _CHAIN_SAFE_BYTES or b % fold != 0):
        fold -= 1
    groups = b // fold
    rows = fold * yz
    half = size_x // 2

    x4 = x.reshape(b, size_x, yz, cin)
    if m2:
        nq = size_x // 4
        # 5-D views for the aligned quad skip/output blocks.
        x5 = x.reshape(b, nq, 4, yz, cin)
        in_specs = [
            pl.BlockSpec((fold, 1, yz, cin),
                         functools.partial(
                             lambda d, g, j: (
                                 g, jnp.clip(4 * j + d, 0, size_x - 1),
                                 0, 0), d))
            for d in (-1, 0, 1, 2)
        ]
        in_specs += [
            # skip planes (4J-4 .. 4J-1) = quad block J-1 (clamped)
            pl.BlockSpec((fold, 1, 4, yz, cin),
                         lambda g, j: (g, jnp.clip(j - 1, 0, nq - 1),
                                       0, 0, 0)),
        ]
        operands = [x4, x4, x4, x4, x5]
    else:
        # 5-D views for the aligned 2-plane skip/output blocks (only the
        # last two dims may be partially blocked).
        x5 = x.reshape(b, half, 2, yz, cin)
        in_specs = [
            pl.BlockSpec((fold, 1, yz, cin),
                         lambda g, j: (g, jnp.clip(2 * j - 1, 0, size_x - 1),
                                       0, 0)),
            pl.BlockSpec((fold, 1, yz, cin),
                         lambda g, j: (g, jnp.clip(2 * j, 0, size_x - 1),
                                       0, 0)),
            # skip planes (2j-4, 2j-3) = 2-plane block j-2 (clamped)
            pl.BlockSpec((fold, 1, 2, yz, cin),
                         lambda g, j: (g, jnp.clip(j - 2, 0, half - 1),
                                       0, 0, 0)),
        ]
        operands = [x4, x4, x5]
    in_specs += [
        pl.BlockSpec((18 * cin, 4 * c), lambda g, j: (0, 0)),
        pl.BlockSpec((18 * c, 4 * c), lambda g, j: (0, 0)),
        pl.BlockSpec((1, c), lambda g, j: (0, 0)),
        pl.BlockSpec((1, c), lambda g, j: (0, 0)),
    ]
    operands += [w1p, w2p, b1r, b2r]

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

    import os

    if dy_accum is None:
        dy_accum = bool(os.environ.get("LT_TPU_RES3D_DY_ACCUM"))
    # Keep buffers hold the cross-step halves of the conv partial sums.
    # bf16 keeps halve their VMEM round-trip traffic; the rounding applies
    # to one addend of the final sum (~0.4% worst-case on bf16 inputs,
    # inside the block's 2e-2 parity budget).  LT_TPU_RES3D_F32_KEEPS=1
    # restores f32.
    keep_dtype = (jnp.float32 if os.environ.get("LT_TPU_RES3D_F32_KEEPS")
                  or x.dtype == jnp.float32 else x.dtype)
    emit_pooled = emit_pooled and m2
    assert not emit_pooled or (size_y % 2 == 0 and size_z % 2 == 0)
    kernel = functools.partial(
        _res3d_kernel_m2 if m2 else _res3d_kernel, batch=fold,
        size_x=size_x, yz=yz, size_y=size_y, size_z=size_z, cin=cin, c=c,
        tail_relu=tuple(bool(t[2]) for t in tail),
        out_c=out_c, skip_proj=skip_proj is not None,
        **({"dy_accum": dy_accum, "emit_pooled": emit_pooled}
           if m2 else {}))

    if m2:
        grid = (groups, size_x // 4 + 1)
        out_specs = pl.BlockSpec(
            (fold, 1, 4, yz, out_c),
            lambda g, j: (g, jnp.clip(j - 1, 0, size_x // 4 - 1), 0, 0, 0))
        out_shape = jax.ShapeDtypeStruct(
            (b, size_x // 4, 4, yz, out_c), out_dtype)
        if emit_pooled:
            out_specs = [out_specs, pl.BlockSpec(
                (fold, 1, 2, yz // 4, cin),
                lambda g, j: (g, jnp.clip(j - 1, 0, size_x // 4 - 1),
                              0, 0, 0))]
            out_shape = [out_shape, jax.ShapeDtypeStruct(
                (b, size_x // 4, 2, yz // 4, cin), x.dtype)]
    else:
        grid = (groups, half + 2)
        out_specs = pl.BlockSpec(
            (fold, 1, 2, yz, out_c),
            lambda g, j: (g, jnp.clip(j - 2, 0, half - 1), 0, 0, 0))
        out_shape = jax.ShapeDtypeStruct((b, half, 2, yz, out_c), out_dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((rows, 2 * c), keep_dtype),    # q1 keep
            pltpu.VMEM((rows, 2 * c), keep_dtype),    # q2 keep
            pltpu.VMEM((rows, c), x.dtype),           # y1 plane history
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)

    if emit_pooled:
        out, pooled = out
        return (out.reshape(b, size_x, size_y, size_z, out_c),
                pooled.reshape(b, size_x // 2, size_y // 2, size_z // 2,
                               cin))
    return out.reshape(b, size_x, size_y, size_z, out_c)


def _ups_res3d_kernel(x0_ref, x1_ref, skip_ref, wu_ref, bu_ref, *rest,
                      n_blocks: int, batch: int, xs: int, yzs: int,
                      yz: int, size_y: int, size_z: int, cin: int, c: int,
                      tail_relu: tuple):
    """ConvTranspose3d(2,2) head + K chained Res3D blocks + tail, one kernel.

    Per grid step j: upsample small planes (2j, 2j+1) into output quad j
    (the head has NO pipeline latency — it emits quad j at step j), add
    the decoder skip quad, then run the K identity-skip blocks with the
    m2 schedule shifted by their block index (block i finalizes quad
    j - i - 1; grid = X/4 + K).  The last block's quad passes through the
    per-voxel ``tail`` matmuls (V2V back_basic1/2 + output conv) before
    the o_ref write.  Semantics: /root/reference/mvn/models/v2v.py:54-66
    (Upsample3DBlock) + :128 (`up(x) + skip`) + :160-169 (back layers).
    """
    rest = list(rest)
    w_refs = rest[:4 * n_blocks]
    idx = 4 * n_blocks
    n_tail = len(tail_relu)
    tail_refs = rest[idx:idx + 2 * n_tail]
    o_ref = rest[idx + 2 * n_tail]
    scr = rest[idx + 2 * n_tail + 1:]
    hist_scr = scr[3 * n_blocks:4 * n_blocks]
    zb, yb = scr[4 * n_blocks], scr[4 * n_blocks + 1]
    j = pl.program_id(1)
    rows = batch * yz
    rows_s = batch * yzs
    nq = xs // 2  # output quads == X/4 == Xs/2

    def dot(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def zif(cond, v):
        return jnp.where(cond, jnp.zeros_like(v), v)

    # Head: 2 small planes -> output quad j.  Taps (dx, dy, dz) from ONE
    # GEMM column block each; z/y interleave via strided scratch stores
    # (same schedule as updown._upsample_kernel, here emitting 4 planes).
    def tap(plane, t):
        q = dot(plane, wu_ref[t])
        return jnp.maximum(q + bu_ref[t], 0.0)

    quad = []
    for sp in (0, 1):
        plane = (x0_ref if sp == 0 else x1_ref)[:, 0].reshape(rows_s, cin)
        for dx in (0, 1):
            m = 2 * sp + dx
            vs = []
            for dy in (0, 1):
                base = dx * 4 + dy * 2
                zb[::2] = tap(plane, base)
                zb[1::2] = tap(plane, base + 1)
                vs.append(zb[...].reshape(batch * size_y // 2, size_z, c))
            yb[::2] = vs[0]
            yb[1::2] = vs[1]
            out = yb[...].reshape(rows, c)
            out = out + skip_ref[:, 0, m].reshape(rows, c).astype(
                jnp.float32)
            quad.append(out)

    for i in range(n_blocks):
        hq = hist_scr[i]
        ji = j - i
        hist = hq[...]                                   # quad ji-1
        pA0 = zif(jnp.logical_or(ji < 1, ji > nq),
                  hist[:, 3 * c:4 * c])                  # plane 4*ji-1
        drain = jnp.logical_or(ji < 0, ji >= nq)
        dt = hq.dtype
        pA1 = zif(drain, quad[0]).astype(dt)
        pB0 = zif(drain, quad[1]).astype(dt)
        pB1 = zif(drain, quad[2]).astype(dt)
        new_hist = jnp.concatenate(quad, axis=-1).astype(dt)
        quad = _m2_step(ji, w_refs[4 * i:4 * i + 4], scr[3 * i:3 * i + 3],
                        pA0, pA1, pB0, pB1,
                        lambda m, h=hist: h[:, m * c:(m + 1) * c]
                        .astype(jnp.float32),
                        nq=nq, c=c, rows=rows, size_y=size_y,
                        size_z=size_z, fold=batch)
        hq[...] = new_hist

    @pl.when(j >= n_blocks)
    def _():
        for m in range(4):
            v = quad[m]
            for t, relu_t in enumerate(tail_relu):
                tw, tb = tail_refs[2 * t], tail_refs[2 * t + 1]
                v = dot(v.astype(tw.dtype), tw[...]) + tb[0]
                if relu_t:
                    v = jnp.maximum(v, 0.0)
            o_ref[:, 0, m] = v.astype(o_ref.dtype).reshape(
                batch, yz, o_ref.shape[-1])


def upsample_res3d_fused(x: jnp.ndarray, w8: jnp.ndarray, b8: jnp.ndarray,
                         skip: jnp.ndarray, blocks,
                         tail: Sequence[Tuple[jnp.ndarray, jnp.ndarray,
                                              bool]] = (),
                         out_dtype=None, interpret: bool = False,
                         force_fold: int = None) -> jnp.ndarray:
    """Upsample3DBlock + skip-add + K Res3D blocks + tail in ONE kernel.

    The V2V decoder's final ``up(x) + skip1`` (v2v.py:128) chained into the
    back section (back_res + two k=1 Basic3D blocks + the output conv,
    v2v.py:160-169): the 2X^3 upsampled volume and every inter-block volume
    never round-trip HBM.

    Args:
      x: (B, Xs, Ys, Zs, Cin) with Xs % 2 == 0 — the small decoder volume.
      w8: (Cin, 8*C) packed ConvTranspose taps + folded BN
        (:func:`lt_tpu.ops.pallas.updown.pack_upsample_weights`).
      b8: (8*C,) folded bias.
      skip: (B, 2Xs, 2Ys, 2Zs, C) residual added after the head's ReLU.
      blocks: folded (w1, b1, w2, b2) per identity-skip Res3D block
        (Cin == Cout == C).
      tail: ((w (C_i, C_o), b (C_o,), relu), ...) per-voxel matmuls after
        the last block.

    Returns:
      (B, 2Xs, 2Ys, 2Zs, C_out) where C_out is the last tail width (or C).
    """
    b, xs, ys, zs, cin = x.shape
    assert xs % 2 == 0, xs
    c = w8.shape[1] // 8
    size_x, size_y, size_z = 2 * xs, 2 * ys, 2 * zs
    yzs, yz = ys * zs, size_y * size_z
    n_blocks = len(blocks)
    assert n_blocks >= 1
    for (w1, _, _, _) in blocks:
        assert w1.shape[-2] == w1.shape[-1] == c, "identity-skip blocks"
    out_dtype = out_dtype or x.dtype
    out_c = tail[-1][0].shape[-1] if tail else c
    import os

    keep_dtype = (jnp.float32 if os.environ.get("LT_TPU_RES3D_F32_KEEPS")
                  or x.dtype == jnp.float32 else x.dtype)

    # Measured-good starting heuristic, then estimator-driven REDUCTION
    # (see res3d_chain_fused): the unbudgeted version put all 8 batch
    # samples' windows + spill slots in VMEM at once on the f32 32^3 eval
    # step — 144.3 MB of the 128 MB physical (round-5 OOM).
    fold = force_fold if force_fold is not None else (
        1 if yz >= 4096 else b)
    assert b % fold == 0, (b, fold)
    if force_fold is None:
        while fold > 1 and (b % fold != 0 or ups_chain_stack_bytes(
                fold, yz, cin, c, out_c, n_blocks, x.dtype,
                out_dtype) > _CHAIN_SAFE_BYTES):
            fold -= 1
    groups = b // fold
    rows = fold * yz
    nq = xs // 2

    xr = x.reshape(b, xs, yzs, cin)
    in_specs = [
        pl.BlockSpec((fold, 1, yzs, cin),
                     lambda g, j: (g, jnp.clip(2 * j, 0, xs - 1), 0, 0)),
        pl.BlockSpec((fold, 1, yzs, cin),
                     lambda g, j: (g, jnp.clip(2 * j + 1, 0, xs - 1), 0, 0)),
        pl.BlockSpec((fold, 1, 4, yz, c),
                     lambda g, j: (g, jnp.clip(j, 0, nq - 1), 0, 0, 0)),
        pl.BlockSpec((8, cin, c), lambda g, j: (0, 0, 0)),
        pl.BlockSpec((8, 1, c), lambda g, j: (0, 0, 0)),
    ]
    operands = [xr, xr, skip.reshape(b, nq, 4, yz, c),
                w8.reshape(cin, 8, c).transpose(1, 0, 2).astype(x.dtype),
                b8.reshape(8, 1, c).astype(jnp.float32)]
    for (w1, b1, w2, b2) in blocks:
        operands += [pack_weights_s2(w1).astype(x.dtype),
                     pack_weights_s2(w2).astype(x.dtype),
                     b1.reshape(1, c).astype(jnp.float32),
                     b2.reshape(1, c).astype(jnp.float32)]
        in_specs += [
            pl.BlockSpec((18 * c, 4 * c), lambda g, j: (0, 0)),
            pl.BlockSpec((18 * c, 4 * c), lambda g, j: (0, 0)),
            pl.BlockSpec((1, c), lambda g, j: (0, 0)),
            pl.BlockSpec((1, c), lambda g, j: (0, 0)),
        ]
    tail_relu = []
    for (tw, tb, trelu) in tail:
        ci, co = tw.shape
        operands += [tw.astype(x.dtype),
                     tb.reshape(1, co).astype(jnp.float32)]
        in_specs += [pl.BlockSpec((ci, co), lambda g, j: (0, 0)),
                     pl.BlockSpec((1, co), lambda g, j: (0, 0))]
        tail_relu.append(bool(trelu))

    kernel = functools.partial(
        _ups_res3d_kernel, n_blocks=n_blocks, batch=fold, xs=xs, yzs=yzs,
        yz=yz, size_y=size_y, size_z=size_z, cin=cin, c=c,
        tail_relu=tuple(tail_relu))

    scratch = []
    for _ in range(n_blocks):
        scratch += [pltpu.VMEM((rows, 2 * c), keep_dtype),
                    pltpu.VMEM((rows, 2 * c), keep_dtype),
                    pltpu.VMEM((rows, c), x.dtype)]
    for _ in range(n_blocks):
        scratch.append(pltpu.VMEM((rows, 4 * c), x.dtype))
    scratch += [pltpu.VMEM((fold * yz // 2, c), jnp.float32),   # zb
                pltpu.VMEM((fold * size_y, size_z, c),
                           jnp.float32)]                        # yb

    out = pl.pallas_call(
        kernel,
        grid=(groups, nq + n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (fold, 1, 4, yz, out_c),
            lambda g, j: (g, jnp.clip(j - n_blocks, 0, nq - 1), 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq, 4, yz, out_c), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # 115 MB of the 128 MB physical: the flagship upsample-headed
            # chain's stack allocation measures 103.7 MB on current
            # compilers (a 100 MB cap OOMed the bench compile), and the
            # ~10% slack guideline wants headroom for compiler drift.
            vmem_limit_bytes=115 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, size_x, size_y, size_z, out_c)
