"""Fused Pallas TPU Res3D block, complete-output-quad schedule ("q4").

Functional parity target: ``Res3DBlock`` of /root/reference/mvn/models/
v2v.py:20-42 (two 3x3x3 convs + BN + ReLU with identity/projection skip),
plus the optional fused per-voxel matmul tail (``Basic3DBlock`` k=1,
v2v.py:7-17, and the V2V output conv) — same contract as
:func:`lt_tpu.ops.pallas.res3d.res3d_block_fused`.

Why a second schedule
---------------------
The round-2 kernel (ops/pallas/res3d.py) finalizes TWO planes per grid step
and carries partial conv sums across steps in f32 VMEM "keep" buffers.
Ablations on v5e (round 3) showed its per-step cost is NOT the GEMM
(~3.5 us of a ~26 us step): it is the keep-buffer traffic plus per-step
block DMA machinery.  This kernel instead:

- reads SIX input planes per step and emits FOUR *complete* output planes
  (a quad): every output plane's 27 taps are present in one GEMM, so there
  are no partial-sum keeps at all;
- the GEMM is (M, 6*9*C) @ (6*9*C, 4*C) — K=1728, N=128 at C=32, 50%
  tap density; measured dense rate ~190-200 TF/s vs ~165 at the round-2
  kernel's K=576 — the density loss is bought back by shape rate and by
  halving the step count (overhead amortization);
- chains conv2 at a one-quad lag through a rolling 5-plane y1 ring in
  VMEM, so the intermediate activation adds ZERO HBM traffic;
- folds BN into the weights and fuses skip-add, ReLUs and the optional
  per-voxel tail, finalizing a whole quad per step.

Schedule (X = depth, quads q = X/4, grid j = 0 .. q):

  step j: conv1 on x planes 4j-1 .. 4j+4  ->  y1 quad j (planes 4j..4j+3)
          conv2 on y1 planes 4j-5 .. 4j   ->  y2 quad j-1  [ring + fresh]
          out quad j-1 <- tail(relu(y2 + b2 + skip))       [written j>=1]
          ring <- y1 planes 4j-1 .. 4j+3

Inference-only by design; training keeps the XLA conv path (autodiff).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lt_tpu.ops.pallas.conv3d import _row_shift_up

S = 4          # complete output planes per grid step
P = S + 2      # input planes read per grid step


def pack_weights_q4(weights: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) -> (P*9*Cin, S*Cout) complete-quad matrix.

    Row (dy, dz, pi, ci), column (ob, co): output plane ob (absolute
    S*j + ob) takes input plane pi (absolute S*j - 1 + pi) through tap
    kx = pi - ob, zero outside [0, 2].  Row order matches the
    hierarchical tap tree of :func:`_taps_q` (dy outermost).
    """
    k, _, _, cin, cout = weights.shape
    assert k == 3, k
    w2 = jnp.zeros((3, 3, P, cin, S, cout), weights.dtype)
    for pi in range(P):
        for ob in range(S):
            kx = pi - ob
            if 0 <= kx <= 2:
                # rows (dy, dz, ci) <- W[kx, ky=dy, kz=dz]
                w2 = w2.at[:, :, pi, :, ob, :].set(weights[kx])
    return w2.reshape(P * 9 * cin, S * cout)


def _taps_q(planes, *, size_z: int, rows: int):
    """(rows, len(planes)*9*C) patch matrix, row order (dy, dz, pi, ci).

    fold == 1 layout (row r = (y, z) of ONE sample): dy shifts cannot
    cross a sample boundary, so their zero-fill IS the y mask and only
    dz != 0 needs a where.  Hierarchical tree (planes -> dz -> dy): every
    shift/mask moves a full-width lane-dense strip instead of a padded
    (rows, C) plane.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    z_of_r = r % size_z
    pp = jnp.concatenate(list(planes), axis=-1)           # (rows, P*C)
    bases = []
    for dz in (-1, 0, 1):
        base = _row_shift_up(pp, dz)
        if dz != 0:
            z_ok = (z_of_r + dz >= 0) & (z_of_r + dz < size_z)
            base = jnp.where(z_ok, base, jnp.zeros_like(base))
        bases.append(base)
    d3 = jnp.concatenate(bases, axis=-1)                  # (rows, 3*P*C)
    taps = [_row_shift_up(d3, dy * size_z) for dy in (-1, 0, 1)]
    return jnp.concatenate(taps, axis=-1)


def _res3d_q4_kernel(*refs, size_x: int, yz: int, size_z: int,
                     cin: int, c: int, tail_relu: Tuple[bool, ...],
                     out_c: int, skip_proj: bool):
    """One complete-quad grid step (see module docstring)."""
    rest = list(refs)
    x_refs = rest[:P]
    x_skip, w1_ref, w2_ref, b1_ref, b2_ref = rest[P:P + 5]
    rest = rest[P + 5:]
    if skip_proj:
        ws_ref, bs_ref = rest[:2]
        rest = rest[2:]
    n_tail = len(tail_relu)
    tail_refs = rest[:2 * n_tail]
    o_ref = rest[2 * n_tail]
    ring = rest[2 * n_tail + 1:]          # P-1 scratch refs of (yz, c)
    j = pl.program_id(1)
    rows = yz
    nq = size_x // S

    def dot(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ---- conv1: x planes 4j-1 .. 4j+4 -> complete y1 quad j ----
    planes = []
    for pi in range(P):
        p = x_refs[pi][:, 0].reshape(rows, cin)
        plane_id = S * j + pi - 1
        valid = jnp.logical_and(plane_id >= 0, plane_id <= size_x - 1)
        # j == nq is the drain step: conv1's quad is out of range entirely
        valid = jnp.logical_and(valid, j < nq)
        planes.append(jnp.where(valid, p, jnp.zeros_like(p)))
    q1 = dot(_taps_q(planes, size_z=size_z, rows=rows), w1_ref[...])

    b1 = b1_ref[0]
    y1 = [jnp.maximum(q1[:, m * c:(m + 1) * c] + b1, 0.0) for m in range(S)]

    # ---- conv2: y1 planes 4j-5 .. 4j -> complete y2 quad j-1 ----
    dt = ring[0].dtype
    ring_old = [r[...] for r in ring]     # planes 4j-5 .. 4j-1
    y1_planes = []
    for pi in range(P):
        plane_id = S * (j - 1) + pi - 1
        p = ring_old[pi] if pi < P - 1 else y1[0].astype(dt)
        valid = jnp.logical_and(plane_id >= 0, plane_id <= size_x - 1)
        y1_planes.append(jnp.where(valid, p, jnp.zeros((rows, c), dt)))
    # ring <- y1 planes 4j-1 .. 4j+3 (last old slot + this quad)
    ring[0][...] = ring_old[P - 2]
    for m in range(S):
        ring[m + 1][...] = y1[m].astype(dt)
    q2 = dot(_taps_q(y1_planes, size_z=size_z, rows=rows), w2_ref[...])

    # ---- finalize quad j-1: BN2 (folded) + skip + ReLU [+ tail] ----
    @pl.when(j >= 1)
    def _():
        b2 = b2_ref[0]
        for m in range(S):
            sk = x_skip[:, 0, m].reshape(rows, cin)
            if skip_proj:
                sk = dot(sk.astype(ws_ref.dtype), ws_ref[...]) + bs_ref[0]
            else:
                sk = sk.astype(jnp.float32)
            out = jnp.maximum(q2[:, m * c:(m + 1) * c] + b2 + sk, 0.0)
            for i, relu_t in enumerate(tail_relu):
                wt = tail_refs[2 * i][...]
                bt = tail_refs[2 * i + 1][0]
                out = dot(out.astype(wt.dtype), wt) + bt
                if relu_t:
                    out = jnp.maximum(out, 0.0)
            o_ref[:, 0, m] = out.astype(o_ref.dtype).reshape(1, yz, out_c)


def res3d_block_q4(
        x: jnp.ndarray,
        w1: jnp.ndarray, b1: jnp.ndarray,
        w2: jnp.ndarray, b2: jnp.ndarray,
        skip_proj=None,
        tail: Sequence[Tuple[jnp.ndarray, jnp.ndarray, bool]] = (),
        out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """Fused Res3DBlock: relu(bn2(conv2(relu(bn1(conv1(x))))) + skip) [+tail].

    Same contract as :func:`lt_tpu.ops.pallas.res3d.res3d_block_fused`
    (BN pre-folded weights/biases, optional (ws, bs) projection skip,
    optional per-voxel matmul tail), but X must be divisible by 4 and one
    batch sample is processed per grid group (fold=1 tap layout).
    """
    b, size_x, size_y, size_z, cin = x.shape
    assert size_x % S == 0, size_x
    yz = size_y * size_z
    c = w1.shape[-1]
    assert skip_proj is not None or cin == c, (cin, c)
    out_c = tail[-1][0].shape[-1] if tail else c
    out_dtype = out_dtype or x.dtype
    nq = size_x // S

    w1p = pack_weights_q4(w1).astype(x.dtype)
    w2p = pack_weights_q4(w2).astype(x.dtype)
    b1r = b1.reshape(1, c).astype(jnp.float32)
    b2r = b2.reshape(1, c).astype(jnp.float32)

    x4 = x.reshape(b, size_x, yz, cin)
    x5 = x.reshape(b, nq, S, yz, cin)

    in_specs = [
        pl.BlockSpec((1, 1, yz, cin),
                     functools.partial(
                         lambda pi, g, j: (
                             g, jnp.clip(S * j + pi - 1, 0, size_x - 1),
                             0, 0), pi))
        for pi in range(P)
    ]
    in_specs += [
        # skip planes: quad j-1 (clamped)
        pl.BlockSpec((1, 1, S, yz, cin),
                     lambda g, j: (g, jnp.clip(j - 1, 0, nq - 1), 0, 0, 0)),
        pl.BlockSpec((P * 9 * cin, S * c), lambda g, j: (0, 0)),
        pl.BlockSpec((P * 9 * c, S * c), lambda g, j: (0, 0)),
        pl.BlockSpec((1, c), lambda g, j: (0, 0)),
        pl.BlockSpec((1, c), lambda g, j: (0, 0)),
    ]
    operands = [x4] * P + [x5, w1p, w2p, b1r, b2r]

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
        _res3d_q4_kernel, size_x=size_x, yz=yz, size_z=size_z, cin=cin,
        c=c, tail_relu=tuple(bool(t[2]) for t in tail),
        out_c=out_c, skip_proj=skip_proj is not None)

    out = pl.pallas_call(
        kernel,
        grid=(b, nq + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, S, yz, out_c),
            lambda g, j: (g, jnp.clip(j - 1, 0, nq - 1), 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq, S, yz, out_c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((yz, c), x.dtype)              # y1 plane ring
            for _ in range(P - 1)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)

    return out.reshape(b, size_x, size_y, size_z, out_c)
