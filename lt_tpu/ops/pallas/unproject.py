"""Fused Pallas TPU kernel for projective volume unprojection.

Replaces the XLA gather path of ``lt_tpu.ops.volumetric.unproject_heatmaps``
for the volumetric model's hot loop (reference op.py:99-166).  XLA lowers the
bilinear gather to per-element dynamic slices (~370 ms for the flagship
batch on v5e, 75% of the whole pipeline); this kernel is gather-free.

Key observations
----------------
1. The pelvis-centered coordinate volume is an *affine* function of integer
   grid indices (position + rotation * spacing * g), so the full world->
   image projection collapses to ONE 3x4 matrix per (batch, view):
   ``[u, v, w]^T = M @ [gx, gy, gz, 1]^T``.  No coordinate volume tensor is
   ever materialized for the kernel.
2. Bilinear sampling is a 2-sparse row mix followed by a 2-sparse column
   mix.  Per voxel tile, that is two small matmuls on the MXU:

     A (TILE, H)  @  F (H, W*C)      -> row-mixed M (TILE, W*C)
     (M * Bexp)   @  S (W*C, C)      -> output (TILE, C)

   where A holds the two bilinear row weights per voxel (built from iota
   compares), ``Bexp`` broadcasts the two column weights across channels,
   and S is a constant 0/1 channel-summing matrix.  ~4.9 TFLOP(bf16) for
   the flagship shapes — MXU work instead of 262k serial gathers.

The per-view feature map (H, W*C) stays resident in VMEM across all voxel
tiles of that (batch, view) — Pallas skips the re-copy when the block index
map repeats.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_sample(read_band, m, t, *, tile: int, grid_size: int, height: int,
                 width: int, channels: int, f32_mode: bool,
                 band_width=None, c0=None):
    """Bilinear samples of voxel tile ``t``: the shared sampling body.

    Args:
      read_band: callable (lane_start, n_lanes) -> (H, n_lanes) feature
        slice (lane_start 128-aligned).
      m: callable (i, j) -> scalar of the 3x4 affine matrix.
      c0: optional traced scalar — precomputed column-band start (< 0 means
        chunked full-width fallback); requires static ``band_width``.

    Returns:
      (TILE, C) float32 samples, zeroed where depth <= 0.
    """
    # Voxel linear indices for this tile, in (gx, gy, gz) scan order
    # (gz fastest) matching build_coord_volumes.
    n = t * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    gz = (n % grid_size).astype(jnp.float32)
    gy = ((n // grid_size) % grid_size).astype(jnp.float32)
    gx = (n // (grid_size * grid_size)).astype(jnp.float32)

    # Affine projection: [u, v, w] = M @ [gx, gy, gz, 1].  (TILE, 1) each.
    def row(i):
        return m(i, 0) * gx + m(i, 1) * gy + m(i, 2) * gz + m(i, 3)

    u, v, w = row(0), row(1), row(2)

    invalid = w <= 0.0                      # op.py:121
    w_safe = jnp.where(w == 0.0, 1.0, w)    # op.py:123
    x = jnp.where(invalid, 0.0, u / w_safe) * ((width - 1) / width)
    y = jnp.where(invalid, 0.0, v / w_safe) * ((height - 1) / height)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    dims = (((1,), (0,)), ((), ()))

    def dot(lhs, rhs):
        return jax.lax.dot_general(lhs, rhs, dims,
                                   preferred_element_type=jnp.float32)

    def dot_split(lhs32, rhs32):
        """~fp32-accurate MXU product via bf16 hi/lo splitting.

        Mosaic only lowers DEFAULT-precision dots (single bf16 pass, ~0.4%
        error); three split passes recover ~1e-6 relative accuracy for the
        parity (f32 features) path.
        """
        lhs_hi = lhs32.astype(jnp.bfloat16)
        lhs_lo = (lhs32 - lhs_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rhs_hi = rhs32.astype(jnp.bfloat16)
        rhs_lo = (rhs32 - rhs_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (dot(lhs_hi, rhs_hi) + dot(lhs_hi, rhs_lo)
                + dot(lhs_lo, rhs_hi))

    def sample_band(col0, band_w):
        """Exact bilinear samples against image columns [col0, col0+band_w).

        Taps outside the band contribute zero — exact whenever every
        in-image tap of the tile lies inside the band.  ``band_w`` static.
        """
        bwc = band_w * channels
        start = pl.multiple_of(col0 * channels, 128)
        f = read_band(start, bwc)                       # (H, band_w*C)

        # Row one-hot weights A (TILE, H): taps y0, y0+1; OOB rows drop.
        hh = jax.lax.broadcasted_iota(jnp.int32, (tile, height), 1)
        a = (jnp.where(hh == y0i, 1.0 - wy, 0.0)
             + jnp.where(hh == y0i + 1, wy, 0.0))
        m2 = dot_split(a, f) if f32_mode else dot(a.astype(f.dtype), f)

        # Column weights vs absolute column index; lane l -> col0 + l // C.
        ww = (jax.lax.broadcasted_iota(jnp.int32, (tile, bwc), 1)
              // channels + col0)
        bexp = (jnp.where(ww == x0i, 1.0 - wx, 0.0)
                + jnp.where(ww == x0i + 1, wx, 0.0))
        p = m2 * bexp                                    # (TILE, bwc) f32

        # Channel-collapse S (band_w*C, C): S[w*C + c, c] = 1 (0/1: exact).
        rows = jax.lax.broadcasted_iota(jnp.int32, (bwc, channels), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bwc, channels), 1)
        s = (rows % channels == cols).astype(jnp.bfloat16)
        if f32_mode:
            p_hi = p.astype(jnp.bfloat16)
            p_lo = (p - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return dot(p_hi, s) + dot(p_lo, s)           # (TILE, C)
        return dot(p.astype(jnp.bfloat16), s)

    if c0 is not None:
        # Host-precomputed column band (scalar-prefetched): c0 >= 0 means
        # every in-image tap of this tile lies in columns
        # [c0, c0 + band_width); c0 < 0 falls back to chunked full coverage.
        def banded():
            return sample_band(c0, band_width)

        def chunked():
            acc = jnp.zeros((tile, channels), jnp.float32)
            for cc0 in range(0, width, band_width):
                acc = acc + sample_band(cc0,
                                        min(band_width, width - cc0))
            return acc

        out = jax.lax.cond(c0 >= 0, banded, chunked)
    else:
        out = sample_band(0, width)

    return jnp.where(invalid, 0.0, out)


def _unproject_kernel(m_ref, f_ref, o_ref, *, tile: int, grid_size: int,
                      height: int, width: int, channels: int,
                      band_width=None, c0_ref=None, subtiles: int = 1):
    """One (bv, voxel-super-tile) grid step of ``subtiles`` banded tiles.

    Sub-tiling amortizes the fixed per-grid-step cost (block bookkeeping +
    pipeline bubbles, ~1 us/step measured on v5e) over several voxel tiles
    while keeping the per-tile column bands tight.
    """
    t = pl.program_id(1)
    for s in range(subtiles):
        tt = t * subtiles + s
        c0 = None if c0_ref is None else c0_ref[pl.program_id(0), tt]
        o_ref[0, pl.ds(s * tile, tile)] = _tile_sample(
            lambda start, n_lanes: f_ref[0, :, pl.ds(start, n_lanes)],
            lambda i, j: m_ref[0, i, j], tt,
            tile=tile, grid_size=grid_size, height=height, width=width,
            channels=channels, f32_mode=f_ref.dtype == jnp.float32,
            band_width=band_width, c0=c0).astype(o_ref.dtype)


def _unproject_agg_kernel(c0_sref, m_ref, f_ref, mask_ref, conf_ref, o_ref,
                          s_scratch, *, tile: int, grid_size: int,
                          height: int, width: int, channels: int,
                          band_width: int, n_views: int, method: str,
                          subtiles: int = 1):
    """One (batch, voxel-super-tile, view) grid step, in-VMEM aggregation.

    Views iterate fastest; each step samples one view's ``subtiles`` banded
    voxel tiles into scratch and the last view aggregates (softmax / conf /
    sum / max across the view axis, reference op.py:149-164) and writes the
    output super-tile — the (B, V, N, C) sampled tensor never exists in HBM.

    Everything runs in the transposed (C, voxels) orientation (see
    ``_tile_sample_t``); the output is (B, C, N).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    v = pl.program_id(2)
    wc = width * channels

    for s in range(subtiles):
        tt = t * subtiles + s
        c0 = c0_sref[b, v, tt]
        out = _tile_sample_t(
            lambda start, n_rows: f_ref[0, pl.ds(v * wc + start, n_rows), :],
            lambda i, j: m_ref[0, v, i, j], tt,
            tile=tile, grid_size=grid_size, height=height, width=width,
            channels=channels, f32_mode=f_ref.dtype == jnp.float32,
            band_width=band_width, c0=c0)
        s_scratch[pl.ds(v, 1), :, pl.ds(s * tile, tile)] = out[None]
    tile = tile * subtiles  # aggregation below covers the super-tile

    @pl.when(v == n_views - 1)
    def _():
        neg = jnp.float32(-1e9)
        masked_vals = []
        for u in range(n_views):
            keep = mask_ref[b, u] > 0.0
            masked_vals.append((keep, s_scratch[u]))

        if method == "softmax":
            logits = [jnp.where(k, val, neg) for k, val in masked_vals]
            m0 = logits[0]
            for lg in logits[1:]:
                m0 = jnp.maximum(m0, lg)
            num = jnp.zeros((channels, tile), jnp.float32)
            den = jnp.zeros((channels, tile), jnp.float32)
            for (k, val), lg in zip(masked_vals, logits):
                e = jnp.exp(lg - m0)
                den = den + e
                num = num + e * jnp.where(k, val, 0.0)
            agg = num / den
        elif method == "sum":
            agg = jnp.zeros((channels, tile), jnp.float32)
            for k, val in masked_vals:
                agg = agg + jnp.where(k, val, 0.0)
        elif method == "max":
            agg = jnp.full((channels, tile), -jnp.inf, jnp.float32)
            for k, val in masked_vals:
                agg = jnp.maximum(agg, jnp.where(k, val, -jnp.inf))
            agg = jnp.where(jnp.isneginf(agg), 0.0, agg)
        elif method.startswith("conf"):
            agg = jnp.zeros((channels, tile), jnp.float32)
            for u, (k, val) in enumerate(masked_vals):
                c = conf_ref[0, :, u:u + 1].astype(jnp.float32)  # (C, 1)
                agg = agg + jnp.where(k, val * c, 0.0)
        else:
            raise ValueError(method)
        o_ref[0] = agg


def _pick_subtiles(n_tiles: int, target: int = 8) -> int:
    """Largest divisor of ``n_tiles`` that is <= target."""
    s = min(target, n_tiles)
    while n_tiles % s:
        s -= 1
    return s


def _tile_sample_t(read_band, m, t, *, tile: int, grid_size: int,
                   height: int, width: int, channels: int, f32_mode: bool,
                   band_width=None, c0=None):
    """Transposed-orientation bilinear sampling of voxel tile ``t``.

    Identical math to ``_tile_sample`` but with voxels living in the LANE
    dimension throughout: per-voxel scalars are (1, TILE) rows (full 128-lane
    VPU utilization — the (TILE, 1) sublane-major chain measured 27 ms of the
    50 ms flagship kernel alone), the one-hot row/column mixes are built
    transposed, and the feature band arrives pre-transposed as
    (band_w*C, H) sublane-major (a cheap XLA-side relayout of the feature
    maps).  Output is (C, TILE).

    Args:
      read_band: callable (row_start, n_rows) -> (n_rows, H) slice of the
        view's transposed feature map F^T (W*C, H); row_start only needs
        sublane-tile alignment, so column bands need no 128-lane alignment.
      m: callable (i, j) -> scalar of the 3x4 affine matrix.

    Returns:
      (C, TILE) float32 samples, zeroed where depth <= 0.
    """
    n = t * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    gz = (n % grid_size).astype(jnp.float32)
    gy = ((n // grid_size) % grid_size).astype(jnp.float32)
    gx = (n // (grid_size * grid_size)).astype(jnp.float32)

    def row(i):
        return m(i, 0) * gx + m(i, 1) * gy + m(i, 2) * gz + m(i, 3)

    u, v, w = row(0), row(1), row(2)

    invalid = w <= 0.0                      # op.py:121
    w_safe = jnp.where(w == 0.0, 1.0, w)    # op.py:123
    x = jnp.where(invalid, 0.0, u / w_safe) * ((width - 1) / width)
    y = jnp.where(invalid, 0.0, v / w_safe) * ((height - 1) / height)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    dims = (((1,), (0,)), ((), ()))

    def dot(lhs, rhs):
        return jax.lax.dot_general(lhs, rhs, dims,
                                   preferred_element_type=jnp.float32)

    def dot_split(lhs32, rhs32):
        lhs_hi = lhs32.astype(jnp.bfloat16)
        lhs_lo = (lhs32 - lhs_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rhs_hi = rhs32.astype(jnp.bfloat16)
        rhs_lo = (rhs32 - rhs_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (dot(lhs_hi, rhs_hi) + dot(lhs_hi, rhs_lo)
                + dot(lhs_lo, rhs_hi))

    def sample_band(col0, band_w):
        bwc = band_w * channels
        f_t = read_band(col0 * channels, bwc)            # (band_w*C, H)

        # Transposed row one-hot A^T (H, TILE): taps y0, y0+1.
        hh = jax.lax.broadcasted_iota(jnp.int32, (height, tile), 0)
        a_t = (jnp.where(hh == y0i, 1.0 - wy, 0.0)
               + jnp.where(hh == y0i + 1, wy, 0.0))
        # m2^T (band_w*C, TILE) = F^T @ A^T.
        m2 = (dot_split(f_t, a_t) if f32_mode
              else dot(f_t, a_t.astype(f_t.dtype)))

        # Column mix + channel collapse in one VPU contraction: the column
        # weight depends on the band row r only through w = r // C, so the
        # one-hot is built at band resolution (band_w, TILE) — 1/C of the
        # old (band_w*C, TILE) compare/select build — and the collapse
        #   out[c, t] = sum_w m2[(w, c), t] * b16[w, t]
        # is a broadcast multiply + leading-axis sum on the (band_w, C,
        # TILE) sublane-split view (lanes untouched), replacing the
        # 25%-M-dense S^T matmul entirely.  All f32: strictly more accurate
        # than the old bf16 S-dot.
        wwb = (jax.lax.broadcasted_iota(jnp.int32, (band_w, tile), 0)
               + col0)
        b16 = (jnp.where(wwb == x0i, 1.0 - wx, 0.0)
               + jnp.where(wwb == x0i + 1, wx, 0.0))     # (band_w, TILE)
        m3 = m2.reshape(band_w, channels, tile)
        return jnp.sum(m3 * b16[:, None, :], axis=0)     # (C, TILE)

    if c0 is not None:
        def banded():
            return sample_band(c0, band_width)

        def chunked():
            acc = jnp.zeros((channels, tile), jnp.float32)
            for cc0 in range(0, width, band_width):
                acc = acc + sample_band(cc0,
                                        min(band_width, width - cc0))
            return acc

        out = jax.lax.cond(c0 >= 0, banded, chunked)
    else:
        out = sample_band(0, width)

    return jnp.where(invalid, 0.0, out)


def _sample_views_agg_impl(features: jnp.ndarray, affine: jnp.ndarray,
                           view_mask: Optional[jnp.ndarray],
                           vol_confidences: Optional[jnp.ndarray],
                           method: str, grid_size: int, tile: int = 256,
                           band_width: Optional[int] = 16,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused sample + cross-view aggregation: (B,V,H,W,C) -> (B, C, S^3).

    Transposed orientation throughout (voxels in lanes); the feature maps
    are relayouted once by XLA to F^T (B, V*W*C, H) — sublane-major bands
    need no 128-lane alignment, and per-voxel math runs at full VPU width.
    """
    b, v, h, wdt, c = features.shape
    n = grid_size ** 3
    tile = min(tile, n)
    assert n % tile == 0, (n, tile)
    n_tiles = n // tile
    subtiles = _pick_subtiles(n_tiles)

    # Sublane-tile alignment for the transposed band slice start (c0 * C).
    sub_align = 16 if features.dtype == jnp.bfloat16 else 8
    use_bands = (band_width is not None and band_width < wdt
                 and tile % grid_size == 0 and (c % sub_align == 0))
    if use_bands:
        c0s = _tile_column_bands(affine.reshape(b * v, 3, 4), grid_size,
                                 tile, h, wdt, band_width, c,
                                 align=1).reshape(b, v, n_tiles)
        bw = band_width
    else:
        c0s = jnp.full((b, v, n_tiles), -1, jnp.int32)
        bw = wdt  # chunked fallback == one full-width pass

    mask = (jnp.ones((b, v), jnp.float32) if view_mask is None
            else view_mask.astype(jnp.float32))
    conf = (jnp.zeros((b, c, v), jnp.float32) if vol_confidences is None
            else vol_confidences.astype(jnp.float32).swapaxes(1, 2))

    kernel = functools.partial(
        _unproject_agg_kernel, tile=tile, grid_size=grid_size, height=h,
        width=wdt, channels=c, band_width=bw, n_views=v, method=method,
        subtiles=subtiles)

    # F^T: (B, V, H, W, C) -> (B, V*W*C, H); one XLA relayout (~0.15 ms for
    # the flagship shapes), amortized across all voxel tiles.
    feats_t = jnp.transpose(features, (0, 1, 3, 4, 2)).reshape(
        b, v * wdt * c, h)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles // subtiles, v),
        in_specs=[
            pl.BlockSpec((1, v, 3, 4), lambda bb, t, vv, sref: (bb, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            # All V transposed feature maps of one batch resident at once
            # (~2.3 MB for the flagship shapes).
            pl.BlockSpec((1, v * wdt * c, h),
                         lambda bb, t, vv, sref: (bb, 0, 0)),
            # Whole (B, V) mask in SMEM: a (1, V) block would violate the
            # last-two-dims blocking rule for multi-batch inputs.
            pl.BlockSpec((b, v), lambda bb, t, vv, sref: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, v), lambda bb, t, vv, sref: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, tile * subtiles),
                               lambda bb, t, vv, sref: (bb, 0, t)),
        scratch_shapes=[pltpu.VMEM((v, c, tile * subtiles), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(c0s, affine, feats_t, mask, conf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def sample_views_agg(features, m, view_mask, method, grid_size, tile,
                     band_width, interpret):
    """Differentiable fused sample + cross-view aggregation.

    Forward is the fused kernel (the (B, V, C, N) sampled tensor never
    exists in HBM — the dominant training-memory residual at flagship
    shapes).  Backward recomputes the per-view samples TILE-WISE inside the
    backward pass (a transient, not a remat residual saved across the whole
    V2V forward+backward), applies the aggregation VJP in XLA, and pushes
    the cotangent through the banded transposed gradient kernel.

    Supports 'softmax' and 'sum' (the reference's trained configurations,
    op.py:149-164); 'conf'/'max' stay on the unfused path.
    """
    return _sample_views_agg_impl(features, m, view_mask, None, method,
                                  grid_size, tile, band_width, interpret)


def _agg_fwd(features, m, view_mask, method, grid_size, tile, band_width,
             interpret):
    out = _sample_views_agg_impl(features, m, view_mask, None, method,
                                 grid_size, tile, band_width, interpret)
    return out, (features, m, view_mask)


def _agg_bwd(method, grid_size, tile, band_width, interpret, res, g):
    features, m, view_mask = res
    b, v, h, wdt, c = features.shape
    n = grid_size ** 3

    def sample(f):
        s = sample_views_affine_t(f.reshape(b * v, h, wdt, c),
                                  m.reshape(b * v, 3, 4), grid_size, tile,
                                  band_width, interpret, jnp.bfloat16)
        return s.reshape(b, v, c, n)

    s, pull = jax.vjp(sample, features)
    s32 = s.astype(jnp.float32)
    mask = None
    if view_mask is not None:
        mask = (view_mask > 0.0)[:, :, None, None]

    g32 = g.astype(jnp.float32)[:, None]                  # (B, 1, C, N)
    if method == "softmax":
        logits = jnp.where(mask, s32, -1e9) if mask is not None else s32
        wgt = jax.nn.softmax(logits, axis=1)
        contrib = jnp.where(mask, s32, 0.0) if mask is not None else s32
        out = (wgt * contrib).sum(axis=1, keepdims=True)
        # d out / d s_k = w_k * (1 + s_k - out) for valid views (w_k ~ 0
        # for masked ones).
        ds = g32 * wgt * (1.0 + contrib - out)
        if mask is not None:
            ds = jnp.where(mask, ds, 0.0)
    elif method == "sum":
        ds = jnp.broadcast_to(g32, s32.shape)
        if mask is not None:
            ds = jnp.where(mask, ds, 0.0)
    else:
        raise NotImplementedError(
            f"fused-aggregation backward not defined for {method!r}")

    (df,) = pull(ds.astype(s.dtype))
    dmask = None if view_mask is None else jnp.zeros_like(view_mask)
    return df, jnp.zeros_like(m), dmask


sample_views_agg.defvjp(_agg_fwd, _agg_bwd)


def _sample_views_fwd_impl(features: jnp.ndarray, affine: jnp.ndarray,
                           grid_size: int, tile: int = 256,
                           band_width: Optional[int] = 16,
                           interpret: bool = False,
                           out_dtype=jnp.float32) -> jnp.ndarray:
    """Bilinear-sample every voxel of an affine grid from per-view features.

    Args:
      features: (BV, H, W, C) channels-last feature maps.
      affine: (BV, 3, 4) combined projection @ grid-affine matrices mapping
        integer grid indices (gx, gy, gz, 1) to homogeneous image coords in
        heatmap pixels.
      grid_size: S; the voxel grid is S^3 in (gx, gy, gz) order, gz fastest.
      tile: voxels per kernel step.
      band_width: column-band optimization — each tile first computes the
        column extent of its in-image taps; when it fits in ``band_width``
        image columns (typical: a tile of gz-columns projects to a thin
        near-vertical sliver) the matmuls run on that band only (~width/band
        fewer MXU passes), else the exact full-width path runs. None
        disables banding.

    Returns:
      (BV, S^3, C) float32 sampled values (0 where depth <= 0 or taps fall
      outside the map), matching grid_sample align_corners=True + zeros
      padding semantics.
    """
    bv, h, wdt, c = features.shape
    n = grid_size ** 3
    tile = min(tile, n)
    assert n % tile == 0, (n, tile)
    feats = features.reshape(bv, h, wdt * c)
    n_tiles = n // tile
    subtiles = _pick_subtiles(n_tiles)

    use_bands = (band_width is not None and band_width < wdt
                 and tile % grid_size == 0 and 128 % c == 0)
    if not use_bands:
        kernel = functools.partial(_unproject_kernel, tile=tile,
                                   grid_size=grid_size, height=h, width=wdt,
                                   channels=c, band_width=None,
                                   subtiles=subtiles)
        return pl.pallas_call(
            kernel,
            grid=(bv, n_tiles // subtiles),
            in_specs=[
                pl.BlockSpec((1, 3, 4), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, h, wdt * c), lambda b, t: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, tile * subtiles, c),
                                   lambda b, t: (b, t, 0)),
            out_shape=jax.ShapeDtypeStruct((bv, n, c), out_dtype),
            interpret=interpret,
        )(affine, feats)

    c0s = _tile_column_bands(affine, grid_size, tile, h, wdt, band_width, c)

    def kernel(c0_sref, m_ref, f_ref, o_ref):
        _unproject_kernel(m_ref, f_ref, o_ref, tile=tile,
                          grid_size=grid_size, height=h, width=wdt,
                          channels=c, band_width=band_width, c0_ref=c0_sref,
                          subtiles=subtiles)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bv, n_tiles // subtiles),
        in_specs=[
            pl.BlockSpec((1, 3, 4), lambda b, t, sref: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, wdt * c), lambda b, t, sref: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile * subtiles, c),
                               lambda b, t, sref: (b, t, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bv, n, c), out_dtype),
        interpret=interpret,
    )(c0s, affine, feats)


def _unproject_kernel_t(c0_sref, m_ref, f_ref, o_ref, *, tile: int,
                        grid_size: int, height: int, width: int,
                        channels: int, band_width: int, subtiles: int):
    """Transposed-orientation unfused sampling: output block (1, C, N-tile).

    The (BV, C, N) output layout is PAD-FREE on TPU (N in lanes, C in
    sublanes) — the standard (BV, N, C) orientation tiles C=32 into 128
    lanes, a 4x HBM expansion that alone decides whether flagship batch-5
    training fits in one chip's HBM.
    """
    t = pl.program_id(1)
    for s in range(subtiles):
        tt = t * subtiles + s
        c0 = c0_sref[pl.program_id(0), tt]
        out = _tile_sample_t(
            lambda start, n_rows: f_ref[0, pl.ds(start, n_rows), :],
            lambda i, j: m_ref[0, i, j], tt,
            tile=tile, grid_size=grid_size, height=height, width=width,
            channels=channels, f32_mode=f_ref.dtype == jnp.float32,
            band_width=band_width, c0=c0)
        o_ref[0, :, pl.ds(s * tile, tile)] = out.astype(o_ref.dtype)


def _sample_views_fwd_impl_t(features: jnp.ndarray, affine: jnp.ndarray,
                             grid_size: int, tile: int = 256,
                             band_width: Optional[int] = 16,
                             interpret: bool = False,
                             out_dtype=jnp.float32) -> jnp.ndarray:
    """Transposed twin of :func:`_sample_views_fwd_impl`: (BV, C, S^3)."""
    bv, h, wdt, c = features.shape
    n = grid_size ** 3
    tile = min(tile, n)
    assert n % tile == 0, (n, tile)
    n_tiles = n // tile
    subtiles = _pick_subtiles(n_tiles)

    sub_align = 16 if features.dtype == jnp.bfloat16 else 8
    use_bands = (band_width is not None and band_width < wdt
                 and tile % grid_size == 0 and (c % sub_align == 0))
    if use_bands:
        c0s = _tile_column_bands(affine, grid_size, tile, h, wdt,
                                 band_width, c, align=1)
        bw = band_width
    else:
        c0s = jnp.full((bv, n_tiles), -1, jnp.int32)
        bw = wdt  # chunked fallback == one full-width pass

    # F^T (BV, W*C, H): one XLA relayout amortized across all voxel tiles.
    feats_t = jnp.transpose(features, (0, 2, 3, 1)).reshape(bv, wdt * c, h)

    kernel = functools.partial(_unproject_kernel_t, tile=tile,
                               grid_size=grid_size, height=h, width=wdt,
                               channels=c, band_width=bw, subtiles=subtiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bv, n_tiles // subtiles),
        in_specs=[
            pl.BlockSpec((1, 3, 4), lambda b, t, sref: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, wdt * c, h), lambda b, t, sref: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, tile * subtiles),
                               lambda b, t, sref: (b, 0, t)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bv, c, n), out_dtype),
        interpret=interpret,
    )(c0s, affine, feats_t)


def _tile_column_bands(affine: jnp.ndarray, grid_size: int, tile: int,
                       height: int, width: int, band_width: int,
                       channels: int, align: Optional[int] = None
                       ) -> jnp.ndarray:
    """Per-(bv, tile) aligned column-band starts, or -1 for full fallback.

    A tile covers ``tile // grid_size`` full gz-columns, i.e. an axis-aligned
    box in grid-index space.  The projected column u/w is linear-fractional
    in the grid index, so (given w > 0 on the whole box) its extrema over the
    box sit at the 8 corners — the corner extent is exact, not a bound.
    Tiles with any corner at w <= 0 or an extent wider than ``band_width``
    get -1 (kernel falls back to chunked full coverage).
    """
    bv = affine.shape[0]
    s = grid_size
    cols_per_tile = tile // s
    tiles_n = (s * s * s) // tile
    t_idx = jnp.arange(tiles_n)
    gy0 = (t_idx * cols_per_tile) % s
    gx0 = (t_idx * cols_per_tile) // s

    # A tile spans one gx value, cols_per_tile gy values, and all of gz
    # (grid_size % cols_per_tile == 0, so gy never wraps across gx).
    assert s % cols_per_tile == 0, (s, cols_per_tile)
    corners = []
    for dy in (0, cols_per_tile - 1):
        for dz in (0, s - 1):
            corners.append(jnp.stack(
                [gx0, gy0 + dy, jnp.full_like(gy0, dz),
                 jnp.ones_like(gy0)], axis=-1))
    g = jnp.stack(corners, axis=1).astype(jnp.float32)  # (T, 4, 4)

    uvw = jnp.einsum("bij,tkj->btki", affine, g,
                     precision=jax.lax.Precision.HIGHEST)  # (BV, T, 8, 3)
    w = uvw[..., 2]
    pos = jnp.all(w > 0.0, axis=-1)                        # (BV, T)
    x = uvw[..., 0] / jnp.where(w == 0.0, 1.0, w) * ((width - 1) / width)

    x0min = jnp.clip(jnp.floor(jnp.min(x, axis=-1)), 0, width - 1)
    x1max = jnp.clip(jnp.floor(jnp.max(x, axis=-1)) + 1, 0, width - 1)

    if align is None:
        align = max(1, 128 // channels)
    c0 = (x0min.astype(jnp.int32) // align) * align
    c0 = jnp.clip(c0, 0, width - band_width)
    fits = pos & (x1max.astype(jnp.int32) < c0 + band_width)
    return jnp.where(fits, c0, -1).astype(jnp.int32)


def unproject_heatmaps_affine(features: jnp.ndarray, proj_matrices: jnp.ndarray,
                              grid_affine: jnp.ndarray, grid_size: int,
                              volume_aggregation_method: str = "softmax",
                              vol_confidences: Optional[jnp.ndarray] = None,
                              view_mask: Optional[jnp.ndarray] = None,
                              tile: int = 512,
                              band_width: Optional[int] = 16,
                              channels_last: bool = False,
                              fuse_aggregation: bool = False,
                              aggregation_dtype=None,
                              interpret: bool = False) -> jnp.ndarray:
    """Fused-unprojection equivalent of ``volumetric.unproject_heatmaps``.

    Args:
      features: (B, V, H, W, C).
      proj_matrices: (B, V, 3, 4) in heatmap pixel units.
      grid_affine: (B, 3, 4) mapping grid indices -> world mm (from
        ``volumetric.coord_volume_affine``).
      grid_size: S of the S^3 voxel grid.
      channels_last: if True, return (B, S, S, S, C) — the kernel's native
        voxel scan order, zero-copy into the NDHWC V2V net.
      fuse_aggregation: run the cross-view aggregation inside the kernel —
        the (B, V, N, C) sampled tensor never exists in HBM.  softmax/sum
        (no confidences) are differentiable via :func:`sample_views_agg`;
        conf/max remain forward-only.
      aggregation_dtype: optional dtype for the sampled tensor on the
        UNFUSED path (e.g. bfloat16 during training: halves the softmax-
        aggregation residual that dominates big-batch training memory).

    Returns:
      (B, C, S, S, S) aggregated volumes (or NDHWC with channels_last).
    """
    b, v, h, wdt, c = features.shape

    # Compose world-affine with projection: (B, V, 3, 4).
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32), (b, 1, 4))
    affine4 = jnp.concatenate([grid_affine, bottom], axis=1)  # (B, 4, 4)
    m = jnp.einsum("bvij,bjk->bvik", proj_matrices, affine4,
                   precision=jax.lax.Precision.HIGHEST)

    n = grid_size ** 3
    if fuse_aggregation:
        # Fused kernel emits (B, C, N) (transposed orientation).  softmax/
        # sum without confidences ride the differentiable wrapper (training
        # never materializes the (B, V, C, N) sampled tensor); conf/max
        # stay forward-only.
        if (volume_aggregation_method in ("softmax", "sum")
                and vol_confidences is None):
            volume = sample_views_agg(
                features, m, view_mask, volume_aggregation_method,
                grid_size, tile, band_width, interpret)
        else:
            volume = _sample_views_agg_impl(
                features, m, view_mask, vol_confidences,
                volume_aggregation_method, grid_size, tile, band_width,
                interpret)
        # Cast BEFORE the channels-last transpose: the volume only feeds
        # the V2V net (which computes in aggregation_dtype anyway), and
        # casting first halves the 64^3 relayout's HBM traffic.
        if aggregation_dtype is not None:
            volume = volume.astype(aggregation_dtype)
        if channels_last:
            return volume.swapaxes(1, 2).reshape(
                b, grid_size, grid_size, grid_size, c)
        return volume.reshape(b, c, grid_size, grid_size, grid_size)

    # Unfused (training) path, transposed orientation throughout: the
    # kernel emits (B, V, C, N) directly in aggregation_dtype.  Both
    # choices are HBM-peak levers at flagship batch 5: a post-hoc cast
    # would materialize the f32 buffer anyway, and the (..., N, C)
    # orientation tiles C=32 into 128 lanes — a 4x layout-padding
    # expansion (2.5 GB) on the softmax residual that alone kept
    # reference batch-5 training from fitting in one chip's HBM.
    sampled = sample_views_affine_t(
        features.reshape(b * v, h, wdt, c), m.reshape(b * v, 3, 4),
        grid_size, tile, band_width, interpret,
        aggregation_dtype or jnp.float32)
    sampled = sampled.reshape(b, v, c, n)

    mask = None
    if view_mask is not None:
        mask = view_mask.astype(jnp.bool_)[:, :, None, None]

    method = volume_aggregation_method
    if method.startswith("conf"):
        conf = vol_confidences[:, :, :, None]                # (B, V, C, 1)
        if mask is not None:
            conf = jnp.where(mask, conf, 0.0)
        volume = (sampled * conf).sum(axis=1)
    elif method == "sum":
        if mask is not None:
            sampled = jnp.where(mask, sampled, 0.0)
        volume = sampled.sum(axis=1)
    elif method == "max":
        if mask is not None:
            sampled = jnp.where(mask, sampled, -jnp.inf)
        volume = sampled.max(axis=1)
        if mask is not None:
            volume = jnp.where(jnp.isneginf(volume), 0.0, volume)
    elif method == "softmax":
        logits = sampled
        if mask is not None:
            logits = jnp.where(mask, logits, -1e9)
        weights = jax.nn.softmax(logits, axis=1)
        contrib = jnp.where(mask, sampled, 0.0) if mask is not None else sampled
        volume = (contrib * weights).sum(axis=1)
    else:
        raise ValueError(f"Unknown volume_aggregation_method: {method}")

    # volume is (B, C, N) here (transposed orientation).  Emit it in the
    # aggregation dtype too: it only feeds the V2V net (which computes in
    # that dtype anyway), and an f32 64^3 volume is a 160 MB tensor that
    # remat saves at padded layouts in the training backward.
    if aggregation_dtype is not None:
        volume = volume.astype(aggregation_dtype)
    if channels_last:
        return volume.swapaxes(1, 2).reshape(
            b, grid_size, grid_size, grid_size, c)
    return volume.reshape(b, c, grid_size, grid_size, grid_size)


# ---------------------------------------------------------------------------
# Backward: dL/dFeatures is the transposed row-mix, accumulated per (b, v)
# ---------------------------------------------------------------------------


def _unproject_bwd_kernel(m_ref, g_ref, o_ref, *, tile: int, grid_size: int,
                          height: int, width: int, channels: int):
    """Accumulate dF (H, W*C) for one (bv) from one voxel tile's grads.

    Forward per tile: out = (A @ F * Bexp) @ S with S the channel-collapse.
    Hence dF = A^T @ (gS^T * Bexp) where gS^T just broadcasts the upstream
    grad across the W lane groups.  Grid iterates tiles for a fixed (bv);
    the output block is revisited and accumulated in VMEM, flushed once.
    """
    t = pl.program_id(1)
    wc = width * channels

    n = t * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    gz = (n % grid_size).astype(jnp.float32)
    gy = ((n // grid_size) % grid_size).astype(jnp.float32)
    gx = (n // (grid_size * grid_size)).astype(jnp.float32)

    def row(i):
        return (m_ref[0, i, 0] * gx + m_ref[0, i, 1] * gy
                + m_ref[0, i, 2] * gz + m_ref[0, i, 3])

    u, v, w = row(0), row(1), row(2)
    invalid = w <= 0.0
    w_safe = jnp.where(w == 0.0, 1.0, w)
    x = jnp.where(invalid, 0.0, u / w_safe) * ((width - 1) / width)
    y = jnp.where(invalid, 0.0, v / w_safe) * ((height - 1) / height)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    g = jnp.where(invalid, 0.0, g_ref[0].astype(jnp.float32))  # (TILE, C)
    gp = pltpu.repeat(g, width, axis=1)                        # (TILE, W*C)

    ww = (jax.lax.broadcasted_iota(jnp.int32, (tile, wc), 1) // channels)
    bexp = (jnp.where(ww == x0i, 1.0 - wx, 0.0)
            + jnp.where(ww == x0i + 1, wx, 0.0))
    dm = (gp * bexp).astype(jnp.bfloat16)                      # (TILE, W*C)

    hh = jax.lax.broadcasted_iota(jnp.int32, (tile, height), 1)
    a = (jnp.where(hh == y0i, 1.0 - wy, 0.0)
         + jnp.where(hh == y0i + 1, wy, 0.0)).astype(jnp.bfloat16)

    # A^T @ dM: contract the tile dim -> (H, W*C).
    contrib = jax.lax.dot_general(
        a, dm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _():
        o_ref[0] = contrib

    @pl.when(t > 0)
    def _():
        o_ref[0] = o_ref[0] + contrib


def _sample_views_grad_features(g: jnp.ndarray, affine: jnp.ndarray,
                                feat_shape, grid_size: int, tile: int,
                                interpret: bool) -> jnp.ndarray:
    bv, h, wdt, c = feat_shape
    n = grid_size ** 3
    tile = min(tile, n)

    kernel = functools.partial(_unproject_bwd_kernel, tile=tile,
                               grid_size=grid_size, height=h, width=wdt,
                               channels=c)
    df = pl.pallas_call(
        kernel,
        grid=(bv, n // tile),
        in_specs=[
            pl.BlockSpec((1, 3, 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, c), lambda b, t: (b, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, wdt * c), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bv, h, wdt * c), jnp.float32),
        interpret=interpret,
    )(affine, g)
    return df.reshape(bv, h, wdt, c)


def _unproject_bwd_kernel_t(c0_sref, m_ref, g_ref, o_ref, *, tile: int,
                            grid_size: int, height: int, width: int,
                            channels: int, band_width: int):
    """Transposed backward: accumulate dF^T (W*C, H) from (C, TILE) grads.

    Same math as :func:`_unproject_bwd_kernel` with every operand
    transposed (voxels in lanes): dF^T = dM^T @ A with dM^T the upstream
    grad broadcast across the W sublane groups times the column weights.
    Tiles whose taps fit a precomputed column band (c0 >= 0, the common
    case) only build and accumulate the (band_width*C, TILE) slice —
    width/band_width fewer FLOPs than the full-width pass.
    """
    t = pl.program_id(1)
    wc = width * channels

    n = t * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    gz = (n % grid_size).astype(jnp.float32)
    gy = ((n // grid_size) % grid_size).astype(jnp.float32)
    gx = (n // (grid_size * grid_size)).astype(jnp.float32)

    def row(i):
        return (m_ref[0, i, 0] * gx + m_ref[0, i, 1] * gy
                + m_ref[0, i, 2] * gz + m_ref[0, i, 3])

    u, v, w = row(0), row(1), row(2)
    invalid = w <= 0.0
    w_safe = jnp.where(w == 0.0, 1.0, w)
    x = jnp.where(invalid, 0.0, u / w_safe) * ((width - 1) / width)
    y = jnp.where(invalid, 0.0, v / w_safe) * ((height - 1) / height)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    g = jnp.where(invalid, 0.0, g_ref[0].astype(jnp.float32))  # (C, TILE)

    hh = jax.lax.broadcasted_iota(jnp.int32, (height, tile), 0)
    a_t = (jnp.where(hh == y0i, 1.0 - wy, 0.0)
           + jnp.where(hh == y0i + 1, wy, 0.0)).astype(jnp.bfloat16)

    def band_contrib(col0, band_w):
        bwc = band_w * channels
        gp = pltpu.repeat(g, band_w, axis=0)                   # (bwc, TILE)
        ww = (jax.lax.broadcasted_iota(jnp.int32, (bwc, tile), 0)
              // channels + col0)
        bexp = (jnp.where(ww == x0i, 1.0 - wx, 0.0)
                + jnp.where(ww == x0i + 1, wx, 0.0))
        dm_t = (gp * bexp).astype(jnp.bfloat16)                # (bwc, TILE)
        # dM^T @ A: contract the tile (lane) dim -> (bwc, H).
        return jax.lax.dot_general(
            dm_t, a_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _():
        o_ref[0] = jnp.zeros((wc, height), jnp.float32)

    c0 = c0_sref[pl.program_id(0), t]

    @pl.when(c0 >= 0)
    def _():
        start = pl.multiple_of(c0 * channels, 8)
        o_ref[0, pl.ds(start, band_width * channels)] += band_contrib(
            c0, band_width)

    @pl.when(c0 < 0)
    def _():
        o_ref[0] += band_contrib(0, width)


def _sample_views_grad_features_t(g: jnp.ndarray, affine: jnp.ndarray,
                                  feat_shape, grid_size: int, tile: int,
                                  band_width: Optional[int],
                                  interpret: bool) -> jnp.ndarray:
    bv, h, wdt, c = feat_shape
    n = grid_size ** 3
    tile = min(tile, n)
    assert n % tile == 0, (n, tile)
    n_tiles = n // tile

    # c % 8 == 0 makes every c0 * c store offset sublane-aligned for the
    # f32 dF^T output (the pl.multiple_of claim in the kernel would be a
    # lie otherwise — silently wrong gradients on hardware).
    if (band_width is not None and band_width < wdt
            and tile % grid_size == 0 and c % 8 == 0):
        c0s = _tile_column_bands(affine, grid_size, tile, h, wdt,
                                 band_width, c, align=1)
        bw = band_width
    else:
        c0s = jnp.full((bv, n_tiles), -1, jnp.int32)
        bw = wdt

    kernel = functools.partial(_unproject_bwd_kernel_t, tile=tile,
                               grid_size=grid_size, height=h, width=wdt,
                               channels=c, band_width=bw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bv, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, 4), lambda b, t, sref: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, tile), lambda b, t, sref: (b, 0, t)),
        ],
        out_specs=pl.BlockSpec((1, wdt * c, h),
                               lambda b, t, sref: (b, 0, 0)),
    )
    df_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bv, wdt * c, h), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(c0s, affine, g)
    return jnp.transpose(df_t.reshape(bv, wdt, c, h), (0, 3, 1, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def sample_views_affine_t(features, affine, grid_size, tile=256,
                          band_width=16, interpret=False,
                          out_dtype=jnp.float32):
    """Differentiable transposed sampling: (BV, H, W, C) -> (BV, C, S^3).

    Pad-free output orientation (see _unproject_kernel_t); gradients flow
    to ``features`` only, like :func:`sample_views_affine`.
    """
    return _sample_views_fwd_impl_t(features, affine, grid_size, tile,
                                    band_width, interpret, out_dtype)


def _sample_views_fwd_t(features, affine, grid_size, tile, band_width,
                        interpret, out_dtype):
    out = _sample_views_fwd_impl_t(features, affine, grid_size, tile,
                                   band_width, interpret, out_dtype)
    token = jnp.zeros((0,) + features.shape[1:], features.dtype)
    return out, (affine, token)


def _sample_views_bwd_t(grid_size, tile, band_width, interpret, out_dtype,
                        res, g):
    affine, token = res
    feat_shape = (affine.shape[0],) + token.shape[1:]
    df = _sample_views_grad_features_t(g, affine, feat_shape, grid_size,
                                       tile, band_width, interpret)
    return df.astype(token.dtype), jnp.zeros_like(affine)


sample_views_affine_t.defvjp(_sample_views_fwd_t, _sample_views_bwd_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def sample_views_affine(features, affine, grid_size, tile=256,
                        band_width=16, interpret=False,
                        out_dtype=jnp.float32):
    """Differentiable fused sampling (see _sample_views_fwd_impl).

    Gradients flow to ``features`` only; ``affine`` gets zeros.  That is
    sufficient for every reference training config: cameras and coordinate
    volumes are inputs, not parameters (the coordinate-volume gradient used
    by soft-argmax flows through integrate_tensor_3d_with_coordinates, not
    through the unprojection).
    """
    return _sample_views_fwd_impl(features, affine, grid_size, tile,
                                  band_width, interpret, out_dtype)


def _sample_views_fwd(features, affine, grid_size, tile, band_width,
                      interpret, out_dtype):
    out = _sample_views_fwd_impl(features, affine, grid_size, tile,
                                 band_width, interpret, out_dtype)
    # Zero-length token carries the feature shape/dtype through residuals
    # (residuals must be JAX types).
    token = jnp.zeros((0,) + features.shape[1:], features.dtype)
    return out, (affine, token)


def _sample_views_bwd(grid_size, tile, band_width, interpret, out_dtype,
                      res, g):
    affine, token = res
    feat_shape = (affine.shape[0],) + token.shape[1:]
    df = _sample_views_grad_features(g, affine, feat_shape, grid_size, tile,
                                     interpret)
    return df.astype(token.dtype), jnp.zeros_like(affine)


sample_views_affine.defvjp(_sample_views_fwd, _sample_views_bwd)
