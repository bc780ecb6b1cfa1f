"""V2V voxel-to-voxel 3D hourglass network.

Functional parity target: /root/reference/mvn/models/v2v.py — ``Basic3DBlock``
(:7-17), ``Res3DBlock`` (:20-42), ``Pool3DBlock`` (:45-51),
``Upsample3DBlock`` (:54-66), ``EncoderDecorder`` (:69-138), ``V2VModel``
(:141-180).

TPU-first design notes
----------------------
- NDHWC layout (channels last): 3D convs lower to MXU matmuls over the
  channel contraction; channels-last keeps the 128-lane axis dense.
- Optional bfloat16 compute (params and BN stats stay fp32).
- The encoder halves 64^3 five times down to 2^3; all shapes are static so
  XLA tiles every conv onto the MXU.
- Transposed 3D convs (k=2, s=2, p=0) map to ``lax.conv_transpose`` with
  explicit padding k - 1 - p = 1 per side, doubling each spatial dim exactly
  like PyTorch's ``ConvTranspose3d(2, 2)``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

import contextlib

from lt_tpu.models.backbone import BN_EPS, BatchNorm


_FORCE_XLA = 0


@contextlib.contextmanager
def force_xla():
    """Disable every Pallas/z2d fast path within the block (trace-time).

    Used when the volume is spatially sharded over the mesh
    (lt_tpu.parallel.spatial): GSPMD can partition XLA convs (inserting
    halo exchanges) but not our single-device pallas_calls.
    """
    global _FORCE_XLA
    _FORCE_XLA += 1
    try:
        yield
    finally:
        _FORCE_XLA -= 1


def _use_pallas_res3d(train: bool, size_x: int) -> bool:
    """Gate for the fused whole-Res3DBlock inference kernel (ops/pallas/
    res3d.py): ON by default on TPU inference — it halves the dominant
    32ch@64^3 blocks (16.5 -> 8.4 ms standalone, 6.8 ms chained, measured
    benchmarks/bench_res3d.py) and chains custom-call-to-custom-call.
    Kill switch: LT_TPU_DISABLE_PALLAS_RES3D=1.
    """
    import os

    return (not train and size_x % 2 == 0 and not _FORCE_XLA
            and jax.default_backend() == "tpu"
            and not os.environ.get("LT_TPU_DISABLE_PALLAS_RES3D"))


def _use_pallas_conv3d(kernel: int, features: int, train: bool) -> bool:
    """Gate for the fused inference conv kernel (see Conv3D).

    OFF by default: the kernel beats XLA's conv standalone (6.9 vs 9.4 ms
    at 64^3x32ch) and fusing BN/ReLU/skip recovers most in-context relayout
    cost (115 -> 92 ms V2V), but XLA's fully-fused conv chain still wins
    end-to-end (80 ms) because pool/upsample/k1/k7 boundaries remain.
    Enable with LT_TPU_ENABLE_PALLAS_CONV3D=1; the decisive step is an
    all-Pallas V2V level (ROADMAP).
    """
    import os

    return (kernel == 3 and not train and 3 * features <= 128
            and jax.default_backend() == "tpu" and not _FORCE_XLA
            and bool(os.environ.get("LT_TPU_ENABLE_PALLAS_CONV3D")))


def _use_mp_conv(kernel: int, train: bool, size_x: int) -> bool:
    """Gate for the multi-plane k>=5 inference conv (ops/pallas/conv_mp.py).

    The s=2 plane-pair packing gives the k=7 front conv a (M, 2*49*Cin) x
    (2*49*Cin, 8*Cout) GEMM at 87.5% tap density — measured 12.9 -> 9.2 ms
    on the flagship front conv vs the z-decomposed XLA path
    (benchmarks/bench_conv_mp.py).  Kill switch: LT_TPU_DISABLE_CONV_MP=1.
    """
    import os

    return (kernel >= 5 and kernel % 2 == 1 and not train
            and size_x % 2 == 0 and jax.default_backend() == "tpu"
            and not _FORCE_XLA
            and not os.environ.get("LT_TPU_DISABLE_CONV_MP"))


def conv3d_as_z2d(x, kernel, padding: int, compute_dtype):
    """A k^3 conv as ONE (k, k) 2D conv: z moves into the batch dim and the
    k z-shifted slabs stack into input channels.

    XLA's 3D conv picks batch-second-minor padded layouts for the 64^3
    C<=32 tensors and runs the flagship training step's k7/k3 convs at
    12-17 TFLOP/s with ~200 ms/step of relayout copies around them
    (round-3 profile).  Its 2D image-conv path (the same one running the
    ResNet backbone at ~66 TFLOP/s) gets sane NHWC layouts and a huge
    effective M = B*Z; the stacked-slab formulation is numerically the
    same contraction:

        out[b, x, y, z, o] = conv2d_{k x k}(S[b*Z + z], W2)[x, y, o]
        S[..., kz*C + c] = x_padded[b, x, y, z + kz, c]
        W2[kx, ky, kz*C + c, o] = W[kx, ky, kz, c, o]

    Fully autodiffable (slab stacking backward = slice-adds; 2D conv
    grads use XLA's tuned dgrad/wgrad).
    """
    k = kernel.shape[0]
    b, sx, sy, sz, c = x.shape
    o = kernel.shape[4]
    p = padding
    x = x.astype(compute_dtype)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (p, p), (0, 0)))
    s = jnp.concatenate([xp[:, :, :, i:i + sz, :] for i in range(k)], -1)
    s = jnp.moveaxis(s, 3, 1).reshape(b * sz, sx, sy, k * c)
    w2 = kernel.reshape(k, k, k * c, o).astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        s, w2, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.moveaxis(y.reshape(b, sz, sx, sy, o), 1, 3)


def _use_z2d_train_conv(train: bool, k: int, z: int) -> bool:
    """Gate for the z-stacked 2D training conv: the big-Z, narrow-C convs
    where XLA's 3D path is slowest.  Kill switch: LT_TPU_DISABLE_Z2D=1;
    LT_TPU_Z2D_MIN_Z overrides the minimum volume depth (default 16;
    measured 532 vs 543 ms/step flagship b5 against 64)."""
    import os

    min_z = int(os.environ.get("LT_TPU_Z2D_MIN_Z", "16") or "16")
    return (train and k in (3, 7) and z >= min_z and not _FORCE_XLA
            and not os.environ.get("LT_TPU_DISABLE_Z2D"))


def _bn_constants(bn: "BatchNorm", channels: int):
    """Read a BatchNorm child's inference constants for conv folding.

    A dummy one-row call declares the variables (so init works); the values
    are then read directly off the bound child — the parameter tree is
    identical to the unfused path.
    """
    bn(jnp.zeros((1, channels), jnp.float32), train=False)
    params = bn.variables["params"]["BatchNorm_0"]
    stats = bn.variables["batch_stats"]["BatchNorm_0"]
    return params["scale"], params["bias"], stats["mean"], stats["var"]


class Conv3D(nn.Module):
    """3D convolution with a TPU-friendly z-decomposition.

    XLA's conv3d leaves the MXU ~12% utilized here because V2V's output
    channel counts (16/32) fill only a fraction of the 128 lanes.  For
    kernels k > 1 this module instead runs ONE (k, k, 1) conv whose output
    columns are all (z-tap, out-channel) pairs — k*C_out lanes — followed by
    a cheap static z-shift-and-add:

        Y[z] = sum_dz Q_dz[z + dz - pad],   Q = conv_{xy}(X; W[:, :, dz])

    Numerically identical to the direct conv (same taps, same adds), same
    FLOPs, ~3-5x faster on v5e.  The parameter keeps the standard
    (k, k, k, I, O) layout so checkpoint import is unaffected.
    """

    features: int
    kernel: int
    padding: int
    use_bias: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, bn_fold=None,
                 relu: bool = False, residual=None):
        """Args:
          bn_fold: optional (scale, bias, mean, var) inference BatchNorm
            constants folded into the conv (Pallas fast path only).
          relu / residual: fused epilogue for the fast path.
        """
        k = self.kernel
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, k, in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)

        if _use_pallas_conv3d(k, self.features, train):
            # Inference hot path: the Pallas slab kernel keeps the im2col
            # patches in VMEM and fills (dx, cout) = 3*cout output lanes;
            # folding BN/ReLU/skip into the call keeps consecutive convs
            # custom-call-to-custom-call, avoiding XLA relayouts at every
            # op boundary (the in-context cost that standalone conv
            # benchmarks miss).  Training keeps the XLA conv (autodiff).
            from lt_tpu.ops.pallas.conv3d import conv3d_same, fold_bn

            w, b = kernel, bias
            if bn_fold is not None:
                scale, bn_bias, mean, var = bn_fold
                w, b = fold_bn(kernel, bias, scale, bn_bias, mean, var,
                               eps=BN_EPS)
            return conv3d_same(
                x.astype(self.compute_dtype), w.astype(self.compute_dtype),
                b, relu=relu, residual=residual,
                out_dtype=self.compute_dtype)

        if _use_mp_conv(k, train, x.shape[1]) and residual is None:
            from lt_tpu.ops.pallas.conv3d import fold_bn
            from lt_tpu.ops.pallas.conv_mp import conv3d_mp

            w, b = kernel, bias
            if bn_fold is not None:
                scale, bn_bias, mean, var = bn_fold
                w, b = fold_bn(kernel, bias, scale, bn_bias, mean, var,
                               eps=BN_EPS)
            if b is None:
                b = jnp.zeros((self.features,), jnp.float32)
            return conv3d_mp(
                x.astype(self.compute_dtype), w.astype(self.compute_dtype),
                b, s=2, relu=relu, out_dtype=self.compute_dtype)

        assert bn_fold is None and not relu and residual is None, (
            "fused epilogue requires the Pallas fast path")
        if _use_z2d_train_conv(train, k, x.shape[3]):
            y = conv3d_as_z2d(x, kernel, self.padding, self.compute_dtype)
        elif k < 5 or train:
            # Direct conv: for k=3 the z-decomposition's extra HBM traffic
            # (materializing the k*O-channel Q tensor) outweighs its MXU
            # utilization win; only the k=7 front conv nets out ahead — and
            # only at inference: under autodiff+remat the decomposition's
            # padded shift-add temporaries (20 x 180 MB with 2x layout
            # padding) are what keeps flagship batch-5 training from
            # fitting in one chip's HBM.
            pad = ((self.padding, self.padding),) * 3 if k > 1 else "VALID"
            y = jax.lax.conv_general_dilated(
                x.astype(self.compute_dtype),
                kernel.astype(self.compute_dtype), (1, 1, 1), pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        else:
            # (k, k, k, I, O) -> (k, k, 1, I, k*O): tap dz lands in output
            # columns [dz*O : (dz+1)*O].
            w2 = jnp.transpose(kernel, (0, 1, 3, 2, 4)).reshape(
                k, k, in_features, 1, k * self.features)
            w2 = jnp.transpose(w2, (0, 1, 3, 2, 4))
            pad = ((self.padding, self.padding),) * 2 + ((0, 0),)
            q = jax.lax.conv_general_dilated(
                x.astype(self.compute_dtype), w2.astype(self.compute_dtype),
                (1, 1, 1), pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            # Shift-add over z taps with zero padding at the borders; pad+add
            # (not .at[].add) so XLA fuses the k terms into one pass.
            z = x.shape[3]
            o = self.features
            terms = []
            for dz in range(k):
                shift = dz - self.padding
                lo = max(0, -shift)
                hi = min(z, z - shift)
                if hi <= lo:
                    continue
                sl = q[:, :, :, lo + shift:hi + shift, dz * o:(dz + 1) * o]
                terms.append(jnp.pad(
                    sl, ((0, 0), (0, 0), (0, 0), (lo, z - hi), (0, 0))))
            y = terms[0]
            for term in terms[1:]:
                y = y + term
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


def _conv3d(features: int, kernel: int, padding: int, use_bias: bool = True,
            name=None, dtype=jnp.float32) -> "Conv3D":
    return Conv3D(features, kernel, padding, use_bias, dtype, name=name)


class Basic3DBlock(nn.Module):
    """conv3d(k) + BN + relu (v2v.py:7-17)."""

    features: int
    kernel: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        conv = _conv3d(self.features, self.kernel, (self.kernel - 1) // 2,
                       dtype=self.compute_dtype, name="conv")
        bn = BatchNorm(name="bn")
        if (_use_pallas_conv3d(self.kernel, self.features, train)
                or _use_mp_conv(self.kernel, train, x.shape[1])):
            return conv(x, train, bn_fold=_bn_constants(bn, self.features),
                        relu=True)
        x = conv(x, train)
        x = bn(x, train)
        return nn.relu(x)


class Res3DBlock(nn.Module):
    """Two 3x3x3 convs + (optional 1x1x1 projection) skip (v2v.py:20-42)."""

    features: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, tail=(), emit_pooled: bool = False,
                 return_folded: bool = False):
        """``tail``: optional ((w, b, relu), ...) per-voxel matmuls fused
        after the block on the Pallas inference path (V2V back section).

        ``emit_pooled``: also return ``MaxPool3d(2)(x)`` — computed inside
        the fused kernel from the already-resident input blocks on the
        Pallas path (the encoder's ``skip = res(x); x = pool(x)`` pattern,
        v2v.py:73-84), as a plain pooling op otherwise.  Returns
        ``(out, pooled)`` when set.

        ``return_folded``: declare the block's params and return the folded
        ``(w1, b1, w2, b2)`` WITHOUT computing — the chain-fusion caller
        (V2VModel front section) feeds several blocks' params into one
        :func:`res3d_chain_fused` call.  Identity-skip blocks only."""
        conv1 = _conv3d(self.features, 3, 1, dtype=self.compute_dtype,
                        name="conv1")
        bn1 = BatchNorm(name="bn1")
        conv2 = _conv3d(self.features, 3, 1, dtype=self.compute_dtype,
                        name="conv2")
        bn2 = BatchNorm(name="bn2")

        def skip_branch():
            if x.shape[-1] == self.features:
                return x
            s = _conv3d(self.features, 1, 0, dtype=self.compute_dtype,
                        name="skip_conv")(x)
            return BatchNorm(name="skip_bn")(s, train)

        if return_folded or _use_pallas_res3d(train, x.shape[1]):
            # Whole block = ONE fused kernel: conv+BN+ReLU, conv+BN,
            # (projected) skip add, ReLU (v2v.py:20-42 semantics).
            from lt_tpu.ops.pallas.conv3d import fold_bn
            from lt_tpu.ops.pallas.res3d import res3d_block_fused

            cin = x.shape[-1]
            # Dummy one-voxel calls declare the child params (identical
            # parameter tree to the unfused path); DCE removes them.
            dummy = jnp.zeros((1, 1, 1, 1, cin), jnp.float32)
            conv1(dummy, False)
            dummy2 = jnp.zeros((1, 1, 1, 1, self.features), jnp.float32)
            conv2(dummy2, False)
            w1, b1 = fold_bn(conv1.variables["params"]["kernel"],
                             conv1.variables["params"].get("bias"),
                             *_bn_constants(bn1, self.features), eps=BN_EPS)
            w2, b2 = fold_bn(conv2.variables["params"]["kernel"],
                             conv2.variables["params"].get("bias"),
                             *_bn_constants(bn2, self.features), eps=BN_EPS)
            skip_proj = None
            if cin != self.features:
                sconv = _conv3d(self.features, 1, 0,
                                dtype=self.compute_dtype, name="skip_conv")
                sbn = BatchNorm(name="skip_bn")
                sconv(dummy, False)
                ws, bs = fold_bn(sconv.variables["params"]["kernel"],
                                 sconv.variables["params"].get("bias"),
                                 *_bn_constants(sbn, self.features),
                                 eps=BN_EPS)
                skip_proj = (ws.reshape(cin, self.features), bs)
            if return_folded:
                # Width-changing blocks return the folded projection skip
                # too — res3d_chain_fused accepts a 5-tuple FIRST block.
                if skip_proj is not None:
                    return w1, b1, w2, b2, skip_proj
                return w1, b1, w2, b2
            want_pool = (emit_pooled and x.shape[1] % 4 == 0
                         and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0)
            r = res3d_block_fused(
                x.astype(self.compute_dtype), w1, b1, w2, b2,
                skip_proj=skip_proj, tail=tail,
                out_dtype=self.compute_dtype, emit_pooled=want_pool)
            if emit_pooled and not want_pool:
                return r, pool3d(x, train=train)
            return r

        assert not tail, "tail fusion requires the Pallas res3d path"
        if _use_pallas_conv3d(3, self.features, train):
            # Whole block = two fused kernel calls: conv+BN+relu, then
            # conv+BN+skip-add+relu (v2v.py:20-42 semantics).
            skip = skip_branch().astype(self.compute_dtype)
            res = conv1(x, train, bn_fold=_bn_constants(bn1, self.features),
                        relu=True)
            out = conv2(res, train,
                        bn_fold=_bn_constants(bn2, self.features),
                        relu=True, residual=skip)
            if emit_pooled:
                return out, pool3d(x, train=train)
            return out

        res = conv1(x, train)
        res = bn1(res, train)
        res = nn.relu(res)
        res = conv2(res, train)
        res = bn2(res, train)
        out = nn.relu(res + skip_branch())
        if emit_pooled:
            return out, pool3d(x, train=train)
        return out


def _use_pallas_updown(train: bool, size_x: int) -> bool:
    """Gate for the pool/upsample kernels (ops/pallas/updown.py); rides the
    master res3d gate plus its own kill switch LT_TPU_DISABLE_PALLAS_UPDOWN.
    """
    import os

    return (_use_pallas_res3d(train, size_x)
            and not os.environ.get("LT_TPU_DISABLE_PALLAS_UPDOWN"))


def pool3d(x, size: int = 2, train: bool = True):
    """Max pool with kernel == stride (v2v.py:45-51)."""
    if (size == 2 and _use_pallas_updown(train, x.shape[1])
            and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0):
        from lt_tpu.ops.pallas.updown import max_pool3d_2x

        return max_pool3d_2x(x)
    return nn.max_pool(x, (size, size, size), strides=(size, size, size))


class Upsample3DBlock(nn.Module):
    """ConvTranspose3d(k=2, s=2) + BN + relu (v2v.py:54-66).

    For k=2, s=2, p=0, PyTorch's transposed conv equals ``lax.conv_transpose``
    with padding k - 1 - p = 1 per side of the dilated input: output = 2x.
    """

    features: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, skip=None,
                 return_folded: bool = False):
        """``skip``: optional residual of the OUTPUT shape added after the
        ReLU (the decoder's ``up(x) + skip``, v2v.py:126-136) — fused into
        the kernel's finalize on the Pallas path.

        ``return_folded``: declare the params and return the packed
        ``(w8, b8)`` WITHOUT computing — the upsample-headed chain caller
        (V2VModel back section) feeds them into ONE
        :func:`lt_tpu.ops.pallas.res3d.upsample_res3d_fused` call."""
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (2, 2, 2, self.features, in_features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        bn = BatchNorm(name="bn")
        if return_folded or _use_pallas_updown(train, x.shape[1]):
            # Fused transposed-conv + folded BN + ReLU kernel: one matmul
            # per plane producing all 8 (dx, dy, dz) taps, interleaved
            # in-VMEM (keeps the V2V chain custom-call-to-custom-call).
            from lt_tpu.ops.pallas.updown import (pack_upsample_weights,
                                                  upsample3d_2x)

            scale, bn_bias, mean, var = _bn_constants(bn, self.features)
            w8, b8 = pack_upsample_weights(kernel, bias, scale, bn_bias,
                                           mean, var, eps=BN_EPS)
            if return_folded:
                return w8, b8
            sk = (None if skip is None
                  else skip.astype(self.compute_dtype))
            return upsample3d_2x(x.astype(self.compute_dtype), w8, b8,
                                 skip=sk)

        pad = 2 - 1 - 0  # k - 1 - p
        y = jax.lax.conv_transpose(
            x.astype(self.compute_dtype), kernel.astype(self.compute_dtype),
            strides=(2, 2, 2), padding=((pad, pad),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            transpose_kernel=True)
        y = y + bias.astype(y.dtype)
        y = bn(y, train)
        y = nn.relu(y)
        if skip is not None:
            y = y + skip.astype(y.dtype)
        return y


class EncoderDecoder(nn.Module):
    """5-level 3D hourglass with per-level residual skips (v2v.py:69-138)."""

    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, front_chain=None,
                 fuse_up1: bool = False):
        dt = self.compute_dtype
        # Encoder levels: `skip = res(x); x = pool(x)` — the skip block
        # emits the pooled tensor from its own kernel (emit_pooled), so
        # each level's pool costs no separate HBM pass on the Pallas path.
        import os

        deep_chain = (_use_pallas_res3d(train, x.shape[1])
                      and os.environ.get("LT_TPU_CHAIN_DEEP", "1") != "0")

        def enc_pair(feats, res_name, skip_name, x):
            """``x = res(x); skip = skip_res(x); x = pool(x)`` — on the
            chain path the pair runs as ONE pallas_call (proj-headed when
            res widens) with the inter-block volume never in HBM and the
            pool emitted from the resident blocks."""
            from lt_tpu.ops.pallas.res3d import (chain_feasible,
                                                 res3d_chain_fused)

            if (deep_chain and x.shape[1] % 4 == 0
                    and chain_feasible(x.shape[0], x.shape[2], x.shape[3],
                                       x.shape[-1], feats, 2, dt,
                                       emit_pooled=True)):
                p1 = Res3DBlock(feats, dt, name=res_name)(
                    x, train, return_folded=True)
                xd = jnp.zeros((1, 1, 1, 1, feats), x.dtype)
                p2 = Res3DBlock(feats, dt, name=skip_name)(
                    xd, train, return_folded=True)
                return res3d_chain_fused(x.astype(dt), [p1, p2],
                                         out_dtype=dt, emit_pooled=True)
            x = Res3DBlock(feats, dt, name=res_name)(x, train)
            return Res3DBlock(feats, dt, name=skip_name)(
                x, train, emit_pooled=True)

        def dec_pair(up_feats, up_name, res_name, x, skip):
            """``x = up(x) + skip; x = res(x)`` as ONE pallas_call (the
            upsampled volume never round-trips HBM)."""
            from lt_tpu.ops.pallas.res3d import (ups_chain_feasible,
                                                 upsample_res3d_fused)

            if (deep_chain and x.shape[1] % 2 == 0
                    and ups_chain_feasible(x.shape[0], 2 * x.shape[2],
                                           2 * x.shape[3], x.shape[-1],
                                           up_feats, up_feats, 1, dt)):
                w8, b8 = Upsample3DBlock(up_feats, dt, name=up_name)(
                    x, train, return_folded=True)
                xd = jnp.zeros((1, 1, 1, 1, up_feats), x.dtype)
                pr = Res3DBlock(up_feats, dt, name=res_name)(
                    xd, train, return_folded=True)
                return upsample_res3d_fused(x.astype(dt), w8, b8,
                                            skip.astype(dt), [pr],
                                            out_dtype=dt)
            x = Upsample3DBlock(up_feats, dt, name=up_name)(x, train, skip)
            return Res3DBlock(up_feats, dt, name=res_name)(x, train)

        if front_chain is not None:
            # The V2V front blocks and skip_res1 all act on the same
            # 64^3 x 32 volume: chain them (+ the encoder pool) in ONE
            # pallas_call — front_res1 -> front_res2 -> front_res3 ->
            # skip_res1 with the inter-block volumes never leaving VMEM
            # (v2v.py:104-105 semantics: skip1 = skip_res1(x);
            # pooled = pool1(x)).  skip_res1 declares from a 32-wide
            # dummy: x may still be the 16-wide stem output when
            # front_res1 (proj skip) heads the chain.
            from lt_tpu.ops.pallas.res3d import res3d_chain_fused

            x32 = jnp.zeros((1, 1, 1, 1, 32), x.dtype)
            p_skip = Res3DBlock(32, dt, name="skip_res1")(
                x32, train, return_folded=True)
            skip1, x = res3d_chain_fused(
                x.astype(dt), list(front_chain) + [p_skip],
                out_dtype=dt, emit_pooled=True)
        else:
            skip1, x = Res3DBlock(32, dt, name="skip_res1")(
                x, train, emit_pooled=True)
        skip2, x = enc_pair(64, "encoder_res1", "skip_res2", x)
        skip3, x = enc_pair(128, "encoder_res2", "skip_res3", x)
        skip4, x = enc_pair(128, "encoder_res3", "skip_res4", x)
        skip5, x = enc_pair(128, "encoder_res4", "skip_res5", x)
        x = Res3DBlock(128, dt, name="encoder_res5")(x, train)

        x = Res3DBlock(128, dt, name="mid_res")(x, train)

        # Decoder levels: each `up(x) + skip` chains with the res block
        # that follows it (dec_pair); on the unfused path the residual
        # adds still fuse into the upsample kernels' finalize.
        x = Res3DBlock(128, dt, name="decoder_res5")(x, train)
        x = dec_pair(128, "decoder_upsample5", "decoder_res4", x, skip5)
        x = dec_pair(128, "decoder_upsample4", "decoder_res3", x, skip4)
        x = dec_pair(128, "decoder_upsample3", "decoder_res2", x, skip3)
        x = dec_pair(64, "decoder_upsample2", "decoder_res1", x, skip2)
        if fuse_up1:
            # The caller (V2VModel back section) chains decoder_upsample1
            # + the skip1 add + the back blocks in ONE kernel: hand back
            # the small volume, the folded upsample params, and skip1.
            up1 = Upsample3DBlock(32, dt, name="decoder_upsample1")(
                x, train, return_folded=True)
            return x, up1, skip1
        x = Upsample3DBlock(32, dt, name="decoder_upsample1")(x, train,
                                                              skip1)
        return x


class V2VModel(nn.Module):
    """Front layers -> hourglass -> back layers -> 1x1x1 output conv.

    Mirrors v2v.py:141-180. Input (B, X, Y, Z, C_in), output
    (B, X, Y, Z, n_joints).

    ``remat=True`` wraps every block in ``nn.remat`` so the backward pass
    keeps only block boundaries alive — the difference between fitting the
    64^3 training activations in HBM or not (ROADMAP.md "Training memory").
    """

    output_channels: int
    compute_dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        if self.remat:
            basic = nn.remat(Basic3DBlock, static_argnums=(2,))
            res = nn.remat(Res3DBlock, static_argnums=(2,))
            encdec = nn.remat(EncoderDecoder, static_argnums=(2, 4))
        else:
            basic, res, encdec = Basic3DBlock, Res3DBlock, EncoderDecoder
        x = x.astype(dt)
        x = basic(16, 7, dt, name="front_basic")(x, train)
        from lt_tpu.ops.pallas.res3d import chain_feasible as _cf

        # Feasibility at fold=1 (chain_stack_bytes): the f32 flagship
        # front chain's measured 111.3 MB stack exceeds the axon compiler's
        # ~109 MB scoped limit, so f32 falls back to the unfused path here.
        chain = (_use_pallas_res3d(train, x.shape[1])
                 and x.shape[1] % 4 == 0
                 and _cf(x.shape[0], x.shape[2], x.shape[3], 32, 32, 3, dt,
                         emit_pooled=True))
        front_chain = None
        if chain:
            # The consecutive front blocks run as ONE chained kernel
            # (res3d_chain_fused): the inter-block 64^3 volumes never
            # round-trip HBM.  Parameter tree identical to the sequential
            # path (return_folded only declares).  By default the chain
            # is front_res2 -> front_res3 -> skip_res1 (+ its pool) — one
            # kernel from front_res1's output to the encoder's first
            # skip/pool (gate: LT_TPU_CHAIN_SKIP1=0 for the front-only
            # variant).  LT_TPU_CHAIN_FRONT1=1 additionally heads the
            # chain with front_res1 (16->32, folded projection skip) —
            # measured SLOWER (110.7 -> 106.3 fps: every block-0 plane
            # and tap strip lane-pads 16 -> 128, an 8x tax the standalone
            # block amortizes over its own schedule), kept opt-in.
            import os

            from lt_tpu.ops.pallas.res3d import res3d_chain_fused

            params = []
            if os.environ.get("LT_TPU_CHAIN_FRONT1", "0") != "0":
                params.append(Res3DBlock(32, dt, name="front_res1")(
                    x, train, return_folded=True))
            else:
                x = res(32, dt, name="front_res1")(x, train)
            # Dummy 32-wide input: return_folded only reads the trailing
            # dim (the chain input may still be 16-wide at this point).
            x32 = jnp.zeros((1, 1, 1, 1, 32), x.dtype)
            params += [Res3DBlock(32, dt, name=f"front_res{i}")(
                x32, train, return_folded=True) for i in (2, 3)]
            if os.environ.get("LT_TPU_CHAIN_SKIP1", "1") != "0":
                front_chain = params
            else:
                x = res3d_chain_fused(x.astype(dt), params, out_dtype=dt)
        else:
            x = res(32, dt, name="front_res1")(x, train)  # 16->32 proj
            x = res(32, dt, name="front_res2")(x, train)
            x = res(32, dt, name="front_res3")(x, train)

        fused_back = _use_pallas_res3d(train, x.shape[1])
        # Default: chain decoder_upsample1 + skip1-add + back_res + the
        # k=1 back/tail matmuls in ONE kernel (upsample_res3d_fused) — the
        # upsampled 64^3 volume never exists in HBM.  LT_TPU_CHAIN_BACK=0
        # for the separate upsample + back_res kernels.
        import os

        from lt_tpu.ops.pallas.res3d import ups_chain_feasible as _ucf

        chain_back = (fused_back and x.shape[1] % 4 == 0
                      and os.environ.get("LT_TPU_CHAIN_BACK", "1") != "0"
                      and _ucf(x.shape[0], x.shape[2], x.shape[3], 32, 32,
                               self.output_channels, 1, dt))
        enc_out = encdec(dt, name="encoder_decoder")(x, train, front_chain,
                                                     chain_back)
        x = enc_out[0] if chain_back else enc_out
        # Unwrapped class on the fused inference path: remat is a training
        # concern, and the static relu flags in ``tail`` must not traverse
        # nn.remat (which would trace them).
        back_res = (Res3DBlock if fused_back else res)(
            32, dt, name="back_res")
        back1 = basic(32, 1, dt, name="back_basic1")
        back2 = basic(32, 1, dt, name="back_basic2")
        out_conv = _conv3d(self.output_channels, 1, 0, dtype=dt,
                           name="output_layer")

        keep_dtype_out = (not train and dt != jnp.float32)
        if fused_back:
            # Back section fused into back_res's kernel tail: two k=1
            # Basic3D blocks (conv+BN+ReLU as one matmul each after BN
            # folding) + the 1x1x1 output conv — four HBM round trips and
            # their pallas<->XLA layout conversions become zero.
            from lt_tpu.ops.pallas.conv3d import fold_bn

            dummy = jnp.zeros((1, 1, 1, 1, 32), jnp.float32)
            tail = []
            for blk in (back1, back2):
                blk(dummy, False)
                p = blk.variables["params"]
                s = blk.variables["batch_stats"]
                wk, bk = fold_bn(p["conv"]["kernel"],
                                 p["conv"].get("bias"),
                                 p["bn"]["BatchNorm_0"]["scale"],
                                 p["bn"]["BatchNorm_0"]["bias"],
                                 s["bn"]["BatchNorm_0"]["mean"],
                                 s["bn"]["BatchNorm_0"]["var"], eps=BN_EPS)
                tail.append((wk.reshape(32, 32), bk, True))
            out_conv(dummy, False)
            po = out_conv.variables["params"]
            tail.append((po["kernel"].reshape(32, self.output_channels),
                         po["bias"], False))
            if chain_back:
                from lt_tpu.ops.pallas.res3d import upsample_res3d_fused

                x_small, (w8u, b8u), skip1 = enc_out
                p_back = back_res(jnp.zeros((1, 1, 1, 1, 32), x.dtype),
                                  train, return_folded=True)
                x = upsample_res3d_fused(
                    x_small.astype(dt), w8u, b8u, skip1.astype(dt),
                    [p_back], tail=tuple(tail), out_dtype=dt)
            else:
                x = back_res(x, train, tuple(tail))
        else:
            x = back_res(x, train)
            x = back1(x, train)
            x = back2(x, train)
            x = out_conv(x)
        # Inference keeps the compute dtype: the (B, 64^3, J) logits tensor
        # is the single biggest HBM lump on the hot path (571 MB in f32 at
        # flagship) and the soft-argmax upcasts in-register.  Training
        # emits f32 (loss-side numerics unchanged).
        if keep_dtype_out:
            return x
        return x.astype(jnp.float32)
