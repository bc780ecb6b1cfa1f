"""PoseResNet heatmap backbone (ResNet-{18,34,50,101,152} + deconv head).

Functional parity target: /root/reference/mvn/models/pose_resnet.py —
``BasicBlock`` (:25-54), ``Bottleneck`` (:57-95), ``Bottleneck_CAFFE``
(:98-137), ``GlobalAveragePoolingHead`` (:140-174), ``PoseResNet``
(:184-318), ``get_pose_net`` checkpoint loading (:321-377, reimplemented in
``lt_tpu.utils.torch_import``).

TPU-first design notes
----------------------
- NHWC layout throughout (TPU-native conv layout; the reference is NCHW).
- Optional bfloat16 compute: convolutions run in ``compute_dtype`` while
  parameters and batch-norm statistics stay float32 (casts around BN).
- BatchNorm matches PyTorch semantics: eps 1e-5, EMA momentum 0.1 (flax
  ``momentum=0.9``), per-channel affine. pose_resnet.py:15 sets
  BN_MOMENTUM=0.1.
- The three 4x4 stride-2 transposed convs (pose_resnet.py:266-291) map to
  ``lax.conv_transpose`` with explicit (2, 2) padding — the exact equivalent
  of PyTorch's ``ConvTranspose2d(k=4, s=2, p=1)``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

BN_MOMENTUM = 0.9  # flax EMA decay == 1 - PyTorch momentum (0.1)
BN_EPS = 1e-5

RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BatchNorm(nn.Module):
    """PyTorch-compatible BatchNorm2d over the channel (last) axis.

    Statistics (mean/var/EMA) are always float32 — flax's ``_compute_stats``
    upcasts internally — but the normalize itself runs in the input dtype:
    an f32 normalize under bf16 compute materializes f32 activations that
    remat then saves (2x HBM on every 64^3 V2V tensor; the difference
    between flagship batch-5 training fitting in one chip or not).
    """

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=x.dtype,
            param_dtype=jnp.float32,
        )(x)


def _conv(features: int, kernel: int, stride: int = 1, padding: int = 0,
          use_bias: bool = False, name: Optional[str] = None,
          dtype=jnp.float32) -> nn.Conv:
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((padding, padding), (padding, padding)),
                   use_bias=use_bias, name=name, dtype=dtype,
                   param_dtype=jnp.float32)


def _use_s2d_stem(h: int, w: int) -> bool:
    """Gate for the space-to-depth stem (opt-in: LT_TPU_S2D_STEM=1).

    The 7x7/s2 stem convolves 3-channel input — 3 of the MXU's contraction
    lanes used.  The space-to-depth formulation is the standard TPU fix:
    2x2 blocks fold into channels (3 -> 12) and the stride-2 k7 becomes a
    stride-1 k4 over the half-res image with 4x the contraction depth —
    numerically identical (same taps, zero-padded k7 -> k8 regrouped).
    Opt-in until measured on-chip.
    """
    import os

    return (bool(os.environ.get("LT_TPU_S2D_STEM"))
            and h % 2 == 0 and w % 2 == 0)


class StemConv(nn.Module):
    """The ResNet 7x7/stride-2 stem (pose_resnet.py:190), s2d-capable.

    Parameter layout is exactly ``nn.Conv``'s ((7, 7, Cin, 64) under
    'kernel') so reference-checkpoint import and existing state are
    unaffected by which formulation runs.
    """

    features: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, c, self.features), jnp.float32)
        kernel = kernel.astype(x.dtype)
        if _use_s2d_stem(h, w):
            x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // 2, w // 2, 4 * c)
            # Zero-front-pad k7 -> k8 (output taps x[2i + t - 4], t=0..7),
            # regroup (ty, tx) = (2qy + ry, 2qx + rx) to a k4 over the s2d
            # channels ((ry, rx, c) ordering matches x2's flatten above).
            k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            k4 = k8.reshape(4, 2, 4, 2, c, self.features)
            k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(
                4, 4, 4 * c, self.features)
            return jax.lax.conv_general_dilated(
                x2, k4, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, kernel, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection skip (pose_resnet.py:25-54)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    compute_dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = _conv(self.planes, 3, self.stride, 1, dtype=self.compute_dtype,
                    name="conv1")(x)
        out = BatchNorm(name="bn1")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, 1, dtype=self.compute_dtype,
                    name="conv2")(out)
        out = BatchNorm(name="bn2")(out, train)
        if self.downsample:
            residual = _conv(self.planes, 1, self.stride,
                             dtype=self.compute_dtype,
                             name="downsample_conv")(x)
            residual = BatchNorm(name="downsample_bn")(residual, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck (pose_resnet.py:57-95).

    ``caffe_style=True`` puts the stride on the first 1x1 instead
    (pose_resnet.py:98-137).
    """

    planes: int
    stride: int = 1
    downsample: bool = False
    caffe_style: bool = False
    compute_dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        s1 = self.stride if self.caffe_style else 1
        s2 = 1 if self.caffe_style else self.stride
        out = _conv(self.planes, 1, s1, dtype=self.compute_dtype,
                    name="conv1")(x)
        out = BatchNorm(name="bn1")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, s2, 1, dtype=self.compute_dtype,
                    name="conv2")(out)
        out = BatchNorm(name="bn2")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, dtype=self.compute_dtype,
                    name="conv3")(out)
        out = BatchNorm(name="bn3")(out, train)
        if self.downsample:
            residual = _conv(self.planes * 4, 1, self.stride,
                             dtype=self.compute_dtype,
                             name="downsample_conv")(x)
            residual = BatchNorm(name="downsample_bn")(residual, train)
        return nn.relu(out + residual)


class RepeatedBlock(nn.Module):
    """One residual block inside an ``nn.scan`` repeat.

    The deep trunks repeat the same block shape many times (ResNet-152's
    layer3 is 36 bottlenecks).  Unrolled, that makes a huge HLO and
    minutes-long TPU compiles; scanned, the compiler sees ONE block body and
    a loop.  Parameters/batch stats gain a leading repeat axis (handled by
    the checkpoint importer).
    """

    block_kind: str  # 'basic' | 'bottleneck'
    planes: int
    caffe_style: bool
    train: bool
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        if self.block_kind == "basic":
            y = BasicBlock(self.planes, 1, False, self.compute_dtype,
                           name="block")(x, self.train)
        else:
            y = Bottleneck(self.planes, 1, False, self.caffe_style,
                           self.compute_dtype, name="block")(x, self.train)
        return y, None


def _scan_repeat(block_kind: str, planes: int, caffe: bool, train: bool,
                 compute_dtype, length: int, name: str,
                 remat: bool = False):
    import os

    body = nn.remat(RepeatedBlock) if remat else RepeatedBlock
    # LT_TPU_SCAN_UNROLL=k unrolls k block bodies per loop step: XLA can
    # then fuse/pipeline across block boundaries (longer compile, cached).
    unroll = int(os.environ.get("LT_TPU_SCAN_UNROLL", "1") or "1")
    scanned = nn.scan(
        body,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
        length=length,
        unroll=min(max(unroll, 1), length),
    )
    return scanned(block_kind=block_kind, planes=planes, caffe_style=caffe,
                   train=train, compute_dtype=compute_dtype, name=name)


class TransposedConv(nn.Module):
    """PyTorch-equivalent ``ConvTranspose2d(kernel, stride, padding)``.

    Uses ``lax.conv_transpose`` with explicit padding ``k - 1 - p`` per side
    and ``transpose_kernel=True`` so imported PyTorch weights apply without
    spatial flips (see lt_tpu.utils.torch_import).
    """

    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        # transpose_kernel=True expects an IO-swapped kernel: (kH, kW, O, I).
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (self.kernel, self.kernel, self.features, in_features),
            jnp.float32)
        pad = self.kernel - 1 - self.padding
        y = jax.lax.conv_transpose(
            x, kernel.astype(self.compute_dtype),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class GlobalAveragePoolingHead(nn.Module):
    """Confidence head: conv-BN-pool-relu x2, GAP, MLP, sigmoid.

    Mirrors pose_resnet.py:140-174 (note the BN -> maxpool -> relu order).
    """

    n_classes: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = _conv(512, 3, 1, 1, use_bias=True, dtype=self.compute_dtype,
                  name="conv1")(x)
        x = BatchNorm(name="bn1")(x, train)
        if min(x.shape[1:3]) >= 2:  # tiny test inputs: a 2x2 VALID pool on
            x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 1x1 emits 0x0 -> NaN
        x = nn.relu(x)

        x = _conv(256, 3, 1, 1, use_bias=True, dtype=self.compute_dtype,
                  name="conv2")(x)
        x = BatchNorm(name="bn2")(x, train)
        if min(x.shape[1:3]) >= 2:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(x)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # GAP

        x = nn.Dense(512, name="fc1", param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Dense(256, name="fc2", param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Dense(self.n_classes, name="fc3", param_dtype=jnp.float32)(x)
        return nn.sigmoid(x)


class PoseResNet(nn.Module):
    """ResNet trunk + 3 deconv layers + 1x1 heatmap head.

    Mirrors pose_resnet.py:184-318.  ``__call__`` takes NHWC images and
    returns ``(heatmaps, features, alg_confidences, vol_confidences)`` where
    the confidences are None unless the respective head is enabled
    (pose_resnet.py:215-219, 304-310).
    """

    num_joints: int
    num_layers: int = 152
    style: str = "simple"  # 'simple' | 'caffe'
    alg_confidences: bool = False
    vol_confidences: bool = False
    num_deconv_filters: Sequence[int] = (256, 256, 256)
    final_conv_kernel: int = 1
    compute_dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, layers = RESNET_SPEC[self.num_layers]
        caffe = self.style == "caffe"
        x = x.astype(self.compute_dtype)

        x = StemConv(64, self.compute_dtype, name="conv1")(x)
        x = BatchNorm(name="bn1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        expansion = 1 if block_kind == "basic" else 4
        inplanes = 64
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), layers)):
            stride = 1 if stage == 0 else 2
            downsample = stride != 1 or inplanes != planes * expansion
            name = f"layer{stage + 1}_0"
            if block_kind == "basic":
                x = BasicBlock(planes, stride, downsample,
                               self.compute_dtype, name=name)(x, train)
            else:
                x = Bottleneck(planes, stride, downsample, caffe,
                               self.compute_dtype, name=name)(x, train)
            if blocks > 1:
                # Remaining identical blocks run under one scanned body
                # (compile-time lever; see RepeatedBlock).
                x, _ = _scan_repeat(block_kind, planes, caffe, train,
                                    self.compute_dtype, blocks - 1,
                                    f"layer{stage + 1}_rest",
                                    remat=self.remat)(x)
            inplanes = planes * expansion

        alg_conf = None
        if self.alg_confidences:
            alg_conf = GlobalAveragePoolingHead(
                self.num_joints, self.compute_dtype,
                name="alg_confidences")(x, train)
        vol_conf = None
        if self.vol_confidences:
            vol_conf = GlobalAveragePoolingHead(
                32, self.compute_dtype, name="vol_confidences")(x, train)

        for i, filters in enumerate(self.num_deconv_filters):
            x = TransposedConv(filters, 4, 2, 1, use_bias=False,
                               compute_dtype=self.compute_dtype,
                               name=f"deconv{i}")(x)
            x = BatchNorm(name=f"deconv_bn{i}")(x, train)
            x = nn.relu(x)
        features = x

        pad = 1 if self.final_conv_kernel == 3 else 0
        heatmaps = _conv(self.num_joints, self.final_conv_kernel, 1, pad,
                         use_bias=True, dtype=self.compute_dtype,
                         name="final_layer")(x)

        return (heatmaps.astype(jnp.float32), features.astype(jnp.float32),
                alg_conf, vol_conf)
