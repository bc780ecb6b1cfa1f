"""PyTorch checkpoint importers: reference ``.pth`` -> flax variable trees.

Covers the three checkpoint families the reference consumes/produces:
  - backbone-only checkpoints (COCO/MPII-pretrained PoseResNet) including the
    final-layer reinit-on-joint-mismatch logic of
    /root/reference/mvn/models/pose_resnet.py:338-375;
  - whole-model checkpoints (alg / vol nets) with ``module.`` prefix strip
    (/root/reference/train.py:406-413);
  - V2V sub-trees inside volumetric checkpoints.

Layout conversions (PyTorch -> flax NHWC/NDHWC):
  Conv2d          (O, I, kH, kW)     -> (kH, kW, I, O)
  ConvTranspose2d (I, O, kH, kW)     -> (kH, kW, O, I)   [transpose_kernel=True]
  Conv3d          (O, I, kD, kH, kW) -> (kD, kH, kW, I, O)
  ConvTranspose3d (I, O, kD, kH, kW) -> (kD, kH, kW, O, I)
  Linear          (O, I)             -> (I, O)
  BatchNorm: weight->scale, bias->bias, running_mean->mean, running_var->var
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state dict to numpy, stripping any ``module.`` prefix."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in state:
        state = state["state_dict"]
    out = {}
    for k, v in state.items():
        out[k.replace("module.", "")] = v.detach().cpu().numpy()
    return out


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _deconv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv3d_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def _deconv3d_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


class _Writer:
    """Accumulates params and batch_stats trees from torch tensors."""

    def __init__(self):
        self.params: dict = {}
        self.batch_stats: dict = {}

    def conv(self, sd, torch_name, flax_path, transform=_conv_w,
             bias: bool = False):
        _set(self.params, flax_path + ("kernel",),
             transform(sd[torch_name + ".weight"]))
        if bias:
            _set(self.params, flax_path + ("bias",), sd[torch_name + ".bias"])

    def bn(self, sd, torch_name, flax_path):
        inner = flax_path + ("BatchNorm_0",)
        _set(self.params, inner + ("scale",), sd[torch_name + ".weight"])
        _set(self.params, inner + ("bias",), sd[torch_name + ".bias"])
        _set(self.batch_stats, inner + ("mean",),
             sd[torch_name + ".running_mean"])
        _set(self.batch_stats, inner + ("var",),
             sd[torch_name + ".running_var"])

    def dense(self, sd, torch_name, flax_path):
        _set(self.params, flax_path + ("kernel",),
             np.ascontiguousarray(sd[torch_name + ".weight"].T))
        _set(self.params, flax_path + ("bias",), sd[torch_name + ".bias"])

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def _import_gap_head(w: _Writer, sd, prefix: str, flax_prefix: Tuple[str, ...]):
    """GlobalAveragePoolingHead (pose_resnet.py:140-174)."""
    w.conv(sd, f"{prefix}.features.0", flax_prefix + ("conv1",), bias=True)
    w.bn(sd, f"{prefix}.features.1", flax_prefix + ("bn1",))
    w.conv(sd, f"{prefix}.features.4", flax_prefix + ("conv2",), bias=True)
    w.bn(sd, f"{prefix}.features.5", flax_prefix + ("bn2",))
    w.dense(sd, f"{prefix}.head.0", flax_prefix + ("fc1",))
    w.dense(sd, f"{prefix}.head.2", flax_prefix + ("fc2",))
    w.dense(sd, f"{prefix}.head.4", flax_prefix + ("fc3",))


def import_pose_resnet(sd: Dict[str, np.ndarray], num_layers: int = 152,
                       num_joints: int = 17, prefix: str = "",
                       rng: np.random.RandomState = None) -> dict:
    """Build PoseResNet flax variables from a reference state dict.

    ``prefix`` lets the same routine pull ``backbone.``-prefixed weights out
    of whole-model checkpoints. Handles the final-layer joint-count mismatch
    like pose_resnet.py:352-368 (xavier-init new filters, copy min(n)).
    """
    from lt_tpu.models.backbone import RESNET_SPEC

    block_kind, layers = RESNET_SPEC[num_layers]
    w = _Writer()
    p = prefix

    w.conv(sd, p + "conv1", ("conv1",))
    w.bn(sd, p + "bn1", ("bn1",))

    expansion = 1 if block_kind == "basic" else 4
    inplanes = 64
    n_convs = 2 if block_kind == "basic" else 3
    for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers)):
        stride = 1 if stage == 0 else 2
        # Block 0 (possibly with downsample projection) keeps its own params.
        tname = f"{p}layer{stage + 1}.0"
        fname = f"layer{stage + 1}_0"
        for ci in range(1, n_convs + 1):
            w.conv(sd, f"{tname}.conv{ci}", (fname, f"conv{ci}"))
            w.bn(sd, f"{tname}.bn{ci}", (fname, f"bn{ci}"))
        if stride != 1 or inplanes != planes * expansion:
            w.conv(sd, f"{tname}.downsample.0", (fname, "downsample_conv"))
            w.bn(sd, f"{tname}.downsample.1", (fname, "downsample_bn"))

        # Blocks 1..N-1 are scanned: stack their weights on a leading axis
        # (matching nn.scan's variable_axes={'params': 0, 'batch_stats': 0}).
        if blocks > 1:
            rest = f"layer{stage + 1}_rest"
            for ci in range(1, n_convs + 1):
                kernels = np.stack([
                    _conv_w(sd[f"{p}layer{stage + 1}.{i}.conv{ci}.weight"])
                    for i in range(1, blocks)])
                _set(w.params, (rest, "block", f"conv{ci}", "kernel"),
                     kernels)
                bn = f"bn{ci}"
                inner = (rest, "block", bn, "BatchNorm_0")
                _set(w.params, inner + ("scale",), np.stack(
                    [sd[f"{p}layer{stage + 1}.{i}.{bn}.weight"]
                     for i in range(1, blocks)]))
                _set(w.params, inner + ("bias",), np.stack(
                    [sd[f"{p}layer{stage + 1}.{i}.{bn}.bias"]
                     for i in range(1, blocks)]))
                _set(w.batch_stats, inner + ("mean",), np.stack(
                    [sd[f"{p}layer{stage + 1}.{i}.{bn}.running_mean"]
                     for i in range(1, blocks)]))
                _set(w.batch_stats, inner + ("var",), np.stack(
                    [sd[f"{p}layer{stage + 1}.{i}.{bn}.running_var"]
                     for i in range(1, blocks)]))
        inplanes = planes * expansion

    for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4), (6, 7))):
        w.conv(sd, f"{p}deconv_layers.{conv_idx}", (f"deconv{i}",),
               transform=_deconv_w)
        w.bn(sd, f"{p}deconv_layers.{bn_idx}", (f"deconv_bn{i}",))

    # Final layer with joint-count mismatch handling (pose_resnet.py:352-368).
    fw = sd[p + "final_layer.weight"]
    fb = sd[p + "final_layer.bias"]
    if fw.shape[0] != num_joints:
        rng = rng or np.random.RandomState(0)
        fan_in = fw.shape[1] * fw.shape[2] * fw.shape[3]
        fan_out = num_joints * fw.shape[2] * fw.shape[3]
        bound = np.sqrt(6.0 / (fan_in + fan_out))
        new_w = rng.uniform(-bound, bound,
                            (num_joints,) + fw.shape[1:]).astype(fw.dtype)
        n = min(num_joints, fw.shape[0])
        new_w[:n] = fw[:n]
        new_b = np.zeros((num_joints,), fb.dtype)
        new_b[:n] = fb[:n]
        fw, fb = new_w, new_b
    _set(w.params, ("final_layer", "kernel"), _conv_w(fw))
    _set(w.params, ("final_layer", "bias"), fb)

    if p + "alg_confidences.features.0.weight" in sd:
        _import_gap_head(w, sd, p + "alg_confidences", ("alg_confidences",))
    if p + "vol_confidences.features.0.weight" in sd:
        _import_gap_head(w, sd, p + "vol_confidences", ("vol_confidences",))

    return w.variables()


def _import_basic3d(w: _Writer, sd, tname: str, fname: Tuple[str, ...]):
    w.conv(sd, f"{tname}.block.0", fname + ("conv",), transform=_conv3d_w,
           bias=True)
    w.bn(sd, f"{tname}.block.1", fname + ("bn",))


def _import_res3d(w: _Writer, sd, tname: str, fname: Tuple[str, ...]):
    w.conv(sd, f"{tname}.res_branch.0", fname + ("conv1",),
           transform=_conv3d_w, bias=True)
    w.bn(sd, f"{tname}.res_branch.1", fname + ("bn1",))
    w.conv(sd, f"{tname}.res_branch.3", fname + ("conv2",),
           transform=_conv3d_w, bias=True)
    w.bn(sd, f"{tname}.res_branch.4", fname + ("bn2",))
    if f"{tname}.skip_con.0.weight" in sd:
        w.conv(sd, f"{tname}.skip_con.0", fname + ("skip_conv",),
               transform=_conv3d_w, bias=True)
        w.bn(sd, f"{tname}.skip_con.1", fname + ("skip_bn",))


def _import_upsample3d(w: _Writer, sd, tname: str, fname: Tuple[str, ...]):
    _set(w.params, fname + ("kernel",),
         _deconv3d_w(sd[f"{tname}.block.0.weight"]))
    _set(w.params, fname + ("bias",), sd[f"{tname}.block.0.bias"])
    w.bn(sd, f"{tname}.block.1", fname + ("bn",))


def import_v2v(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """Build V2VModel flax variables from a reference state dict."""
    w = _Writer()
    p = prefix

    _import_basic3d(w, sd, p + "front_layers.0", ("front_basic",))
    for i in (1, 2, 3):
        _import_res3d(w, sd, f"{p}front_layers.{i}", (f"front_res{i}",))

    ed = p + "encoder_decoder."
    fed = ("encoder_decoder",)
    for i in range(1, 6):
        _import_res3d(w, sd, f"{ed}encoder_res{i}", fed + (f"encoder_res{i}",))
        _import_res3d(w, sd, f"{ed}skip_res{i}", fed + (f"skip_res{i}",))
        _import_res3d(w, sd, f"{ed}decoder_res{i}", fed + (f"decoder_res{i}",))
        _import_upsample3d(w, sd, f"{ed}decoder_upsample{i}",
                           fed + (f"decoder_upsample{i}",))
    _import_res3d(w, sd, f"{ed}mid_res", fed + ("mid_res",))

    _import_res3d(w, sd, p + "back_layers.0", ("back_res",))
    _import_basic3d(w, sd, p + "back_layers.1", ("back_basic1",))
    _import_basic3d(w, sd, p + "back_layers.2", ("back_basic2",))

    w.conv(sd, p + "output_layer", ("output_layer",), transform=_conv3d_w,
           bias=True)
    return w.variables()


def import_algebraic_model(sd: Dict[str, np.ndarray], num_layers: int = 152,
                           num_joints: int = 17) -> dict:
    """Whole-model import for AlgebraicTriangulationNet checkpoints."""
    bb = import_pose_resnet(sd, num_layers, num_joints, prefix="backbone.")
    return {"params": {"backbone": bb["params"]},
            "batch_stats": {"backbone": bb["batch_stats"]}}


def import_volumetric_model(sd: Dict[str, np.ndarray], num_layers: int = 152,
                            num_joints: int = 17) -> dict:
    """Whole-model import for VolumetricTriangulationNet checkpoints."""
    bb = import_pose_resnet(sd, num_layers, num_joints, prefix="backbone.")
    v2v = import_v2v(sd, prefix="volume_net.")
    w = _Writer()
    w.conv(sd, "process_features.0", ("process_features",), bias=True)
    return {
        "params": {"backbone": bb["params"], "volume_net": v2v["params"],
                   "process_features": w.params["process_features"]},
        "batch_stats": {"backbone": bb["batch_stats"],
                        "volume_net": v2v["batch_stats"]},
    }
