"""Validate the analytic FLOP counters (lt_tpu/utils/flops.py) against
XLA's own cost analysis, and pin the explanations for the residual gaps:

- Convention everywhere: FLOPs = 2*MACs with full-kernel tap counting
  (the torchvision-table convention).  Verified below: XLA reports exactly
  2*M*N*K for a matmul and a 1x1 conv.
- XLA's conv cost is PADDING-AWARE (boundary output positions count only
  their valid taps), so HLO sits a few percent BELOW analytic for SAME
  convs — ~9% for V2V@32^3 (k7 front conv dominates), ~3% at 64^3.
- ``nn.scan`` loop bodies are counted ONCE by cost analysis regardless of
  trip count, so scanned-backbone HLO numbers undercount hard at depth
  (rn152's 36-block layer3 counts as one block): this is why bench.py's
  MFU uses the analytic count, with the HLO number reported alongside.
"""

import numpy as np
import pytest

from lt_tpu.utils import flops as flops_lib


def _hlo_flops(apply_fn, variables, x):
    import jax

    c = jax.jit(apply_fn).lower(variables, x).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c["flops"])


def test_convention_matches_xla_2mac():
    import jax
    import jax.numpy as jnp

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.zeros((1, 96, 96, 256), jnp.float32)
    w = jnp.zeros((1, 1, 256, 32), jnp.float32)
    c = jax.jit(conv).lower(x, w).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    assert c["flops"] == 2 * 96 * 96 * 256 * 32


def test_backbone_analytic_vs_hlo_rn18():
    """rn18 @128^2: scan bodies are short (layer1's two identical blocks
    fold into one scanned body = the only scan undercount), so HLO lands
    at ~0.89x analytic: 0.95x padding-awareness x 0.94x scan fold."""
    import jax
    import jax.numpy as jnp

    from lt_tpu.models.backbone import PoseResNet

    model = PoseResNet(num_joints=17, num_layers=18)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    hlo = _hlo_flops(lambda v, x: model.apply(v, x, False), variables, x)
    analytic = flops_lib.pose_resnet_flops(18, 128)
    ratio = hlo / analytic
    assert 0.82 < ratio < 1.0, f"rn18 hlo/analytic = {ratio:.4f}"


@pytest.mark.slow
def test_v2v_analytic_vs_hlo():
    """V2V @32^3 (pure XLA on CPU — no scan anywhere): HLO = analytic
    minus the boundary taps of the SAME convs (measured 0.907)."""
    import jax
    import jax.numpy as jnp

    from lt_tpu.models.v2v import V2VModel

    model = V2VModel(output_channels=17)
    x = jnp.zeros((1, 32, 32, 32, 32), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    hlo = _hlo_flops(lambda v, x: model.apply(v, x, False), variables, x)
    analytic = flops_lib.v2v_flops(32)
    ratio = hlo / analytic
    assert 0.88 < ratio < 1.0, f"v2v hlo/analytic = {ratio:.4f}"


def test_flagship_pipeline_breakdown():
    """Pin the flagship analytic numbers bench.py's MFU is quoted against
    (a change here must be reflected in bench.py + README + ROADMAP)."""
    f = flops_lib.vol_pipeline_flops(152, 384, 64, 4, 17)
    assert abs(f["backbone"] / 1e9 - 304.8) < 2.0
    assert abs(f["v2v"] / 1e9 - 296.3) < 2.0
    assert abs(f["total"] / 1e9 - 602.1) < 4.0
    # Sanity: stage budget implies the backbone runs at a plausible
    # fraction of peak (17.9 ms @ batch 8 -> ~136 TFLOP/s < 197 peak).
    tflops_at_budget = f["backbone"] * 8 / 17.9e-3 / 1e12
    assert tflops_at_budget < 197


def test_resnet_spec_scaling():
    """Depth ordering + the textbook rn152@224^2 trunk count (11.6 GMAC =
    23.1 GFLOP) within 3%."""
    vals = [flops_lib.pose_resnet_flops(n, 224, with_head=False)
            for n in (18, 34, 50, 101, 152)]
    assert all(a < b for a, b in zip(vals, vals[1:]))
    assert abs(vals[-1] / 1e9 - 23.1) / 23.1 < 0.03
