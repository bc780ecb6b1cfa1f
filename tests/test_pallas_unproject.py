"""Fused Pallas unprojection kernel: parity with the XLA path.

Runs in interpreter mode on the CPU test mesh; the same kernel is validated
compiled on real TPU hardware (max diff ~1.4e-4 vs the XLA path at f32, see
lt_tpu/ops/pallas/unproject.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lt_tpu.ops import volumetric as vol_ops
from lt_tpu.ops.pallas import unproject as pu
from tests.conftest import make_synthetic_cameras


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(3)
    b, v, h, w, c, s = 2, 3, 16, 16, 8, 8
    feats = jnp.asarray(rng.randn(b, v, h, w, c).astype(np.float32))
    proj, *_ = make_synthetic_cameras(v, rng)
    proj = jnp.broadcast_to(jnp.asarray(proj * np.array(
        [[16 / 96.0], [16 / 96.0], [1.0]], np.float32)), (b, v, 3, 4))
    base = jnp.asarray(rng.uniform(-200, 200, (b, 3)).astype(np.float32))
    thetas = jnp.asarray(rng.uniform(0, 6.28, (b,)).astype(np.float32))
    return feats, proj, base, thetas, s


def test_affine_matches_materialized_volume(setup):
    _, _, base, thetas, s = setup
    coords = vol_ops.build_coord_volumes(base, 2000.0, s, thetas)
    affine = vol_ops.coord_volume_affine(base, 2000.0, s, thetas)
    gx, gy, gz = np.meshgrid(np.arange(s), np.arange(s), np.arange(s),
                             indexing="ij")
    g = np.stack([gx, gy, gz, np.ones_like(gx)], -1).astype(np.float32)
    coords2 = np.einsum("bij,xyzj->bxyzi", np.asarray(affine), g)
    np.testing.assert_allclose(coords2, np.asarray(coords), atol=2e-3)


def test_affine_transfer_cmu_matches(setup):
    _, _, base, thetas, s = setup
    coords = vol_ops.build_coord_volumes(base, 2000.0, s, thetas,
                                         transfer_cmu_to_human36m=True)
    affine = vol_ops.coord_volume_affine(base, 2000.0, s, thetas,
                                         transfer_cmu_to_human36m=True)
    gx, gy, gz = np.meshgrid(np.arange(s), np.arange(s), np.arange(s),
                             indexing="ij")
    g = np.stack([gx, gy, gz, np.ones_like(gx)], -1).astype(np.float32)
    coords2 = np.einsum("bij,xyzj->bxyzi", np.asarray(affine), g)
    np.testing.assert_allclose(coords2, np.asarray(coords), atol=2e-3)


@pytest.mark.parametrize("method", ["softmax", "sum", "max"])
def test_kernel_matches_xla_unproject(setup, method):
    feats, proj, base, thetas, s = setup
    coords = vol_ops.build_coord_volumes(base, 2000.0, s, thetas)
    affine = vol_ops.coord_volume_affine(base, 2000.0, s, thetas)

    ref = vol_ops.unproject_heatmaps(feats, proj, coords, method)
    got = pu.unproject_heatmaps_affine(feats, proj, affine, s, method,
                                       tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_kernel_view_mask(setup):
    feats, proj, base, thetas, s = setup
    coords = vol_ops.build_coord_volumes(base, 2000.0, s, thetas)
    affine = vol_ops.coord_volume_affine(base, 2000.0, s, thetas)
    mask = jnp.asarray([[1, 1, 0], [1, 1, 1]], jnp.float32)

    ref = vol_ops.unproject_heatmaps(feats, proj, coords, "softmax",
                                     view_mask=mask)
    got = pu.unproject_heatmaps_affine(feats, proj, affine, s, "softmax",
                                       view_mask=mask, tile=64,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_kernel_conf_aggregation(setup):
    feats, proj, base, thetas, s = setup
    b, v = feats.shape[:2]
    c = feats.shape[-1]
    conf = jnp.asarray(np.random.RandomState(0).rand(b, v, c)
                       .astype(np.float32))
    coords = vol_ops.build_coord_volumes(base, 2000.0, s, thetas)
    affine = vol_ops.coord_volume_affine(base, 2000.0, s, thetas)

    ref = vol_ops.unproject_heatmaps(feats, proj, coords, "conf",
                                     vol_confidences=conf)
    got = pu.unproject_heatmaps_affine(feats, proj, affine, s, "conf",
                                       vol_confidences=conf, tile=64,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("method", ["softmax", "sum", "max", "conf"])
def test_fused_aggregation_matches_unfused(setup, method):
    """The in-kernel view aggregation == the XLA aggregation, incl. a
    masked view (op.py:149-164 semantics)."""
    feats, proj, base, thetas, s = setup
    b, v = feats.shape[:2]
    c = feats.shape[-1]
    conf = (jnp.asarray(np.random.RandomState(0).rand(b, v, c)
                        .astype(np.float32)) if method == "conf" else None)
    mask = jnp.asarray([[1, 1, 0], [1, 1, 1]], jnp.float32)
    coords = vol_ops.build_coord_volumes(base, 2000.0, s, thetas)
    affine = vol_ops.coord_volume_affine(base, 2000.0, s, thetas)

    ref = vol_ops.unproject_heatmaps(feats, proj, coords, method,
                                     vol_confidences=conf, view_mask=mask)
    got = pu.unproject_heatmaps_affine(feats, proj, affine, s, method,
                                       vol_confidences=conf, view_mask=mask,
                                       tile=64, fuse_aggregation=True,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_kernel_gradient_matches_xla(setup):
    """custom_vjp (transposed row-mix) vs autodiff through the XLA path."""
    import jax

    feats, proj, base, thetas, s = setup
    coords = vol_ops.build_coord_volumes(base, 2000.0, s, thetas)
    affine = vol_ops.coord_volume_affine(base, 2000.0, s, thetas)
    rng = np.random.RandomState(7)
    w = jnp.asarray(rng.randn(2, 8, s, s, s).astype(np.float32))

    def loss_kernel(f):
        out = pu.unproject_heatmaps_affine(f, proj, affine, s, "sum",
                                           tile=64, interpret=True)
        return jnp.sum(out * w)

    def loss_xla(f):
        out = vol_ops.unproject_heatmaps(f, proj, coords, "sum")
        return jnp.sum(out * w)

    g1 = jax.grad(loss_kernel)(feats)
    g2 = jax.grad(loss_xla)(feats)
    scale = float(jnp.abs(g2).max())
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-2 * scale, rtol=1e-2)


def test_kernel_bf16_aggregation_dtype(setup):
    """Training path: the kernel emits the sampled tensor in bf16 directly
    (halves the softmax-aggregation residual that gated flagship batch-5
    training memory); outputs and gradients stay within bf16 tolerance."""
    import jax

    feats, proj, base, thetas, s = setup
    affine = vol_ops.coord_volume_affine(base, 2000.0, s, thetas)
    rng = np.random.RandomState(11)
    w = jnp.asarray(rng.randn(2, s, s, s, 8).astype(np.float32))

    def make_loss(agg_dtype):
        def loss(f):
            out = pu.unproject_heatmaps_affine(
                f, proj, affine, s, "softmax", tile=64,
                aggregation_dtype=agg_dtype, channels_last=True,
                interpret=True)
            return jnp.sum(out * w)
        return loss

    l32, g32 = jax.value_and_grad(make_loss(None))(feats)
    l16, g16 = jax.value_and_grad(make_loss(jnp.bfloat16))(feats)
    assert g16.dtype == feats.dtype
    np.testing.assert_allclose(float(l16), float(l32), rtol=2e-2)
    scale = float(jnp.abs(g32).max())
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               atol=3e-2 * scale, rtol=3e-2)


def test_banded_backward_matches_unbanded(setup):
    """The banded backward (c0 >= 0 path) equals the full-width pass."""
    import jax

    feats, proj, base, thetas, s = setup
    affine = vol_ops.coord_volume_affine(base, 2000.0, s, thetas)
    b, v = feats.shape[:2]
    m = jnp.einsum(
        "bvij,bjk->bvik", proj,
        jnp.concatenate([affine, jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0]), (b, 1, 4))], 1))
    f = feats.reshape(b * v, *feats.shape[2:])
    mm = m.reshape(b * v, 3, 4)
    rng = np.random.RandomState(13)
    w = jnp.asarray(rng.randn(b * v, 8, s ** 3).astype(np.float32))

    def loss(f, band):
        out = pu.sample_views_affine_t(f, mm, s, 64, band, True)
        return jnp.sum(out * w)

    h, wdt, c = feats.shape[2:]
    c0s = np.asarray(pu._tile_column_bands(mm, s, 64, h, wdt, 4, c,
                                           align=1))
    assert (c0s >= 0).any(), "no tile fits the band; test would be vacuous"

    g_banded = jax.grad(lambda f: loss(f, 4))(f)     # bands active (4 < W)
    g_full = jax.grad(lambda f: loss(f, None))(f)    # full-width fallback
    np.testing.assert_allclose(np.asarray(g_banded), np.asarray(g_full),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("method", ["softmax", "sum"])
def test_fused_aggregation_gradient_matches_unfused(setup, method):
    """sample_views_agg custom VJP (VERDICT r2 #4): gradients of the fused
    sample+aggregate kernel vs autodiff through the XLA path, with a masked
    view."""
    import jax

    feats, proj, base, thetas, s = setup
    b = feats.shape[0]
    mask = jnp.asarray([[1, 1, 0], [1, 1, 1]], jnp.float32)
    coords = vol_ops.build_coord_volumes(base, 2000.0, s, thetas)
    affine = vol_ops.coord_volume_affine(base, 2000.0, s, thetas)
    rng = np.random.RandomState(13)
    w = jnp.asarray(rng.randn(b, 8, s, s, s).astype(np.float32))

    def loss_fused(f):
        out = pu.unproject_heatmaps_affine(f, proj, affine, s, method,
                                           view_mask=mask, tile=64,
                                           fuse_aggregation=True,
                                           interpret=True)
        return jnp.sum(out * w)

    def loss_xla(f):
        out = vol_ops.unproject_heatmaps(f, proj, coords, method,
                                         view_mask=mask)
        return jnp.sum(out * w)

    assert np.isfinite(float(loss_fused(feats)))
    g1 = jax.grad(loss_fused)(feats)
    g2 = jax.grad(loss_xla)(feats)
    scale = float(jnp.abs(g2).max())
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-2 * scale, rtol=1e-2)
