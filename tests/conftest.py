"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §4: multi-device
tests fake an 8-device mesh via xla_force_host_platform_device_count).
"""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (real TPU)
# AND its sitecustomize imports jax at interpreter startup, so env vars alone
# are too late — jax.config.update() still works before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def make_synthetic_cameras(n_views=4, rng=None):
    """A ring of cameras looking at the origin, with realistic intrinsics."""
    rng = rng or np.random.RandomState(0)
    proj = []
    Rs, ts, Ks = [], [], []
    for i in range(n_views):
        angle = 2 * np.pi * i / n_views + rng.uniform(-0.1, 0.1)
        # Camera center on a circle of radius 4000mm, height ~1500mm.
        center = np.array([4000 * np.cos(angle), 4000 * np.sin(angle), 1500.0])
        # Look-at rotation: z axis towards origin.
        z = -center / np.linalg.norm(center)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)
        t = -R @ center.reshape(3, 1)
        K = np.array([[1150.0 + rng.uniform(-20, 20), 0, 48.0],
                      [0, 1150.0 + rng.uniform(-20, 20), 48.0],
                      [0, 0, 1.0]])
        # Scale focal way down so the 96x96 "heatmap-space" projection of
        # points near the origin lands in frame.
        K[:2] *= 96.0 / 1000.0 / 4.0
        Rs.append(R)
        ts.append(t)
        Ks.append(K)
        proj.append(K @ np.hstack([R, t]))
    return (np.array(proj, np.float32), np.array(Rs, np.float32),
            np.array(ts, np.float32), np.array(Ks, np.float32))
