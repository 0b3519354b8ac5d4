"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use XLA's
host-platform device-count simulation instead (the "fake backend" the
reference never had — SURVEY §4 implications)."""

import os

# Hard-set (not setdefault): the machine environment pins JAX_PLATFORMS=axon
# (the real TPU tunnel), which is single-client and slow to init — tests must
# never grab it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def make_test_image(h=128, w=160, seed=7):
    """Synthetic photographic-like image: gradients + edges + texture."""
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.5 + 0.3 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
    edges = ((xx // 40 + yy // 32) % 2) * 0.25
    texture = r.normal(0, 0.02, (h, w)).astype(np.float32)
    lum = np.clip(base + edges + texture, 0, 1)
    rgb = np.stack(
        [
            lum * (0.8 + 0.2 * np.sin(yy / 50.0)),
            lum,
            lum * (0.7 + 0.3 * np.cos(xx / 60.0)),
        ],
        axis=-1,
    )
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)


@pytest.fixture(scope="session")
def test_image():
    return make_test_image()
