"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use XLA's
host-platform device-count simulation instead (the "fake backend" the
reference never had — SURVEY §4 implications)."""

import os

# The axon TPU plugin registers itself regardless of the JAX_PLATFORMS env
# var (verified: env JAX_PLATFORMS=cpu still yields the TPU device), and the
# tunnel is single-client — tests must force CPU through the config API,
# which does win over the plugin. Same for the virtual device count
# (jax_num_cpu_devices replaces the old XLA_FLAGS mechanism in jax 0.9).
os.environ["JAX_PLATFORMS"] = "cpu"  # belt...
# Persistent compile cache in a DEDICATED cpu-tests dir (the old
# NO_CACHE=1 existed because the default dir mixed TPU-CLI artifacts
# with CPU test artifacts and warned loudly; a partitioned dir is clean).
# The suite is XLA-compile-bound, so a warm cache cuts a full invocation
# from ~10 minutes to ~2-3; xdist workers share it safely (file-per-
# program). JXL_TPU_NO_CACHE=1 still opts out.
os.environ.setdefault(
    "JXL_TPU_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "jxl_tpu_jax", "cpu-tests"),
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # ...and suspenders
jax.config.update("jax_num_cpu_devices", 8)

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
