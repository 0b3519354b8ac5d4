"""Multi-device tests on the virtual 8-device CPU mesh (conftest)."""

import numpy as np
import pytest

import jax


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    from jxl_tpu.distributed.mesh import make_mesh

    m = make_mesh(8)
    assert m.devices.shape == (8, 1)
    m2 = make_mesh(8, space=2)
    assert m2.devices.shape == (4, 2)
    assert m2.axis_names == ("data", "space")


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_encode_matches_single_device():
    """DPxSP sharded result must equal the unsharded computation."""
    from jxl_tpu.distributed.mesh import make_mesh
    from jxl_tpu.distributed.sharded import make_sharded_encode_step

    h = w = 32
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (4, h, w, 3), dtype=np.uint8)

    mesh = make_mesh(8, space=2)
    step, shard = make_sharded_encode_step(mesh, height=h, width=w, lanes=8)
    nbytes_sharded, counts_sharded = step(jax.device_put(batch, shard))

    mesh1 = make_mesh(1)
    step1, shard1 = make_sharded_encode_step(mesh1, height=h, width=w, lanes=8)
    nbytes_1, counts_1 = step1(jax.device_put(batch, shard1))

    np.testing.assert_array_equal(np.asarray(nbytes_sharded), np.asarray(nbytes_1))
    np.testing.assert_array_equal(np.asarray(counts_sharded), np.asarray(counts_1))


@pytest.mark.slow
def test_sharded_epf_matches_unsharded():
    """Explicit ppermute halo exchange must reproduce the single-device EPF
    bit-for-bit (boundary handling included)."""
    import jax.numpy as jnp

    from jxl_tpu.distributed.mesh import make_mesh
    from jxl_tpu.distributed.sharded import sharded_epf
    from jxl_tpu.transforms.epf import epf_apply

    rng = np.random.default_rng(7)
    h, w = 32, 8 * 8 * 4  # width splits over 4 space shards
    planes = jnp.asarray(rng.normal(0.4, 0.1, (3, h, w)).astype(np.float32))
    eff = jnp.asarray(rng.uniform(0.6, 2.0, (h // 8, w // 8)).astype(np.float32))

    want = np.asarray(epf_apply(planes, eff, 2.0))
    mesh = make_mesh(8, space=4)
    got = np.asarray(sharded_epf(planes, eff, 2.0, mesh))
    np.testing.assert_allclose(got, want, atol=1e-6)
