"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jxl_tpu.ops.pallas_dct import _dct_kron_np, dct_quantize_reference


def test_kron_identity_matches_dct2d():
    from jxl_tpu.transforms.dct import dct2d

    rng = np.random.default_rng(0)
    x = rng.normal(size=(17, 8, 8)).astype(np.float32)
    kron = _dct_kron_np()
    got = (x.reshape(17, 64) @ kron.T).reshape(17, 8, 8)
    want = np.asarray(dct2d(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_dct_quantize_interpret():
    """Run the kernel in interpreter mode (no TPU needed) vs the XLA path."""
    from jax.experimental import pallas as pl
    from jxl_tpu.ops import pallas_dct as pd

    rng = np.random.default_rng(1)
    nb = 700  # non-multiple of CHUNK exercises padding
    blocks = jnp.asarray(rng.normal(0, 0.2, (nb, 8, 8)).astype(np.float32))
    steps = jnp.asarray(rng.uniform(0.01, 0.1, (nb, 8, 8)).astype(np.float32))

    # monkeypatch pallas_call to interpret mode for CPU execution
    orig = pl.pallas_call
    try:
        pl.pallas_call = lambda *a, **k: orig(*a, interpret=True, **k)
        got = np.asarray(pd.dct_quantize_pallas.__wrapped__(blocks, steps))
    finally:
        pl.pallas_call = orig
    want = np.asarray(dct_quantize_reference(blocks, steps))
    # rounding boundaries may differ by 1 ulp-of-round; demand near-exact
    diff = np.abs(got - want)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3
