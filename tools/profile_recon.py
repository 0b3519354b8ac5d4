"""Profile decode reconstruction + EPF separately from the entropy stages."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from jxl_tpu.codec.layout import token_layout
from jxl_tpu.codec.decode import _reconstruct_sub8, _overlay_merged
from jxl_tpu.strategy.acs import (
    ACS_DCT16X16,
    ACS_DCT32X32,
    effective_multiplier,
    step_grid_variants,
    steps_field,
)
from jxl_tpu.transforms.adaptive import qf_multiplier
from jxl_tpu.transforms.epf import epf_apply

h, w = 512, 768
lay = token_layout(h, w)
nby, nbx = lay["nby"], lay["nbx"]
rng = np.random.default_rng(0)
storage = jnp.asarray(rng.normal(size=(3, nby, nbx, 8, 8)).astype(np.float32))
dc = jnp.asarray(rng.normal(size=(3, nby, nbx)).astype(np.float32))
acs = jnp.asarray(rng.integers(0, 6, size=(nby, nbx)).astype(np.int32))
qf_idx = jnp.asarray(rng.integers(0, 16, size=(nby, nbx)).astype(np.int32))
d = jnp.float32(1.0)


def t(fn, iters=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


@jax.jit
def steps_part(acs, qf_idx, d):
    variants = step_grid_variants(d)
    eff = effective_multiplier(qf_multiplier(qf_idx), acs)
    return steps_field(variants, acs, eff)


print("steps_field+variants:", round(t(lambda: jax.block_until_ready(steps_part(acs, qf_idx, d))), 4), flush=True)


@jax.jit
def recon_sub8(storage, dc, acs):
    return _reconstruct_sub8(storage, dc, acs)


print("reconstruct_sub8 (4 dense IDCT + select):", round(t(lambda: jax.block_until_ready(recon_sub8(storage, dc, acs))), 4), flush=True)


@jax.jit
def recon_full(storage, dc, acs):
    blocks = _reconstruct_sub8(storage, dc, acs)
    planes = blocks.transpose(0, 1, 3, 2, 4).reshape(3, nby * 8, nbx * 8)
    planes = _overlay_merged(planes, storage, dc, acs, 16, ACS_DCT16X16)
    planes = _overlay_merged(planes, storage, dc, acs, 32, ACS_DCT32X32)
    return planes


print("recon + merged overlays:", round(t(lambda: jax.block_until_ready(recon_full(storage, dc, acs))), 4), flush=True)

planes = recon_full(storage, dc, acs)
eff = jax.jit(lambda q, a: effective_multiplier(qf_multiplier(q), a))(qf_idx, acs)


@jax.jit
def epf_part(planes, eff, d):
    return epf_apply(planes, eff, d)


print("epf_apply:", round(t(lambda: jax.block_until_ready(epf_part(planes, eff, d))), 4), flush=True)
