"""Can Mosaic do dynamic per-element gathers from VMEM, and how fast?

Tests: (a) XLA baseline gather, (b) pallas take_along_axis lanes-dim,
(c) pallas one-hot matmul lookup for a 64-entry table.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 20  # ~1M lookups
TABLE = 1 << 16  # 64K-entry table (256KB u32) — VMEM resident
rng = np.random.default_rng(0)
idx_np = rng.integers(0, TABLE, size=N).astype(np.int32)
tab_np = rng.integers(0, 1 << 30, size=TABLE).astype(np.uint32)
idx = jnp.asarray(idx_np)
tab = jnp.asarray(tab_np)


def t(fn, iters=5):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


xla_gather = jax.jit(lambda tab, idx: tab[idx])
print("xla gather 1M from 64K:", round(t(lambda: xla_gather(tab, idx)), 4), flush=True)

# pallas: grid over chunks of 8x128 rows; table fully in VMEM
ROWS, LANES = 512, 128  # 64K elements per grid step
CHUNK = ROWS * LANES
idx2 = idx.reshape(N // CHUNK, ROWS, LANES)


def gather_kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


try:
    pgather = pl.pallas_call(
        gather_kernel,
        grid=(N // CHUNK,),
        in_specs=[
            pl.BlockSpec((TABLE,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx2.shape, jnp.uint32),
    )
    pg = jax.jit(lambda tab, idx2: pgather(tab, idx2))
    r = pg(tab, idx2)
    ok = np.array_equal(np.asarray(r).reshape(-1), tab_np[idx_np])
    print("pallas take gather ok:", ok, "time:", round(t(lambda: pg(tab, idx2)), 4), flush=True)
except Exception as e:
    print("pallas take gather FAILED:", repr(e)[:300], flush=True)

# variant: 2D table [rows=512, 128], per-element gather via take on flattened — try dynamic_gather through indexing
def gather_kernel2(tab_ref, idx_ref, out_ref):
    out_ref[:] = tab_ref[idx_ref[:]]


try:
    pgather2 = pl.pallas_call(
        gather_kernel2,
        grid=(N // CHUNK,),
        in_specs=[
            pl.BlockSpec((TABLE,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx2.shape, jnp.uint32),
    )
    pg2 = jax.jit(lambda tab, idx2: pgather2(tab, idx2))
    r = pg2(tab, idx2)
    ok = np.array_equal(np.asarray(r).reshape(-1), tab_np[idx_np])
    print("pallas ref-index gather ok:", ok, "time:", round(t(lambda: pg2(tab, idx2)), 4), flush=True)
except Exception as e:
    print("pallas ref-index gather FAILED:", repr(e)[:300], flush=True)

# small-table one-hot matmul: 1M lookups from a 64-entry table
SMALL = 64
idx_s = jnp.asarray((idx_np % SMALL).astype(np.int32))
tab_s = jnp.asarray(tab_np[:SMALL].astype(np.float32))


@jax.jit
def onehot_lookup(tab_s, idx_s):
    oh = (idx_s[:, None] == jnp.arange(SMALL)[None, :]).astype(jnp.bfloat16)
    return jnp.dot(oh, tab_s.astype(jnp.bfloat16)[:, None], preferred_element_type=jnp.float32)


print("xla one-hot matmul 1M from 64:", round(t(lambda: onehot_lookup(tab_s, idx_s)), 4), flush=True)

xla_small = jax.jit(lambda tab_s, idx_s: tab_s[idx_s])
print("xla gather 1M from 64:", round(t(lambda: xla_small(tab_s, idx_s)), 4), flush=True)

# lanes-dim take_along_axis (the in-scan window-read shape): [T,K] windows
K = 256
T = N // K
win = jnp.asarray(rng.integers(0, 1 << 30, size=(T, K)).astype(np.uint32))
rk = jnp.asarray(rng.integers(0, K, size=(T, K)).astype(np.int32))
xla_taa = jax.jit(lambda w, r: jnp.take_along_axis(w, r, axis=1))
print("xla take_along [T,K] lanes:", round(t(lambda: xla_taa(win, rk)), 4), flush=True)
