"""What gather forms does Mosaic support? Test 2D take / take_along_axis."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def t(fn, iters=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


# A: take_along_axis on 2D [R, 128] with per-row indices  (lanes-dim shuffle)
R = 512
tab = jnp.asarray(rng.integers(0, 1 << 30, size=(R, 128)).astype(np.uint32))
idx = jnp.asarray(rng.integers(0, 128, size=(R, 128)).astype(np.int32))


def k_taa(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)


try:
    f = jax.jit(
        pl.pallas_call(
            k_taa,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    r = f(tab, idx)
    ok = np.array_equal(np.asarray(r), np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1))
    print("A take_along_axis axis=1 [512,128]: ok", ok, "t", round(t(lambda: f(tab, idx)), 5), flush=True)
except Exception as e:
    print("A FAILED:", repr(e)[:200], flush=True)

# B: take_along_axis axis=0 (per-column row select)
idx0 = jnp.asarray(rng.integers(0, R, size=(8, 128)).astype(np.int32))


def k_taa0(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)


try:
    f = jax.jit(
        pl.pallas_call(
            k_taa0,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    r = f(tab, idx0)
    ok = np.array_equal(np.asarray(r), np.take_along_axis(np.asarray(tab), np.asarray(idx0), axis=0))
    print("B take_along_axis axis=0 [8,128] from [512,128]: ok", ok, "t", round(t(lambda: f(tab, idx0)), 5), flush=True)
except Exception as e:
    print("B FAILED:", repr(e)[:200], flush=True)

# C: jnp.take 2D operand, 2D indices, axis=0 (row gather)
idxr = jnp.asarray(rng.integers(0, R, size=(64, 128)).astype(np.int32))


def k_take0(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:, 0], axis=0)


try:
    f = jax.jit(
        pl.pallas_call(
            k_take0,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    r = f(tab, idxr)
    print("C take axis=0 rows: ok", np.array_equal(np.asarray(r), np.asarray(tab)[np.asarray(idxr)[:, 0]]), "t", round(t(lambda: f(tab, idxr)), 5), flush=True)
except Exception as e:
    print("C FAILED:", repr(e)[:200], flush=True)

# D: full scan-in-pallas feasibility: sequential grid with scratch carry and
# a per-step [1, K] table lookup via take_along_axis on a [K, 128] table page
# (table replicated per sublane? emulate: lookup combo_flat via 2-step:
# row = idx // 128 -> take rows is unsupported per-lane... try where-chain 15 ctx)
K = 128
T = 1024
states0 = jnp.asarray(rng.integers(1 << 16, 1 << 31, size=(1, K)).astype(np.uint32))
seq = jnp.asarray(rng.integers(0, 1 << 30, size=(T, K)).astype(np.uint32))


def k_scan(seq_ref, st_ref, out_ref, carry):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = st_ref[:]

    x = carry[:]
    s = seq_ref[:]
    x = x ^ s + (x >> 3)
    carry[:] = x
    out_ref[:] = x


try:
    f = jax.jit(
        pl.pallas_call(
            k_scan,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, K), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((1, K), jnp.uint32)],
        )
    )
    r = jax.block_until_ready(f(seq, states0))
    print("D sequential-grid scratch-carry scan works, t/step:", round(t(lambda: f(seq, states0)) / T * 1e6, 3), "us", flush=True)
except Exception as e:
    print("D FAILED:", repr(e)[:300], flush=True)

# E: cumsum along lanes inside kernel (needed for rank)
def k_cumsum(x_ref, out_ref):
    out_ref[:] = jnp.cumsum(x_ref[:], axis=1)


try:
    x = jnp.asarray(rng.integers(0, 2, size=(8, 128)).astype(np.int32))
    f = jax.jit(
        pl.pallas_call(
            k_cumsum,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    r = f(x)
    print("E cumsum axis=1: ok", np.array_equal(np.asarray(r), np.cumsum(np.asarray(x), axis=1)), flush=True)
except Exception as e:
    print("E FAILED:", repr(e)[:200], flush=True)
