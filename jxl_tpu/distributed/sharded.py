"""Sharded batch encode — the multi-chip execution path.

The reference achieves corpus parallelism with 6 threads x 6 containers
(`benchmark.rs:173-198`); here a batch of images is one jit-compiled program
over a ("data", "space") mesh: images sharded over "data" (DP), each image's
width sharded over "space" (the spatial/sequence-parallel axis). XLA inserts
the collectives the sharding implies — e.g. the DC gradient-predictor
cumsum and histogram reductions cross the "space" boundary (the reference's
only cross-worker "communication" was CSV files on the host FS).

The dryrun path uses uniform rANS tables so the whole step stays on device
(real encodes quantize per-image histograms on the host between stage 1 and
stage 2 — see codec.encode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jxl_tpu.codec.encode import tokens_from_rgb
from jxl_tpu.codec.layout import N_CTX, token_layout
from jxl_tpu.distributed.mesh import batch_sharding, make_mesh
from jxl_tpu.entropy.rans import rans_encode
from jxl_tpu.entropy.tokens import ALPHABET, byte_capacity, pack_bytes


def uniform_tables():
    """Flat rANS tables (valid, content-independent) for on-device-only runs."""
    m = 1 << 12
    base = m // ALPHABET
    freq = np.full((N_CTX, ALPHABET), base, np.int64)
    freq[:, -1] += m - base * ALPHABET
    cum = np.concatenate(
        [np.zeros((N_CTX, 1), np.int64), np.cumsum(freq, axis=1)[:, :-1]], axis=1
    )
    return freq.astype(np.uint32), cum.astype(np.uint32)


def _single_image_step(rgb, freq, cum, *, height, width, distance, lanes):
    token, nbits, mant, counts = tokens_from_rgb(
        rgb, height=height, width=width, distance=distance
    )
    lay = token_layout(height, width)
    ctx = jnp.asarray(lay["ctx"])
    _words, n_words, _states = rans_encode(token, ctx, freq, cum, lanes=lanes)
    _mant_arr, total_mant = pack_bytes(nbits, mant, byte_capacity(lay["n_tokens"]))
    # compressed payload bytes: rANS words + mantissa bytes (headers excluded)
    nbytes = 2 * n_words + total_mant
    return nbytes, counts


def make_sharded_encode_step(mesh=None, *, height, width, distance=1.0, lanes=64):
    """Returns (jitted_step, input_sharding) for [B, H, W, 3] u8 batches.

    jitted_step(batch) -> (nbytes [B], counts [B, C, A]).
    """
    if mesh is None:
        mesh = make_mesh()
    freq, cum = uniform_tables()
    freq_j, cum_j = jnp.asarray(freq), jnp.asarray(cum)

    step = jax.vmap(
        partial(
            _single_image_step,
            freq=freq_j,
            cum=cum_j,
            height=height,
            width=width,
            distance=distance,
            lanes=lanes,
        )
    )
    in_sharding = batch_sharding(mesh)
    jitted = jax.jit(step, in_shardings=(in_sharding,))
    return jitted, in_sharding
