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


def sharded_epf(planes, eff_mul, distance, mesh):
    """EPF over a width-sharded image with EXPLICIT halo exchange.

    The distributed analog of libjxl's cross-group filtering: each device
    holds a vertical stripe of the image ("space" axis); the 1-pixel column
    halos the cross-shaped kernel needs are exchanged with the ring
    neighbors via `ppermute` (ICI neighbor collectives — the
    boundary-exchange pattern SURVEY §5.7 calls the ring-attention analog
    for images). Global image edges use edge replication, selected by
    axis_index so the ring wrap never leaks pixels across the image border.

    planes: [3, H, W] (W divisible by 8 * mesh "space" size),
    eff_mul: [nby, nbx]. Returns filtered [3, H, W] with the exact same
    values as the unsharded transforms.epf.epf_apply.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from jxl_tpu.transforms.epf import epf_filter_ext, epf_sigma

    h, w = planes.shape[-2:]
    n_space = mesh.shape["space"]
    assert w % (8 * n_space) == 0, "width must split into whole block columns"
    sig = epf_sigma(eff_mul, distance, h, w)

    def body(pl_local, sig_local):
        idx = jax.lax.axis_index("space")
        left_edge = pl_local[:, :, :1]
        right_edge = pl_local[:, :, -1:]
        # ring exchange: receive the right neighbor's leftmost column and
        # the left neighbor's rightmost column
        fwd = [(i, (i + 1) % n_space) for i in range(n_space)]
        bwd = [(i, (i - 1) % n_space) for i in range(n_space)]
        from_left = jax.lax.ppermute(right_edge, "space", fwd)
        from_right = jax.lax.ppermute(left_edge, "space", bwd)
        # global borders replicate their own edge instead of ring-wrapping
        from_left = jnp.where(idx == 0, left_edge, from_left)
        from_right = jnp.where(idx == n_space - 1, right_edge, from_right)
        ext = jnp.concatenate([from_left, pl_local, from_right], axis=-1)
        ext = jnp.pad(ext, ((0, 0), (1, 1), (0, 0)), mode="edge")
        return epf_filter_ext(ext, sig_local)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None, "space"), P(None, "space")),
        out_specs=P(None, None, "space"),
    )
    return fn(planes, sig)


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
