"""Pallas TPU kernel: grouped rANS ENCODE scan + in-order stream emission.

The XLA encoder (entropy/grouped.py) pays ~18 ms/1.2M tokens in stream
ASSEMBLY: the rANS scan's word scatter and the 3-pass mantissa-byte pack
are full-stream scatters (ROADMAP #1). This kernel emits both streams in
their final per-group consumption order DIRECTLY, walking the scan steps
in reverse (rANS encodes back-to-front) and back-filling each group's
output bucket from the end — when the grid finishes, group g's words
occupy words[g, capw-count_g : capw] already in decoder consumption order,
and likewise for mantissa bytes.

Mosaic constraints shape everything (see entropy/pallas_rans.py, the
decode twin): the only dynamic indexing is lane-dim `take_along_axis`, and
dynamic loads/stores must start 128-aligned. So the back-fill is a
read-modify-write of the (at most 2 word / 4 byte) aligned 128-wide
windows covering each step's emission region, with the scatter inverted
into a gather: output lane at stream position p computes its rank
r = p - new_ptr and finds the emitting lane by 7-probe binary search over
the step's inclusive-cumsum (roll-based — Mosaic has no cumsum).

Symbol (f, c) lookup is a lane-dim take_along into the step's streamed
(freq|cum) row — no search needed on the encode side (the symbol is
known). Steps beyond the real T use the same no-op row as decode
(freq[0] = M: the state update is an exact identity; the emit test
`x >> 20 >= f` is false for every x since x >> 20 < 4096 = M).

Bit-exactness vs the XLA twin (words, counts, states, mantissa bytes) is
pinned by tests/test_pallas_enc.py in interpret mode; the decode kernel
round-trips the emitted streams.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jxl_tpu.entropy.grouped import GROUP, MAX_NBYTES
from jxl_tpu.entropy.rans import RANS_L, RANS_PRECISION

SUBSTEPS = 8  # scan steps per grid iteration (sublane tile height)


def _incl_cumsum_lanes(v):
    """Inclusive cumsum along the 128-lane dim of an [8, 128] i32 tile."""
    x = v
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    for sh in (1, 2, 4, 8, 16, 32, 64):
        r = pltpu.roll(x, shift=sh, axis=1)
        x = x + jnp.where(col >= sh, r, 0)
    return x


def _lower_bound_rank(csum, r):
    """Rowwise: the index of the emitting lane with rank r — the smallest
    k with csum[row, k] == r + 1 on a nondecreasing inclusive cumsum.
    csum, r: [8, 128] i32 (r may be negative / out of range — caller masks
    validity). Mosaic's gather rule wants full [8, 128] tiles, so searches
    run stacked across all groups at once (rows are independent)."""
    lo = jnp.zeros_like(r)
    for p in (64, 32, 16, 8, 4, 2, 1):
        cand = lo + p
        cv = jnp.take_along_axis(csum, jnp.minimum(cand, GROUP - 1), axis=1)
        lo = jnp.where(cv <= r, cand, lo)
    first = jnp.take_along_axis(csum, jnp.zeros_like(r), axis=1)
    return jnp.where(first <= r, lo + 1, 0)


def _stack_scalar_col(vals, fill=0):
    """[len(vals)] SMEM scalars -> [8, 1] i32 column (decode's off_col
    pattern)."""
    parts = [jnp.full((1, 1), v, jnp.int32) for v in vals]
    if len(vals) < 8:
        parts.append(jnp.full((8 - len(vals), 1), fill, jnp.int32))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _make_enc_kernel(G: int, capw: int, capm: int, Tg: int):
    def kernel(
        rows_ref,
        tok_ref,
        mant_ref,
        words_ref,
        mbytes_ref,
        states_ref,
        counts_ref,
        x_scr,
        ptr_ref,
    ):
        i = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1)

        @pl.when(i == 0)
        def _():
            x_scr[:] = jnp.full((8, GROUP), RANS_L, jnp.uint32)
            for g in range(G):
                ptr_ref[g] = capw  # word back-fill pointer
                ptr_ref[8 + g] = capm  # mantissa byte back-fill pointer

        for s in reversed(range(SUBSTEPS)):
            tok = tok_ref[s]  # [8, 128] i32 (rows >= G are zero padding)
            rowb = jnp.broadcast_to(rows_ref[s][None, :], (8, GROUP))
            f = jnp.take_along_axis(rowb, tok, axis=1)
            c = jnp.take_along_axis(rowb, tok + 64, axis=1)
            fu = f.astype(jnp.uint32)
            x = x_scr[:]

            emit = (x >> jnp.uint32(20)) >= fu  # overflow-safe x >= f << 20
            word = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
            x1 = jnp.where(emit, x >> jnp.uint32(16), x)
            x_scr[:] = ((x1 // fu) << jnp.uint32(RANS_PRECISION)) + (
                x1 % fu
            ) + c.astype(jnp.uint32)

            # ---- words: back-fill this step's emissions in rank order.
            # Searches/gathers run STACKED over all groups as [8, 128]
            # tiles (Mosaic's gather lowering wants full tiles, not [1,128]
            # slices); only the window read-modify-writes are per group row
            # (aligned bases differ per group).
            e32 = emit.astype(jnp.int32)
            csum = _incl_cumsum_lanes(e32)
            wold = [ptr_ref[g] for g in range(G)]
            wnew = [wold[g] - jnp.sum(e32[g, :]) for g in range(G)]
            wbase = [(jnp.maximum(p, 0) // GROUP) * GROUP for p in wnew]
            new_col = _stack_scalar_col(wnew)
            old_col = _stack_scalar_col(wold)
            base_col = _stack_scalar_col(wbase)
            for wj in range(2):
                olds = [
                    words_ref[
                        g, pl.ds(pl.multiple_of(wbase[g] + wj * GROUP, GROUP), GROUP)
                    ].reshape(1, GROUP)
                    for g in range(G)
                ] + [jnp.zeros((1, GROUP), jnp.int32)] * (8 - G)
                old = olds[0] if len(olds) == 1 else jnp.concatenate(olds, axis=0)
                pos = base_col + wj * GROUP + iota  # [8, 128]
                r = pos - new_col
                valid = (r >= 0) & (pos < old_col)
                idx = _lower_bound_rank(csum, r)
                wv = jnp.take_along_axis(word, idx, axis=1)
                merged = jnp.where(valid, wv, old)
                for g in range(G):
                    words_ref[
                        g, pl.ds(pl.multiple_of(wbase[g] + wj * GROUP, GROUP), GROUP)
                    ] = merged[g, :]
            for g in range(G):
                ptr_ref[g] = wnew[g]

            # ---- mantissa bytes: same back-fill, up to 3 bytes/token ----
            nbits = jnp.where(tok >= 32, tok - 27, 0)
            nbyt = (nbits + 7) >> 3
            bcs = _incl_cumsum_lanes(nbyt)
            brank = bcs - nbyt  # per-token exclusive byte offsets
            mstep = mant_ref[s]
            bold = [ptr_ref[8 + g] for g in range(G)]
            bnew = [bold[g] - jnp.sum(nbyt[g, :]) for g in range(G)]
            bbase = [(jnp.maximum(p, 0) // GROUP) * GROUP for p in bnew]
            bnew_col = _stack_scalar_col(bnew)
            bold_col = _stack_scalar_col(bold)
            bbase_col = _stack_scalar_col(bbase)
            for wj in range(4):
                olds = [
                    mbytes_ref[
                        g, pl.ds(pl.multiple_of(bbase[g] + wj * GROUP, GROUP), GROUP)
                    ].reshape(1, GROUP)
                    for g in range(G)
                ] + [jnp.zeros((1, GROUP), jnp.int32)] * (8 - G)
                old = olds[0] if len(olds) == 1 else jnp.concatenate(olds, axis=0)
                pos = bbase_col + wj * GROUP + iota
                r = pos - bnew_col
                valid = (r >= 0) & (pos < bold_col)
                idx = _lower_bound_rank(bcs, r)
                rk = jnp.take_along_axis(brank, idx, axis=1)
                jof = jnp.clip(r - rk, 0, MAX_NBYTES - 1)
                mv = jnp.take_along_axis(mstep, idx, axis=1)
                byte = (mv >> (8 * jof)) & 0xFF
                merged = jnp.where(valid, byte, old)
                for g in range(G):
                    mbytes_ref[
                        g, pl.ds(pl.multiple_of(bbase[g] + wj * GROUP, GROUP), GROUP)
                    ] = merged[g, :]
            for g in range(G):
                ptr_ref[8 + g] = bnew[g]

        @pl.when(i == Tg - 1)
        def _():
            states_ref[:] = x_scr[:]
            cnt = jnp.zeros((8, GROUP), jnp.int32)
            col = jax.lax.broadcasted_iota(jnp.int32, (8, GROUP), 1)
            for g in range(G):
                row = jax.lax.broadcasted_iota(jnp.int32, (8, GROUP), 0)
                cnt = jnp.where(
                    (row == g) & (col == 0), capw - ptr_ref[g], cnt
                )
                cnt = jnp.where(
                    (row == g) & (col == 1), capm - ptr_ref[8 + g], cnt
                )
            counts_ref[:] = cnt

    return kernel


@partial(jax.jit, static_argnames=("T", "lanes", "capw", "capm", "interpret"))
def encode_grouped_pallas(
    tokp, mant, rows, *, T: int, lanes: int, capw: int, capm: int, interpret: bool = False
):
    """Kernel twin of rans_encode_grouped + pack_mantissa_grouped.

    tokp: [T*lanes] i32 padded token stream; mant: [T*lanes] u32 mantissa
    values; rows: [Tp, 128] i32 from grouped.kernel_rows, Tp padded to a
    SUBSTEPS multiple by pallas_rans.rows_padded. capw/capm: per-group
    bucket sizes (128-multiples; see enc_caps).

    Returns (words [G, capw] i32 — group g's stream occupies
    [capw - wcount_g, capw) in consumption order; mbytes [G, capm] i32 —
    same layout; states [lanes] u32; wcounts [G] i32; mcounts [G] i32).
    Counts larger than the caps signal bucket overflow (caller re-encodes
    via the XLA path).
    """
    G = lanes // GROUP
    Tp = rows.shape[0]
    assert Tp % SUBSTEPS == 0 and Tp >= T
    assert capw % GROUP == 0 and capm % GROUP == 0

    tok8 = jnp.zeros((Tp, 8, GROUP), jnp.int32)
    tok8 = jax.lax.dynamic_update_slice(
        tok8, tokp.astype(jnp.int32).reshape(T, G, GROUP), (0, 0, 0)
    )
    mant8 = jnp.zeros((Tp, 8, GROUP), jnp.int32)
    mant8 = jax.lax.dynamic_update_slice(
        mant8, mant.astype(jnp.int32).reshape(T, G, GROUP), (0, 0, 0)
    )

    Tg = Tp // SUBSTEPS
    words, mbytes, states, counts = pl.pallas_call(
        _make_enc_kernel(G, capw, capm, Tg),
        grid=(Tg,),
        in_specs=[
            pl.BlockSpec(
                (SUBSTEPS, 128), lambda i: (Tg - 1 - i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUBSTEPS, 8, GROUP),
                lambda i: (Tg - 1 - i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (SUBSTEPS, 8, GROUP),
                lambda i: (Tg - 1 - i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, capw), jnp.int32),
            jax.ShapeDtypeStruct((G, capm), jnp.int32),
            jax.ShapeDtypeStruct((8, GROUP), jnp.uint32),
            jax.ShapeDtypeStruct((8, GROUP), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, GROUP), jnp.uint32),
            pltpu.SMEM((16,), jnp.int32),
        ],
        interpret=interpret,
    )(rows, tok8, mant8)
    states_out = states[:G].reshape(lanes)
    wcounts = counts[:G, 0]
    mcounts = counts[:G, 1]
    return words, mbytes, states_out, wcounts, mcounts


def enc_caps(T: int, lanes: int) -> tuple[int, int]:
    """Per-group bucket sizes. Words have a HARD bound (the state grows by
    at most PRECISION=12 bits per token, so at most ceil(0.75*T)+1 renorms
    per lane); mantissa budgets 1/3 byte per token — generous for any
    distance >= ~0.3 (overflow is detected via counts by the host, which
    falls back to the XLA encoder for that image)."""

    def r128(v):
        return -(-v // GROUP) * GROUP

    capw = r128(min(T * GROUP, (3 * T * GROUP) // 4 + 2 * GROUP))
    capm = r128(min(MAX_NBYTES * T * GROUP, max(4096, (T * GROUP) // 3)))
    return capw, capm


def enc_fits_vmem(lanes: int, T: int, capw: int, capm: int, budget_bytes: int = 9 << 20) -> bool:
    """Whether the encode kernel's VMEM-resident buckets + stream blocks
    fit; beyond this the XLA encoder (which scatters through HBM) is used."""
    G = lanes // GROUP
    return 4 * G * (capw + capm) <= budget_bytes
