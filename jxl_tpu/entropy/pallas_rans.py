"""Pallas TPU kernel: grouped rANS decode scan (the codec's only serial op).

One kernel run decodes the whole token stream: the grid walks scan steps
sequentially (TPU grid steps execute in order; scratch persists), keeping
the K rANS states in VMEM registers and both byte/word stream pointers in
SMEM. Everything data-dependent uses the one dynamic-indexing primitive
Mosaic supports — lane-dim `take_along_axis` on a [8, 128] tile:

- symbol resolution = 6-probe binary search over the step's streamed
  (freq|cum) table row (layout guarantees ONE context per step),
- word/mantissa consumption = 128-ALIGNED vector loads around each group's
  stream pointer (Mosaic requires lane-aligned dynamic starts), with the
  intra-window misalignment folded into the per-lane rank index before the
  take_along_axis; ranks come from a roll-based exclusive cumsum (Mosaic
  has no cumsum primitive).

The XLA `lax.scan` version (entropy/grouped.py:decode_grouped) is the
bit-exact reference; differential tests pin the two together. Steps past
the real T are padded with a degenerate freq[0]=M row, which makes the
state update an exact identity (x//M<<12 + x%M = x) and never renorms —
true no-ops, no masking needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jxl_tpu.entropy.grouped import GROUP, MAX_NBYTES
from jxl_tpu.entropy.rans import RANS_L, RANS_M, RANS_PRECISION

SUBSTEPS = 8  # scan steps per grid iteration (sublane tile height)
WORD_SLACK = 2 * GROUP  # aligned double-window read-ahead per group
MANT_SLACK = 5 * GROUP


def _excl_cumsum_lanes(v):
    """Exclusive cumsum along the 128-lane dim of an [8, 128] i32 tile."""
    x = v
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    for sh in (1, 2, 4, 8, 16, 32, 64):
        r = pltpu.roll(x, shift=sh, axis=1)
        x = x + jnp.where(col >= sh, r, 0)
    return x - v


def _windows(ref, ptrs, G: int, n_win: int):
    """Aligned window loads: for each group g, n_win consecutive 128-wide
    vectors starting at align128(ptrs[g]); returns (wins list of [8, 128]
    i32, off_col [8, 1] i32 misalignment per group)."""
    wins = [[] for _ in range(n_win)]
    offs = []
    for g in range(G):
        p = ptrs[g]
        base = (p // GROUP) * GROUP
        offs.append(p - base)
        for j in range(n_win):
            start = pl.multiple_of(base + j * GROUP, GROUP)
            wins[j].append(ref[g, pl.ds(start, GROUP)].reshape(1, GROUP))
    zero = jnp.zeros((1, GROUP), jnp.int32)
    for j in range(n_win):
        wins[j] += [zero] * (8 - G)
    win_mats = [w[0] if len(w) == 1 else jnp.concatenate(w, axis=0) for w in wins]
    off_parts = [jnp.full((1, 1), o, jnp.int32) for o in offs]
    if G < 8:
        off_parts.append(jnp.zeros((8 - G, 1), jnp.int32))
    off_col = off_parts[0] if len(off_parts) == 1 else jnp.concatenate(off_parts, axis=0)
    return win_mats, off_col


def _select_window(wins, idx):
    """Per-lane read at unaligned index idx (in [0, len(wins)*128)) from the
    aligned window stack."""
    out = jnp.take_along_axis(wins[0], jnp.clip(idx, 0, GROUP - 1), axis=1)
    for j in range(1, len(wins)):
        cand = jnp.take_along_axis(
            wins[j], jnp.clip(idx - j * GROUP, 0, GROUP - 1), axis=1
        )
        out = jnp.where(idx >= j * GROUP, cand, out)
    return out


def _make_kernel(G: int, B: int = 1):
    """Decode kernel over Gt = B * G active groups (B same-geometry images
    batched into one kernel run). At lanes=256 a single image occupies only
    2 of the [8, 128] state tile's sublane rows — batching 4 images fills
    the tile, quadrupling tokens decoded per vector op at the same step
    count and ZERO rate cost (VERDICT r2 item 2; the alternative, more
    lanes per image, buys the same speed but pays +4 B/lane of header).
    rows_ref is [SUBSTEPS, B, 128]: each image has its own (freq|cum) row
    per step (grid rows vary in distance, hence in tables); sublane row r
    uses image r // G's row — take_along_axis operates lane-wise per
    sublane row, so the binary search stays correct per image."""
    Gt = B * G

    def kernel(
        rows_ref, words_ref, mant_ref, states_ref, ptr_init_ref,
        out_ref, states_out_ref, ptr_out_ref, x_scr, ptr_ref,
    ):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            x_scr[:] = states_ref[:]
            for g in range(Gt):
                ptr_ref[g] = ptr_init_ref[g]  # word stream pointer
                ptr_ref[8 + g] = ptr_init_ref[8 + g]  # mantissa byte pointer

        for s in range(SUBSTEPS):
            x = x_scr[:]
            if B == 1:
                rowb = jnp.broadcast_to(rows_ref[s, 0][None, :], (8, 128))
            else:
                rowb = jnp.concatenate(
                    [
                        rows_ref[s, min(r // G, B - 1)].reshape(1, 128)
                        for r in range(8)
                    ],
                    axis=0,
                )
            slot = (x & jnp.uint32(RANS_M - 1)).astype(jnp.int32)

            # binary search: largest k with cum[k] <= slot (cum in lanes 64+)
            lo = jnp.zeros((8, 128), jnp.int32)
            for p in (32, 16, 8, 4, 2, 1):
                cand = lo + p
                cv = jnp.take_along_axis(rowb, cand + 64, axis=1)
                lo = jnp.where(cv <= slot, cand, lo)
            sym = lo
            f = jnp.take_along_axis(rowb, lo, axis=1)
            bias = jnp.take_along_axis(rowb, lo + 64, axis=1)

            x_dec = f.astype(jnp.uint32) * (x >> RANS_PRECISION) + (
                slot - bias
            ).astype(jnp.uint32)
            need = (x_dec < RANS_L).astype(jnp.int32)
            rank = _excl_cumsum_lanes(need)

            gptrs = [ptr_ref[g] for g in range(Gt)]
            wwins, woff = _windows(words_ref, gptrs, Gt, 2)
            w = _select_window(wwins, rank + woff)
            x_new = jnp.where(need == 1, (x_dec << 16) | w.astype(jnp.uint32), x_dec)
            x_scr[:] = x_new
            for g in range(Gt):
                ptr_ref[g] = ptr_ref[g] + jnp.sum(need[g, :])

            # mantissa: up to 3 bytes per token from the group's byte stream
            nbits = jnp.where(sym >= 32, sym - 27, 0)
            nbyt = (nbits + 7) >> 3
            brank = _excl_cumsum_lanes(nbyt)
            bptrs = [ptr_ref[8 + g] for g in range(Gt)]
            mwins, moff = _windows(mant_ref, bptrs, Gt, 4)
            mval = jnp.zeros((8, 128), jnp.uint32)
            for j in range(MAX_NBYTES):
                b = _select_window(mwins, brank + j + moff)
                mval = mval | jnp.where(
                    j < nbyt, b.astype(jnp.uint32) << jnp.uint32(8 * j), 0
                ).astype(jnp.uint32)
            for g in range(Gt):
                ptr_ref[8 + g] = ptr_ref[8 + g] + jnp.sum(nbyt[g, :])

            exp = jnp.where(sym >= 32, sym - 27, 0).astype(jnp.uint32)
            value = jnp.where(
                sym >= 32, (jnp.uint32(1) << exp) + mval, sym.astype(jnp.uint32)
            )
            out_ref[s] = value

        # carry out (two-phase decode, container v8): the final states and
        # stream pointers let a second kernel invocation continue the scan
        # with freshly computed context rows (the AC phase's contexts
        # depend on the nnz map decoded in this phase). Padded no-op steps
        # past T leave both unchanged, so "last grid iteration" == step T.
        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            states_out_ref[:] = x_scr[:]
            for g in range(16):
                ptr_out_ref[g] = ptr_ref[g]

    return kernel


def _run_kernel(
    words_g, mant_g, st8, rows3, G: int, B: int, T: int, interpret: bool,
    ptr_init=None,
):
    """Returns (values [Tp, 8, 128], final states [8, 128], final ptrs [16]).

    ptr_init: optional [16] i32 initial (word, mantissa) stream pointers per
    group row — the carry of a previous phase's scan (zeros = stream start).
    """
    Tp = rows3.shape[0]
    assert Tp % SUBSTEPS == 0 and Tp >= T
    if ptr_init is None:
        ptr_init = jnp.zeros((16,), jnp.int32)
    return pl.pallas_call(
        _make_kernel(G, B),
        grid=(Tp // SUBSTEPS,),
        in_specs=[
            pl.BlockSpec(
                (SUBSTEPS, B, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (SUBSTEPS, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((16,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.uint32),
            pltpu.SMEM((16,), jnp.int32),
        ],
        interpret=interpret,
    )(
        rows3,
        words_g.astype(jnp.int32),
        mant_g.astype(jnp.int32),
        st8,
        ptr_init.astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("T", "lanes", "interpret", "return_carry"))
def decode_grouped_pallas(
    words_g, mant_g, states, rows, *, T: int, lanes: int, interpret: bool = False,
    ptr_init=None, return_carry: bool = False,
):
    """Kernel twin of grouped.decode_grouped. words_g must have >= WORD_SLACK
    and mant_g >= MANT_SLACK columns of tail padding; rows must be T-padded
    to a SUBSTEPS multiple by rows_padded().

    Two-phase use (container v8): pass states/ptr_init from a previous
    phase's carry and set return_carry=True to get
    (values, final_states [8, 128] u32, final_ptrs [16] i32) back."""
    G = lanes // GROUP

    # stream buffers keep their true G rows (full-array blocks are exempt
    # from the 8-sublane tile rule); only the state tile is 8-padded
    if states.ndim == 2 and states.shape == (8, GROUP):
        st8 = states.astype(jnp.uint32)  # already a carry tile
    else:
        st8 = jnp.zeros((8, GROUP), jnp.uint32)
        st8 = jax.lax.dynamic_update_slice(
            st8, states.astype(jnp.uint32).reshape(G, GROUP), (0, 0)
        )
    out, st_f, ptr_f = _run_kernel(
        words_g, mant_g, st8, rows[:, None, :], G, 1, T, interpret,
        ptr_init=ptr_init,
    )
    vals = out[:T, :G, :].reshape(T * lanes)
    if return_carry:
        return vals, st_f, ptr_f
    return vals


@partial(jax.jit, static_argnames=("T", "lanes", "B", "interpret", "return_carry"))
def decode_grouped_pallas_batched(
    words_g, mant_g, states, rows, *, T: int, lanes: int, B: int,
    interpret: bool = False, ptr_init=None, return_carry: bool = False,
):
    """Decode B same-geometry streams in ONE kernel run (see _make_kernel's
    batching note: fills the [8, 128] state tile, ~B x the tokens per
    vector op). The streams share T / lanes / capw / capm (an RD grid row
    satisfies this by construction — decode.decode_bytes_grid_stacked).

    words_g: [B*G, capw]; mant_g: [B*G, capm]; states: [B, lanes] (or an
    [8, 128] carry tile); rows: [Tp, B, 128] (per-image rows, each T-padded
    by rows_padded). Returns values [B, T*lanes] (+ carry when requested).
    """
    G = lanes // GROUP
    Gt = B * G
    assert Gt <= 8, f"batch {B} x {G} groups exceeds the 8-sublane tile"
    if states.ndim == 2 and states.shape == (8, GROUP):
        st8 = states.astype(jnp.uint32)
    else:
        st8 = jnp.zeros((8, GROUP), jnp.uint32)
        st8 = jax.lax.dynamic_update_slice(
            st8, states.astype(jnp.uint32).reshape(Gt, GROUP), (0, 0)
        )
    out, st_f, ptr_f = _run_kernel(
        words_g, mant_g, st8, rows, G, B, T, interpret, ptr_init=ptr_init
    )
    vals = (
        out[:T, :Gt, :].reshape(T, B, G, GROUP).transpose(1, 0, 2, 3).reshape(B, T * lanes)
    )
    if return_carry:
        return vals, st_f, ptr_f
    return vals


def fits_vmem(lanes: int, capw: int, capm: int, budget_bytes: int = 10 << 20) -> bool:
    """Whether the kernel's VMEM-resident stream buffers fit. Beyond this
    (multi-10MP images at high quality) the caller should use the XLA
    decoder, which streams from HBM."""
    G = lanes // GROUP
    return 4 * G * (capw + capm) <= budget_bytes


def rows_padded(rows, T: int):
    """Pad kernel rows to a SUBSTEPS multiple with the no-op row
    (freq[0] = M: the rANS update becomes an exact identity and never
    renorms, so padded steps consume nothing and change nothing)."""
    Tp = -(-T // SUBSTEPS) * SUBSTEPS
    if Tp == T:
        return rows
    pad_row = np.zeros((1, 128), np.int32)
    pad_row[0, 0] = RANS_M
    pad_row[0, 64:] = RANS_M
    pad_row[0, 64] = 0
    pad = jnp.asarray(np.repeat(pad_row, Tp - T, axis=0))
    return jnp.concatenate([rows, pad], axis=0)
