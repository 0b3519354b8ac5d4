"""Differential tests: Pallas encode kernel vs the XLA grouped encoder.

Runs the Mosaic kernel in interpret mode (CPU) and asserts the emitted
words, mantissa bytes, counts, and final states are bit-identical to
entropy.grouped.rans_encode_grouped + pack_mantissa_grouped, then decodes
the kernel's streams with the XLA reference decoder to close the loop.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jxl_tpu.entropy.grouped import (
    GROUP,
    decode_grouped,
    kernel_rows,
    pack_mantissa_grouped,
    rans_encode_grouped,
)
from jxl_tpu.entropy.pallas_rans import rows_padded
from jxl_tpu.entropy.pallas_rans_enc import enc_caps, encode_grouped_pallas
from jxl_tpu.entropy.rans import quantize_histograms
from jxl_tpu.entropy.tokens import ALPHABET, byte_capacity, tokenize


def _stream(n, lanes, seed=0):
    """Synthetic padded token stream with a few long-context runs, like the
    real layout: values heavy-tailed so some tokens carry 1-3 mantissa
    bytes."""
    rng = np.random.default_rng(seed)
    vals = np.minimum(
        (rng.pareto(1.2, n) * 3).astype(np.uint32), np.uint32(1 << 20)
    )
    vals[rng.random(n) < 0.55] = 0
    token, nbits, mant = tokenize(jnp.asarray(vals, jnp.uint32))
    T = n // lanes
    n_ctx = 4
    step_ctx = np.repeat(np.arange(n_ctx, dtype=np.int32), -(-T // n_ctx))[:T]
    counts = np.zeros((n_ctx, ALPHABET), np.int64)
    tok_np = np.asarray(token)
    for c in range(n_ctx):
        sel = np.repeat(step_ctx == c, lanes)
        np.add.at(counts[c], tok_np[sel], 1)
    freq, cum = quantize_histograms(counts)
    return token, nbits, mant, jnp.asarray(step_ctx), jnp.asarray(freq), jnp.asarray(cum)


@pytest.mark.parametrize("lanes", [128, 256])
def test_encode_kernel_matches_xla(lanes):
    n = lanes * 96
    token, nbits, mant, step_ctx, freq, cum = _stream(n, lanes, seed=3)
    T = n // lanes
    G = lanes // GROUP

    words_x, wc_x, st_x = rans_encode_grouped(token, step_ctx, freq, cum, lanes)
    cap = byte_capacity(n)
    mbytes_x, mc_x = pack_mantissa_grouped(nbits, mant, lanes, cap)
    wc_x, mc_x = np.asarray(wc_x), np.asarray(mc_x)
    words_x, mbytes_x = np.asarray(words_x), np.asarray(mbytes_x)

    rows = rows_padded(kernel_rows(step_ctx, freq, cum), T)
    capw, capm = enc_caps(T, lanes)
    wk, mk, st_k, wc_k, mc_k = encode_grouped_pallas(
        token, mant, rows, T=T, lanes=lanes, capw=capw, capm=capm, interpret=True
    )
    wk, mk = np.asarray(wk), np.asarray(mk)
    np.testing.assert_array_equal(np.asarray(wc_k), wc_x)
    np.testing.assert_array_equal(np.asarray(mc_k), mc_x)
    np.testing.assert_array_equal(np.asarray(st_k), np.asarray(st_x))

    wb = np.concatenate([[0], np.cumsum(wc_x)])
    mb = np.concatenate([[0], np.cumsum(mc_x)])
    for g in range(G):
        np.testing.assert_array_equal(
            wk[g, capw - wc_x[g] :].astype(np.uint16),
            words_x[wb[g] : wb[g + 1]],
            err_msg=f"group {g} words",
        )
        np.testing.assert_array_equal(
            mk[g, capm - mc_x[g] :].astype(np.uint32),
            mbytes_x[mb[g] : mb[g + 1]],
            err_msg=f"group {g} mantissa bytes",
        )


def test_encode_kernel_roundtrip_through_decoder():
    """Kernel streams must decode back to the original values with the XLA
    reference decoder."""
    from jxl_tpu.entropy.pallas_rans import MANT_SLACK, WORD_SLACK
    from jxl_tpu.entropy.tokens import tokenize

    lanes = 128
    n = lanes * 64
    token, nbits, mant, step_ctx, freq, cum = _stream(n, lanes, seed=9)
    T = n // lanes

    rows_k = kernel_rows(step_ctx, freq, cum)
    rows = rows_padded(rows_k, T)
    capw, capm = enc_caps(T, lanes)
    wk, mk, st_k, wc_k, mc_k = encode_grouped_pallas(
        token, mant, rows, T=T, lanes=lanes, capw=capw, capm=capm, interpret=True
    )
    wc, mc = int(wc_k[0]), int(mc_k[0])
    words_g = np.zeros((1, wc + WORD_SLACK), np.uint32)
    words_g[0, :wc] = np.asarray(wk)[0, capw - wc :].astype(np.uint32)
    mant_g = np.zeros((1, mc + MANT_SLACK), np.uint32)
    mant_g[0, :mc] = np.asarray(mk)[0, capm - mc :].astype(np.uint32)

    vals = decode_grouped(
        jnp.asarray(words_g), jnp.asarray(mant_g), st_k, rows_k, T=T, lanes=lanes
    )
    rng_vals = np.asarray(vals)
    # reconstruct expected values from (token, nbits, mant)
    tok_np = np.asarray(token)
    nb_np = np.asarray(nbits)
    mant_np = np.asarray(mant)
    expect = np.where(
        tok_np >= 32, (1 << np.maximum(tok_np - 27, 0)) + mant_np, tok_np
    ).astype(np.uint32)
    np.testing.assert_array_equal(rng_vals, expect)
