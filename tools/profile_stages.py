"""Fine-grained per-op TPU profiling of the entropy + reconstruction stages.

Isolates the candidate costs the ROADMAP flags: per-token gathers, the rANS
scans, scatter compaction, histogram build, byte pack/unpack, dense IDCT
reconstruction, EPF. Run from the repo root.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import synth_kodak
from jxl_tpu.codec.config import CodecConfig
from jxl_tpu.codec.encode import _encode_stage1, encode_image, pick_lanes
from jxl_tpu.codec.decode import decode_bytes, _decode_core
from jxl_tpu.codec.container import read_container
from jxl_tpu.codec.layout import token_layout
from jxl_tpu.entropy.rans import (
    RANS_M,
    build_decode_table,
    deserialize_streams,
    quantize_histograms,
    rans_decode,
    rans_encode,
)
from jxl_tpu.entropy import tokens as tok_mod

print("devices:", jax.devices(), flush=True)
img = synth_kodak()
h, w = 512, 768
lay = token_layout(h, w)
ctx = jnp.asarray(lay["ctx"])
n = lay["n_tokens"]


def t(fn, iters=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


rgbj = jnp.asarray(img)
d = jnp.float32(1.0)
token, nbits, mant, counts = jax.block_until_ready(
    _encode_stage1(rgbj, d, height=h, width=w, effort=7, hook_a=False, hook_b=False)
)
freq, cum = quantize_histograms(np.asarray(counts))
fj, cj = jnp.asarray(freq), jnp.asarray(cum)
lanes = pick_lanes(n, 256)
print(f"n_tokens={n} lanes={lanes} T={-(-n // lanes)}", flush=True)

# --- encode side pieces ---
s1 = lambda: jax.block_until_ready(
    _encode_stage1(rgbj, d, height=h, width=w, effort=7, hook_a=False, hook_b=False)
)
print("enc stage1 (xyb+acs+tokens+hist):", round(t(s1), 4), flush=True)


@jax.jit
def combo_gather(tok):
    combo_tab = fj.astype(jnp.uint32) | (cj.astype(jnp.uint32) << 16)
    return combo_tab[ctx, tok]


print("enc combo gather [N from 15x64 tab]:", round(t(lambda: jax.block_until_ready(combo_gather(token))), 4), flush=True)


@jax.jit
def hist_scatter(tok):
    return (
        jnp.zeros((15 * 64,), jnp.int32).at[ctx * 64 + tok].add(1)
    )


print("enc histogram scatter-add:", round(t(lambda: jax.block_until_ready(hist_scatter(token))), 4), flush=True)

renc = jax.jit(lambda tk: rans_encode(tk, ctx, fj, cj, lanes=lanes))
print("enc rans_encode (scan+compact):", round(t(lambda: jax.block_until_ready(renc(token))), 4), flush=True)

cap = tok_mod.byte_capacity(n)
pack = jax.jit(lambda nb, mt: tok_mod.pack_bytes(nb, mt, cap))
print("enc pack_bytes:", round(t(lambda: jax.block_until_ready(pack(nbits, mant))), 4), flush=True)

# scan alone (no compaction): reuse rans_encode internals via a stripped copy
T = -(-n // lanes)
pad = T * lanes - n


@jax.jit
def scan_only(tok):
    tokp = jnp.concatenate([tok.astype(jnp.int32), jnp.zeros(pad, jnp.int32)])
    ctxp = jnp.concatenate([ctx.astype(jnp.int32), jnp.zeros(pad, jnp.int32)])
    valid = (jnp.arange(T * lanes) < n).reshape(T, lanes)
    combo_tab = fj.astype(jnp.uint32) | (cj.astype(jnp.uint32) << 16)
    combo = combo_tab[ctxp, tokp].reshape(T, lanes)
    f_all = combo & jnp.uint32(0xFFFF)
    c_all = combo >> 16

    def step(states, inp):
        f, c, v = inp
        x = states
        emit = jnp.logical_and(v, x >= (f << 20))
        word = x & jnp.uint32(0xFFFF)
        x = jnp.where(emit, x >> 16, x)
        x_enc = ((x // f) << 12) + (x % f) + c
        x = jnp.where(v, x_enc, states)
        return x, (word, emit)

    init = jnp.full((lanes,), np.uint32(1 << 16), dtype=jnp.uint32)
    states, (words, emits) = jax.lax.scan(step, init, (f_all, c_all, valid), reverse=True, unroll=8)
    return states, words, emits


print("enc scan only (incl combo gather):", round(t(lambda: jax.block_until_ready(scan_only(token))), 4), flush=True)

# --- decode side ---
data = encode_image(img, CodecConfig())
stream = read_container(data)
hh = stream.header
Tw = max(1, -(-n // hh.lanes))
words_np = deserialize_streams(stream.stream_words, Tw * hh.lanes)
words_j = jnp.asarray(words_np)
states_j = jnp.asarray(stream.states)
freq2 = jnp.asarray(stream.freq.astype(np.uint32))
cum2 = jnp.asarray(
    np.concatenate(
        [np.zeros((stream.freq.shape[0], 1), np.uint32),
         np.cumsum(stream.freq, axis=1)[:, :-1].astype(np.uint32)],
        axis=1,
    )
)

rdec = jax.jit(lambda wd, st: rans_decode(wd, st, ctx, freq2, cum2, n, lanes=hh.lanes))
print("dec rans_decode scan:", round(t(lambda: jax.block_until_ready(rdec(words_j, states_j))), 4), flush=True)

toks_dec = rdec(words_j, states_j)


@jax.jit
def table_build():
    return build_decode_table(freq2, cum2)


print("dec build_decode_table:", round(t(lambda: jax.block_until_ready(table_build())), 4), flush=True)


@jax.jit
def unpack(tk):
    nb = tok_mod.token_nbits(tk)
    raw = np.frombuffer(stream.mant_bytes, dtype=np.uint8)
    bucket = 4096
    while bucket < raw.shape[0]:
        bucket *= 2
    mant_arr = np.zeros(bucket, dtype=np.uint32)
    mant_arr[: raw.shape[0]] = raw
    mt = tok_mod.unpack_bytes(nb, jnp.asarray(mant_arr))
    return tok_mod.detokenize(tk, mt)


print("dec unpack+detokenize:", round(t(lambda: jax.block_until_ready(unpack(toks_dec))), 4), flush=True)

# full decode jit vs scan: the rest is reconstruction+EPF
dec_t = t(lambda: decode_bytes(data), iters=5)
print("dec total:", round(dec_t, 4), flush=True)

enc_t = t(lambda: encode_image(img, CodecConfig()), iters=5)
print("enc total:", round(enc_t, 4), flush=True)
