"""Micro-experiments: dispatch overhead, decode-scan unroll/lanes, transfers."""
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
from jxl_tpu.codec.layout import token_layout
from jxl_tpu.entropy.rans import (
    RANS_M,
    RANS_L,
    build_decode_table,
    quantize_histograms,
    rans_encode,
)

print("devices:", jax.devices(), flush=True)
img = synth_kodak()
h, w = 512, 768
lay = token_layout(h, w)
ctx_np = np.asarray(lay["ctx"])
n = lay["n_tokens"]


def t(fn, iters=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


# 1. dispatch overhead: trivial jit, blocking each iteration
xs = jnp.float32(1.0)
triv = jax.jit(lambda x: x + 1.0)
print("trivial jit (block each):", round(t(lambda: jax.block_until_ready(triv(xs))), 5), flush=True)

# async pipelining: 10 dispatches, single block
def ten():
    y = xs
    for _ in range(10):
        y = triv(y)
    jax.block_until_ready(y)
print("trivial jit x10 (one block) /10:", round(t(ten) / 10, 5), flush=True)

# 2. device_get cost for various sizes
for mb in (0.1, 1.0, 4.0):
    nn = int(mb * 1e6 // 4)
    arr = jax.block_until_ready(jnp.zeros((nn,), jnp.uint32) + 1)
    print(f"device_get {mb} MB:", round(t(lambda: jax.device_get(arr)), 5), flush=True)

# 3. decode scan variants
tokens, nbits, mant, counts = jax.block_until_ready(
    _encode_stage1(jnp.asarray(img), jnp.float32(1.0), height=h, width=w, effort=7, hook_a=False, hook_b=False)
)
freq, cum = quantize_histograms(np.asarray(counts))
fj, cj = jnp.asarray(freq), jnp.asarray(cum)


def dec_scan_variant(lanes, unroll):
    T = -(-n // lanes)
    pad = T * lanes - n
    ctx = jnp.asarray(ctx_np)
    words, n_words, states = jax.block_until_ready(
        jax.jit(lambda tk: rans_encode(tk, ctx, fj, cj, lanes=lanes))(tokens)
    )

    ctxp = jnp.concatenate([ctx.astype(jnp.int32), jnp.zeros(pad, jnp.int32)])
    ctx_all = jnp.reshape(ctxp, (T, lanes))
    valid = (jnp.arange(T * lanes) < n).reshape(T, lanes)
    words_u32 = jnp.concatenate([words.astype(jnp.uint32), jnp.zeros((lanes,), jnp.uint32)])
    combo_flat = build_decode_table(fj, cj).reshape(-1)

    @jax.jit
    def run(words_u32, states):
        def step(carry, inp):
            x, gptr = carry
            c_ids, v = inp
            slot = (x & jnp.uint32(RANS_M - 1)).astype(jnp.int32)
            combo = combo_flat[c_ids * RANS_M + slot]
            s = (combo & jnp.uint32(0x3F)).astype(jnp.int32)
            f = (combo >> 6) & jnp.uint32(0xFFF)
            cm = combo >> 18
            x_dec = f * (x >> 12) + slot.astype(jnp.uint32) - cm
            need = jnp.logical_and(v, x_dec < RANS_L)
            need32 = need.astype(jnp.int32)
            rank = jnp.cumsum(need32) - need32
            window = jax.lax.dynamic_slice(words_u32, (gptr,), (lanes,))
            wv = jnp.take_along_axis(window, rank, axis=0)
            x_new = jnp.where(need, (x_dec << 16) | wv, x_dec)
            x_new = jnp.where(v, x_new, x)
            return (x_new, gptr + jnp.sum(need32)), jnp.where(v, s, 0)

        init = (states.astype(jnp.uint32), jnp.int32(0))
        _, syms = jax.lax.scan(step, init, (ctx_all, valid), unroll=unroll)
        return syms

    dt = t(lambda: jax.block_until_ready(run(words_u32, states)), iters=5)
    print(f"dec scan lanes={lanes} unroll={unroll}: {dt:.4f}", flush=True)


for lanes, unroll in [(256, 1), (256, 4), (256, 8), (512, 4), (1024, 4), (1024, 8)]:
    dec_scan_variant(lanes, unroll)

# 4. encode scan variants (lanes)
for lanes in (256, 1024):
    ctx = jnp.asarray(ctx_np)
    renc = jax.jit(lambda tk: rans_encode(tk, ctx, fj, cj, lanes=lanes))
    dt = t(lambda: jax.block_until_ready(renc(tokens)), iters=5)
    print(f"enc rans_encode lanes={lanes}: {dt:.4f}", flush=True)
