"""Profile the v5 encoder pieces + tunnel sync/poll behavior."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import synth_kodak
from jxl_tpu.codec.config import CodecConfig
from jxl_tpu.codec.encode import (
    _encode_full,
    _encode_stage1,
    encode_image,
    pick_lanes,
)
from jxl_tpu.codec.layout import padded_layout, token_layout
from jxl_tpu.entropy.grouped import pack_mantissa_grouped, rans_encode_grouped
from jxl_tpu.entropy.rans import quantize_histograms
from jxl_tpu.entropy.tokens import byte_capacity

img = synth_kodak()
h, w = 512, 768
lanes = pick_lanes(token_layout(h, w)["n_tokens"], 256)
lay = padded_layout(h, w, lanes)
cap = byte_capacity(lay["n_padded"])
rgbj = jnp.asarray(img)
d = jnp.float32(1.0)
kw = dict(height=h, width=w, effort=7, hook_a=False, hook_b=False, lanes=lanes, cap_bytes=cap)


def t_async(fn, iters=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


print("enc full (async amortized):", round(t_async(lambda: _encode_full(rgbj, d, **kw)), 4), flush=True)
print("enc stage1 (async):", round(t_async(lambda: _encode_stage1(rgbj, d, height=h, width=w, effort=7, hook_a=False, hook_b=False)), 4), flush=True)

token, nbits, mant, counts = jax.block_until_ready(
    _encode_stage1(rgbj, d, height=h, width=w, effort=7, hook_a=False, hook_b=False)
)
freq, cum = quantize_histograms(np.asarray(counts))
fj, cj = jnp.asarray(freq), jnp.asarray(cum)
n_padded = lay["n_padded"]
tokp = jnp.zeros((n_padded,), jnp.int32)
tokp = jax.lax.dynamic_update_slice(tokp, token, (0,))
nbp = jnp.zeros((n_padded,), jnp.int32)
nbp = jax.lax.dynamic_update_slice(nbp, nbits, (0,))
mantp = jnp.zeros((n_padded,), jnp.uint32)
mantp = jax.lax.dynamic_update_slice(mantp, mant, (0,))
sc = jnp.asarray(lay["step_ctx"])
renc = jax.jit(lambda tk: rans_encode_grouped(tk, sc, fj, cj, lanes))
print("rans_encode_grouped (async):", round(t_async(lambda: renc(tokp)), 4), flush=True)
pk = jax.jit(lambda nb, mt: pack_mantissa_grouped(nb, mt, lanes, cap))
print("pack_mantissa_grouped (async):", round(t_async(lambda: pk(nbp, mantp)), 4), flush=True)

# sync/poll behavior: dispatch encode, sleep X, then fetch
buf = jax.block_until_ready(_encode_full(rgbj, d, **kw))
from jxl_tpu.codec.encode import _first_get_u32

first = min(_first_get_u32(lanes, h * w), buf.shape[0])
for sleep_ms in (0, 40, 80, 120):
    t0 = time.perf_counter()
    for _ in range(3):
        b = _encode_full(rgbj, d, **kw)
        if sleep_ms:
            time.sleep(sleep_ms / 1000)
        got = jax.device_get(jax.lax.slice(b, (0,), (first,)))
    dt = (time.perf_counter() - t0) / 3
    print(f"dispatch+sleep{sleep_ms}ms+get: {dt:.4f}", flush=True)

# D2H size scan on ready array
for n_u32 in (16 * 1024, 64 * 1024, 256 * 1024):
    arr = jax.block_until_ready(jnp.arange(n_u32, dtype=jnp.uint32) * 3)
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_get(arr)
    print(f"get ready {n_u32*4//1024}KB: {(time.perf_counter()-t0)/5*1000:.2f} ms", flush=True)

# full encode_image wall
t0 = time.perf_counter()
for _ in range(5):
    encode_image(img, CodecConfig())
print("encode_image wall:", round((time.perf_counter() - t0) / 5, 4), flush=True)
