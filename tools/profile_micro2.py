"""Pin down: 2D-index gather vs flat, scatter-add, cumsum, decode mystery time."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import synth_kodak
from jxl_tpu.codec.config import CodecConfig
from jxl_tpu.codec.encode import encode_image
from jxl_tpu.codec.container import read_container
from jxl_tpu.codec.layout import token_layout
from jxl_tpu.codec.decode import _decode_core, decode_bytes
from jxl_tpu.entropy.rans import deserialize_streams

N = 1192704
rng = np.random.default_rng(0)
ctx_np = rng.integers(0, 15, size=N).astype(np.int32)
tok_np = rng.integers(0, 52, size=N).astype(np.int32)
ctx = jnp.asarray(ctx_np)
tok = jnp.asarray(tok_np)
tab2 = jnp.asarray(rng.integers(0, 1 << 30, size=(15, 64)).astype(np.uint32))
tabf = tab2.reshape(-1)


def t(fn, iters=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


g2d = jax.jit(lambda c, tk: tab2[c, tk])
g1d = jax.jit(lambda c, tk: tabf[c * 64 + tk])
print("2D-index gather:", round(t(lambda: g2d(ctx, tok)), 4), flush=True)
print("flat 1D gather:", round(t(lambda: g1d(ctx, tok)), 4), flush=True)

sadd = jax.jit(lambda c, tk: jnp.zeros((960,), jnp.int32).at[c * 64 + tk].add(1))
print("1D scatter-add 960 bins:", round(t(lambda: sadd(ctx, tok)), 4), flush=True)

vals = jnp.asarray(rng.integers(0, 3, size=N).astype(np.int32))
cs = jax.jit(lambda v: jnp.cumsum(v))
print("cumsum 1.19M:", round(t(lambda: cs(vals)), 4), flush=True)


@jax.jit
def blocked_cumsum(v):
    B = 2048
    n = v.shape[0]
    pad = -n % B
    vp = jnp.pad(v, (0, pad)).reshape(-1, B)
    tri = jnp.tril(jnp.ones((B, B), jnp.float32))
    within = jnp.dot(vp.astype(jnp.float32), tri.T, preferred_element_type=jnp.float32)
    rows = within[:, -1]
    offs = jnp.cumsum(rows) - rows
    return (within + offs[:, None]).reshape(-1)[:n].astype(jnp.int32)


r1 = np.asarray(cs(vals))
r2 = np.asarray(blocked_cumsum(vals))
print("blocked cumsum ok:", np.array_equal(r1, r2), "time:", round(t(lambda: blocked_cumsum(vals)), 4), flush=True)

# one-hot matmul histogram: [15,64] counts via segment indicator
@jax.jit
def hist_matmul(c, tk):
    oh_t = (tk[:, None] == jnp.arange(64)[None, :]).astype(jnp.bfloat16)  # [N, 64]
    oh_c = (c[None, :] == jnp.arange(15)[:, None]).astype(jnp.bfloat16)  # [15, N]
    return jnp.dot(oh_c, oh_t, preferred_element_type=jnp.float32)


hm = np.asarray(hist_matmul(ctx, tok)).astype(np.int64)
hs = np.asarray(sadd(ctx, tok)).reshape(15, 64)
print("hist matmul ok:", np.array_equal(hm, hs), "time:", round(t(lambda: hist_matmul(ctx, tok)), 4), flush=True)

# unique scatter (compaction-style)
tgt = jnp.asarray(rng.permutation(N).astype(np.int32))
w16 = jnp.asarray(rng.integers(0, 65535, size=N).astype(np.uint32))
usc = jax.jit(lambda tg, wd: jnp.zeros((N,), jnp.uint32).at[tg].set(wd, mode="drop", unique_indices=True))
print("unique 1D scatter:", round(t(lambda: usc(tgt, w16)), 4), flush=True)

# decode mystery: time _decode_core alone with pre-staged inputs
img = synth_kodak()
data = encode_image(img, CodecConfig())
stream = read_container(data)
h = stream.header
lay = token_layout(h.height, h.width)
T = max(1, -(-lay["n_tokens"] // h.lanes))
words_np = deserialize_streams(stream.stream_words, T * h.lanes)
raw = np.frombuffer(stream.mant_bytes, dtype=np.uint8)
bucket = 4096
while bucket < raw.shape[0]:
    bucket *= 2
mant_arr = np.zeros(bucket, dtype=np.uint32)
mant_arr[: raw.shape[0]] = raw
freq = stream.freq.astype(np.uint32)
cum = np.concatenate(
    [np.zeros((freq.shape[0], 1), np.uint32), np.cumsum(freq, axis=1)[:, :-1].astype(np.uint32)],
    axis=1,
)
args = [jnp.asarray(x) for x in (words_np, stream.states, mant_arr, freq, cum)]
dj = jnp.float32(h.distance)
core = lambda: _decode_core(*args, dj, height=h.height, width=h.width, lanes=h.lanes, epf=h.epf)
print("decode core (device only):", round(t(core), 4), flush=True)
print("decode_bytes total:", round(t(lambda: decode_bytes(data)), 4), flush=True)
