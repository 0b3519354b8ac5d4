import time, jax, jax.numpy as jnp, numpy as np
import jxl_tpu
from bench import synth_kodak
from jxl_tpu.codec.encode import _encode_stage1
from jxl_tpu.codec.layout import token_layout
from jxl_tpu.entropy.rans import quantize_histograms, rans_encode, rans_decode
from jxl_tpu.entropy.tokens import bit_capacity_words, pack_bits, unpack_bits, token_nbits
img = synth_kodak(); h, w = 512, 768
lay = token_layout(h, w)
token, nbits, mant, counts = _encode_stage1(jnp.asarray(img), jnp.float32(1.0), height=h, width=w, effort=7, hook_a=False, hook_b=False)
freq, cum = quantize_histograms(np.asarray(counts))
fj, cj = jnp.asarray(freq), jnp.asarray(cum)
ctx = jnp.asarray(lay["ctx"])
cap = bit_capacity_words(lay["n_tokens"])
def timeit(f):
    r = jax.block_until_ready(f()); t0=time.perf_counter()
    for _ in range(3): r = jax.block_until_ready(f())
    return (time.perf_counter()-t0)/3
je = jax.jit(lambda t: rans_encode(t, ctx, fj, cj, lanes=256))
print("rans_encode:", round(timeit(lambda: je(token))*1e3,1), "ms", flush=True)
jp = jax.jit(lambda nb_, m_: pack_bits(nb_, m_, cap))
print("pack_bits  :", round(timeit(lambda: jp(nbits, mant))*1e3,1), "ms", flush=True)
words, lens, states = je(token)
jd = jax.jit(lambda w_, s_: rans_decode(w_, s_, ctx, fj, cj, lay["n_tokens"], lanes=256))
print("rans_decode:", round(timeit(lambda: jd(words, states))*1e3,1), "ms", flush=True)
bw, _ = jp(nbits, mant)
ju = jax.jit(lambda nb_, w_: unpack_bits(nb_, w_))
print("unpack_bits:", round(timeit(lambda: ju(nbits, bw))*1e3,1), "ms", flush=True)
# histogram scatter
jh = jax.jit(lambda t: jnp.zeros((14*37,), jnp.int32).at[ctx*37+t].add(1))
print("hist scatter:", round(timeit(lambda: jh(token))*1e3,1), "ms", flush=True)
