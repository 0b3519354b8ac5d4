"""Per-stage TPU profiling of the codec pipeline (run from the repo root)."""
import time, numpy as np, jax, jax.numpy as jnp
import jxl_tpu
from bench import synth_kodak
from jxl_tpu.codec.config import CodecConfig
from jxl_tpu.codec.encode import _encode_stage1, _encode_stage2, encode_image, pick_lanes
from jxl_tpu.codec.decode import decode_bytes
from jxl_tpu.codec.layout import token_layout
from jxl_tpu.entropy.rans import quantize_histograms
from jxl_tpu.entropy.tokens import byte_capacity
print("devices:", jax.devices(), flush=True)
img = synth_kodak()
h, w = 512, 768
lay = token_layout(h, w)
def t(fn, n=3):
    fn(); t0=time.perf_counter()
    for _ in range(n): r = fn()
    return (time.perf_counter()-t0)/n
rgbj = jnp.asarray(img)
d = jnp.float32(1.0)
s1 = lambda: jax.block_until_ready(_encode_stage1(rgbj, d, height=h, width=w, effort=7, hook_a=False, hook_b=False))
print("stage1 (xyb+acs+tokens):", round(t(s1),4), "s", flush=True)
token, nbits, mant, counts = _encode_stage1(rgbj, d, height=h, width=w, effort=7, hook_a=False, hook_b=False)
freq, cum = quantize_histograms(np.asarray(counts))
lanes = pick_lanes(lay["n_tokens"], 256)
cap = byte_capacity(lay["n_tokens"])
fj, cj = jnp.asarray(freq), jnp.asarray(cum)
s2 = lambda: jax.block_until_ready(_encode_stage2(token, nbits, mant, fj, cj, height=h, width=w, lanes=lanes, cap_bytes=cap))
print("stage2 (rans+packbits), lanes", lanes, ":", round(t(s2),4), "s", flush=True)
data = encode_image(img, CodecConfig())
print("bpp", len(data)*8/(h*w), flush=True)
dec = lambda: decode_bytes(data)
print("decode total:", round(t(dec),4), "s", flush=True)
e2e = lambda: encode_image(img, CodecConfig())
print("encode total:", round(t(e2e),4), "s", flush=True)
