"""Isolate device cadence vs transfer cost for the pipelined encoder."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import synth_kodak
from jxl_tpu.codec.config import CodecConfig
from jxl_tpu.codec.encode import (
    _encode_full_pref,
    _first_get_u32,
    pick_lanes,
)
from jxl_tpu.codec.layout import padded_layout, token_layout
from jxl_tpu.entropy.tokens import byte_capacity
from jxl_tpu.utils.jax_setup import ready_get, ready_wait

img = synth_kodak()
h, w = 512, 768
cfg = CodecConfig(distance=1.0, effort=7)
lanes = pick_lanes(token_layout(h, w)["n_tokens"], 256)
lay = padded_layout(h, w, lanes)
cap = byte_capacity(lay["n_padded"])
first = _first_get_u32(lanes, h * w)
rgbj = jnp.asarray(img)
kw = dict(
    first=first, height=h, width=w, effort=7, hook_a=False, hook_b=False,
    lanes=lanes, cap_bytes=cap,
)

# warm
pref, buf = _encode_full_pref(rgbj, jnp.float32(1.0), **kw)
ready_wait(buf)
print("prefix u32:", first, "=", first * 4 // 1024, "KB")

N = 10
# 1) device cadence, no gets: dispatch N, poll last ready
t0 = time.perf_counter()
outs = [_encode_full_pref(rgbj, jnp.float32(1.0), **kw) for _ in range(N)]
ready_wait(outs[-1][0])
t_cad = (time.perf_counter() - t0) / N
print(f"device cadence (no gets): {t_cad*1e3:.1f} ms/img")

# 2) gets of READY prefixes, one by one
t0 = time.perf_counter()
for p, b in outs:
    g = ready_get(p)
t_get = (time.perf_counter() - t0) / N
print(f"ready prefix get: {t_get*1e3:.1f} ms/img")

# 3) interleaved: dispatch all, then get in order (device idle by then? no:
#    re-dispatch fresh and get while later ones compute)
t0 = time.perf_counter()
outs = [_encode_full_pref(rgbj, jnp.float32(1.0), **kw) for _ in range(N)]
for p, b in outs:
    g = ready_get(p)
t_int = (time.perf_counter() - t0) / N
print(f"dispatch-all-then-get-in-order: {t_int*1e3:.1f} ms/img")

# 4) get with plain np.asarray (no copy_to_host_async) of ready data
outs = [_encode_full_pref(rgbj, jnp.float32(1.0), **kw) for _ in range(N)]
ready_wait([o[0] for o in outs])
t0 = time.perf_counter()
for p, b in outs:
    g = np.asarray(p)
t_np = (time.perf_counter() - t0) / N
print(f"np.asarray of ready prefix: {t_np*1e3:.1f} ms/img")
