"""Break down the encode pipeline steady state: dispatch vs poll vs
transfer vs assembly, and compare prefix-fetch strategies."""
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
    _parse_packed,
    pick_lanes,
)
from jxl_tpu.codec.layout import padded_layout, token_layout
from jxl_tpu.entropy.tokens import byte_capacity
from jxl_tpu.utils.jax_setup import ready_get, ready_wait

img = synth_kodak()
h, w = 512, 768
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

N = 12
# steady state with manual pipeline depth 4, instrumented
t_disp, t_poll, t_xfer, t_parse = [], [], [], []
pending = []
t_start = time.perf_counter()
for i in range(N + 4):
    if i < N + 4 - 4 + 4:  # always dispatch N total
        pass
    if i < N:
        t0 = time.perf_counter()
        pending.append(_encode_full_pref(rgbj, jnp.float32(1.0), **kw))
        t_disp.append(time.perf_counter() - t0)
    if (i >= 4 and pending) or i >= N:
        p, b = pending.pop(0)
        t0 = time.perf_counter()
        ready_wait(p)
        t1 = time.perf_counter()
        got = np.asarray(p)
        t2 = time.perf_counter()
        pieces = _parse_packed(got, b, lanes)
        t3 = time.perf_counter()
        t_poll.append(t1 - t0)
        t_xfer.append(t2 - t1)
        t_parse.append(t3 - t2)
    if not pending and i >= N:
        break
t_total = time.perf_counter() - t_start
print(f"serial pipeline total: {t_total/N*1e3:.1f} ms/img")
print(f"dispatch: {np.mean(t_disp)*1e3:.1f} ms  poll: {np.mean(t_poll)*1e3:.1f} ms  "
      f"xfer(np.asarray {first*4//1024}KB): {np.mean(t_xfer)*1e3:.1f} ms  parse: {np.mean(t_parse)*1e3:.1f} ms")

# fetch strategy comparison on ready buffers
outs = [_encode_full_pref(rgbj, jnp.float32(1.0), **kw) for _ in range(8)]
ready_wait([o[0] for o in outs])

t0 = time.perf_counter()
for p, b in outs:
    g = np.asarray(p)
print(f"np.asarray each (ready, idle device): {(time.perf_counter()-t0)/8*1e3:.1f} ms")

outs = [_encode_full_pref(rgbj, jnp.float32(1.0), **kw) for _ in range(8)]
ready_wait([o[0] for o in outs])
t0 = time.perf_counter()
for p, b in outs:
    p.copy_to_host_async()
for p, b in outs:
    g = np.asarray(p)
print(f"batch copy_to_host_async then asarray: {(time.perf_counter()-t0)/8*1e3:.1f} ms")

# small-get cost when device idle
small = jax.jit(lambda x: x[:2834])(buf)
ready_wait(small)
t0 = time.perf_counter()
for _ in range(8):
    g = np.asarray(small)
print(f"11KB get (ready, idle): {(time.perf_counter()-t0)/8*1e3:.1f} ms")

# strategy: copy_to_host_async AT DISPATCH TIME (before ready), pipeline depth 4
N = 12
pending = []
t0 = time.perf_counter()
done = 0
for i in range(N):
    p, b = _encode_full_pref(rgbj, jnp.float32(1.0), **kw)
    p.copy_to_host_async()
    pending.append((p, b))
    if len(pending) >= 4:
        p0, b0 = pending.pop(0)
        ready_wait(p0)
        g = np.asarray(p0)
        pieces = _parse_packed(g, b0, lanes)
        done += 1
while pending:
    p0, b0 = pending.pop(0)
    ready_wait(p0)
    g = np.asarray(p0)
    pieces = _parse_packed(g, b0, lanes)
    done += 1
print(f"async-copy-at-dispatch pipeline: {(time.perf_counter()-t0)/N*1e3:.1f} ms/img")

# same but asarray without ready_wait (asarray blocks on the async copy itself)
pending = []
t0 = time.perf_counter()
for i in range(N):
    p, b = _encode_full_pref(rgbj, jnp.float32(1.0), **kw)
    p.copy_to_host_async()
    pending.append((p, b))
    if len(pending) >= 4:
        p0, b0 = pending.pop(0)
        g = np.asarray(p0)
        pieces = _parse_packed(g, b0, lanes)
print(f"async-copy-at-dispatch, no-poll asarray: ", end="")
while pending:
    p0, b0 = pending.pop(0)
    g = np.asarray(p0)
    pieces = _parse_packed(g, b0, lanes)
print(f"{(time.perf_counter()-t0)/N*1e3:.1f} ms/img")
