"""Measure dispatch-vs-fetch split of the pipelined encoder and test a
background-thread finalize (ROADMAP item 2)."""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import synth_kodak
from jxl_tpu.codec.config import CodecConfig
from jxl_tpu.codec.encode import encode_image, encode_image_async, encode_images

img = synth_kodak()
cfg = CodecConfig(distance=1.0, effort=7)

# warmup/compile
encode_image(img, cfg)

N = 12

# dispatch-only cost
t0 = time.perf_counter()
fins = [encode_image_async(img, cfg, "") for _ in range(N)]
t_disp = (time.perf_counter() - t0) / N
# finalize-only cost (everything ready by now? drain)
t0 = time.perf_counter()
for f in fins:
    f()
t_fin = (time.perf_counter() - t0) / N
print(f"dispatch-only: {t_disp*1e3:.1f} ms  finalize-after-all: {t_fin*1e3:.1f} ms")

# current inline pipeline
t0 = time.perf_counter()
encode_images([(img, cfg, "")] * N)
t_cur = (time.perf_counter() - t0) / N
print(f"encode_images depth4 inline: {t_cur*1e3:.1f} ms/img")

# threaded finalize: dispatch on main thread, finalize on IO thread
def threaded(jobs, depth=4):
    out = []
    with ThreadPoolExecutor(max_workers=1) as ex:
        futs = []
        for job in jobs:
            fin = encode_image_async(*job)
            futs.append(ex.submit(fin))
            if len(futs) > depth:
                out.append(futs.pop(0).result())
        out.extend(f.result() for f in futs)
    return out

threaded([(img, cfg, "")] * 4)  # warm
t0 = time.perf_counter()
threaded([(img, cfg, "")] * N)
t_thr = (time.perf_counter() - t0) / N
print(f"encode_images threaded-finalize: {t_thr*1e3:.1f} ms/img")
