"""Generate synthetic photographic-like test sets under test_images/.

The reference ships Kodak-style sets in `test_images/` (baked into its
Docker image, Dockerfile:36-37) which are not redistributable here; these
synthetic images exercise the same codec behaviors: smooth gradients (DC/
low-freq), sharp edges (partition decisions), texture (entropy), and color
variation (chroma channels).

Usage: python tools/make_test_images.py [--out test_images] [--n 8]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_photo(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    # smooth multi-scale base
    base = np.zeros((h, w), np.float32)
    for freq, amp in ((29.0, 0.25), (61.0, 0.15), (131.0, 0.2)):
        ph1, ph2 = rng.uniform(0, 6.28, 2)
        base += amp * np.sin(xx / freq + ph1) * np.cos(yy / (freq * 0.8) + ph2)
    base = 0.55 + base

    # edges / blocks
    edges = 0.18 * (((xx // rng.integers(48, 128)).astype(int) ^ (yy // rng.integers(32, 96)).astype(int)) % 2)

    # texture octaves (band-limited noise)
    tex = np.zeros((h, w), np.float32)
    for scale, amp in ((4, 0.02), (16, 0.03)):
        n = rng.normal(0, 1, (h // scale + 2, w // scale + 2)).astype(np.float32)
        nn = np.kron(n, np.ones((scale, scale), np.float32))[:h, :w]
        tex += amp * nn
    tex += rng.normal(0, 0.012, (h, w)).astype(np.float32)

    lum = np.clip(base + edges + tex, 0.02, 0.98)
    r = lum * (0.8 + 0.2 * np.sin(yy / 97.0 + rng.uniform(0, 6)))
    g = lum
    b = lum * (0.7 + 0.3 * np.cos(xx / 83.0 + rng.uniform(0, 6)))
    rgb = np.stack([r, g, b], axis=-1)
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="test_images")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--size", default="512x768", help="HxW")
    args = ap.parse_args()

    from jxl_tpu.core.io import write_image

    h, w = (int(s) for s in args.size.split("x"))
    out_dir = os.path.join(args.out, "synth")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(args.n):
        path = os.path.join(out_dir, f"synth{i:02d}.png")
        write_image(path, synth_photo(h, w, seed=100 + i))
        print("wrote", path)


if __name__ == "__main__":
    main()
