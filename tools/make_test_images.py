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


def synth_graphics(h, w, seed):
    """Sharp-edged synthetic-graphics content (text-box/diagram-like):
    flat regions, high-contrast rectangles and thin lines — the regime
    where the thesis's homogeneity partitioning targets DCT4x4/8x4/4x8
    splits (proposals/homogeneity-partitioning.diff:213-235)."""
    rng = np.random.default_rng(seed)
    lum = np.full((h, w), 0.92, np.float32)
    for _ in range(28):
        y0, x0 = rng.integers(0, h - 16), rng.integers(0, w - 16)
        bh, bw = rng.integers(12, h // 3), rng.integers(12, w // 3)
        lum[y0 : y0 + bh, x0 : x0 + bw] = rng.uniform(0.05, 0.95)
    for _ in range(40):  # thin lines, both orientations
        if rng.random() < 0.5:
            y = rng.integers(0, h - 2)
            x0, x1 = sorted(rng.integers(0, w, 2))
            lum[y : y + rng.integers(1, 3), x0:x1] = rng.uniform(0.0, 1.0)
        else:
            x = rng.integers(0, w - 2)
            y0, y1 = sorted(rng.integers(0, h, 2))
            lum[y0:y1, x : x + rng.integers(1, 3)] = rng.uniform(0.0, 1.0)
    hue = rng.uniform(0, 6.28)
    r = np.clip(lum * (0.85 + 0.15 * np.cos(hue)), 0, 1)
    b = np.clip(lum * (0.85 + 0.15 * np.sin(hue)), 0, 1)
    return (np.stack([r, lum, b], axis=-1) * 255).astype(np.uint8)


def synth_portrait(h, w, seed):
    """Smooth-gradient-dominated content (sky/skin-like): large radial
    gradients + a few soft blobs + mild grain — the regime where big
    merged transforms (16x16..64x64) and DC fidelity dominate."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = rng.uniform(0.3, 0.7) * h, rng.uniform(0.3, 0.7) * w
    rad = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2) / np.hypot(h, w)
    lum = 0.75 - 0.45 * rad
    for _ in range(6):  # soft blobs
        by, bx = rng.uniform(0, h), rng.uniform(0, w)
        s = rng.uniform(0.05, 0.2) * min(h, w)
        a = rng.uniform(-0.12, 0.12)
        lum += a * np.exp(-(((yy - by) ** 2 + (xx - bx) ** 2) / (2 * s * s)))
    lum += rng.normal(0, 0.004, (h, w)).astype(np.float32)  # mild grain
    lum = np.clip(lum, 0.02, 0.98)
    r = lum * (0.95 + 0.05 * np.sin(yy / 151.0))
    b = lum * (0.82 + 0.1 * np.cos(xx / 177.0))
    return (np.clip(np.stack([r, lum, b], axis=-1), 0, 1) * 255).astype(np.uint8)


# content family per corpus index: photographic texture, sharp graphics,
# smooth portrait — cycled so an 8-image set covers all three regimes
GENERATORS = (synth_photo, synth_photo, synth_graphics, synth_portrait)


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
        gen = GENERATORS[i % len(GENERATORS)]
        write_image(path, gen(h, w, seed=100 + i))
        print("wrote", path, gen.__name__)


if __name__ == "__main__":
    main()
