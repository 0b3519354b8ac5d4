"""Perceptual metrics: Butteraugli-style distance and SSIMULACRA2-style score.

The reference runs the real binaries inside its containers
(`butteraugli_main` via `docker_manager.rs:167-175`, `ssimulacra2` via
`:148-156`) and parses stdout (`metrics.rs:96-144`). Those tools are large
C++ psychovisual models; this module provides TPU-native stand-ins with the
same interfaces, orientations and CSV columns (SURVEY §7 notes the full
ports are M6 scope; columns must exist from day one):

- `calculate_butteraugli` returns (distance, pnorm3): an XYB-space,
  multi-scale, contrast-masked difference. 0 = identical; larger = worse;
  magnitudes calibrated to be ~commensurate with butteraugli distances on
  photographic content (d~1 at the edge of visibility).
- `calculate_ssimulacra2` returns a score <= 100 (100 = identical),
  computed from multi-scale structural similarity in XYB space.

Both run as one fused jnp computation per image pair.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jxl_tpu.core.xyb import srgb_to_xyb

# Perceptual channel weights for XYB differences (X errors are ~30x more
# visible per unit than Y; B the least).
_XYB_WEIGHTS = jnp.array([60.0, 8.0, 3.0], dtype=jnp.float32)
_SCALE_WEIGHTS = (0.55, 0.30, 0.15)
_SIGMAS = (0.5, 1.2, 3.0)
# Unit gain calibrated on the round-1 sweep so a d=1 encode scores ~1.0
# butteraugli-style distance units.
_GAIN = 18.0


def _blur(img, sigma: float):
    radius = max(1, int(3 * sigma))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    pad = radius
    img_p = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="symmetric")
    v = jax.lax.conv_general_dilated(
        img_p.transpose(2, 0, 1)[:, None],
        k[None, None, :, None],
        (1, 1),
        "VALID",
        precision=jax.lax.Precision.HIGHEST,
    )
    h = jax.lax.conv_general_dilated(
        v,
        k[None, None, None, :],
        (1, 1),
        "VALID",
        precision=jax.lax.Precision.HIGHEST,
    )
    return h[:, 0].transpose(1, 2, 0)


@jax.jit
def _butteraugli_maps(orig_u8, comp_u8):
    a = srgb_to_xyb(orig_u8.astype(jnp.float32) / 255.0)
    b = srgb_to_xyb(comp_u8.astype(jnp.float32) / 255.0)

    # Local activity of the original acts as a masking term: errors in busy
    # regions are less visible (the same psychovisual idea the thesis's
    # homogeneity heuristics exploit on the encoder side).
    act = _blur(jnp.abs(a - _blur(a, 1.5)), 2.0)
    masking = 1.0 + 12.0 * jnp.sum(act * _XYB_WEIGHTS, axis=-1, keepdims=True)

    dist = jnp.zeros(a.shape[:2], jnp.float32)
    for sigma, w in zip(_SIGMAS, _SCALE_WEIGHTS):
        da = _blur(a, sigma) - _blur(b, sigma)
        d = jnp.sqrt(jnp.sum((da * _XYB_WEIGHTS) ** 2, axis=-1, keepdims=True))
        dist = dist + w * (d / masking)[..., 0]
    return _GAIN * dist


def calculate_butteraugli(orig: np.ndarray, comp: np.ndarray) -> tuple[float, float]:
    """Returns (max-distance, 3-norm) like the reference parses from
    `butteraugli_main` output (`metrics.rs:96-121`)."""
    dist = _butteraugli_maps(jnp.asarray(orig), jnp.asarray(comp))
    # "max norm" with a slight soften (99.95th percentile) for robustness
    d_max = float(jnp.quantile(dist, 0.9995))
    pnorm3 = float(jnp.mean(dist**3) ** (1.0 / 3.0))
    return d_max, pnorm3


def calculate_ssimulacra2(orig: np.ndarray, comp: np.ndarray) -> float:
    """SSIMULACRA2-style score: 100 = identical, lower = worse, can go
    negative for bad quality (same orientation as the real tool)."""
    from jxl_tpu.metrics.quality import _downsample2x, _gaussian_kernel, _filter2d_sep

    a = np.asarray(srgb_to_xyb(jnp.asarray(orig).astype(jnp.float32) / 255.0))
    b = np.asarray(srgb_to_xyb(jnp.asarray(comp).astype(jnp.float32) / 255.0))
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    k = _gaussian_kernel(5, 1.5)
    c1, c2 = 1e-4, 1e-4
    total = 0.0
    weights = (0.4, 0.3, 0.2, 0.1)
    for w in weights:
        mu_a = _filter2d_sep(a, k)
        mu_b = _filter2d_sep(b, k)
        sig_a = _filter2d_sep(a * a, k) - mu_a * mu_a
        sig_b = _filter2d_sep(b * b, k) - mu_b * mu_b
        sig_ab = _filter2d_sep(a * b, k) - mu_a * mu_b
        s = ((2 * mu_a * mu_b + c1) * (2 * sig_ab + c2)) / (
            (mu_a * mu_a + mu_b * mu_b + c1) * (sig_a + sig_b + c2)
        )
        err = 1.0 - float(jnp.mean(s))
        total += w * err
        if min(a.shape[0], a.shape[1]) < 22:
            break
        a = _downsample2x(a)
        b = _downsample2x(b)
    # Sub-linear response calibrated on the round-1 sweep so scores span
    # realistic SSIMULACRA2-like ranges (d=0.5 ~ 86, d=1 ~ 75, d=3 ~ 55,
    # d=14 ~ 20 on photographic content).
    return 100.0 - 348.0 * max(total, 0.0) ** 0.65
