"""Lossless (d=0) modular mode — exact integer round trip.

The legacy pipeline's sweep grid includes distance 0.0, which in cjxl terms
selects libjxl's modular lossless coder (`old_test_jxl.py:16-27`). This is
the TPU-native equivalent, designed so DECODE stays fully parallel:

- reversible color: YCoCg-R integer lifting (exactly invertible with
  arithmetic shifts; the same family JPEG XL's modular mode uses via RCTs)
- predictor: the UNCLAMPED gradient pred = W + N - NW per plane. libjxl's
  ClampedGradient compresses slightly better but its inverse is an
  inherently sequential wavefront; the unclamped form's inverse is a
  separable 2D prefix sum — two cumsums, perfectly vectorizable
- entropy: the same grouped rANS layer as the lossy path (one context per
  channel), so the Pallas decode kernel serves both modes unchanged

Everything is int32-exact end to end; tests assert bit-identical pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jxl_tpu.codec.layout import N_CTX, lossless_layout
from jxl_tpu.entropy.tokens import ALPHABET, tokenize, zigzag_map, zigzag_unmap


def ycocg_forward(rgb):
    """u8 [H, W, 3] -> int32 [3, H, W] (Y, Co, Cg). Exactly reversible."""
    x = rgb.astype(jnp.int32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    co = r - b
    t = b + (co >> 1)
    cg = g - t
    y = t + (cg >> 1)
    return jnp.stack([y, co, cg])


def ycocg_inverse(planes):
    """int32 [3, H, W] -> u8 [H, W, 3]."""
    y, co, cg = planes[0], planes[1], planes[2]
    t = y - (cg >> 1)
    g = cg + t
    b = t - (co >> 1)
    r = b + co
    return jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)


def grad_residual(planes):
    """r = x - W - N + NW per [3, H, W] plane (unclamped gradient)."""
    w = jnp.pad(planes, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    n = jnp.pad(planes, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
    nw = jnp.pad(planes, ((0, 0), (1, 0), (1, 0)))[:, :-1, :-1]
    return planes - w - n + nw


def grad_reconstruct(res):
    """Inverse of grad_residual: separable 2D prefix sum (exact, int32)."""
    return jnp.cumsum(jnp.cumsum(res, axis=1), axis=2)


def lossless_tokens(rgb, *, height: int, width: int):
    """Pixels -> (tokens, nbits, mantissa, histogram counts) for the
    lossless layout (contexts = channels)."""
    planes = ycocg_forward(rgb)
    res = grad_residual(planes)
    values = zigzag_map(res.reshape(3, -1)).reshape(-1)
    token, nbits, mant = tokenize(values)

    from jxl_tpu.codec.encode import _histogram_mxu

    lay = lossless_layout(height, width, 128)  # ctx field is lanes-free
    counts = _histogram_mxu(token, lay["ctx"])
    return token, nbits, mant, counts


def reconstruct_lossless(values, *, height: int, width: int):
    """Decoded value stream -> exact RGB u8 pixels."""
    res = zigzag_unmap(values).reshape(3, height, width)
    planes = grad_reconstruct(res)
    return ycocg_inverse(planes)
