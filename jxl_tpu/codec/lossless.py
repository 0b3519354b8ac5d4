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

from jxl_tpu.codec.layout import lossless_layout
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
    """Pixels -> (tokens, nbits, mantissa, params) for
    the lossless layout (contexts = channels).

    params (traced uint32): per-channel predictor mode, 2 bits each
    (bits 2c..2c+1 for channel c): 0 = none, 1 = west, 2 = gradient —
    chosen per channel on the rate proxy (v7 container flags bits 2-7).
    Adaptive choice matters exactly as for the lossy DC plane: on noisy
    planes the gradient predictor doubles residual stddev vs none/west;
    on smooth planes it wins. All three inverses are prefix sums, so
    decode stays fully parallel whatever is picked.
    """
    planes = ycocg_forward(rgb)
    w_ = jnp.pad(planes, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    n_ = jnp.pad(planes, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
    nw_ = jnp.pad(planes, ((0, 0), (1, 0), (1, 0)))[:, :-1, :-1]
    res_all = jnp.stack([planes, planes - w_, planes - w_ - n_ + nw_])  # [3mode, 3ch, H, W]

    from jxl_tpu.codec.encode import _bits_proxy

    mode_costs = jnp.sum(_bits_proxy(res_all), axis=(2, 3))  # [3mode, 3ch]
    modes = jnp.argmin(mode_costs, axis=0).astype(jnp.uint32)  # [3ch]
    params = modes[0] | (modes[1] << 2) | (modes[2] << 4)
    res = jnp.where(
        (modes == 0)[:, None, None],
        res_all[0],
        jnp.where((modes == 1)[:, None, None], res_all[1], res_all[2]),
    )
    values = zigzag_map(res.reshape(3, -1)).reshape(-1)
    token, nbits, mant = tokenize(values)
    # histograms are computed by the shared entropy tail
    # (encode._entropy_and_pack, stepped over the padded stream)
    return token, nbits, mant, params


def reconstruct_lossless(values, params, *, height: int, width: int):
    """Decoded value stream -> exact RGB u8 pixels. params: per-channel
    predictor modes (see lossless_tokens); pre-v7 streams decode with
    gradient for every channel (JxtHeader.decode_params handles that)."""
    params = jnp.asarray(params, jnp.uint32)
    modes = jnp.stack([(params >> (2 * c)) & 3 for c in range(3)]).astype(jnp.int32)
    res = zigzag_unmap(values).reshape(3, height, width)
    rec_w = jnp.cumsum(res, axis=2)
    rec_g = jnp.cumsum(rec_w, axis=1)
    m = modes[:, None, None]
    planes = jnp.where(m == 0, res, jnp.where(m == 1, rec_w, rec_g))
    return ycocg_inverse(planes)
