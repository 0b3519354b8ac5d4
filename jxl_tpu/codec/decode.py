"""TPU-native JXT decoder — exact mirror of codec.encode.

Replaces the reference's host-side decode path (jpegxl-rs -> libjxl C++,
`image_reader.rs:370-439`). Two-pass parallel decode: the rANS scan yields
all tokens, token -> nbits gives every mantissa's bit offset via cumsum, one
vectorized gather rebuilds values, DC is reconstructed with a separable 2D
prefix sum (inverse of the unclamped gradient predictor), and IDCT + inverse
XYB are batched matmuls/elementwise ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jxl_tpu.codec.container import JxtStream, read_container
from jxl_tpu.codec.layout import token_layout
from jxl_tpu.core.xyb import xyb_to_srgb
from jxl_tpu.entropy.rans import deserialize_streams, rans_decode
from jxl_tpu.entropy.tokens import (
    detokenize,
    token_nbits,
    unpack_bits,
    zigzag_unmap,
)
from jxl_tpu.transforms.dct import idct2d, inverse_zigzag_order
from jxl_tpu.transforms.quant import ac_steps_np, dc_steps_np


def blocks_to_image(blocks: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[3, nby, nbx, 8, 8] -> [3, height, width] (crop padding)."""
    nby, nbx = blocks.shape[1], blocks.shape[2]
    planes = blocks.transpose(0, 1, 3, 2, 4).reshape(3, nby * 8, nbx * 8)
    return planes[:, :height, :width]


@partial(jax.jit, static_argnames=("height", "width", "distance", "lanes"))
def _decode_core(words, states, bit_words, freq, cum, *, height, width, distance, lanes):
    lay = token_layout(height, width)
    ctx = jnp.asarray(lay["ctx"])
    n = lay["n_tokens"]

    tokens = rans_decode(words, states, ctx, freq, cum, n, lanes=lanes)
    nbits = token_nbits(tokens)
    mant = unpack_bits(nbits, bit_words)
    values = detokenize(tokens, mant)
    signed = zigzag_unmap(values)

    n_dc = lay["n_dc"]
    nb, nby, nbx = lay["nb"], lay["nby"], lay["nbx"]

    dc_res = signed[:n_dc].reshape(3, nby, nbx)
    dcq = jnp.cumsum(jnp.cumsum(dc_res, axis=1), axis=2)  # inverse gradient predictor

    ac = signed[n_dc:].reshape(3, nb, 63)
    inv_zz = jnp.asarray(inverse_zigzag_order(8, 8))
    # Rebuild the 64-coefficient block: DC slot 0, then inverse zigzag.
    acq_zz = jnp.concatenate([jnp.zeros((3, nb, 1), jnp.int32), ac], axis=-1)
    acq = acq_zz[:, :, inv_zz].reshape(3, nby, nbx, 8, 8)

    dc_step = jnp.asarray(dc_steps_np(distance))
    ac_step = jnp.asarray(ac_steps_np(distance))

    coef = acq.astype(jnp.float32) * ac_step[:, None, None, :, :]
    coef = coef.at[..., 0, 0].set(dcq.astype(jnp.float32) * dc_step[:, None, None])

    blocks = idct2d(coef)
    planes = blocks_to_image(blocks, height, width)
    x, y, b_res = planes[0], planes[1], planes[2]
    xyb = jnp.stack([x, y, b_res + y], axis=-1)
    srgb = xyb_to_srgb(xyb)
    return jnp.round(srgb * 255.0).astype(jnp.uint8)


def decode_stream(stream: JxtStream) -> np.ndarray:
    """JxtStream -> RGB u8 [H, W, 3]."""
    h = stream.header
    lay = token_layout(h.height, h.width)
    T = max(1, -(-lay["n_tokens"] // h.lanes))

    words_np = deserialize_streams(stream.stream_words, stream.lens, h.lanes)
    if words_np.shape[0] < T:  # pad to the static scan length
        words_np = np.pad(words_np, ((0, T - words_np.shape[0]), (0, 0)))

    from jxl_tpu.entropy.tokens import bit_capacity_words

    cap = bit_capacity_words(lay["n_tokens"])
    bit_words = np.zeros(cap, dtype=np.uint32)
    bit_words[: stream.bit_words.shape[0]] = stream.bit_words

    freq = stream.freq.astype(np.uint32)
    cum = np.concatenate(
        [np.zeros((freq.shape[0], 1), np.uint32), np.cumsum(freq, axis=1)[:, :-1].astype(np.uint32)],
        axis=1,
    )

    rgb = _decode_core(
        jnp.asarray(words_np),
        jnp.asarray(stream.states),
        jnp.asarray(bit_words),
        jnp.asarray(freq),
        jnp.asarray(cum),
        height=h.height,
        width=h.width,
        distance=float(h.distance),
        lanes=h.lanes,
    )
    return np.asarray(rgb)


def decode_bytes(data: bytes) -> np.ndarray:
    return decode_stream(read_container(data))


def decode_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_bytes(f.read())
