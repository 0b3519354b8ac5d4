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
from jxl_tpu.entropy.rans import rans_decode
from jxl_tpu.entropy.tokens import (
    detokenize,
    token_nbits,
    unpack_bytes,
    zigzag_unmap,
)
from jxl_tpu.strategy.acs import (
    ACS_DCT4X4,
    ACS_DCT4X8,
    ACS_DCT8X4,
    ACS_DCT16X16,
    ACS_DCT32X32,
    N_STRATEGIES,
    effective_multiplier,
    reassemble_merged,
    step_grid_variants,
    steps_field,
)
from jxl_tpu.transforms.adaptive import QF_LEVELS, qf_multiplier
from jxl_tpu.transforms.epf import epf_apply
from jxl_tpu.transforms.dct import idct2d, inverse_zigzag_order, permute_last
from jxl_tpu.transforms.quant import dc_steps_t

_SQRT2 = float(np.sqrt(2.0))


def blocks_to_image(blocks: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[3, nby, nbx, 8, 8] -> [3, height, width] (crop padding)."""
    nby, nbx = blocks.shape[1], blocks.shape[2]
    planes = blocks.transpose(0, 1, 3, 2, 4).reshape(3, nby * 8, nbx * 8)
    return planes[:, :height, :width]


def _reconstruct_sub8(storage: jnp.ndarray, dc: jnp.ndarray, acs: jnp.ndarray):
    """Pixel blocks for strategies 0..3, per-block selected by the acs map.

    storage: [3, nby, nbx, 8, 8] dequantized coefficient storage,
    dc: [3, nby, nbx] dequantized DC-plane values. Dense: every strategy's
    inverse transform is computed for every block (batched MXU matmuls),
    then masked select — the jit-friendly dual of the encoder's search.
    """
    # DCT 8x8
    c8 = storage.at[..., 0, 0].set(dc)
    out8 = idct2d(c8)

    # DCT4X4: quadrants + Haar-mixed sub-DCs
    m = jnp.stack(
        [
            jnp.stack([dc, storage[..., 0, 4]], axis=-1),
            jnp.stack([storage[..., 4, 0], storage[..., 4, 4]], axis=-1),
        ],
        axis=-2,
    )  # [3, nby, nbx, 2, 2]
    subdc = idct2d(m)
    q44 = storage.reshape(*storage.shape[:-2], 2, 4, 2, 4).transpose(
        0, 1, 2, 3, 5, 4, 6
    )  # [3, nby, nbx, qy, qx, 4, 4]
    q44 = q44.at[..., 0, 0].set(subdc)
    p44 = idct2d(q44)  # [3, nby, nbx, 2, 2, 4, 4]
    out44 = p44.transpose(0, 1, 2, 3, 5, 4, 6).reshape(*storage.shape[:-2], 8, 8)

    # DCT8X4: left/right halves
    m1h = storage[..., 0, 4]
    s0 = (dc + m1h) / _SQRT2
    s1 = (dc - m1h) / _SQRT2
    h84 = storage.reshape(*storage.shape[:-2], 8, 2, 4).transpose(0, 1, 2, 4, 3, 5)
    h84 = h84.at[..., 0, 0, 0].set(s0).at[..., 1, 0, 0].set(s1)
    p84 = idct2d(h84)  # [3, nby, nbx, 2, 8, 4]
    out84 = p84.transpose(0, 1, 2, 4, 3, 5).reshape(*storage.shape[:-2], 8, 8)

    # DCT4X8: top/bottom halves
    m1v = storage[..., 4, 0]
    t0 = (dc + m1v) / _SQRT2
    t1 = (dc - m1v) / _SQRT2
    h48 = storage.reshape(*storage.shape[:-2], 2, 4, 8)
    h48 = h48.at[..., 0, 0, 0].set(t0).at[..., 1, 0, 0].set(t1)
    p48 = idct2d(h48)  # [3, nby, nbx, 2, 4, 8]
    out48 = p48.reshape(*storage.shape[:-2], 8, 8)

    sel = acs[None, :, :, None, None]
    out = jnp.where(sel == ACS_DCT4X4, out44, out8)
    out = jnp.where(sel == ACS_DCT8X4, out84, out)
    out = jnp.where(sel == ACS_DCT4X8, out48, out)
    return out


def _overlay_merged(pix: jnp.ndarray, storage, dc, acs, n: int, sid: int):
    """Overwrite pixels of n x n merged groups (dense compute + mask)."""
    k = n // 8
    nby, nbx = acs.shape
    gby, gbx = nby // k, nbx // k
    if gby == 0 or gbx == 0:
        return pix
    slots = storage[:, : gby * k, : gbx * k].reshape(3, gby, k, gbx, k, 8, 8).transpose(
        0, 1, 3, 2, 4, 5, 6
    )  # [3, gby, gbx, k, k, 8, 8]
    dcb = dc[:, : gby * k, : gbx * k].reshape(3, gby, k, gbx, k).transpose(0, 1, 3, 2, 4)
    tiles = reassemble_merged(slots, dcb)  # [3, gby, gbx, n, n]
    tile_img = tiles.transpose(0, 1, 3, 2, 4).reshape(3, gby * n, gbx * n)
    mask = acs[: gby * k : k, : gbx * k : k] == sid  # group origin blocks
    mask_img = jnp.repeat(jnp.repeat(mask, n, axis=0), n, axis=1)
    hp, wp = pix.shape[-2:]
    tile_full = jnp.pad(tile_img, ((0, 0), (0, hp - gby * n), (0, wp - gbx * n)))
    mask_full = jnp.pad(mask_img, ((0, hp - gby * n), (0, wp - gbx * n)))
    return jnp.where(mask_full[None], tile_full, pix)


def _pow2_bucket(n: int, floor: int = 1024) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


@partial(jax.jit, static_argnames=("height", "width", "lanes", "epf", "w2b", "m4b"))
def _decode_packed(packed, distance, *, height, width, lanes, epf, w2b, m4b):
    """Unpack the single uploaded u32 buffer and decode.

    Host->device layout (static offsets; w2b/m4b are power-of-two bucket
    sizes so jit specializations stay bounded):
      [0:NF]         freq tables (N_CTX*A u32)
      [NF:NF+lanes]  final rANS states
      [.. : ..+w2b]  words, 2 x u16 per u32 (LE)
      [.. : ..+m4b]  mantissa bytes, 4 per u32 (LE)
    """
    from jxl_tpu.codec.layout import N_CTX
    from jxl_tpu.entropy.tokens import ALPHABET

    nf = N_CTX * ALPHABET
    freq = packed[:nf].reshape(N_CTX, ALPHABET)
    states = packed[nf : nf + lanes]
    w2 = packed[nf + lanes : nf + lanes + w2b]
    m4 = packed[nf + lanes + w2b : nf + lanes + w2b + m4b]
    words = jnp.stack([w2 & 0xFFFF, w2 >> 16], axis=1).reshape(-1)
    mant_arr = jnp.stack(
        [m4 & 0xFF, (m4 >> 8) & 0xFF, (m4 >> 16) & 0xFF, m4 >> 24], axis=1
    ).reshape(-1)
    lay = token_layout(height, width)
    T = max(1, -(-lay["n_tokens"] // lanes))
    pad_w = T * lanes - words.shape[0]
    if pad_w > 0:
        words = jnp.concatenate([words, jnp.zeros((pad_w,), jnp.uint32)])
    else:
        words = words[: T * lanes]
    cum = jnp.concatenate(
        [jnp.zeros((N_CTX, 1), jnp.uint32), jnp.cumsum(freq, axis=1)[:, :-1]], axis=1
    )
    return _decode_body(
        words, states, mant_arr, freq, cum, distance, height=height, width=width, lanes=lanes, epf=epf
    )


@partial(jax.jit, static_argnames=("height", "width", "lanes", "epf"))
def _decode_core(
    words, states, mant_arr, freq, cum, distance, *, height, width, lanes, epf=True
):
    return _decode_body(
        words, states, mant_arr, freq, cum, distance, height=height, width=width, lanes=lanes, epf=epf
    )


def _decode_body(
    words, states, mant_arr, freq, cum, distance, *, height, width, lanes, epf=True
):
    lay = token_layout(height, width)
    ctx = jnp.asarray(lay["ctx"])
    n = lay["n_tokens"]

    tokens = rans_decode(words, states, ctx, freq, cum, n, lanes=lanes)
    nbits = token_nbits(tokens)
    mant = unpack_bytes(nbits, mant_arr)
    values = detokenize(tokens, mant)
    signed = zigzag_unmap(values)

    n_acs, n_qf, n_cfl, n_dc = lay["n_acs"], lay["n_qf"], lay["n_cfl"], lay["n_dc"]
    nb, nby, nbx = lay["nb"], lay["nby"], lay["nbx"]
    ty, tx = lay["ty"], lay["tx"]

    acs = jnp.clip(values[:n_acs].astype(jnp.int32), 0, N_STRATEGIES - 1).reshape(
        nby, nbx
    )
    qf_idx = jnp.clip(
        values[n_acs : n_acs + n_qf].astype(jnp.int32), 0, QF_LEVELS - 1
    ).reshape(nby, nbx)
    qf_mul = qf_multiplier(qf_idx)

    cfl = signed[n_acs + n_qf : n_acs + n_qf + n_cfl].reshape(2, ty, tx)

    dc_start = n_acs + n_qf + n_cfl
    dc_res = signed[dc_start : dc_start + n_dc].reshape(3, nby, nbx)
    dcq = jnp.cumsum(jnp.cumsum(dc_res, axis=1), axis=2)  # inverse gradient predictor

    ac = signed[dc_start + n_dc :].reshape(3, nb, 63)
    # Rebuild the 64-coefficient block: DC slot 0, then inverse zigzag
    # (as a permutation matmul — see transforms.dct.permute_last).
    acq_zz = jnp.concatenate([jnp.zeros((3, nb, 1), jnp.int32), ac], axis=-1)
    acq = permute_last(acq_zz, inverse_zigzag_order(8, 8)).reshape(3, nby, nbx, 8, 8)

    dc_step = dc_steps_t(distance)
    dc = dcq.astype(jnp.float32) * dc_step[:, None, None]

    variants = step_grid_variants(distance)
    eff_mul = effective_multiplier(qf_mul, acs)
    qsteps = steps_field(variants, acs, eff_mul)
    storage = acq.astype(jnp.float32) * qsteps

    # Chroma-from-luma: add back the signaled per-tile luma prediction.
    yd = storage[1]
    kq = jnp.clip(cfl.astype(jnp.float32), -32, 32) / 32.0
    kb = jnp.repeat(jnp.repeat(kq, 4, axis=1), 4, axis=2)[:, :nby, :nbx]
    storage = jnp.stack(
        [
            storage[0] + kb[0][:, :, None, None] * yd,
            yd,
            storage[2] + kb[1][:, :, None, None] * yd,
        ]
    )

    blocks = _reconstruct_sub8(storage, dc, acs)
    planes = blocks.transpose(0, 1, 3, 2, 4).reshape(3, nby * 8, nbx * 8)
    planes = _overlay_merged(planes, storage, dc, acs, 16, ACS_DCT16X16)
    planes = _overlay_merged(planes, storage, dc, acs, 32, ACS_DCT32X32)
    if epf:
        planes = epf_apply(planes, eff_mul, distance)
    planes = planes[:, :height, :width]

    x, y, b_res = planes[0], planes[1], planes[2]
    xyb = jnp.stack([x, y, b_res + y], axis=-1)
    srgb = xyb_to_srgb(xyb)
    return jnp.round(srgb * 255.0).astype(jnp.uint8)


def decode_stream_device(stream: JxtStream):
    """JxtStream -> RGB u8 [H, W, 3] as a DEVICE array.

    One packed host->device upload (uploads are ~1.2 GB/s over the tunnel;
    downloads cost ~25 ms fixed + ~27 ms/MB, so the pixels stay on device —
    metrics and sweep consumers operate there and only fetch scalars).
    """
    h = stream.header
    words = np.frombuffer(stream.stream_words, dtype="<u2")
    mant = np.frombuffer(stream.mant_bytes, dtype=np.uint8)
    w2b = _pow2_bucket((words.shape[0] + 1) // 2)
    m4b = _pow2_bucket((mant.shape[0] + 3) // 4)

    from jxl_tpu.codec.layout import N_CTX
    from jxl_tpu.entropy.tokens import ALPHABET

    nf = N_CTX * ALPHABET
    packed = np.zeros(nf + h.lanes + w2b + m4b, dtype=np.uint32)
    packed[:nf] = stream.freq.reshape(-1)
    packed[nf : nf + h.lanes] = stream.states
    wpad = np.zeros(2 * w2b, dtype="<u2")
    wpad[: words.shape[0]] = words
    packed[nf + h.lanes : nf + h.lanes + w2b] = wpad.view("<u4")
    mpad = np.zeros(4 * m4b, dtype=np.uint8)
    mpad[: mant.shape[0]] = mant
    packed[nf + h.lanes + w2b :] = mpad.view("<u4")

    return _decode_packed(
        jnp.asarray(packed),
        jnp.float32(h.distance),
        height=h.height,
        width=h.width,
        lanes=h.lanes,
        epf=h.epf,
        w2b=w2b,
        m4b=m4b,
    )


def decode_stream(stream: JxtStream) -> np.ndarray:
    """JxtStream -> RGB u8 [H, W, 3] (host array)."""
    return np.asarray(decode_stream_device(stream))


def decode_bytes(data: bytes) -> np.ndarray:
    return decode_stream(read_container(data))


def decode_bytes_device(data: bytes):
    """Decode to a device-resident RGB u8 array (no device->host download)."""
    return decode_stream_device(read_container(data))


def decode_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_bytes(f.read())
