"""Static token/context layout — shared encoder/decoder ground truth.

The decoder must know each token's entropy context *before* decoding it, so
contexts are a pure function of the (static) image geometry: channel for DC,
channel x frequency-band for AC. This mirrors libjxl's position-based
context modeling in spirit while staying jit-static (no data-dependent
context chains), which is what lets the rANS scan stay fully vectorized.

Token stream order (flat index -> meaning):
  [0, nb)            AC-strategy map tokens ([nby, nbx], ids 0..5)
  [nb, 2*nb)         quant-field multiplier indices ([nby, nbx], 0..15)
  [.., +2*ntiles)    chroma-from-luma factors, zigzag-mapped ([2, ty, tx])
  [.., +3*nb)        DC residual tokens, channel-major ([3, nby, nbx])
  [.., end)          AC tokens, [3, nb, 63] in zigzag order (DC excluded)
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from jxl_tpu.transforms.dct import zigzag_order

N_CTX = 15  # ACS-map + quant-field + CfL + 3 DC + 3 channels x 3 AC bands
CTX_ACS = 12
CTX_QF = 13
CTX_CFL = 14
CFL_TILE = 4  # chroma-from-luma tile size in 8x8 blocks (32x32 pixels)
# AC band split by zigzag position (1-indexed after DC): 1-3, 4-15, 16-63.
_BAND_EDGES = (4, 16)


@lru_cache(maxsize=None)
def ac_band_table() -> np.ndarray:
    """[63] band index (0/1/2) for zigzag positions 1..63."""
    pos = np.arange(1, 64)
    return np.where(pos < _BAND_EDGES[0], 0, np.where(pos < _BAND_EDGES[1], 1, 2)).astype(
        np.int32
    )


@lru_cache(maxsize=None)
def token_layout(height: int, width: int):
    """Geometry + context ids for an image. Returns a dict of python ints and
    numpy arrays (safe to capture as jit constants)."""
    hp = -(-height // 8) * 8
    wp = -(-width // 8) * 8
    nby, nbx = hp // 8, wp // 8
    nb = nby * nbx
    n_acs = nb
    n_qf = nb
    ty, tx = -(-nby // CFL_TILE), -(-nbx // CFL_TILE)
    n_cfl = 2 * ty * tx
    n_dc = 3 * nb
    n_ac = 3 * nb * 63
    n_tokens = n_acs + n_qf + n_cfl + n_dc + n_ac

    acs_ctx = np.full(n_acs, CTX_ACS, dtype=np.int32)
    qf_ctx = np.full(n_qf, CTX_QF, dtype=np.int32)
    cfl_ctx = np.full(n_cfl, CTX_CFL, dtype=np.int32)
    dc_ctx = np.repeat(np.arange(3, dtype=np.int32), nb)
    band = ac_band_table()  # [63]
    ac_ctx = (
        3 + np.arange(3, dtype=np.int32)[:, None, None] * 3 + band[None, None, :]
    )  # [3, 1, 63]
    ac_ctx = np.broadcast_to(ac_ctx, (3, nb, 63)).reshape(-1).astype(np.int32)
    ctx = np.concatenate([acs_ctx, qf_ctx, cfl_ctx, dc_ctx, ac_ctx])
    zz = zigzag_order(8, 8)  # [64] flat indices, zz[0] == 0 (DC)

    return {
        "hp": hp,
        "wp": wp,
        "nby": nby,
        "nbx": nbx,
        "nb": nb,
        "n_acs": n_acs,
        "n_qf": n_qf,
        "n_cfl": n_cfl,
        "ty": ty,
        "tx": tx,
        "n_dc": n_dc,
        "n_ac": n_ac,
        "n_tokens": n_tokens,
        "ctx": ctx,
        "zigzag": zz,
    }
