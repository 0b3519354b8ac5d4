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
  [.., end)          AC tokens, [3, 63, nb]: zigzag-position-major so each
                     context forms one long contiguous run (DC excluded)

The z-major AC order makes the context id sequence a small list of long
RUNS (15 of them). `padded_layout` additionally pads every run to a
multiple of the rANS lane count K, so that each K-token scan step has a
SINGLE static context: the decoder then streams one (freq, cum) table row
per step instead of doing a per-token table gather — the key property the
Pallas rANS kernel (entropy/pallas_rans.py) relies on.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from jxl_tpu.transforms.dct import zigzag_order

# AC band split by zigzag position (1-indexed after DC): dyadic bands
# 1, 2-3, 4-7, 8-15, 16-31, 32-63. Finer banding sharpens the per-context
# histograms (late bands are overwhelmingly zero) at negligible header and
# padding cost — the grouped entropy layer is context-count-agnostic.
_BAND_EDGES = (2, 4, 8, 16, 32)
N_BANDS = len(_BAND_EDGES) + 1
N_CTX = 3 + 3 * N_BANDS + 3  # 3 DC + 3 channels x bands + ACS/QF/CfL
CTX_ACS = 3 + 3 * N_BANDS
CTX_QF = CTX_ACS + 1
CTX_CFL = CTX_ACS + 2
CFL_TILE = 4  # chroma-from-luma tile size in 8x8 blocks (32x32 pixels)


@lru_cache(maxsize=None)
def ac_band_table() -> np.ndarray:
    """[63] band index for zigzag positions 1..63."""
    pos = np.arange(1, 64)
    band = np.zeros(63, np.int32)
    for e in _BAND_EDGES:
        band += (pos >= e).astype(np.int32)
    return band


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

    band = ac_band_table()  # [63] band per zigzag position, z-major runs
    # runs: (ctx, length) in stream order; AC bands are contiguous in the
    # z-major layout: per channel, 3*nb + 12*nb + 48*nb tokens.
    runs = [(CTX_ACS, n_acs), (CTX_QF, n_qf), (CTX_CFL, n_cfl)]
    runs += [(c, nb) for c in range(3)]
    for c in range(3):
        for b in range(N_BANDS):
            runs.append((3 + c * N_BANDS + b, int(np.sum(band == b)) * nb))
    ctx = np.concatenate(
        [np.full(n, r, dtype=np.int32) for r, n in runs]
    )
    zz = zigzag_order(8, 8)  # [64] flat indices, zz[0] == 0 (DC)

    return {
        "runs": runs,
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


def _pad_runs(runs, lanes: int):
    """Common span/step-context builder: pad every (ctx, n) run to a
    multiple of `lanes` so each K-token scan step has a single context."""
    spans = []
    dst = 0
    step_ctx = []
    for c, n in runs:
        n_pad = -(-n // lanes) * lanes
        spans.append((c, dst, n, n_pad))
        step_ctx += [c] * (n_pad // lanes)
        dst += n_pad
    return spans, dst, np.asarray(step_ctx, dtype=np.int32)


@lru_cache(maxsize=None)
def lossless_layout(height: int, width: int, lanes: int):
    """Token layout for the lossless modular mode: three full-resolution
    planes (Y, Co, Cg residuals), one context per channel."""
    n = height * width
    runs = [(c, n) for c in range(3)]
    spans, dst, step_ctx = _pad_runs(runs, lanes)
    return {
        "runs": runs,
        "spans": spans,
        "n_tokens": 3 * n,
        "n_padded": dst,
        "T": dst // lanes,
        "step_ctx": step_ctx,
        "ctx": np.repeat(np.arange(3, dtype=np.int32), n),
    }


@lru_cache(maxsize=None)
def padded_layout(height: int, width: int, lanes: int):
    """K-padded token layout for the grouped rANS coder.

    Every context run is padded to a multiple of `lanes` with value-0
    tokens (coded like any other symbol — sub-0.5%% size cost), so each
    K-token scan step carries exactly ONE context. Returns:
      n_padded      total padded tokens (= T * lanes)
      T             scan steps
      step_ctx      [T] int32 context id per step
      ctx_padded    [n_padded] int32 per-token context ids
      spans         list of (ctx, dst_start, n_real, n_run_padded) for
                    scattering real values into the padded stream and
                    slicing them back out
    """
    base = token_layout(height, width)
    spans, dst, step_ctx = _pad_runs(base["runs"], lanes)
    out = dict(base)
    out["spans"] = spans
    out["n_padded"] = dst
    out["T"] = dst // lanes
    out["step_ctx"] = step_ctx
    out["ctx_padded"] = np.repeat(step_ctx, lanes)
    return out
