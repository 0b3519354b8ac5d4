"""AC-strategy search: variable DCT block sizes, selected densely under jit.

TPU-native counterpart of libjxl's `ProcessRectACS`/`FindBest8x8Transform`/
`TryMergeAcs`/`FindBestFirstLevelDivisionForSquare` (the functions the thesis
patches — SURVEY §3.4): where the C++ walks 64x64 tiles with branchy
per-block recursion, this computes *every* candidate transform for *every*
block as batched matmuls, scores them all at once, and selects by masked
argmin — the dense-then-select pattern SURVEY §7 "hard parts #3" prescribes
for data-dependent strategy choice under jit.

Strategies and their coefficient storage in the per-8x8-block [8, 8] grid:

| id | name     | transform(s)        | storage layout                       |
|----|----------|---------------------|--------------------------------------|
| 0  | DCT      | one 8x8             | coefficients, (0,0) = 0 (DC plane)   |
| 1  | DCT4X4   | four 4x4            | quadrant (qy,qx) at [4qy:, 4qx:];    |
|    |          |                     | sub-DCs Haar-mixed: M=dct2(subDCs),  |
|    |          |                     | M00 == block DC (DC plane), M01/M10/ |
|    |          |                     | M11 stored at the other quadrant DCs |
| 2  | DCT8X4   | two 8rows x 4cols   | halves at cols [0:4], [4:8];         |
|    |          |                     | (s0+s1)/sqrt2 == DC, (s0-s1)/sqrt2   |
|    |          |                     | stored at (0,4)                      |
| 3  | DCT4X8   | two 4rows x 8cols   | mirror of DCT8X4; m1 at (4,0)        |
| 4  | DCT16X16 | one 16x16 over 2x2  | C16 8x8 quadrants in the 4 blocks;   |
|    |          | aligned blocks      | C16[:2,:2] not coded (rebuilt from   |
|    |          |                     | the DC plane via dct2 at decode)     |
| 5  | DCT32X32 | one 32x32 over 4x4  | same scheme, C32[:4,:4] from DC      |

All strategies keep the invariant: the DC-plane entry of every 8x8 block is
its exact pixel mean * 8, so DC prediction/coding is strategy-independent.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from jxl_tpu.strategy.homogeneity import (
    homogeneity_partition,
    homogeneity_similarity_indices,
    hook_b_factor,
)
from jxl_tpu.transforms.dct import dct2d, idct2d
from jxl_tpu.transforms.quant import ac_steps_t

ACS_DCT = 0
ACS_DCT4X4 = 1
ACS_DCT8X4 = 2
ACS_DCT4X8 = 3
ACS_DCT16X16 = 4
ACS_DCT32X32 = 5
N_STRATEGIES = 6

SQRT2 = float(np.sqrt(2.0))

# Entropy multipliers (cost handicap per strategy; <1 favors, >1 penalizes).
# Splits must clearly win to be chosen; merges are slightly favored on
# smooth content — mirroring the role of libjxl's per-transform entropy_mul.
ENTROPY_MUL = {
    ACS_DCT: 1.0,
    ACS_DCT4X4: 1.12,
    ACS_DCT8X4: 1.08,
    ACS_DCT4X8: 1.08,
    ACS_DCT16X16: 0.99,
    ACS_DCT32X32: 0.98,
}

# Rate proxy constants: bits(q) ~ 2*log2(1+|q|) + NONZERO_BITS per nonzero.
NONZERO_BITS = 1.1


def step_grid_variants(distance) -> jnp.ndarray:
    """[n_variants, 3, 8, 8] quant-step grids on the storage layout.

    Variants: 0=DCT, 1=DCT4X4, 2=DCT8X4, 3=DCT4X8,
    4..7   = DCT16X16 quadrant (qy, qx) in row-major order,
    8..23  = DCT32X32 sub-position (qy, qx) row-major.

    No per-size step scaling: all transforms are orthonormal and cover the
    same number of coefficients per pixel area, so equal steps give equal
    quantization MSE (Parseval) — candidates then compete purely on rate
    (energy compaction). The CSF frequency weight is indexed by normalized
    frequency u/n, which is cycles/pixel, hence directly comparable across
    sizes.

    `distance` may be a traced scalar: the tables are tiny (24*3*64) and
    recomputing them per call keeps the whole codec distance-polymorphic
    under one jit compilation.
    """
    u = np.arange(8)
    parts = []

    s8 = ac_steps_t(distance, 8, 8)
    parts.append(s8[None])

    s4 = ac_steps_t(distance, 4, 4)
    parts.append(s4[:, u[:, None] % 4, u[None, :] % 4][None])

    s84 = ac_steps_t(distance, 8, 4)
    parts.append(s84[:, u[:, None], u[None, :] % 4][None])

    s48 = ac_steps_t(distance, 4, 8)
    parts.append(s48[:, u[:, None] % 4, u[None, :]][None])

    s16 = ac_steps_t(distance, 16, 16)
    for qy in range(2):
        for qx in range(2):
            parts.append(s16[:, qy * 8 + u[:, None], qx * 8 + u[None, :]][None])

    s32 = ac_steps_t(distance, 32, 32)
    for qy in range(4):
        for qx in range(4):
            parts.append(s32[:, qy * 8 + u[:, None], qx * 8 + u[None, :]][None])
    return jnp.concatenate(parts, axis=0)


def variant_index_map(acs: jnp.ndarray) -> jnp.ndarray:
    """Per-block index into step_grid_variants from the acs map [nby, nbx]."""
    nby, nbx = acs.shape
    by = jnp.arange(nby)[:, None]
    bx = jnp.arange(nbx)[None, :]
    idx16 = 4 + (by % 2) * 2 + (bx % 2)
    idx32 = 8 + (by % 4) * 4 + (bx % 4)
    out = acs  # ids 0..3 == variant ids 0..3
    out = jnp.where(acs == ACS_DCT16X16, idx16, out)
    out = jnp.where(acs == ACS_DCT32X32, idx32, out)
    return out


def _rate_bits(q: jnp.ndarray, axes) -> jnp.ndarray:
    """Rate proxy in bits over the given axes (q: int32 quantized coeffs)."""
    aq = jnp.abs(q).astype(jnp.float32)
    return jnp.sum(2.0 * jnp.log2(1.0 + aq) + NONZERO_BITS * (aq > 0), axis=axes)


def _mask_dc_slot(storage: jnp.ndarray) -> jnp.ndarray:
    """Zero the (0,0) slot (DC lives in the DC plane for every strategy)."""
    return storage.at[..., 0, 0].set(0.0)


def candidates_sub8(blocks: jnp.ndarray) -> dict:
    """Per-block coefficient storages for strategies 0..3.

    blocks: [3, nby, nbx, 8, 8] pixel blocks (XYB planes).
    Returns dict id -> storage [3, nby, nbx, 8, 8] float32 (DC slot zeroed,
    Haar-mixed sub-DC slots filled per the layout table).
    """
    c8 = dct2d(blocks)

    # DCT4X4: quadrants
    q = blocks.reshape(*blocks.shape[:-2], 2, 4, 2, 4).transpose(0, 1, 2, 3, 5, 4, 6)
    c44 = dct2d(q)  # [3, nby, nbx, 2, 2, 4, 4]
    subdc = c44[..., 0, 0]  # [3, nby, nbx, 2, 2]
    m = dct2d(subdc)  # orthonormal 2x2 DCT of the sub-DC matrix
    st44 = c44.transpose(0, 1, 2, 3, 5, 4, 6).reshape(*blocks.shape[:-2], 8, 8)
    st44 = st44.at[..., 0, 0].set(0.0)  # M00 == DC -> DC plane
    st44 = st44.at[..., 0, 4].set(m[..., 0, 1])
    st44 = st44.at[..., 4, 0].set(m[..., 1, 0])
    st44 = st44.at[..., 4, 4].set(m[..., 1, 1])

    # DCT8X4: left/right halves (8 rows x 4 cols each)
    halves = blocks.reshape(*blocks.shape[:-2], 8, 2, 4).transpose(0, 1, 2, 4, 3, 5)
    c84 = dct2d(halves)  # [3, nby, nbx, 2, 8, 4]
    s0, s1 = c84[..., 0, 0, 0], c84[..., 1, 0, 0]
    st84 = c84.transpose(0, 1, 2, 4, 3, 5).reshape(*blocks.shape[:-2], 8, 8)
    st84 = st84.at[..., 0, 0].set(0.0)  # (s0+s1)/sqrt2 == DC
    st84 = st84.at[..., 0, 4].set((s0 - s1) / SQRT2)

    # DCT4X8: top/bottom halves (4 rows x 8 cols each)
    halvesv = blocks.reshape(*blocks.shape[:-2], 2, 4, 8)
    c48 = dct2d(halvesv)  # [3, nby, nbx, 2, 4, 8]
    t0, t1 = c48[..., 0, 0, 0], c48[..., 1, 0, 0]
    st48 = c48.reshape(*blocks.shape[:-2], 8, 8)
    st48 = st48.at[..., 0, 0].set(0.0)
    st48 = st48.at[..., 4, 0].set((t0 - t1) / SQRT2)

    return {
        ACS_DCT: _mask_dc_slot(c8),
        ACS_DCT4X4: st44,
        ACS_DCT8X4: st84,
        ACS_DCT4X8: st48,
    }


def candidates_merged(planes: jnp.ndarray, n: int) -> jnp.ndarray:
    """n x n DCT (n in {16, 32}) over aligned groups.

    planes: [3, Hp, Wp] with Hp, Wp multiples of 8. Returns storage slots
    [3, gby, gbx, n//8, n//8, 8, 8] (low-frequency (n/8)x(n/8) corner zeroed)
    for the floor-aligned full groups.
    """
    k = n // 8
    h, w = planes.shape[-2:]
    gby, gbx = h // n, w // n
    region = planes[:, : gby * n, : gbx * n]
    tiles = region.reshape(3, gby, n, gbx, n).transpose(0, 1, 3, 2, 4)
    c = dct2d(tiles)  # [3, gby, gbx, n, n]
    c = c.at[..., :k, :k].set(0.0)  # lowfreq rebuilt from DC plane at decode
    return c.reshape(3, gby, gbx, k, 8, k, 8).transpose(0, 1, 2, 3, 5, 4, 6)


def reassemble_merged(slots: jnp.ndarray, dc_block: jnp.ndarray) -> jnp.ndarray:
    """Inverse of candidates_merged + lowfreq injection.

    slots: [3, gby, gbx, k, k, 8, 8] dequantized storages,
    dc_block: [3, gby, gbx, k, k] dequantized DC-plane values of the group.
    Returns pixel tiles [3, gby, gbx, n, n].
    """
    k = slots.shape[3]
    n = k * 8
    c = slots.transpose(0, 1, 2, 3, 5, 4, 6).reshape(*slots.shape[:3], n, n)
    llf = dct2d(dc_block)  # [3, gby, gbx, k, k]
    c = c.at[..., :k, :k].set(llf)
    return idct2d(c)


def group_min_multiplier(qf_mul: jnp.ndarray, k: int) -> jnp.ndarray:
    """Min-pool the per-block multiplier over aligned k x k groups and
    broadcast back — the deterministic rule (shared by encoder and decoder)
    for the multiplier of merged transforms: conservative minimum."""
    nby, nbx = qf_mul.shape
    gby, gbx = nby // k, nbx // k
    if gby == 0 or gbx == 0:
        return qf_mul
    pooled = qf_mul[: gby * k, : gbx * k].reshape(gby, k, gbx, k).min(axis=(1, 3))
    up = jnp.repeat(jnp.repeat(pooled, k, axis=0), k, axis=1)
    return jnp.pad(up, ((0, nby - gby * k), (0, nbx - gbx * k)), constant_values=1.0)


def search_acs(
    blocks: jnp.ndarray,
    planes: jnp.ndarray,
    distance: float,
    *,
    effort: int,
    hook_a: bool,
    hook_b: bool,
    qf_mul: jnp.ndarray | None = None,
):
    """Full AC-strategy search. Returns (acs [nby, nbx] int32,
    storage [3, nby, nbx, 8, 8] float32 of the selected strategies,
    qsteps [3, nby, nbx, 8, 8] step field).

    Hooks implement the thesis variants (SURVEY §2.4):
    - hook A: where the 8x8-level argmin picked plain DCT, override with
      HomogeneityPartition (homogeneity-partitioning.diff:272-277).
    - hook B: scale every candidate cost by 0.8*avg(r_h,r_v,r_d) of the
      candidate's top-left 8x8 block (factored-entropy.diff:248-254); at the
      8x8 level the factor is common to all candidates so — exactly like the
      C++ — it bites on merge decisions.
    """
    nby, nbx = blocks.shape[1], blocks.shape[2]
    variants = step_grid_variants(distance)
    if qf_mul is None:
        qf_mul = jnp.ones((nby, nbx), jnp.float32)

    if hook_a or hook_b:
        r_h, r_v, r_d = homogeneity_similarity_indices(planes, distance)
    if hook_b:
        bfac = hook_b_factor(r_h, r_v, r_d)  # [nby, nbx]
    else:
        bfac = None

    sub8 = candidates_sub8(blocks)
    costs = {}
    qcands = {}
    for sid, storage in sub8.items():
        steps = variants[sid][:, None, None] * qf_mul[None, :, :, None, None]
        qc = jnp.round(storage / steps).astype(jnp.int32)
        qcands[sid] = qc
        c = _rate_bits(qc, axes=(0, -2, -1)) * ENTROPY_MUL[sid]  # [nby, nbx]
        if hook_b:
            c = c * 0.8 * bfac
        costs[sid] = c

    if effort >= 4:
        stacked = jnp.stack([costs[s] for s in range(4)])
        best8 = jnp.argmin(stacked, axis=0).astype(jnp.int32)
    else:
        best8 = jnp.zeros((nby, nbx), jnp.int32)

    # Merge comparisons use the PRE-override entropy, like the C++: in
    # FindBest8x8Transform *entropy_out is stored before HomogeneityPartition
    # rewrites best_tx (homogeneity-partitioning.diff:271-277).
    cost_sel = jnp.take_along_axis(
        jnp.stack([costs[s] for s in range(4)]), best8[None], axis=0
    )[0]

    if hook_a:
        part = homogeneity_partition(r_h, r_v, r_d, distance)
        best8 = jnp.where(best8 == ACS_DCT, part, best8)

    acs = best8

    def try_merge(acs, cost_sel, n, sid):
        k = n // 8
        gby, gbx = nby // k, nbx // k
        if gby == 0 or gbx == 0:
            return acs, cost_sel, None, None
        slots = candidates_merged(planes, n)  # [3, gby, gbx, k, k, 8, 8]
        # per-slot steps: variant ids 4.. / 8.. laid out row-major over (qy,qx)
        base = 4 if sid == ACS_DCT16X16 else 8
        step_slots = variants[base : base + k * k].reshape(k, k, 3, 8, 8)
        step_slots = step_slots.transpose(2, 0, 1, 3, 4)[:, None, None]  # [3,1,1,k,k,8,8]
        gmul = group_min_multiplier(qf_mul, k)[: gby * k : k, : gbx * k : k]
        qslots = jnp.round(
            slots / (step_slots * gmul[None, :, :, None, None, None, None])
        ).astype(jnp.int32)
        cost_m = _rate_bits(qslots, axes=(0, -4, -3, -2, -1)) * ENTROPY_MUL[sid]
        if hook_b:
            bf_g = bfac[: gby * k : k, : gbx * k : k]  # top-left block factor
            cost_m = cost_m * 0.8 * bf_g
        # current cost of the group = sum of selected per-block costs;
        # epsilon breaks zero-cost ties toward the merge (bigger transforms
        # win on content they represent equally cheaply, e.g. flat areas)
        cur = cost_sel[: gby * k, : gbx * k].reshape(gby, k, gbx, k).sum(axis=(1, 3))
        merge = cost_m < cur + 1e-3  # [gby, gbx]
        merge_blocks = jnp.repeat(jnp.repeat(merge, k, axis=0), k, axis=1)
        pad_y, pad_x = nby - gby * k, nbx - gbx * k
        merge_full = jnp.pad(merge_blocks, ((0, pad_y), (0, pad_x)))
        acs = jnp.where(merge_full, sid, acs)
        new_cost = jnp.repeat(jnp.repeat(cost_m / (k * k), k, axis=0), k, axis=1)
        cost_sel = jnp.where(merge_full, jnp.pad(new_cost, ((0, pad_y), (0, pad_x))), cost_sel)
        return acs, cost_sel, slots, merge

    r16 = m16 = r32 = m32 = None
    if effort >= 6:
        acs, cost_sel, r16, m16 = try_merge(acs, cost_sel, 16, ACS_DCT16X16)
    if effort >= 7:
        acs, cost_sel, r32, m32 = try_merge(acs, cost_sel, 32, ACS_DCT32X32)

    # Assemble the selected RAW coefficient storage by per-block masked
    # select (wheres, not take_along_axis: gathers are slow on TPU). The
    # caller quantizes — identically to the candidate costs' quantization —
    # after optionally applying chroma-from-luma on the raw values.
    sel = jnp.clip(acs, 0, 3)[None, :, :, None, None]
    raw = sub8[0]
    for s in range(1, 4):
        raw = jnp.where(sel == s, sub8[s], raw)

    def scatter_merged(storage, slots, merge, n):
        k = n // 8
        gby, gbx = merge.shape
        mb = jnp.repeat(jnp.repeat(merge, k, axis=0), k, axis=1)
        mb = jnp.pad(mb, ((0, nby - gby * k), (0, nbx - gbx * k)))
        # slots [3, gby, gbx, k, k, 8, 8] -> block grid [3, gby*k, gbx*k, 8, 8]
        qs = slots.transpose(0, 1, 3, 2, 4, 5, 6).reshape(3, gby * k, gbx * k, 8, 8)
        qs = jnp.pad(qs, ((0, 0), (0, nby - gby * k), (0, nbx - gbx * k), (0, 0), (0, 0)))
        return jnp.where(mb[None, :, :, None, None], qs, storage)

    if r16 is not None:
        raw = scatter_merged(raw, r16, jnp.logical_and(m16, (acs[::2, ::2] == ACS_DCT16X16)[: m16.shape[0], : m16.shape[1]]), 16)
    if r32 is not None:
        raw = scatter_merged(raw, r32, m32, 32)

    qsteps = steps_field(variants, acs, effective_multiplier(qf_mul, acs))
    return acs, raw, qsteps


def steps_field(variants: jnp.ndarray, acs: jnp.ndarray, eff_mul: jnp.ndarray) -> jnp.ndarray:
    """[3, nby, nbx, 8, 8] per-block step field via a one-hot matmul (not a
    gather — see transforms.dct.select_rows for why)."""
    from jxl_tpu.transforms.dct import select_rows

    nby, nbx = acs.shape
    vidx = variant_index_map(acs)
    sel = select_rows(vidx.reshape(-1), variants.reshape(variants.shape[0], -1))
    field = sel.reshape(nby, nbx, 3, 8, 8).transpose(2, 0, 1, 3, 4)
    return field * eff_mul[None, :, :, None, None]


def effective_multiplier(qf_mul: jnp.ndarray, acs: jnp.ndarray) -> jnp.ndarray:
    """Per-block step multiplier given the quant field and strategy map:
    merged transforms take the group-minimum (same rule on both codec sides)."""
    eff = qf_mul
    eff = jnp.where(acs == ACS_DCT16X16, group_min_multiplier(qf_mul, 2), eff)
    eff = jnp.where(acs == ACS_DCT32X32, group_min_multiplier(qf_mul, 4), eff)
    return eff
