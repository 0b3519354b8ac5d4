"""Per-image histogram clustering (libjxl-style "clustered context models").

libjxl clusters per-context ANS histograms before signaling them (a greedy
agglomerative merge that trades payload entropy against header bytes); the
reference consumes this through cjxl (`docker_manager.rs:100-136`). This is
the TPU-native equivalent: a fixed-trip-count greedy merge that runs ON
DEVICE inside the fused encoder jit (no host round-trip — the tunnel costs
~25 ms per sync), producing an EXPANDED [C, A] count matrix whose rows are
identical within a cluster. Downstream quantization then yields identical
freq-table rows, which the host container writer deduplicates into
`n_clusters` signaled tables + a [C] cluster map (container v6).

Merge criterion per step: join the pair (i, j) with the smallest payload
cost increase  dH = H(c_i + c_j) - H(c_i) - H(c_j)  (H = Shannon bits to
code the counts with their own table), and merge only while dH is smaller
than the header bytes the merge saves (sparse-table size model of
`container._pack_freq_tables`: 2 + 3*nnz bytes/table). The loop therefore
strictly reduces the total file-size estimate; contexts with disjoint
alphabets or genuinely different statistics stay separate.

Everything is masked/fixed-shape (fori_loop over C-1 potential merges) so
the pass is jit- and vmap-compatible (the RD-grid encoder vmaps it over
distances).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _entropy_bits(c: jnp.ndarray) -> jnp.ndarray:
    """[..., A] counts -> [...] total bits to code them with an ideal
    dedicated table (n*log2(n) - sum n_s*log2(n_s))."""
    cf = c.astype(jnp.float32)
    n = jnp.sum(cf, axis=-1)
    return n * jnp.log2(jnp.maximum(n, 1.0)) - jnp.sum(
        cf * jnp.log2(jnp.maximum(cf, 1.0)), axis=-1
    )


def cluster_histograms(counts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedily merge context histograms while the merge shrinks the file.

    counts: [C, A] int32 per-context symbol counts.
    Returns (expanded [C, A] int32 — row c holds its CLUSTER's merged
    counts, identical across members — and cmap [C] int32 cluster
    representative ids, for tests/diagnostics).
    """
    C, A = counts.shape
    cf = counts.astype(jnp.float32)
    iota = jnp.arange(C, dtype=jnp.int32)

    def body(_, state):
        c, alive, cmap = state
        h = _entropy_bits(c)  # [C]
        pair = c[:, None, :] + c[None, :, :]  # [C, C, A]
        d_h = _entropy_bits(pair) - h[:, None] - h[None, :]
        # Header bytes saved by writing one merged sparse table instead of
        # two: ~2 + 3*|overlap| (shared symbols are stored once).
        nz_i = c > 0.0
        overlap = jnp.sum(
            (nz_i[:, None, :] & nz_i[None, :, :]).astype(jnp.float32), axis=-1
        )
        saving = 8.0 * (2.0 + 3.0 * overlap)
        valid = (
            alive[:, None]
            & alive[None, :]
            & (iota[:, None] < iota[None, :])
        )
        score = jnp.where(valid, d_h - saving, jnp.inf)
        flat = jnp.argmin(score)
        bi, bj = flat // C, flat % C
        do = score.reshape(-1)[flat] < 0.0
        merged_i = c[bi] + c[bj]
        c = jnp.where(
            do,
            c.at[bi].set(merged_i).at[bj].set(jnp.zeros((A,), jnp.float32)),
            c,
        )
        alive = jnp.where(do, alive.at[bj].set(False), alive)
        cmap = jnp.where(do & (cmap == bj), bi, cmap)
        return c, alive, cmap

    init = (cf, jnp.ones((C,), bool), iota)
    c, _alive, cmap = jax.lax.fori_loop(0, C - 1, body, init)
    expanded = jnp.round(c[cmap]).astype(jnp.int32)
    return expanded, cmap
