"""Codec configuration.

Collapses the reference's codec-variant machinery — git checkout + patch +
full C++ rebuild per A/B arm (`docker_manager.rs:303-381`, invoked from the
dispatch loop at `benchmark.rs:452-484`) — into one enum field: the thesis's
three proposal diffs (`proposals/*.diff`) become selectable strategies of a
single engine, matching the activation matrix in SURVEY §2.4:

| Strategy                      | Hook A (partition override) | Hook B (entropy factor) |
|-------------------------------|-----------------------------|-------------------------|
| BASELINE                      | off                         | off                     |
| HOMOGENEITY_PARTITIONING      | on                          | off                     |
| HOMOGENEITY_FACTORED_ENTROPY  | off                         | on                      |
| COMBINED                      | on                          | on                      |
"""

from __future__ import annotations

import enum
from dataclasses import dataclass


class Strategy(enum.Enum):
    BASELINE = 0
    HOMOGENEITY_PARTITIONING = 1
    HOMOGENEITY_FACTORED_ENTROPY = 2
    COMBINED = 3

    @property
    def hook_a(self) -> bool:
        """Override plain-DCT winners via HomogeneityPartition
        (homogeneity-partitioning.diff:272-277)."""
        return self in (Strategy.HOMOGENEITY_PARTITIONING, Strategy.COMBINED)

    @property
    def hook_b(self) -> bool:
        """Scale RD cost by 0.8 * avg(r_h, r_v, r_d) inside entropy estimation
        (homogeneity-factored-entropy.diff:248-254)."""
        return self in (Strategy.HOMOGENEITY_FACTORED_ENTROPY, Strategy.COMBINED)


@dataclass(frozen=True)
class CodecConfig:
    """Static compile-time codec parameters (hashable: used as jit static arg)."""

    distance: float = 1.0  # butteraugli-target-style quality knob (cjxl --distance)
    effort: int = 7  # cjxl --effort analog: gates AC-strategy search depth
    strategy: Strategy = Strategy.BASELINE
    lanes: int = 256  # interleaved rANS streams
    epf: bool = True  # decode-side edge-preserving filter (signaled in header)

    # effort >= 4 enables the variable-block-size AC-strategy search;
    # effort < 4 is fixed 8x8 (fast path).
    @property
    def use_acs(self) -> bool:
        return self.effort >= 4

    # effort >= 6 additionally searches 16x16 and 32x32 merges.
    @property
    def acs_large_blocks(self) -> bool:
        return self.effort >= 6
