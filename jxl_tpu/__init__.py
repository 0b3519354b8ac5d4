"""jxl_tpu — a TPU-native JPEG XL-style lossy image codec + benchmarking framework.

Re-implements, TPU-first (JAX/XLA/Pallas), the capabilities of the reference
`pscoro/JPEG-XL-Lossy-Image-Compression-Thesis`:

- a lossy VarDCT encode/decode engine (reference: external libjxl C++,
  invoked via Docker at `benchmark-jpegxl/src/docker_manager.rs:100`),
- the thesis's homogeneity AC-strategy proposals (reference:
  `proposals/*.diff` against `lib/jxl/enc_ac_strategy.cc`) as config flags,
- the quality-metrics suite (reference: `benchmark-jpegxl/src/metrics.rs`),
- the sweep + A/B comparison harness (reference:
  `benchmark-jpegxl/src/benchmark.rs`).

Unlike the reference, codec variants are configuration of one JAX engine, so
there is no checkout/patch/rebuild cycle; parallelism is `jax.sharding` over
device meshes instead of Docker-container worker pools.
"""

__version__ = "0.1.0"

from jxl_tpu.utils.jax_setup import configure_jax as _configure_jax

_configure_jax()

from jxl_tpu.codec.config import CodecConfig, Strategy  # noqa: F401
