"""Pallas TPU kernel: fused 2D DCT + quantization over a batch of 8x8 blocks.

The encoder's transform stage (transforms/dct.py + quantize) is two einsums
and an elementwise divide/round; XLA already fuses these well, but routing
the batch through one Pallas kernel keeps the block tile resident in VMEM
across DCT -> quantize (no HBM round-trip between stages) and pins the
matmuls to the MXU with fp32 accumulation. Used by the encoder when
JXL_TPU_PALLAS=1; always available for benchmarking either path.

Layout: blocks are processed as [CHUNK, 64] panels — an (8*k, 128)-friendly
shape — with the 2D DCT expressed as one [64, 64] matmul: the Kronecker
product D (x) D applied to vectorized blocks. One matmul on the MXU replaces
the two small einsums, and the quant divide fuses behind it in VMEM.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jxl_tpu.transforms.dct import _dct_matrix_np

CHUNK = 512  # blocks per kernel instance ([512, 64] panels in VMEM)


@lru_cache(maxsize=None)
def _dct_kron_np() -> np.ndarray:
    """[64, 64] operator: vec(D @ X @ D.T) = (D kron D) @ vec(X)."""
    d = _dct_matrix_np(8).astype(np.float64)
    return np.kron(d, d).astype(np.float32)


def _kernel(x_ref, inv_steps_ref, kron_ref, out_ref):
    x = x_ref[:]  # [CHUNK, 64] vectorized blocks
    coef = jax.lax.dot_general(
        x,
        kron_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # bf16 MXU default is too coarse
    )  # [CHUNK, 64] = x @ kron.T  (out[b, uv] = sum_jk kron[uv, jk] x[b, jk])
    out_ref[:] = jnp.round(coef * inv_steps_ref[:]).astype(jnp.int32)


@partial(jax.jit, static_argnames=())
def dct_quantize_pallas(blocks: jnp.ndarray, steps: jnp.ndarray) -> jnp.ndarray:
    """blocks, steps: [NB, 8, 8] -> quantized coefficients [NB, 8, 8] int32.

    NB is padded to a CHUNK multiple internally.
    """
    nb = blocks.shape[0]
    nb_pad = -(-nb // CHUNK) * CHUNK
    x = jnp.pad(blocks.reshape(nb, 64), ((0, nb_pad - nb), (0, 0)))
    inv_steps = jnp.pad(
        1.0 / steps.reshape(nb, 64), ((0, nb_pad - nb), (0, 0)), constant_values=1.0
    )
    kron = jnp.asarray(_dct_kron_np())

    out = pl.pallas_call(
        _kernel,
        grid=(nb_pad // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb_pad, 64), jnp.int32),
    )(x, inv_steps, kron)
    return out[:nb].reshape(nb, 8, 8)


def dct_quantize_reference(blocks: jnp.ndarray, steps: jnp.ndarray) -> jnp.ndarray:
    """XLA reference path (einsum DCT + divide/round), for equivalence tests
    and A/B benchmarking against the Pallas kernel."""
    from jxl_tpu.transforms.dct import dct2d

    return jnp.round(dct2d(blocks) / steps).astype(jnp.int32)
