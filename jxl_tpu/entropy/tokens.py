"""Hybrid-uint tokenization and vectorized raw-bit packing.

JPEG XL codes integers as a small token (entropy-coded) plus raw mantissa
bits; the reference gets this from libjxl's C++ coder. Here:

- token(v) = v for v < 16, else 12 + floor(log2 v), with nbits = token - 12
  mantissa bits stored raw (v = 2^nbits + mantissa).
- signed values are mapped to unsigned via the zigzag map 2v / -2v-1 first.
- raw bits are packed MSB-first into uint32 words entirely on device:
  a cumulative-sum of bit-lengths gives every symbol's bit offset, then
  MAX_NBITS masked scatter-adds place the bits — no sequential loop, so the
  whole pack/unpack vectorizes on the VPU.

Decode order is two-pass and fully parallel: rANS first yields all tokens,
token -> nbits gives the bit offsets by cumsum, then one vectorized gather
reconstructs the mantissas (no data-dependent control flow under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TOKEN_SPLIT = 16  # values below this are their own token
MAX_NBITS = 24  # supports values up to 2^25 - 1
ALPHABET = TOKEN_SPLIT + (MAX_NBITS - 4) + 1  # tokens 0..36 -> 37 symbols


def zigzag_map(v):
    """Signed int32 -> unsigned: 0,-1,1,-2,2.. -> 0,1,2,3,4.."""
    v = v.astype(jnp.int32)
    return jnp.where(v >= 0, 2 * v, -2 * v - 1).astype(jnp.uint32)


def zigzag_unmap(u):
    u = u.astype(jnp.int32)
    return jnp.where(u % 2 == 0, u // 2, -(u // 2) - 1)


def tokenize(values):
    """uint32 values -> (token int32, nbits int32, mantissa uint32)."""
    v = values.astype(jnp.uint32)
    # floor(log2(v)) for v >= 1; bit_length - 1
    nbits_total = 32 - jax.lax.clz(v).astype(jnp.int32)  # bit length; 0 for v == 0
    big = v >= TOKEN_SPLIT
    exp = jnp.where(big, nbits_total - 1, 0).astype(jnp.int32)
    token = jnp.where(big, 12 + exp, v.astype(jnp.int32))
    nbits = jnp.where(big, exp, 0).astype(jnp.int32)
    mantissa = jnp.where(big, v - (jnp.uint32(1) << exp.astype(jnp.uint32)), 0).astype(jnp.uint32)
    return token, nbits, mantissa


def detokenize(token, mantissa):
    """(token, mantissa) -> uint32 values."""
    token = token.astype(jnp.int32)
    big = token >= TOKEN_SPLIT
    exp = jnp.where(big, token - 12, 0).astype(jnp.uint32)
    return jnp.where(big, (jnp.uint32(1) << exp) + mantissa.astype(jnp.uint32), token.astype(jnp.uint32))


def token_nbits(token):
    """Mantissa bit count implied by a token (decoder side)."""
    token = token.astype(jnp.int32)
    return jnp.where(token >= TOKEN_SPLIT, token - 12, 0)


def pack_bits(nbits, mantissa, total_words: int):
    """Pack per-symbol mantissas (MSB-first) into uint32 words.

    nbits: [N] int32, mantissa: [N] uint32, total_words: static output size
    (use bit_capacity_words(N)). Returns (words [total_words] uint32,
    total_bits int32 scalar).
    """
    nbits = nbits.astype(jnp.int32)
    offsets = jnp.cumsum(nbits) - nbits  # start bit offset per symbol
    total_bits = jnp.sum(nbits)
    acc = jnp.zeros((total_words,), jnp.uint32)
    for b in range(MAX_NBITS):
        mask = b < nbits
        bitpos = offsets + b
        word_idx = jnp.where(mask, bitpos // 32, total_words)
        bit_in_word = (bitpos % 32).astype(jnp.uint32)
        bit = (mantissa >> (nbits - 1 - b).clip(0).astype(jnp.uint32)) & jnp.uint32(1)
        contrib = jnp.where(mask, bit << (jnp.uint32(31) - bit_in_word), 0).astype(jnp.uint32)
        acc = acc.at[word_idx].add(contrib, mode="drop")
    return acc, total_bits


def unpack_bits(nbits, words):
    """Inverse of pack_bits: per-symbol mantissas from the word array."""
    nbits = nbits.astype(jnp.int32)
    offsets = jnp.cumsum(nbits) - nbits
    out = jnp.zeros(nbits.shape, jnp.uint32)
    n_words = words.shape[0]
    for b in range(MAX_NBITS):
        mask = b < nbits
        bitpos = offsets + b
        word_idx = jnp.where(mask, bitpos // 32, 0)
        bit_in_word = (bitpos % 32).astype(jnp.uint32)
        w = words[word_idx]
        bit = (w >> (jnp.uint32(31) - bit_in_word)) & jnp.uint32(1)
        out = out | jnp.where(mask, bit << (nbits - 1 - b).clip(0).astype(jnp.uint32), 0).astype(jnp.uint32)
    return out


def bit_capacity_words(n_symbols: int) -> int:
    """Static uint32 word budget for n symbols' mantissas."""
    return max(1, (n_symbols * MAX_NBITS + 31) // 32)
