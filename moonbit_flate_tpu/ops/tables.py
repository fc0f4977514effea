"""Wire-format lookup tables as device constants for the XLA pipelines.

Thin jnp mirrors of moonbit_flate_tpu/formats/constants.py (the single
source of truth); gathered into VMEM-resident constants inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import constants as C

LENGTH_CODES = jnp.asarray(C.LENGTH_CODES, jnp.int32)          # [256] xlen -> code idx
LENGTH_BASE = jnp.asarray(C.LENGTH_BASE, jnp.int32)            # [29] code -> base len
LENGTH_EXTRA_BITS = jnp.asarray(C.LENGTH_EXTRA_BITS, jnp.int32)
OFFSET_CODES = jnp.asarray(C.OFFSET_CODES, jnp.int32)          # [256]
OFFSET_BASE = jnp.asarray(C.OFFSET_BASE, jnp.int32)            # [30] code -> base dist
OFFSET_EXTRA_BITS = jnp.asarray(C.OFFSET_EXTRA_BITS, jnp.int32)
CODEGEN_ORDER = jnp.asarray(C.CODEGEN_ORDER, jnp.int32)        # [19]


def _floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(x)) for x in [1, 2^24) via the f32 exponent field."""
    f = x.astype(jnp.float32)
    return ((jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) & 0xFF) - 127


def offset_code(xoffset: jnp.ndarray) -> jnp.ndarray:
    """Distance code for xoffset = dist - 1 (vectorized, token.mbt:112-123).

    Closed form (no table gathers — cheaper than 1M-element gathers on
    TPU): codes 0..3 are the offsets themselves; beyond that, each code
    pair covers one power-of-two octave split by the next bit.
    """
    k = _floor_log2(jnp.maximum(xoffset, 1))
    code = 2 * k + ((xoffset >> jnp.maximum(k - 1, 0)) & 1)
    return jnp.where(xoffset < 4, xoffset, code)


def length_code(xlen: jnp.ndarray) -> jnp.ndarray:
    """Length code for xlen = len - 3, closed form of LENGTH_CODES[256]
    (token.mbt:30-44): codes 0..7 are xlen itself; each octave k >= 3
    splits into 4 codes of 2^(k-2) lengths; xlen 255 (len 258) is its
    own code 28.
    """
    k = _floor_log2(jnp.maximum(xlen, 1))
    code = 4 * k - 8 + (xlen >> jnp.maximum(k - 2, 0))
    return jnp.where(xlen < 8, xlen, jnp.where(xlen == 255, 28, code))


def length_base_extra(lc: jnp.ndarray):
    """(base_len, extra_bits) for a length code, closed form of
    LENGTH_BASE/LENGTH_EXTRA_BITS (huffman-bit-writer.mbt:49-62)."""
    eb = jnp.where(lc < 8, 0, (lc - 4) >> 2)
    base = jnp.where(lc < 8, 3 + lc,
                     (jnp.int32(1) << (eb + 2)) + 3 + ((lc & 3) << eb))
    base = jnp.where(lc >= 28, 258, base)
    eb = jnp.where(lc >= 28, 0, eb)
    return base, eb


def offset_base_extra(dc: jnp.ndarray):
    """(base_dist, extra_bits) for a distance code, closed form of
    OFFSET_BASE/OFFSET_EXTRA_BITS (huffman-bit-writer.mbt:64-78)."""
    eb = jnp.where(dc < 4, 0, (dc - 2) >> 1)
    base = jnp.where(dc < 4, dc + 1,
                     (jnp.int32(1) << (eb + 1)) + 1 + ((dc & 1) << eb))
    return base, eb
