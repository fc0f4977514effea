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
