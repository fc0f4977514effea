"""Wire-format lookup tables as device constants for the XLA pipelines.

Thin jnp mirrors of moonbit_flate_tpu/formats/constants.py (the single
source of truth); gathered into VMEM-resident constants inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..formats import constants as C

LENGTH_CODES = jnp.asarray(C.LENGTH_CODES, jnp.int32)          # [256] xlen -> code idx
LENGTH_BASE = jnp.asarray(C.LENGTH_BASE, jnp.int32)            # [29] code -> base len
LENGTH_EXTRA_BITS = jnp.asarray(C.LENGTH_EXTRA_BITS, jnp.int32)
OFFSET_CODES = jnp.asarray(C.OFFSET_CODES, jnp.int32)          # [256]
OFFSET_BASE = jnp.asarray(C.OFFSET_BASE, jnp.int32)            # [30] code -> base dist
OFFSET_EXTRA_BITS = jnp.asarray(C.OFFSET_EXTRA_BITS, jnp.int32)
CODEGEN_ORDER = jnp.asarray(C.CODEGEN_ORDER, jnp.int32)        # [19]


def offset_code(xoffset: jnp.ndarray) -> jnp.ndarray:
    """Distance code for xoffset = dist - 1 (vectorized, token.mbt:112-123)."""
    small = xoffset < 256
    mid = xoffset < (256 << 7)
    return jnp.where(
        small,
        OFFSET_CODES[jnp.clip(xoffset, 0, 255)],
        jnp.where(
            mid,
            OFFSET_CODES[jnp.clip(xoffset >> 7, 0, 255)] + 14,
            OFFSET_CODES[jnp.clip(xoffset >> 14, 0, 255)] + 28,
        ),
    )
