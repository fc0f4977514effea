"""Bitstream assembly without scatters: hierarchical dense merge + a
tiny Pallas placement kernel.

The DEFLATE bitstream is a concatenation of ~2M variable-width units
(1-28 bits).  The natural formulation — prefix-sum the widths, scatter
each unit's two word contributions — costs ~40 ms per MB on TPU because
XLA lowers scatter to a serial scalar loop.  This module replaces it
with an all-vector pipeline (SURVEY §7 "hard part #1"):

Phase A (XLA, dense): each unit starts as a 2-word buffer already
aligned to its absolute bit offset (known upfront from one cumsum).
Units merge pairwise 8 times — merging two buffers is a word-granular
OR after shifting the odd buffer by ``d = F_odd - F_even`` words, done
with log2(K) *static* shifts selected by d's binary digits (pure VPU
work, no gathers).  After 8 levels, 256 units = one entity of <= 225
words.  A final variable shift by (first_word mod 128) aligns every
entity to 128-word row boundaries.

Phase B (Pallas): entities stream through VMEM; a sequential scalar
loop ORs each [ROWS, 128] entity window into the output at its row —
~8K iterations of one vector OR each, instead of 2M serial scatter
elements.

Monotone-offset invariant: unit j+2^l starts at most 28*2^l bits after
unit j, so the pairwise shift d at level l is bounded by K_l words —
including the zero-width tail padding, whose offsets continue the
sequence.  Bits of distinct units never overlap, so OR == ADD.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEVELS = 8                      # 2^8 = 256 units per entity
UNIT_BITS = 28                  # max width of one unit
ROWS = (UNIT_BITS * (1 << LEVELS) - 1) // 32 // 128 + 2   # 3 rows of 128
_CHUNK_E = 512                  # entities per Pallas grid step


def _k_words(level: int) -> int:
    """Word capacity of a level-`level` entity buffer (incl. straddle)."""
    return (UNIT_BITS * (1 << level) - 1) // 32 + 2


def _merge_levels(values: jnp.ndarray, widths: jnp.ndarray):
    """Phase A: units -> row-aligned entities.

    Returns (ents [M, ROWS, 128] u32, rows [M] i32, total_bits i32).
    """
    NU = values.shape[0]
    NUP = -(-NU // (1 << LEVELS)) * (1 << LEVELS)
    widths = widths.astype(jnp.uint32)
    v = values.astype(jnp.uint32) & ((jnp.uint32(1) << widths) - jnp.uint32(1))
    csum = jnp.cumsum(widths)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.uint32), csum[:-1]])
    total_bits = csum[-1].astype(jnp.int32)

    # level-0: every unit as a 2-word buffer at its absolute alignment
    sh = offsets & jnp.uint32(31)
    lo = v << sh
    hi = (v >> jnp.uint32(1)) >> (jnp.uint32(31) - sh)
    pad = NUP - NU
    cur = jnp.stack([lo, hi], axis=1)                      # [NU, 2]
    F = (offsets >> 5).astype(jnp.int32)                   # first word
    if pad:
        cur = jnp.concatenate([cur, jnp.zeros((pad, 2), jnp.uint32)])
        F = jnp.concatenate(
            [F, jnp.full(pad, (csum[-1] >> 5).astype(jnp.int32), jnp.int32)]
        )

    for level in range(LEVELS):
        K = cur.shape[1]
        K_next = _k_words(level + 1)
        even, odd = cur[0::2], cur[1::2]
        Fe, Fo = F[0::2], F[1::2]
        d = Fo - Fe                                        # 0 .. K_l
        grow = K_next - K
        even = jnp.pad(even, ((0, 0), (0, grow)))
        odd = jnp.pad(odd, ((0, 0), (0, grow)))
        # d <= 28*2^level // 32 + 1 == K - 1, so (K-1).bit_length() digits
        nbits = max(1, (K - 1).bit_length())
        for b in range(nbits):
            s = 1 << b
            shifted = jnp.pad(odd, ((0, 0), (s, 0)))[:, :K_next]
            odd = jnp.where(((d & s) > 0)[:, None], shifted, odd)
        cur = even | odd
        F = Fe

    # align every entity to a 128-word row boundary: shift by F % 128
    M, K = cur.shape
    cur = jnp.pad(cur, ((0, 0), (0, ROWS * 128 - K)))
    c = F & 127
    for b in range(7):
        s = 1 << b
        shifted = jnp.pad(cur, ((0, 0), (s, 0)))[:, : ROWS * 128]
        cur = jnp.where(((c & s) > 0)[:, None], shifted, cur)
    rows = F >> 7
    return cur.reshape(M, ROWS, 128), rows, total_bits


def _place_kernel(rows_ref, ent_ref, out_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def body(i, carry):
        r = rows_ref[t * _CHUNK_E + i]
        win = out_ref[pl.ds(r, ROWS), :]
        out_ref[pl.ds(r, ROWS), :] = win | ent_ref[i]
        return carry

    jax.lax.fori_loop(0, _CHUNK_E, body, 0)


@partial(jax.jit, static_argnums=(2, 3))
def pack_units_dense(values: jnp.ndarray, widths: jnp.ndarray,
                     n_words: int, interpret: bool = False):
    """LSB-first bit packing of (value, width) units into u32 words.

    Drop-in equivalent of pipeline.pack_units (the scatter formulation,
    kept as the CPU path / oracle) — same contract: units <= 28 bits,
    zero-width units contribute nothing, returns (words[n_words],
    total_bits).
    """
    ents, rows, total_bits = _merge_levels(values, widths)
    M = ents.shape[0]
    MP = -(-M // _CHUNK_E) * _CHUNK_E
    R_out = -(-n_words // 128) + ROWS
    if MP > M:
        ents = jnp.concatenate(
            [ents, jnp.zeros((MP - M, ROWS, 128), jnp.uint32)]
        )
        rows = jnp.concatenate([rows, jnp.zeros(MP - M, jnp.int32)])
    rows = jnp.clip(rows, 0, R_out - ROWS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(MP // _CHUNK_E,),
        in_specs=[
            pl.BlockSpec((_CHUNK_E, ROWS, 128), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R_out, 128), lambda t, s: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    words = pl.pallas_call(
        _place_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R_out, 128), jnp.uint32),
        interpret=interpret,
    )(rows, ents)
    return words.reshape(-1)[:n_words], total_bits
