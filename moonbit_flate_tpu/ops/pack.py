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


GROUP = 32                      # units funneled per group in one shot
GROUP_LOG = 5
K_GROUP = (UNIT_BITS * GROUP - 1) // 32 + 2   # 29 words covers 928 bits


def _merge_levels(values: jnp.ndarray, widths: jnp.ndarray):
    """Phase A: units -> row-aligned entities.

    Returns (ents [M, ROWS, 128] u32, rows [M] i32, total_bits i32).

    Two tiers (both shaped by a measured TPU pathology: arrays with a
    tiny dimension — whether on lanes or sublanes — are processed at
    gather-like ~14 ns/element, so the pairwise merge is unaffordable
    while N is in the millions; levels 0-4 of the original hierarchical
    merge cost ~48 ms/MB in either orientation):

    1. *Group funnel*: 32 consecutive units collapse straight into one
       29-word group buffer.  Word k of each group is a masked sum of
       the group's units' shifted values — a static 29-step loop of
       [NG, 32] compare/select/row-reduce passes, all dense VPU work
       with no strided access (bits of distinct units are disjoint, so
       add == or).  Buffers live TRANSPOSED as [29, NG].
    2. *Pairwise merge* for the remaining 3 levels (32 -> 256 units per
       entity), where N <= ~65k makes the strided even/odd slicing
       cheap (measured ~0.3 ms total), then the 128-word row alignment.
    """
    NU = values.shape[0]
    NUP = -(-NU // (1 << LEVELS)) * (1 << LEVELS)
    widths = widths.astype(jnp.uint32)
    v = values.astype(jnp.uint32) & ((jnp.uint32(1) << widths) - jnp.uint32(1))
    pad = NUP - NU
    if pad:
        v = jnp.concatenate([v, jnp.zeros(pad, jnp.uint32)])
        widths = jnp.concatenate([widths, jnp.zeros(pad, jnp.uint32)])

    NG = NUP // GROUP
    w2 = widths.reshape(NG, GROUP)
    gw = jnp.sum(w2, axis=1)                               # [NG] group bits
    gstart = jnp.concatenate(
        [jnp.zeros(1, jnp.uint32), jnp.cumsum(gw)[:-1]]
    )
    total_bits = (gstart[-1] + gw[-1]).astype(jnp.int32)

    # in-group exclusive bit offsets and per-unit word contributions
    lo_in = jnp.cumsum(w2, axis=1) - w2                    # [NG, GROUP]
    v2 = v.reshape(NG, GROUP)
    s = lo_in & jnp.uint32(31)
    lo32 = v2 << s
    hi32 = (v2 >> jnp.uint32(1)) >> (jnp.uint32(31) - s)
    wl = (lo_in >> 5).astype(jnp.int32)                    # 0 .. K_GROUP-2

    cols = []
    for k in range(K_GROUP):
        c = jnp.sum(jnp.where(wl == k, lo32, jnp.uint32(0)), axis=1)
        if k > 0:
            c = c | jnp.sum(jnp.where(wl == k - 1, hi32, jnp.uint32(0)),
                            axis=1)
        cols.append(c)
    cur = jnp.stack(cols, axis=0)                          # [K_GROUP, NG]

    # word-align each group: shift by gstart % 32 bits (content <= 896
    # bits + 31 shift fits the 29 words)
    t = (gstart & jnp.uint32(31))[None, :]
    prev = jnp.concatenate(
        [jnp.zeros((1, NG), jnp.uint32), cur[:-1]], axis=0
    )
    cur = (cur << t) | ((prev >> jnp.uint32(1)) >> (jnp.uint32(31) - t))
    F = (gstart >> 5).astype(jnp.int32)                    # group word home

    # pairwise merge: 32-unit groups -> 256-unit entities (3 levels)
    for level in range(GROUP_LOG, LEVELS):
        K = cur.shape[0]
        K_next = _k_words(level + 1)
        even, odd = cur[:, 0::2], cur[:, 1::2]
        Fe, Fo = F[0::2], F[1::2]
        d = Fo - Fe                                        # 0 .. K_l
        grow = K_next - K
        even = jnp.pad(even, ((0, grow), (0, 0)))
        odd = jnp.pad(odd, ((0, grow), (0, 0)))
        # d <= 28*2^level // 32 + 1 == K - 1, so (K-1).bit_length() digits
        nbits = max(1, (K - 1).bit_length())
        for b in range(nbits):
            sft = 1 << b
            shifted = jnp.pad(odd, ((sft, 0), (0, 0)))[:K_next]
            odd = jnp.where(((d & sft) > 0)[None, :], shifted, odd)
        cur = even | odd
        F = Fe

    # align every entity to a 128-word row boundary: shift by F % 128
    K, M = cur.shape
    cur = jnp.pad(cur, ((0, ROWS * 128 - K), (0, 0)))
    c = F & 127
    for b in range(7):
        sft = 1 << b
        shifted = jnp.pad(cur, ((sft, 0), (0, 0)))[: ROWS * 128]
        cur = jnp.where(((c & sft) > 0)[None, :], shifted, cur)
    rows = F >> 7
    return cur.T.reshape(M, ROWS, 128), rows, total_bits


def _make_place_kernel_batch(n_tchunks: int):
    def _place_kernel_b(rows_ref, ent_ref, out_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        def body(i, carry):
            r = rows_ref[(b * n_tchunks + t) * _CHUNK_E + i]
            win = out_ref[0, pl.ds(r, ROWS), :]
            out_ref[0, pl.ds(r, ROWS), :] = win | ent_ref[0, i]
            return carry

        jax.lax.fori_loop(0, _CHUNK_E, body, 0)

    return _place_kernel_b


@partial(jax.jit, static_argnums=(2, 3))
def pack_units_dense_batch(values: jnp.ndarray, widths: jnp.ndarray,
                           n_words: int, interpret: bool = False):
    """Batched pack_units_dense: [B, NU] units -> ([B, n_words] u32,
    int32[B] total bits).  Phase A runs vmapped (dense VPU work batches
    trivially); phase B grids over (segment, entity chunk) with one
    output row-block per segment."""
    B = values.shape[0]
    ents, rows, total_bits = jax.vmap(_merge_levels)(values, widths)
    M = ents.shape[1]
    MP = -(-M // _CHUNK_E) * _CHUNK_E
    R_out = -(-n_words // 128) + ROWS
    if MP > M:
        ents = jnp.pad(ents, ((0, 0), (0, MP - M), (0, 0), (0, 0)))
        rows = jnp.pad(rows, ((0, 0), (0, MP - M)))
    rows = jnp.clip(rows, 0, R_out - ROWS)
    T = MP // _CHUNK_E

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, _CHUNK_E, ROWS, 128),
                         lambda b, t, s: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R_out, 128), lambda b, t, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    words = pl.pallas_call(
        _make_place_kernel_batch(T),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R_out, 128), jnp.uint32),
        interpret=interpret,
    )(rows.reshape(-1), ents)
    return words.reshape(B, -1)[:, :n_words], total_bits


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
