"""Table lookups and histograms as MXU one-hot matmuls.

XLA on TPU lowers gather/scatter to serial scalar loops (~7 ns/element:
a 1M-element gather costs ~7-9 ms) and a VPU one-hot contraction over an
A-entry table costs A lane-ops per element (~5 ms for A=286 at 1M
elements).  The MXU does the same contraction as a matmul at ~100x the
rate *when the one-hot operand fuses into the dot* — measured 0.02-0.7 ms
for [1M, 286] @ [286, 2] and ~0.3 ms for 16 unrolled per-block lookups
that would cost ~1 ms as a batched dot_general (batch dims defeat the
one-hot fusion, so per-block tables are unrolled into flat matmuls).

Exactness: the one-hot is bf16 (exact 0/1), table columns are split into
byte slices (< 256, exact in bf16), and accumulation is f32
(preferred_element_type), so every product and sum is integer-exact:
lookups select one row (result < 256 per slice), histogram counts stay
below 2^24.  Results recombine with integer shifts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _slices(table: jnp.ndarray, n_bytes: int) -> jnp.ndarray:
    """[A] int32 -> [A, n_bytes] bf16 byte slices (LSB first)."""
    cols = [((table >> (8 * b)) & 0xFF).astype(jnp.bfloat16)
            for b in range(n_bytes)]
    return jnp.stack(cols, axis=-1)


def _recombine(acc: jnp.ndarray, widths: list[int]) -> list[jnp.ndarray]:
    """[..., sum(widths)] f32 -> per-table int32 values."""
    outs = []
    c = 0
    for w in widths:
        v = acc[..., c].astype(jnp.int32)
        for b in range(1, w):
            v = v | (acc[..., c + b].astype(jnp.int32) << (8 * b))
        outs.append(v)
        c += w
    return outs


def take_multi(tables: list[tuple[jnp.ndarray, int]],
               idx: jnp.ndarray, A: int) -> list[jnp.ndarray]:
    """Look idx (any shape, values in [0, A); OOR -> 0) up in several
    tables sharing the index, with one fused one-hot matmul.

    tables: list of ([A] int32 table, n_bytes needed for its values).
    """
    flat = idx.reshape(-1)
    cols = jnp.concatenate([_slices(t, w) for t, w in tables], axis=-1)
    oh = jax.nn.one_hot(flat, A, dtype=jnp.bfloat16)
    acc = jnp.dot(oh, cols, preferred_element_type=jnp.float32)
    outs = _recombine(acc, [w for _, w in tables])
    return [o.reshape(idx.shape) for o in outs]


def take_blocks_multi(tables: list[tuple[jnp.ndarray, int]],
                      idx: jnp.ndarray) -> list[jnp.ndarray]:
    """Per-block lookup: tables[k][0] is [NB, A]; idx is [NB, L].

    Unrolled over blocks so each block is a flat [L, A] @ [A, C] matmul
    (a batched dot_general would not fuse the one-hot).
    """
    NB, L = idx.shape
    A = tables[0][0].shape[1]
    widths = [w for _, w in tables]
    cols = jnp.concatenate(
        [jnp.stack([_slices(t[b], w) for b in range(NB)], axis=0)
         for t, w in tables], axis=-1)  # [NB, A, sum(widths)]
    outs_per_block = []
    for b in range(NB):
        oh = jax.nn.one_hot(idx[b], A, dtype=jnp.bfloat16)
        acc = jnp.dot(oh, cols[b], preferred_element_type=jnp.float32)
        outs_per_block.append(_recombine(acc, widths))
    return [jnp.stack([outs_per_block[b][k] for b in range(NB)])
            for k in range(len(tables))]


def hist_blocks(idx: jnp.ndarray, A: int,
                weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-block histogram [NB, A] of idx [NB, L] (OOR indices dropped).

    Unrolled flat matmuls: counts accumulate in f32 (exact below 2^24;
    per-block counts are <= 65535 and weighted sums <= 65535*255).
    """
    NB, L = idx.shape
    rows = []
    for b in range(NB):
        oh = jax.nn.one_hot(idx[b], A, dtype=jnp.bfloat16)
        w = (jnp.ones((1, L), jnp.bfloat16) if weights is None
             else weights[b].astype(jnp.bfloat16)[None, :])
        rows.append(jnp.dot(w, oh, preferred_element_type=jnp.float32)[0])
    return jnp.stack(rows).astype(jnp.int32)
