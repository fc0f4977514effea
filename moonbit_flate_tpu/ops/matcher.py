"""Vectorized LZ77 match finding — the TPU-native deflateFast.

Reformulation of the reference's sequential hash-table scan
(deflate-fast.mbt:123-270) as three data-parallel stages, none of which
has a sequential dependency over input positions:

1. *Candidates*: the nearest previous position holding the same 4 bytes,
   found with one stable sort of the 32-bit loads (sorted runs of equal
   values; the predecessor inside a run is the candidate).  This strictly
   dominates the reference's direct-mapped 14-bit table, which loses
   candidates to hash collisions and 1-entry eviction.
2. *Extension*: match lengths via chunked 32-byte vector compares (a
   fori_loop of 9 steps, each a [S, 32] gather+compare), capped at 258.
3. *Commit*: the greedy left-to-right tokenization is the orbit of
   ``next(i) = i + (len[i] if len[i] >= 4 else 1)`` starting at 0 —
   materialized in O(log S) pointer-doubling rounds (gather + scatter-max)
   instead of a 64K-step scan.

Match admission mirrors the wire rules: distance <= 32768, length >= 4
(MIN_MATCH_LENGTH, deflate.mbt:20), length <= 258.  Cross-64KB-block
matches within a segment are found naturally (the sort spans the whole
segment), which the reference cannot do (SURVEY.md §2.9.3 quirk); this is
one of the ratio wins that keeps the TPU encoder at-or-below the
reference's sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import constants as C

_CHUNK = 32
_MAX_CHUNKS = 9  # 9 * 32 = 288 >= 258 + alignment slack


def find_matches(data: jnp.ndarray, n: jnp.ndarray):
    """Per-position best matches for one segment.

    data: uint8[S + PAD] zero-padded (PAD >= 320 so extension gathers
          never go out of bounds).
    n:    int32 scalar — valid byte count (n <= S).

    Returns (mlen[S] int32, dist[S] int32): mlen >= 4 where a match is
    admissible, else 0.
    """
    S = data.shape[0] - 320
    d32 = data.astype(jnp.uint32)
    u32 = (
        d32[:S]
        | (d32[1 : S + 1] << 8)
        | (d32[2 : S + 2] << 16)
        | (d32[3 : S + 3] << 24)
    )
    pos = jnp.arange(S, dtype=jnp.int32)

    # Stage 1: nearest previous occurrence of the same u32.
    # Stable argsort groups equal values with ascending positions.
    order = jnp.argsort(u32, stable=True)
    sorted_vals = u32[order]
    same_as_prev = jnp.concatenate(
        [jnp.zeros(1, bool), sorted_vals[1:] == sorted_vals[:-1]]
    )
    prev_pos = jnp.concatenate([jnp.zeros(1, jnp.int32), order[:-1]])
    cand_sorted = jnp.where(same_as_prev, prev_pos, -1)
    cand = jnp.zeros(S, jnp.int32).at[order].set(cand_sorted)

    valid = (pos <= n - 4) & (cand >= 0) & (cand <= n - 4)
    dist = pos - cand
    ok = valid & (dist <= C.MAX_MATCH_OFFSET)

    # Stage 2: chunked match extension.
    offs = jnp.arange(_CHUNK, dtype=jnp.int32)

    def chunk_step(k, state):
        mlen, alive = state
        base = k * _CHUNK
        ia = pos[:, None] + base + offs[None, :]          # [S, CHUNK]
        ib = jnp.maximum(cand, 0)[:, None] + base + offs[None, :]
        ba = data[ia]
        bb = data[ib]
        eq = (ba == bb) & (ia < n)
        run = jnp.sum(jnp.cumprod(eq, axis=1), axis=1).astype(jnp.int32)
        mlen = mlen + jnp.where(alive, run, 0)
        alive = alive & (run == _CHUNK)
        return mlen, alive

    mlen, _ = jax.lax.fori_loop(
        0, _MAX_CHUNKS, chunk_step, (jnp.zeros(S, jnp.int32), ok)
    )
    mlen = jnp.minimum(mlen, C.MAX_MATCH_LENGTH)
    mlen = jnp.where(ok & (mlen >= C.MIN_MATCH_LENGTH), mlen, 0)
    return mlen, jnp.where(mlen > 0, dist, 0)


def greedy_commit(mlen: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Greedy tokenization: bool[S] mask of committed token start positions.

    A committed position with mlen >= 4 emits a match consuming mlen
    bytes; otherwise a literal consuming 1 byte.  Equivalent to the
    sequential greedy walk, computed in ceil(log2(S)) + 1 doubling rounds.
    """
    S = mlen.shape[0]
    pos = jnp.arange(S, dtype=jnp.int32)
    step = jnp.where(mlen >= C.MIN_MATCH_LENGTH, mlen, 1)
    nxt = jnp.where(pos < n, jnp.minimum(pos + step, S), S)
    nxt = jnp.concatenate([nxt, jnp.full(1, S, jnp.int32)])  # sink at S

    n_rounds = max(1, (S - 1).bit_length())

    def round_step(_, state):
        visited, jump = state
        visited = visited.at[jump].max(visited)
        jump = jump[jump]
        return visited, jump

    visited0 = jnp.zeros(S + 1, jnp.int32).at[0].set(1)
    visited, _ = jax.lax.fori_loop(0, n_rounds, round_step, (visited0, nxt))
    return (visited[:S] > 0) & (pos < n)
