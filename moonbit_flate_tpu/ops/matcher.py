"""Vectorized LZ77 match finding — the TPU-native deflateFast.

Reformulation of the reference's sequential hash-table scan
(deflate-fast.mbt:123-270) as data-parallel stages with no sequential
dependency over input positions, engineered around what the TPU does
well (dense vector ops, sorts) and avoiding what it does badly (random
per-element gathers):

1. *Candidates*: the nearest previous position holding the same 4 bytes,
   from one stable sort of the 32-bit loads.  4-byte equality is exact
   (the sort key IS the bytes — no hash collisions, unlike the
   reference's direct-mapped 14-bit table).
2. *Short extension*: bytes 4..7 via a single u32 gather + XOR
   trailing-zero-byte count.
3. *Small distances (<= 8)*: matches are periodic runs; exact lengths
   come from per-period mismatch tables built with shifted compares and
   one reverse cumulative-min scan — zero gathers.  This covers RLE
   (dict-decoder.mbt:136-149 semantics) at full speed.
4. *Long matches (dist > 8, >= 8 bytes)*: compacted candidate list
   (bounded budget) extended 32 bytes/round in a while loop that exits
   as soon as no candidate is alive.  Budget overflow degrades a match
   to 8 bytes — valid output, negligible ratio cost.

Match admission mirrors the wire rules: distance <= 32768, length in
[4, 258] (MIN_MATCH_LENGTH, deflate.mbt:20).  Cross-64KB-block matches
within a segment are found naturally, which the reference cannot do
(SURVEY.md §2.9.3 quirk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import constants as C

_PALLAS_COMMIT = None  # resolved lazily to avoid importing pallas on CPU


def greedy_commit_xla(mlen: jnp.ndarray, n: jnp.ndarray,
                      start: jnp.ndarray | int = 0) -> jnp.ndarray:
    """Greedy tokenization via pointer doubling (O(log S) gather/scatter
    rounds).  Used on CPU; the TPU path uses the Pallas sequential walk
    (commit_pallas.py), which is ~50x cheaper there."""
    S = mlen.shape[0]
    pos = jnp.arange(S, dtype=jnp.int32)
    start = jnp.asarray(start, jnp.int32)
    step = jnp.where(mlen >= C.MIN_MATCH_LENGTH, mlen, 1)
    nxt = jnp.where(pos < n, jnp.minimum(pos + step, S), S)
    nxt = jnp.concatenate([nxt, jnp.full(1, S, jnp.int32)])

    n_rounds = max(1, (S - 1).bit_length())

    def round_step(_, state):
        visited, jump = state
        visited = visited.at[jump].max(visited)
        jump = jump[jump]
        return visited, jump

    visited0 = jnp.zeros(S + 1, jnp.int32).at[jnp.clip(start, 0, S)].set(1)
    visited, _ = jax.lax.fori_loop(0, n_rounds, round_step, (visited0, nxt))
    return (visited[:S] > 0) & (pos < n) & (pos >= start)


def greedy_commit(mlen: jnp.ndarray, n: jnp.ndarray,
                  start: jnp.ndarray | int = 0) -> jnp.ndarray:
    global _PALLAS_COMMIT
    if jax.default_backend() == "tpu":
        if _PALLAS_COMMIT is None:
            from .commit_pallas import greedy_commit as _pc

            _PALLAS_COMMIT = _pc
        return _PALLAS_COMMIT(mlen, n, start)
    return greedy_commit_xla(mlen, n, start)

_PERIODS = 8          # always-tabled small periods (classic RLE)
_NUM_PERIODS = 24     # total period tables incl. dynamic most-frequent
_LONG_BUDGET_DIV = 4  # long-match compaction budget = S / this
_WORDS_PER_ROUND = 8  # 32 bytes per extension round


def _tz_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """Number of trailing zero BYTES of a u32 (0..4): equal-prefix length."""
    b0 = (x & jnp.uint32(0xFF)) == 0
    b1 = (x & jnp.uint32(0xFF00)) == 0
    b2 = (x & jnp.uint32(0xFF0000)) == 0
    b3 = (x & jnp.uint32(0xFF000000)) == 0
    return (
        b0.astype(jnp.int32)
        + (b0 & b1).astype(jnp.int32)
        + (b0 & b1 & b2).astype(jnp.int32)
        + (b0 & b1 & b2 & b3).astype(jnp.int32)
    )


def find_matches(data: jnp.ndarray, n: jnp.ndarray):
    """Per-position best matches for one segment.

    data: uint8[S + 320] zero-padded past n.
    n:    int32 scalar valid byte count.
    Returns (mlen[S] int32 with admissible lengths in [4,258] else 0,
             dist[S] int32).
    """
    S = data.shape[0] - 320
    SE = S + 300
    d32 = data.astype(jnp.uint32)
    u32e = (
        d32[:SE]
        | (d32[1 : SE + 1] << 8)
        | (d32[2 : SE + 2] << 16)
        | (d32[3 : SE + 3] << 24)
    )
    u32 = u32e[:S]
    pos = jnp.arange(S, dtype=jnp.int32)

    # -- stage 1: nearest previous occurrence of the same u32 --------------
    order = jnp.argsort(u32, stable=True)
    sorted_vals = u32[order]
    same_as_prev = jnp.concatenate(
        [jnp.zeros(1, bool), sorted_vals[1:] == sorted_vals[:-1]]
    )
    prev_pos = jnp.concatenate([jnp.zeros(1, jnp.int32), order[:-1]])
    cand_sorted = jnp.where(same_as_prev, prev_pos, -1)
    cand = jnp.zeros(S, jnp.int32).at[order].set(cand_sorted)

    dist = pos - cand
    ok = (
        (pos <= n - 4)
        & (cand >= 0)
        & (cand <= n - 4)
        & (dist <= C.MAX_MATCH_OFFSET)
    )
    candc = jnp.maximum(cand, 0)

    # -- stage 2: bytes 4..7 in one gather ---------------------------------
    a4 = u32e[4 : S + 4]
    b4 = u32e[candc + 4]
    e4 = _tz_bytes(a4 ^ b4)
    mlen = jnp.where(ok, 4 + e4, 0)

    # -- stage 3: periodic paths (exact, gather-free) ----------------------
    # A match whose distance d satisfies length >= d is a periodic run;
    # its exact length is (first j >= pos with data[j] != data[j-d]) - pos.
    # Static tables cover d <= 8 (classic RLE); on top of that, the most
    # frequent candidate distances <= 258 get *dynamic* period tables —
    # this is what keeps highly repetitive inputs (period-45 text,
    # period-128 ramps) off the gather path entirely.
    db = data[:S].astype(jnp.int32)
    is_valid_i = pos < n
    BIG = jnp.int32(S + 300)

    extendable = ok & (e4 == 4)
    small_long = extendable & (dist <= C.MAX_MATCH_LENGTH)
    hist = (
        jnp.zeros(C.MAX_MATCH_LENGTH + 1, jnp.int32)
        .at[jnp.where(small_long, dist, 0)]
        .add(1)
        .at[0]
        .set(0)
    )
    # force periods 1..8 into the table, then the most frequent others
    hist = hist.at[1 : _PERIODS + 1].add(1 << 24)
    _, top_p = jax.lax.top_k(hist, _NUM_PERIODS)
    top_p = top_p.astype(jnp.int32)

    db_pad = jnp.concatenate(
        [jnp.full(C.MAX_MATCH_LENGTH, -1, jnp.int32), db]
    )

    def period_row(p):
        prevb = jax.lax.dynamic_slice(
            db_pad, (C.MAX_MATCH_LENGTH - p,), (S,)
        )
        eq = (db == prevb) & is_valid_i
        return jnp.where(eq, BIG, pos)

    mism = jax.vmap(period_row)(top_p)                      # [P, S]
    # Windowed first-mismatch instead of a full-length reverse scan:
    # only the next 258 positions matter (match length clamp), so a
    # block-structured suffix/prefix min over 272-wide tiles is exact
    # after clamping and ~3x cheaper than associative_scan over S.
    W = 272
    S_t = ((S + W - 1) // W) * W
    mism_p = jnp.concatenate(
        [mism, jnp.full((mism.shape[0], S_t - S + W), BIG, jnp.int32)], axis=1
    )
    tiles = mism_p.reshape(mism.shape[0], -1, W)
    sfx = jnp.flip(
        jax.lax.cummin(jnp.flip(tiles, axis=2), axis=2), axis=2
    )                                  # suffix min to tile end
    pfx = jax.lax.cummin(tiles, axis=2)  # prefix min from tile start
    nxt = jnp.concatenate(
        [pfx[:, 1:, :], jnp.full((mism.shape[0], 1, W), BIG, jnp.int32)],
        axis=1,
    )
    run_end = jnp.minimum(sfx, nxt).reshape(mism.shape[0], -1)[:, :S]
    mlen_per = jnp.zeros(S, jnp.int32)
    covered = jnp.zeros(S, bool)
    for k in range(_NUM_PERIODS):
        sel = dist == top_p[k]
        mlen_per = jnp.where(sel, run_end[k] - pos, mlen_per)
        covered = covered | sel
    # dist <= 8 candidates are always exact via the forced periods (the
    # 4-byte sort guarantee implies length >= 4 >= period coverage).
    per_ok = ok & covered & ((dist <= _PERIODS) | (e4 == 4))
    mlen = jnp.where(per_ok, jnp.maximum(mlen_per, mlen), mlen)

    # -- stage 4: remaining long matches (gathered extension) --------------
    K = S // _LONG_BUDGET_DIV
    long_mask = extendable & ~covered & (dist > _PERIODS)
    lidx = jnp.nonzero(long_mask, size=K, fill_value=S)[0].astype(jnp.int32)
    lvalid = lidx < S
    lpos = jnp.where(lvalid, lidx, 0)
    lcand = candc[lpos]
    woffs = jnp.arange(_WORDS_PER_ROUND, dtype=jnp.int32) * 4

    def round_body(state):
        cm, alive, _ = state
        base = cm  # current verified length per candidate
        ia = lpos[:, None] + base[:, None] + woffs[None, :]
        ib = lcand[:, None] + base[:, None] + woffs[None, :]
        wa = u32e[jnp.clip(ia, 0, SE - 1)]
        wb = u32e[jnp.clip(ib, 0, SE - 1)]
        eqw = wa == wb
        full = jnp.cumprod(eqw.astype(jnp.int32), axis=1)
        nfull = jnp.sum(full, axis=1)
        # first differing word, then byte resolution inside it
        diff = wa ^ wb
        first_diff = jnp.take_along_axis(
            diff, jnp.minimum(nfull, _WORDS_PER_ROUND - 1)[:, None], axis=1
        )[:, 0]
        tzb = jnp.where(
            nfull == _WORDS_PER_ROUND, 0, _tz_bytes(first_diff)
        )
        run = 4 * nfull + tzb
        cm = cm + jnp.where(alive, run, 0)
        alive = alive & (run == 32) & (cm < C.MAX_MATCH_LENGTH)
        return cm, alive, jnp.any(alive)

    def round_cond(state):
        return state[2]

    cm0 = jnp.full(K, 8, jnp.int32)
    alive0 = lvalid
    cm, _, _ = jax.lax.while_loop(
        round_cond, round_body, (cm0, alive0, jnp.any(alive0))
    )
    mlen = mlen.at[jnp.where(lvalid, lidx, S + 1)].max(cm, mode="drop")

    # -- final admission ---------------------------------------------------
    mlen = jnp.minimum(jnp.minimum(mlen, C.MAX_MATCH_LENGTH), n - pos)
    mlen = jnp.where(ok & (mlen >= C.MIN_MATCH_LENGTH), mlen, 0)
    return mlen, jnp.where(mlen > 0, dist, 0)
