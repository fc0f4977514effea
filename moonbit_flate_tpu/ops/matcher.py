"""Vectorized LZ77 match finding — the TPU-native deflateFast.

Reformulation of the reference's sequential hash-table scan
(deflate-fast.mbt:123-270) as data-parallel stages with no sequential
dependency over input positions, engineered around what the TPU does
well (dense vector ops, multi-operand sorts) and avoiding what it does
badly (serial per-element gathers/scatters — ~15 cycles each in XLA):

1. *Candidates*: the nearest previous position holding the same 4 bytes,
   from one stable multi-operand carry-sort of the 32-bit loads
   (jax.lax.sort carrying position + the next 8 bytes).  4-byte equality
   is exact (the sort key IS the bytes — no hash collisions, unlike the
   reference's direct-mapped 14-bit table).  Because the next 8 bytes
   ride along as sort payloads, match lengths up to 12 are resolved by
   comparing *adjacent sorted elements* — zero gathers.  A second
   carry-sort (key = position) routes results back to position order —
   replacing the scatter/inverse-permutation round trip.
2. *Small distances / periodic runs (dist <= 258 when covered)*: exact
   lengths from per-period mismatch tables built with shifted compares
   and windowed suffix/prefix-min scans — zero gathers.  This covers RLE
   (dict-decoder.mbt:136-149 semantics) at full speed.
3. *Long matches (dist > periods, > 12 bytes)*: sort-compacted candidate
   list (bounded budget) extended 32 bytes/round in a while loop that
   exits as soon as no candidate is alive.  Budget overflow degrades a
   match to 12 bytes — valid output, negligible ratio cost.

Match admission mirrors the wire rules: distance <= 32768, length in
[4, 258] (MIN_MATCH_LENGTH, deflate.mbt:20).  Cross-64KB-block matches
within a segment are found naturally, which the reference cannot do
(SURVEY.md §2.9.3 quirk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import constants as C
from .dense import hist_rows

_PALLAS_COMMIT = None  # resolved lazily to avoid importing pallas on CPU


def greedy_commit_xla(mlen: jnp.ndarray, n: jnp.ndarray,
                      start: jnp.ndarray | int = 0) -> jnp.ndarray:
    """Greedy tokenization via pointer doubling (O(log S) gather/scatter
    rounds).  Used on CPU; the TPU path uses the Pallas sequential walk
    (commit_pallas.py), which is far cheaper there."""
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
_LONG_BUDGET_DIV = 16  # long-match compaction budget = S / this
_WORDS_PER_ROUND = 8  # 32 bytes per extension round
_SORT_LEN = 12        # match length resolvable inside the carry-sort


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


_WIN_STRIDE = 1 << 15   # window stride H (= max match distance)
_WIN = 2 * _WIN_STRIDE  # window width: upper-half positions see >= 32 KB


def _nearest_prev_flat(u32e: jnp.ndarray, S: int):
    """Flat-sort candidate search (original formulation, kept for CPU &
    small segments): two carry-sorts over the whole segment."""
    u32 = u32e[:S]
    pos = jnp.arange(S, dtype=jnp.int32)
    w4 = u32e[4 : S + 4]
    w8 = u32e[8 : S + 8]
    skey, spos, sw4, sw8 = jax.lax.sort(
        (u32, pos, w4, w8), dimension=0, is_stable=True, num_keys=1
    )
    same_as_prev = jnp.concatenate(
        [jnp.zeros(1, bool), skey[1:] == skey[:-1]]
    )
    prev_pos = jnp.concatenate([jnp.zeros(1, jnp.int32), spos[:-1]])
    cand_s = jnp.where(same_as_prev, prev_pos, -1)
    # lengths 4..12 from adjacent payload comparison, in sorted order
    x4 = sw4 ^ jnp.concatenate([jnp.zeros(1, jnp.uint32), sw4[:-1]])
    x8 = sw8 ^ jnp.concatenate([jnp.zeros(1, jnp.uint32), sw8[:-1]])
    e4_s = _tz_bytes(x4)
    e8_s = jnp.where(e4_s == 4, _tz_bytes(x8), 0)
    ext_s = e4_s + e8_s                                   # 0..8
    # route back to position order: one more carry-sort keyed by position
    _, cand, ext = jax.lax.sort(
        (spos, cand_s, ext_s), dimension=0, is_stable=True, num_keys=1
    )
    return cand, ext


def _nearest_prev_windowed(u32e: jnp.ndarray, S: int):
    """Windowed batched candidate search.

    Because admissible distances are <= 32768 (MAX_MATCH_OFFSET), the
    nearest previous occurrence only matters within a 32 KB history.  Cut
    the segment into 64 KB windows at 32 KB stride (windows share halves,
    so they're built by reshape+stack — no gathers); each position takes
    its result from the window where it sits in the upper half (>= 32 KB
    of in-window history), making the result *exactly* equal to the flat
    search after the distance check.  The sorts become batched [NW, 65536]
    sorts along the last axis — far better TPU utilization than one flat
    length-S sort, and lg^2(64K)=136 merge stages instead of ~210.
    """
    H, W = _WIN_STRIDE, _WIN
    NH = -(-S // H)              # half-slots covering S
    NW = max(NH - 1, 1)
    need = (NW + 1) * H + 8
    u32p = jnp.concatenate(
        [u32e, jnp.zeros(max(0, need - u32e.shape[0]), jnp.uint32)]
    )
    halves = u32p[: (NW + 1) * H].reshape(NW + 1, H)
    key = jnp.concatenate([halves[:-1], halves[1:]], axis=1)   # [NW, W]
    h4 = u32p[4 : (NW + 1) * H + 4].reshape(NW + 1, H)
    w4 = jnp.concatenate([h4[:-1], h4[1:]], axis=1)
    h8 = u32p[8 : (NW + 1) * H + 8].reshape(NW + 1, H)
    w8 = jnp.concatenate([h8[:-1], h8[1:]], axis=1)
    jloc = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), (NW, W))

    skey, sj, sw4, sw8 = jax.lax.sort(
        (key, jloc, w4, w8), dimension=1, is_stable=True, num_keys=1
    )
    same = jnp.concatenate(
        [jnp.zeros((NW, 1), bool), skey[:, 1:] == skey[:, :-1]], axis=1
    )
    prevj = jnp.concatenate(
        [jnp.zeros((NW, 1), jnp.int32), sj[:, :-1]], axis=1
    )
    cand_s = jnp.where(same, prevj, -1)
    z = jnp.zeros((NW, 1), jnp.uint32)
    x4 = sw4 ^ jnp.concatenate([z, sw4[:, :-1]], axis=1)
    x8 = sw8 ^ jnp.concatenate([z, sw8[:, :-1]], axis=1)
    e4_s = _tz_bytes(x4)
    e8_s = jnp.where(e4_s == 4, _tz_bytes(x8), 0)
    ext_s = e4_s + e8_s
    _, cand_w, ext_w = jax.lax.sort(
        (sj, cand_s, ext_s), dimension=1, is_stable=True, num_keys=1
    )
    # globalize candidates, then take each position's designated window:
    # window 0 contributes [0, W), window k >= 1 contributes its upper half
    base = (jnp.arange(NW, dtype=jnp.int32) * H)[:, None]
    cand_g = jnp.where(cand_w >= 0, cand_w + base, -1)
    cand = jnp.concatenate(
        [cand_g[0], cand_g[1:, H:].reshape(-1)]
    )[:S]
    ext = jnp.concatenate(
        [ext_w[0], ext_w[1:, H:].reshape(-1)]
    )[:S]
    return cand, ext


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

    # -- stage 1: nearest previous occurrence + 12-byte prefix ------------
    if S > 2 * _WIN:
        cand, ext = _nearest_prev_windowed(u32e, S)
    else:
        cand, ext = _nearest_prev_flat(u32e, S)

    dist = pos - cand
    ok = (
        (pos <= n - 4)
        & (cand >= 0)
        & (dist <= C.MAX_MATCH_OFFSET)
    )
    # candidate tail safety: ext bytes past n are garbage; clamp later via
    # the final min(mlen, n - pos).
    mlen = jnp.where(ok, 4 + ext, 0)                      # 4.._SORT_LEN

    # -- stage 2: periodic paths (exact, gather-free) ----------------------
    # A match whose distance d satisfies length >= d is a periodic run;
    # its exact length is (first j >= pos with data[j] != data[j-d]) - pos.
    # Static tables cover d <= 8 (classic RLE); on top of that, the most
    # frequent candidate distances <= 258 get *dynamic* period tables —
    # this is what keeps highly repetitive inputs (period-45 text,
    # period-128 ramps) off the gather path entirely.
    db = data[:S].astype(jnp.int32)
    is_valid_i = pos < n
    BIG = jnp.int32(S + 300)

    extendable = ok & (mlen >= _SORT_LEN)
    small_long = extendable & (dist <= C.MAX_MATCH_LENGTH)
    hist = hist_rows(
        jnp.where(small_long, dist, C.MAX_MATCH_LENGTH + 1)[None, :],
        C.MAX_MATCH_LENGTH + 1,
    )[0]
    hist = hist.at[0].set(0)
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
    # The mismatch table gives the *exact* match length against the
    # distance-d candidate for any position (first j >= pos where
    # data[j] != data[j-d]), so coverage alone gates it.
    per_ok = ok & covered
    mlen = jnp.where(per_ok, jnp.maximum(mlen_per, mlen), mlen)

    # -- stage 3: remaining long matches (gathered extension) --------------
    # Only candidates that matched the full 12 sort-resolved bytes and are
    # not period-covered reach the gather path; budget is S/16 entries.
    K = S // _LONG_BUDGET_DIV
    long_mask = extendable & ~covered & (dist > _PERIODS)
    # sort-based compaction (valid positions first, ascending)
    comp_key = jnp.where(long_mask, pos, BIG)
    comp_key, comp_cand = jax.lax.sort(
        (comp_key, jnp.maximum(cand, 0)), dimension=0, is_stable=True,
        num_keys=1,
    )
    lidx = comp_key[:K]
    lvalid = lidx < S
    lpos = jnp.where(lvalid, lidx, 0)
    lcand = comp_cand[:K]
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

    cm0 = jnp.full(K, _SORT_LEN, jnp.int32)
    alive0 = lvalid
    cm, _, _ = jax.lax.while_loop(
        round_cond, round_body, (cm0, alive0, jnp.any(alive0))
    )
    mlen = mlen.at[jnp.where(lvalid, lidx, S + 1)].max(cm, mode="drop")

    # -- final admission ---------------------------------------------------
    mlen = jnp.minimum(jnp.minimum(mlen, C.MAX_MATCH_LENGTH), n - pos)
    mlen = jnp.where(ok & (mlen >= C.MIN_MATCH_LENGTH), mlen, 0)
    return mlen, jnp.where(mlen > 0, dist, 0)
