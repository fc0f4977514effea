"""Vectorized LZ77 match finding — the TPU-native deflateFast.

Reformulation of the reference's sequential hash-table scan
(deflate-fast.mbt:123-270) as data-parallel stages engineered for the
TPU (dense vector ops and multi-operand sorts; never per-element
gathers, which XLA lowers to ~7 ns/element scalar loops):

1. *Candidates*: the nearest previous position holding the same 4 bytes,
   from one stable carry-sort of the 32-bit loads.  4-byte equality is
   exact (the sort key IS the bytes — no hash collisions, unlike the
   reference's direct-mapped 14-bit table).  A second carry-sort
   (key = position) routes candidates back to position order.  Sorts
   carry exactly one payload: lengths are NOT resolved here (a third
   next-4-bytes operand used to ride along for lengths up to 8; the
   walk extends exactly anyway, so it was pure sort traffic).
2. *Small distances (dist <= 8, the RLE regime)* get exact lengths up
   front from eight lag-compare run tables: eq_d[i] = (x[i] == x[i-d])
   and a reverse cummin gives the first mismatch at or after every
   position — pure vector work, and it covers the overlapping-copy
   semantics of dict-decoder.mbt:136-149 exactly.
3. *Lengths beyond 8 at dist > 8* are resolved by the greedy-walk
   Pallas kernel (ops/walk_pallas.py) at commit time: the scalar core
   extends only the tokens the greedy parse actually commits,
   word-at-a-time out of SMEM — O(#committed match bytes), not
   O(positions), replacing the per-position period tables and gathered
   extension loops of the first design (which cost ~30 ms/MB; see git
   history).  On CPU (tests / oracle) the same extension runs as a
   vectorized gather loop instead (extend_matches_xla).

Match admission mirrors the wire rules: distance <= 32768, length in
[4, 258] (MIN_MATCH_LENGTH, deflate.mbt:20).  Cross-64KB-block matches
within a segment are found naturally, which the reference cannot do
(SURVEY.md §2.9.3 quirk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import constants as C

SORT_CAP = 4  # sort candidates report ">= 4, extend at commit": the
              # walk kernel (TPU) / extend_matches_xla (CPU) resolve the
              # exact length, so carrying extension payloads through the
              # sorts only added traffic (a third 2M-element operand)
Z_LAGS = 4    # lags with exact vector-side run lengths (the RLE regime)


def greedy_commit_xla(mlen: jnp.ndarray, n: jnp.ndarray,
                      start: jnp.ndarray | int = 0) -> jnp.ndarray:
    """Greedy tokenization via pointer doubling (O(log S) gather/scatter
    rounds).  Used on CPU; the TPU path uses the Pallas sequential walk
    (walk_pallas.py), which is far cheaper there."""
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


def _resolve_sorted(skey, sj, axis: int):
    """Nearest-previous candidate from sort-adjacent elements."""
    zi = [(0, 0)] * skey.ndim
    zi[axis] = (1, 0)
    shift = lambda a: jnp.pad(a, zi)[
        tuple(slice(0, s) for s in a.shape)
    ]
    same = (skey == shift(skey))
    if axis == 0:
        same = same.at[0].set(False)
    else:
        same = same.at[:, 0].set(False)
    prevj = shift(sj)
    return jnp.where(same, prevj, -1)


def _nearest_prev_flat(u32e: jnp.ndarray, S: int):
    """Flat-sort candidate search (CPU & small segments)."""
    u32 = u32e[:S]
    pos = jnp.arange(S, dtype=jnp.int32)
    skey, spos = jax.lax.sort(
        (u32, pos), dimension=0, is_stable=True, num_keys=1
    )
    cand_s = _resolve_sorted(skey, spos, axis=0)
    _, cand = jax.lax.sort(
        (spos, cand_s), dimension=0, is_stable=True, num_keys=1
    )
    return cand


def _nearest_prev_windowed(u32e: jnp.ndarray, S: int):
    """Windowed batched candidate search.

    Admissible distances are <= 32768 (MAX_MATCH_OFFSET), so the nearest
    previous occurrence only matters within a 32 KB history.  Cut the
    segment into 64 KB windows at 32 KB stride (windows share halves, so
    they're built by reshape+stack — no gathers); each position takes its
    result from the window where it sits in the upper half (>= 32 KB of
    in-window history).  The sorts become batched [NW, 65536] sorts
    along the last axis — better TPU utilization than one flat length-S
    sort.

    Sort 1 keys on the exact 4-byte loads with the position as carried
    payload (a 16-bit hash<<16|pos fused key was tried and REVERTED:
    hash collisions on incompressible data produce candidates the
    walk must reject one serial position at a time — 15% slower end to
    end on the bench corpus, plus ratio risk).  Round 5 re-measured
    narrower sort operands on-chip (tools/probe_sort.py): u16 hash key
    + u16 payload runs 4.3x SLOWER and a fused u32 hash<<16|pos16 7.3x
    SLOWER than this exact-u32+u16 form — XLA's TPU sort lowers
    sub-32-bit keys poorly, so operand-narrowing is a dead end here.  Sort 2 is fused into a
    SINGLE u32 operand: in-window positions and candidates both fit 16
    bits, so (pos << 16 | cand) routes candidates back to position
    order with half the traffic of a key+payload pair — 3 sorted
    operands total instead of 4, exactly.
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
    # in-window positions fit u16: half the payload traffic through
    # the comparator network
    jloc = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint16), (NW, W))

    # (A halves-sorted + hand-built bitonic merge factoring was tried
    # and reverted: 16 unfused compare-exchange passes — whether
    # reshape- or roll-based — cost more HBM traffic than the fused
    # lax.sort comparator network saves; measured +3.3 ms/MB.)
    skey, sj = jax.lax.sort(
        (key, jloc), dimension=1, is_stable=True, num_keys=1
    )
    same = skey == jnp.pad(skey, ((0, 0), (1, 0)))[:, :W]
    same = same.at[:, 0].set(False)
    prevj = jnp.pad(sj, ((0, 0), (1, 0)))[:, :W]
    # sentinel 0xFFFF = no candidate: a real candidate is always
    # strictly below its position <= 0xFFFF
    cand16 = jnp.where(same, prevj, jnp.uint16(0xFFFF))

    # route back to position order with a single-operand u32 sort
    k2 = (sj.astype(jnp.uint32) << 16) | cand16.astype(jnp.uint32)
    k2s = jax.lax.sort(k2, dimension=1)
    cand_w = (k2s & jnp.uint32(0xFFFF)).astype(jnp.int32)
    cand_w = jnp.where(cand_w == 0xFFFF, -1, cand_w)
    # globalize candidates, then take each position's designated window:
    # window 0 contributes [0, W), window k >= 1 contributes its upper half
    base = (jnp.arange(NW, dtype=jnp.int32) * H)[:, None]
    cand_g = jnp.where(cand_w >= 0, cand_w + base, -1)
    cand = jnp.concatenate(
        [cand_g[0], cand_g[1:, H:].reshape(-1)]
    )[:S]
    return cand


def _small_period_lengths(data: jnp.ndarray, S: int) -> jnp.ndarray:
    """Exact run lengths for the Z_LAGS smallest lags.

    Returns z[Z_LAGS, S]: z[d-1, i] = length of the agreement run between
    data[i:] and data[i-d:] (0 where data[i] != data[i-d] or i < d),
    clipped at MAX_MATCH_LENGTH.  One lag-compare plus one reverse
    cummin per lag — pure vector work, no gathers.
    """
    big = jnp.int32(S)
    pos = jnp.arange(S, dtype=jnp.int32)
    rows = []
    for d in range(1, Z_LAGS + 1):
        eq = jnp.concatenate(
            [jnp.zeros(d, jnp.bool_), data[d:S] == data[: S - d]]
        )
        rows.append(jnp.where(eq, big, pos))
    m = jnp.stack(rows)                                    # [Z_LAGS, S]
    z = jnp.flip(jax.lax.cummin(jnp.flip(m, 1), axis=1), 1)
    return jnp.minimum(z - pos[None, :], C.MAX_MATCH_LENGTH)


def find_matches(data: jnp.ndarray, n: jnp.ndarray):
    """Per-position best matches for one segment.

    data: uint8[S + 320] zero-padded past n.
    n:    int32 scalar valid byte count.
    Returns (mlen[S] int32, dist[S] int32).  Lengths are exact up to
    MAX_MATCH_LENGTH for dist <= Z_LAGS (lag run tables) and reported
    as SORT_CAP (= ">= 4, extend at commit") otherwise — walk_pallas on
    TPU, extend_matches_xla on CPU resolve the exact length.
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
    pos = jnp.arange(S, dtype=jnp.int32)

    if S > 2 * _WIN:
        cand = _nearest_prev_windowed(u32e, S)
    else:
        cand = _nearest_prev_flat(u32e, S)

    dist = pos - cand
    ok = (
        (pos <= n - 4)
        & (cand >= 0)
        & (dist <= C.MAX_MATCH_OFFSET)
    )
    mlen = jnp.where(ok, SORT_CAP, 0)         # ">= 4, extend at commit"

    # exact lengths for the Z_LAGS smallest distances (RLE/overlap regime)
    z = _small_period_lengths(data[:S], S)
    sel = jnp.zeros(S, jnp.int32)
    for d in range(1, Z_LAGS + 1):
        sel = jnp.where(dist == d, z[d - 1], sel)
    mlen = jnp.where(ok & (dist <= Z_LAGS), sel, mlen)

    # tail safety: bytes past n are padding garbage
    mlen = jnp.minimum(mlen, n - pos)
    mlen = jnp.where(ok & (mlen >= C.MIN_MATCH_LENGTH), mlen, 0)
    return mlen, jnp.where(mlen > 0, dist, 0)


def extend_matches_xla(data: jnp.ndarray, mlen: jnp.ndarray,
                       dist: jnp.ndarray, n: jnp.ndarray,
                       cap: jnp.ndarray) -> jnp.ndarray:
    """Resolve capped lengths on CPU: a vectorized gather loop extending
    every dist > Z_LAGS, len == SORT_CAP candidate 4 bytes per round.
    The TPU path never calls this (walk_pallas extends at commit)."""
    S = mlen.shape[0]
    SE = S + 300
    d32 = data.astype(jnp.uint32)
    u32e = (
        d32[:SE]
        | (d32[1 : SE + 1] << 8)
        | (d32[2 : SE + 2] << 16)
        | (d32[3 : SE + 3] << 24)
    )
    pos = jnp.arange(S, dtype=jnp.int32)
    max_l = jnp.minimum(jnp.minimum(C.MAX_MATCH_LENGTH, n - pos), cap)
    active0 = (dist > Z_LAGS) & (mlen == SORT_CAP) & (max_l > SORT_CAP)
    lo = jnp.where(active0, jnp.int32(SORT_CAP), mlen)

    def body(state):
        L, act = state
        a = jnp.clip(pos + L, 0, SE - 1)
        b = jnp.clip(pos - dist + L, 0, SE - 1)
        x = jnp.where(act, u32e[a] ^ u32e[b], jnp.uint32(1))
        tzb = jnp.minimum(_tz_bytes(x), max_l - L)
        L = L + jnp.where(act, tzb, 0)
        act = act & (tzb == 4) & (L + 4 <= max_l)
        return L, act

    def cond(state):
        return jnp.any(state[1])

    L, _ = jax.lax.while_loop(cond, body, (lo, active0))
    # a full-word tail may stop 1-3 bytes short of max_l
    a = jnp.clip(pos + L, 0, SE - 1)
    b = jnp.clip(pos - dist + L, 0, SE - 1)
    tail = jnp.minimum(_tz_bytes(u32e[a] ^ u32e[b]), max_l - L)
    L = L + jnp.where(active0, jnp.maximum(tail, 0), 0)
    return jnp.where(mlen > 0, jnp.minimum(L, max_l), 0)


def pack_match_info(mlen: jnp.ndarray, dist: jnp.ndarray,
                    ctx: jnp.ndarray, S_pad: int):
    """Pack matcher output for the greedy-walk kernel.

    Returns (minfo int32[S_pad] = dist << 9 | mlen at match starts,
             grp int32[S_pad/32] bitmask of match-start positions).
    Positions before ``ctx`` never start a token (context prefix,
    SURVEY §2.9.4) but remain referencable as match sources.
    """
    S = mlen.shape[0]
    pos = jnp.arange(S, dtype=jnp.int32)
    has = (mlen >= C.MIN_MATCH_LENGTH) & (pos >= ctx)
    minfo = jnp.where(has, (dist << 9) | mlen, 0)
    if S_pad > S:
        minfo = jnp.concatenate([minfo, jnp.zeros(S_pad - S, jnp.int32)])
    bits = (minfo != 0).astype(jnp.uint32).reshape(-1, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    grp = jnp.sum(bits * weights, axis=1).astype(jnp.int32)
    return minfo, grp
