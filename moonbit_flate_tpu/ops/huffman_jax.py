"""In-graph length-limited Huffman construction (vmapped over blocks).

TPU-native reformulation of the reference's boundary package-merge
(huffman-code.mbt:112-244): the eager package-merge recurrence over
fixed-shape sorted lists.  A whole batch of per-block code tables is
built inside one jit region with no host round-trip.  Tie-breaking
matches the host oracle (moonbit_flate_tpu/huffman/encode.py) exactly —
packages win weight ties — so the two paths produce identical code
lengths, which the tests assert.

Performance note (TPU): every rank / merge / histogram step here is a
*dense* one-hot contraction over the tiny alphabet (A <= 286) instead of
searchsorted / scatter.  XLA lowers gather and scatter on TPU to serial
scalar loops (~15 cycles per element), which made the previous
searchsorted formulation cost ~50 ms per 32-block batch; the dense form
fuses into VPU reductions and runs in ~1 ms.  Payload-carrying
jax.lax.sort replaces argsort + fancy-indexing round trips.

Everything is int32 (TPU-friendly, no x64).  Correctness of the weight
clamp: per-block frequencies sum to <= 65537, so every *selected* item's
weight is bounded by the total tree cost <= 65537 * 15 < 2^21.  Items at
or above the 2^22 clamp therefore can never enter the selected 2n-2
prefix, and since heavier items only beget heavier packages, distorting
their relative order cannot change the selected set.

Shapes are static: dead symbols get clamp-level weights and never enter
the selected prefix.  The <= 2-live-symbol special case
(huffman-code.mbt:326-336) is computed branchlessly and selected with
jnp.where.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dense import sort_carry, take1d

_INF = jnp.int32(1) << 22  # above any selectable item weight, see module doc


def _rev16(x, width):
    """Bit-reverse the low `width` bits of x, vectorized (int32 in/out)."""
    x = x.astype(jnp.uint32)
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return (x >> (16 - width).astype(jnp.uint32)).astype(jnp.int32)


def huffman_lengths(freqs: jnp.ndarray, max_bits: int) -> jnp.ndarray:
    """Code lengths for one block's frequency table (A-symbol alphabet).

    freqs: int32[A] (>=0, sum < 2^17).  Returns int32[A] lengths in
    0..max_bits.  vmap over blocks for batching.
    """
    A = freqs.shape[0]
    freqs = freqs.astype(jnp.int32)
    live = freqs > 0
    n_live = jnp.sum(live.astype(jnp.int32))
    sym = jnp.arange(A, dtype=jnp.int32)

    # Sort symbols by (freq, symbol): stable carry-sort keeps symbol
    # order on frequency ties (the reference's by_frequency comparator).
    weight = jnp.where(live, freqs, _INF)
    w_sorted, sym_sorted = sort_carry(weight, sym)

    # Package-merge over fixed 2A-item lists.  Because leaves selected at
    # every level form a *prefix* of the sorted order (the property the
    # reference's lazy leaf_counts bookkeeping rests on,
    # huffman-code.mbt:137-143), items need no payload at all: the forward
    # pass only records, per level, the cumulative leaf count at each list
    # prefix; a backward pass then recovers the per-level boundary counts
    # x_l, and lengths[rank r] = #{levels l : r < x_l}.

    # The reference caps max_bits at n_live - 1 (huffman-code.mbt:126-129);
    # replicate by deactivating the extra packaging rounds.
    n_rounds_eff = jnp.minimum(max_bits, n_live - 1) - 1
    arange_a = jnp.arange(A, dtype=jnp.int32)
    arange_2a = jnp.arange(2 * A, dtype=jnp.int32)
    arange_2a1 = jnp.arange(2 * A + 1, dtype=jnp.int32)

    def level_step(weights, t):
        # Both inputs are sorted (packages of a sorted list are sorted),
        # so the level list is a sorted MERGE.  Ranks and the merged
        # list come from dense one-hot counting — packages win weight
        # ties (side choices match searchsorted left/right).
        pkg_w = jnp.minimum(weights[0::2] + weights[1::2], _INF)  # [A]
        # r_pkg[i] = i + #{j : w_sorted[j] <  pkg_w[i]}
        r_pkg = arange_a + jnp.sum(
            (w_sorted[None, :] < pkg_w[:, None]).astype(jnp.int32), axis=1
        )
        # r_leaf[i] = i + #{j : pkg_w[j] <= w_sorted[i]}
        r_leaf = arange_a + jnp.sum(
            (pkg_w[None, :] <= w_sorted[:, None]).astype(jnp.int32), axis=1
        )
        merged = jnp.sum(
            jnp.where(r_pkg[None, :] == arange_2a[:, None], pkg_w[None, :], 0),
            axis=1,
        ) + jnp.sum(
            jnp.where(r_leaf[None, :] == arange_2a[:, None], w_sorted[None, :], 0),
            axis=1,
        )
        # leaf count among the first k merged items, k = 0..2A
        leaf_pref = jnp.sum(
            (r_leaf[None, :] < arange_2a1[:, None]).astype(jnp.int32), axis=1
        )
        active = t < n_rounds_eff
        new_w = jnp.where(active, merged, weights)
        return new_w, (leaf_pref, active)

    init_w = jnp.concatenate([w_sorted, jnp.full(A, _INF, jnp.int32)])
    _, (leaf_prefs, actives) = jax.lax.scan(
        level_step, init_w, jnp.arange(max_bits - 1)
    )  # leaf_prefs: [L-1, 2A+1] for levels 2..max_bits (in forward order)

    # Backward pass: s_L = 2n-2; x_l = leaves among first s_l items;
    # s_{l-1} = 2 * (s_l - x_l).  Inactive levels pass s through.
    def back_step(s, lvl):
        leaf_pref, active = lvl
        x = jnp.where(active, take1d(leaf_pref, jnp.maximum(s, 0)), 0)
        s_next = jnp.where(active, 2 * (s - x), s)
        return s_next, x

    s_final, xs = jax.lax.scan(
        back_step,
        2 * n_live - 2,
        (leaf_prefs, actives),
        reverse=True,
    )
    # level 1 is the plain leaf list: all remaining selected items are leaves.
    x1 = s_final

    ranks = jnp.arange(A, dtype=jnp.int32)
    rank_lengths = (
        jnp.sum((ranks[None, :] < xs[:, None]).astype(jnp.int32), axis=0)
        + (ranks < x1).astype(jnp.int32)
    )

    # Back to symbol order: re-sort by the carried symbol ids.
    _, lengths = sort_carry(sym_sorted, rank_lengths)

    # Special cases: n_live <= 2 -> every live symbol gets length 1;
    # n_live == 0 -> all zero.
    small = jnp.where(live, 1, 0).astype(jnp.int32)
    lengths = jnp.where(n_live <= 2, small, lengths)
    return jnp.where(live, lengths, 0)


def canonical_codes(lengths: jnp.ndarray) -> jnp.ndarray:
    """Wire-ready (bit-reversed) canonical codes from lengths, one block.

    Matches the host ``canonical_codes`` and the <=2-symbol assignment:
    for 1-bit-only codes the canonical rule assigns 0,1 in symbol order,
    which coincides with the reference's special case.
    """
    A = lengths.shape[0]
    max_len = 15
    live = lengths > 0
    # bl_count via dense histogram over the 16 possible lengths
    lens16 = jnp.arange(max_len + 1, dtype=jnp.int32)
    bl_count = jnp.sum(
        (jnp.where(live, lengths, -1)[None, :] == lens16[:, None]).astype(
            jnp.int32
        ),
        axis=1,
    )
    bl_count = bl_count.at[0].set(0)

    def nc_step(code, ln):
        code = (code + take1d(bl_count, ln - 1)) << 1
        return code, code

    _, next_codes = jax.lax.scan(
        # carry seeded from data (not a constant) so its sharding
        # variance matches the body output under shard_map VMA checking
        nc_step, bl_count[0] * 0, jnp.arange(1, max_len + 1)
    )
    next_code = jnp.concatenate([jnp.zeros(1, jnp.int32), next_codes])  # [16]

    # rank of each symbol within its length group, in symbol order:
    # carry-sort by (len, sym), assign sequential codes, carry-sort back.
    sym = jnp.arange(A, dtype=jnp.int32)
    key = jnp.where(live, lengths * A + sym, jnp.int32(16 * A) + sym)
    _, sorted_lens, sorted_sym = sort_carry(key, lengths, sym)
    # group start index of each sorted position
    is_start = jnp.concatenate(
        [jnp.ones(1, bool), sorted_lens[1:] != sorted_lens[:-1]]
    )
    start_idx = jnp.where(is_start, jnp.arange(A), 0)
    group_start = jax.lax.associative_scan(jnp.maximum, start_idx)
    ranks = jnp.arange(A) - group_start
    raw = take1d(next_code, jnp.clip(sorted_lens, 0, max_len)) + ranks
    codes_sorted = _rev16(raw, jnp.maximum(sorted_lens, 1))
    _, codes = sort_carry(sorted_sym, codes_sorted)
    return jnp.where(live, codes, 0)


def build_codes(freqs: jnp.ndarray, max_bits: int):
    """freqs[B, A] -> (codes[B, A], lengths[B, A]) fully in-graph."""
    lengths = jax.vmap(lambda f: huffman_lengths(f, max_bits))(freqs)
    codes = jax.vmap(canonical_codes)(lengths)
    return codes, lengths
