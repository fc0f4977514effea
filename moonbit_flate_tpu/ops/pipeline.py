"""The jit-compiled segment encoder: bytes in, DEFLATE bitstream out.

One ``encode_segment`` call compresses a whole segment (NB blocks of
65535 bytes) on-device with no host round-trips:

  match find -> greedy commit (Pallas scalar walk) -> per-block
  histograms -> in-graph package-merge Huffman -> codegen RLE headers ->
  per-block dynamic-vs-stored policy (a tiny NB-step scan carrying bit
  alignment) -> prefix-sum bit packing -> one contiguous bitstream.

Design properties (SURVEY.md §7):

- Blocks are 65535 bytes (max_store_block_size, deflate-fast.mbt:46) so
  the stored fallback always fits and block token groups align with byte
  ranges (matches are clipped at block boundaries; the in-segment sort
  still finds cross-block candidates, which the reference cannot).
- The per-block policy picks min(true dynamic size, stored size) — a
  strictly better rule than the reference's heuristics (SURVEY §2.9.2),
  keeping output at-or-below reference sizes.
- Every segment ends byte-aligned (an empty stored block is appended
  in-graph only when the segment would end mid-byte), so segments
  compress independently and concatenate bytewise — this is what makes
  the multi-chip data-parallel layer a pure gather (SURVEY §5.7/5.8).
- TPU-shaped data movement: *zero serial gathers or scatters* between
  match finding and the final pack.  Every table lookup and histogram is
  a dense one-hot contraction (ops/dense.py — XLA's gather/scatter on
  TPU cost ~15 cycles/element; the dense forms fuse into VPU reductions
  and are 30-70x faster at these table sizes).  Token attributes are
  computed in a block-aligned [nb, BLOCK] layout (the payload is rolled
  left by the context length) so per-block code tables broadcast instead
  of being gathered through a flattened index.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import constants as C
from . import tables as T
from .dense import hist_rows, take_rows
from .header import SEQ_LEN, codegen_emissions
from .huffman_jax import build_codes
from .matcher import (extend_matches_xla, find_matches, greedy_commit_xla,
                      pack_match_info)

BLOCK = C.MAX_STORE_BLOCK_SIZE          # 65535
PAD = 320                               # matcher gather slack
HDR_UNITS = 4 + 19 + SEQ_LEN            # 339 header unit slots per block
UNITS_PER_POS = 1   # fused <=48-bit emissions; spill rides the next slot

_ORDER_NP = np.asarray(C.CODEGEN_ORDER, np.int32)  # static permutation


def _cksum(*arrays):
    """Order-dependent checksum forcing materialization of every input
    (profiling aid: prevents XLA from dead-code-eliminating a stage when
    the pipeline is cut early via ``stage_cut``)."""
    acc = jnp.int32(0)
    for a in arrays:
        acc = acc + jnp.sum(a.astype(jnp.int32) if a.dtype != jnp.int32 else a)
    return acc


def pack_units(values: jnp.ndarray, widths: jnp.ndarray, n_words: int):
    """LSB-first bit packing: scatter units (<=28 bits each) into u32 words.

    The XLA twin of bitio.writer.pack_bits: exclusive prefix sum of widths
    gives bit offsets; each unit contributes to at most two words via
    shifted adds (bits are disjoint, so add == or).  Offsets are monotone,
    so the scatter indices are sorted — declared to XLA.
    """
    widths = widths.astype(jnp.uint32)
    v = values.astype(jnp.uint32) & ((jnp.uint32(1) << widths) - jnp.uint32(1))
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.uint32), jnp.cumsum(widths)[:-1]]
    )
    total = offsets[-1] + widths[-1]
    w_idx = (offsets >> 5).astype(jnp.int32)
    sh = offsets & jnp.uint32(31)
    lo = v << sh
    hi = (v >> jnp.uint32(1)) >> (jnp.uint32(31) - sh)
    words = jnp.zeros(n_words, jnp.uint32)
    words = words.at[w_idx].add(lo, mode="drop", indices_are_sorted=True)
    words = words.at[w_idx + 1].add(hi, mode="drop", indices_are_sorted=True)
    return words, total.astype(jnp.int32)


def _find_clip(data_padded: jnp.ndarray, n: jnp.ndarray, ctx: jnp.ndarray,
               nb: int):
    """Stage 1a (single segment, vmappable): candidate matches, clipped
    at 65535-byte block boundaries so token groups == byte ranges."""
    S = nb * BLOCK
    ctx = jnp.asarray(ctx, jnp.int32)
    pos = jnp.arange(S, dtype=jnp.int32)
    blk_orig = jnp.clip(pos - ctx, 0, S - 1) // BLOCK
    mlen, dist = find_matches(data_padded, n)
    block_end = ctx + (blk_orig + 1) * BLOCK
    mlen = jnp.minimum(mlen, block_end - pos)
    mlen = jnp.where(mlen >= C.MIN_MATCH_LENGTH, mlen, 0)
    return mlen, dist, block_end


def _commit_walk_batch(data_padded: jnp.ndarray, mlen: jnp.ndarray,
                       dist: jnp.ndarray, n: jnp.ndarray, ctx: jnp.ndarray,
                       nb: int):
    """Stage 1b on TPU: ONE Pallas walk dispatch commits B segments
    (greedy parse + lazy extension; grid = (B, chunks))."""
    from .walk_pallas import CHUNK as WCHUNK
    from .walk_pallas import HALO as WHALO
    from .walk_pallas import SLACK as WSLACK
    from .walk_pallas import walk_batch

    B = data_padded.shape[0]
    S = nb * BLOCK
    S_pad = -(-S // WCHUNK) * WCHUNK
    minfo, grp = jax.vmap(
        lambda m, d, c: pack_match_info(m, d, c, S_pad)
    )(mlen, dist, ctx)
    nbytes = WHALO + S_pad + WSLACK
    pb = jnp.concatenate([
        jnp.zeros((B, WHALO), jnp.uint8), data_padded,
        jnp.zeros((B, nbytes - WHALO - data_padded.shape[1]), jnp.uint8),
    ], axis=1).reshape(B, -1, 4).astype(jnp.uint32)
    words = (pb[..., 0] | (pb[..., 1] << 8)
             | (pb[..., 2] << 16) | (pb[..., 3] << 24))
    words = jax.lax.bitcast_convert_type(words, jnp.int32)
    bits_o, minfo_o = walk_batch(grp, minfo, words, ctx, n)
    pos = jnp.arange(S, dtype=jnp.int32)
    match_start = (
        (bits_o[:, :, None] >> jnp.arange(32, dtype=jnp.int32)[None, None, :])
        & 1
    ).reshape(B, -1)[:, :S] > 0
    mlen2 = jnp.where(match_start, minfo_o[:, :S] & 511, 0)
    dist2 = jnp.where(match_start, minfo_o[:, :S] >> 9, 0)
    reach = jnp.where(match_start, pos[None, :] + mlen2, 0)
    cmax = jax.lax.cummax(reach, axis=1)
    covered = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), cmax[:, :-1]], axis=1
    ) > pos[None, :]
    committed = ((match_start | ~covered)
                 & (pos[None, :] >= ctx[:, None])
                 & (pos[None, :] < n[:, None]))
    return committed, match_start, mlen2, dist2


def _commit_xla(data_padded: jnp.ndarray, mlen: jnp.ndarray,
                dist: jnp.ndarray, n: jnp.ndarray, ctx: jnp.ndarray,
                block_end: jnp.ndarray, nb: int):
    """Stage 1b on CPU (tests / oracle): vectorized extension + pointer-
    doubling greedy commit (single segment, vmappable)."""
    S = nb * BLOCK
    pos = jnp.arange(S, dtype=jnp.int32)
    mlen = extend_matches_xla(data_padded, mlen, dist, n, block_end - pos)
    mlen = jnp.where(mlen >= C.MIN_MATCH_LENGTH, mlen, 0)
    committed = greedy_commit_xla(mlen, n, ctx)
    is_match = committed & (mlen > 0)
    return committed, is_match, mlen, dist


@partial(jax.jit, static_argnums=(3, 4, 5))
def encode_segment_ctx(data_padded: jnp.ndarray, n: jnp.ndarray,
                       ctx: jnp.ndarray, nb: int,
                       stage_cut: int | None = None,
                       ctx_is_zero: bool = False):
    """Compress one segment of up to nb*65535 payload bytes.

    data_padded: uint8[nb*BLOCK + PAD] (zero padded past n).  The first
    ``ctx`` bytes are *context only* (reader-style preset dictionary /
    shard halo, SURVEY §2.9.4, §5.7): the matcher may reference them but
    no tokens are emitted for them.
    n: int32 valid byte count (context + payload)
    Returns (words uint32[W], total_bits int32).

    stage_cut (profiling only): stop after stage k and return a
    checksum of that stage's live outputs instead of the bitstream.
    """
    S = nb * BLOCK
    assert data_padded.shape[0] == S + PAD
    ctx = jnp.asarray(ctx, jnp.int32)
    n = jnp.asarray(n, jnp.int32)

    # ---- stage 1: matching + greedy parse (position layout) ---------------
    mlen, dist, block_end = _find_clip(data_padded, n, ctx, nb)
    if stage_cut == 1:
        return _cksum(mlen, dist), jnp.int32(0)

    if jax.default_backend() == "tpu":
        committed, is_match, mlen, dist = jax.tree.map(
            lambda a: a[0],
            _commit_walk_batch(data_padded[None], mlen[None], dist[None],
                               n.reshape(1), ctx.reshape(1), nb),
        )
    else:
        committed, is_match, mlen, dist = _commit_xla(
            data_padded, mlen, dist, n, ctx, block_end, nb)

    if stage_cut == 2:
        return _cksum(committed, is_match, mlen, dist), jnp.int32(0)

    res = _tokens_to_units(data_padded, n, ctx, committed, is_match,
                           mlen, dist, nb, stage_cut, ctx_is_zero)
    if stage_cut is not None and 3 <= stage_cut <= 7:
        return res
    all_vals, all_wids = res

    # ---- stage 8: pack -------------------------------------------------------
    max_bits = 8 * S + nb * 64 + 64
    n_words = max_bits // 32 + 2
    if jax.default_backend() == "tpu":
        # hierarchical dense merge + Pallas placement (ops/pack.py):
        # ~15x cheaper than the scatter formulation on TPU
        from .pack import pack_units_dense

        words, total_bits = pack_units_dense(all_vals, all_wids, n_words)
    else:
        words, total_bits = pack_units(all_vals, all_wids, n_words)
    return words, total_bits


def _tokens_to_units(data_padded: jnp.ndarray, n: jnp.ndarray,
                     ctx: jnp.ndarray, committed: jnp.ndarray,
                     is_match: jnp.ndarray, mlen: jnp.ndarray,
                     dist: jnp.ndarray, nb: int,
                     stage_cut: int | None = None,
                     ctx_is_zero: bool = False):
    """Stages 2-7: committed tokens -> flat (value, width) unit arrays.

    Pure per-segment array code (no Pallas), shared by the single-
    segment path (with its stage_cut profiling hooks) and the batched
    path (under jax.vmap).
    """
    S = nb * BLOCK
    xlen = jnp.where(is_match, mlen - 3, 0)
    xoff = jnp.where(is_match, dist - 1, 0)
    lc = T.length_code(jnp.clip(xlen, 0, 255))
    dc = T.offset_code(xoff)
    data = data_padded[:S].astype(jnp.int32)
    sym = jnp.where(is_match, 257 + lc, data)

    # ---- roll to block-aligned payload layout [nb, BLOCK] ------------------
    # (the roll by a traced ctx costs ~8 full-array copies; the common
    # context-free path declares ctx == 0 statically and skips them)
    def blkify(a):
        if ctx_is_zero:
            return a.reshape(nb, BLOCK)
        return jnp.roll(a, -ctx, 0).reshape(nb, BLOCK)

    jpos_b = jnp.arange(BLOCK, dtype=jnp.int32)
    valid = (jnp.arange(S, dtype=jnp.int32) < n - ctx).reshape(nb, BLOCK)
    committed_b = blkify(committed) & valid
    is_match_b = blkify(is_match) & valid
    sym_b = blkify(sym)
    lc_b = blkify(lc)
    dc_b = blkify(dc)
    xlen_b = blkify(xlen)
    xoff_b = blkify(xoff)
    data_b = blkify(data)

    # per-block byte counts
    n_b = jnp.clip(n - ctx - jnp.arange(nb) * BLOCK, 0, BLOCK)
    live_b = n_b > 0
    if stage_cut == 3:
        return _cksum(committed_b, is_match_b, sym_b, lc_b, dc_b,
                      xlen_b, xoff_b, data_b, n_b), jnp.int32(0)

    # ---- stage 2: histograms (dense one-hot) -------------------------------
    lit_freq = hist_rows(jnp.where(committed_b, sym_b, 286), 286)
    lit_freq = lit_freq.at[:, C.END_BLOCK_MARKER].add(live_b.astype(jnp.int32))
    off_freq = hist_rows(jnp.where(is_match_b, dc_b, 30), 30)

    sym_range_l = jnp.arange(286, dtype=jnp.int32)
    nl_b = 1 + jnp.max(
        jnp.where(lit_freq > 0, sym_range_l[None, :], -1), axis=1
    )
    sym_range_o = jnp.arange(30, dtype=jnp.int32)
    no_b = 1 + jnp.max(
        jnp.where(off_freq > 0, sym_range_o[None, :], -1), axis=1
    )
    # no matches at all: keep the offset tree encodable
    # (huffman-bit-writer.mbt:584-589)
    need_fake = live_b & (no_b == 0)
    off_freq = off_freq.at[:, 0].add(need_fake.astype(jnp.int32))
    no_b = jnp.maximum(no_b, jnp.where(live_b, 1, 0))

    if stage_cut == 4:
        return _cksum(lit_freq, off_freq, nl_b, no_b), jnp.int32(0)

    # ---- stage 3: Huffman tables -------------------------------------------
    # one batched construction for both alphabets (dist padded to 286):
    # halves the per-level scan overhead and the compile surface
    both_freq = jnp.concatenate(
        [lit_freq,
         jnp.pad(off_freq, ((0, 0), (0, 286 - 30)))], axis=0
    )
    both_codes, both_lens = build_codes(both_freq, C.LIT_LEN_MAX_BITS)
    lit_codes, lit_lens = both_codes[:nb], both_lens[:nb]
    off_codes, off_lens = both_codes[nb:, :30], both_lens[nb:, :30]

    if stage_cut == 5:
        return _cksum(lit_codes, lit_lens, off_codes, off_lens), jnp.int32(0)

    # ---- stage 4: codegen RLE + header sizes -------------------------------
    jpos = jnp.arange(SEQ_LEN, dtype=jnp.int32)
    lit_part = take_rows(
        lit_lens, jnp.clip(jpos, 0, 285)[None, :].repeat(nb, 0)
    )
    off_part = take_rows(
        off_lens, jnp.clip(jpos[None, :] - nl_b[:, None], 0, 29)
    )
    seq = jnp.where(jpos[None, :] < nl_b[:, None], lit_part, off_part)
    cg_sym, cg_pv, cg_pw, cg_freq = jax.vmap(codegen_emissions)(
        seq, nl_b + no_b
    )
    cg_codes, cg_lens = build_codes(cg_freq, C.CODEGEN_MAX_BITS)

    order_freq = cg_freq[:, _ORDER_NP]
    idx19 = jnp.arange(19, dtype=jnp.int32)
    ncg_b = jnp.maximum(
        4, 1 + jnp.max(jnp.where(order_freq > 0, idx19[None, :], -1), axis=1)
    )

    # true dynamic bit size per block
    extra_l = jnp.sum(lit_freq[:, 257:286] * T.LENGTH_EXTRA_BITS[None, :], axis=1)
    extra_o = jnp.sum(off_freq * T.OFFSET_EXTRA_BITS[None, :], axis=1)
    cg_hdr = (
        jnp.sum(cg_freq * cg_lens, axis=1)
        + cg_freq[:, 16] * 2 + cg_freq[:, 17] * 3 + cg_freq[:, 18] * 7
    )
    dyn_bits = (
        17 + 3 * ncg_b + cg_hdr
        + jnp.sum(lit_freq * lit_lens, axis=1)
        + jnp.sum(off_freq * off_lens, axis=1)
        + extra_l + extra_o
    )

    if stage_cut == 6:
        return _cksum(cg_sym, cg_pv, cg_pw, cg_codes, cg_lens, ncg_b,
                      dyn_bits), jnp.int32(0)

    # ---- stage 5: per-block policy (dynamic vs stored) ---------------------
    def policy_step(bitpos8, x):
        dyn, nbytes, live = x
        pad = (8 - ((bitpos8 + 3) % 8)) % 8
        stored = 3 + pad + 32 + 8 * nbytes
        use_stored = live & (stored < dyn)
        chosen = jnp.where(live, jnp.where(use_stored, stored, dyn), 0)
        return (bitpos8 + chosen) % 8, (use_stored, pad)

    _, (use_stored, pad_b) = jax.lax.scan(
        # data-seeded carry: see huffman_jax.canonical_codes (VMA note)
        policy_step, dyn_bits[0] * 0, (dyn_bits, n_b, live_b)
    )

    # ---- stage 6: unit assembly (dense lookups, reshape/concat only) -------
    live_i = live_b.astype(jnp.int32)
    st = use_stored
    dyn_sel = live_b & ~st

    # header zone: [nb, HDR_UNITS]
    h0v = jnp.where(st, 0, 4)
    h0w = 3 * live_i
    h1v = jnp.where(st, 0, nl_b - 257)
    h1w = jnp.where(st, pad_b, 5) * live_i
    h2v = jnp.where(st, n_b, no_b - 1)
    h2w = jnp.where(st, 16, 5) * live_i
    h3v = jnp.where(st, (~n_b) & 0xFFFF, ncg_b - 4)
    h3w = jnp.where(st, 16, 4) * live_i
    head4_v = jnp.stack([h0v, h1v, h2v, h3v], axis=1)
    head4_w = jnp.stack([h0w, h1w, h2w, h3w], axis=1)

    cg_order_lens = cg_lens[:, _ORDER_NP]
    cl_v = jnp.where(dyn_sel[:, None], cg_order_lens, 0)
    cl_w = jnp.where(
        dyn_sel[:, None] & (idx19[None, :] < ncg_b[:, None]), 3, 0
    )

    # codegen stream: one fused unit per emission (code | payload << len)
    # (code and len ride ONE packed table -> one one-hot reduction)
    cg_sym_c = jnp.clip(cg_sym, 0, 18)
    cg_g = take_rows(cg_codes | (cg_lens << 16), cg_sym_c)
    cg_code_u, cg_len_u = cg_g & 0xFFFF, cg_g >> 16
    emit = dyn_sel[:, None] & (cg_sym >= 0)
    cgu_v = jnp.where(emit, cg_code_u | (cg_pv << cg_len_u), 0)
    cgu_w = jnp.where(emit, cg_len_u + cg_pw, 0)

    hdr_vals = jnp.concatenate([head4_v, cl_v, cgu_v], axis=1)
    hdr_wids = jnp.concatenate([head4_w, cl_w, cgu_w], axis=1)

    # token zone: [nb, BLOCK] — per-block code tables broadcast densely;
    # codes (<= 15 bits) and lens (<= 15) share one packed i32 table so
    # the [N, 286] one-hot reduction runs once, not twice
    lit_g = take_rows(lit_codes | (lit_lens << 16), sym_b)
    lit_code_g, lit_len_g = lit_g & 0xFFFF, lit_g >> 16
    len_base_b, len_eb_b = T.length_base_extra(lc_b)
    leb = jnp.where(is_match_b, len_eb_b, 0)
    len_ev = jnp.where(is_match_b, xlen_b - (len_base_b - 3), 0)

    st_b = st[:, None]
    dyn_b = dyn_sel[:, None]
    u0_dyn = committed_b & dyn_b
    m_dyn = is_match_b & dyn_b

    off_g = take_rows(off_codes | (off_lens << 16), dc_b)
    off_code_g, off_len_g = off_g & 0xFFFF, off_g >> 16
    off_base_b, off_eb_b = T.offset_base_extra(dc_b)
    oeb = off_eb_b
    off_ev = xoff_b - (off_base_b - 1)

    # ONE unit slot per position (halving the pack's slot count, its
    # dominant cost): each committed position fuses its whole emission
    # — lit/len code, length extra, offset code, offset extra, LSB
    # first, <= 48 bits — and splits at the 28-bit unit cap.  The tail
    # spills into the NEXT position's slot: a match is >= 4 bytes even
    # after block clipping, so the next slot is always covered (never
    # itself committed), and spills never cross a block boundary.
    a_val = (lit_code_g | (len_ev << lit_len_g)).astype(jnp.uint32)
    a_w = lit_len_g + leb                                  # <= 20
    b_val = jnp.where(
        m_dyn, off_code_g | (off_ev << off_len_g), 0
    ).astype(jnp.uint32)
    b_w = jnp.where(m_dyn, off_len_g + oeb, 0)             # <= 28
    s1 = jnp.asarray(a_w, jnp.uint32)
    lo48 = a_val | (b_val << s1)
    hi48 = (b_val >> jnp.uint32(1)) >> (jnp.uint32(31) - s1)  # b >> (32-s1)
    w48 = a_w + b_w
    u0_w = jnp.minimum(w48, 28)
    sp_w = w48 - u0_w                                      # <= 20
    u0s = jnp.asarray(u0_w, jnp.uint32)
    u0_val48 = (lo48 & ((jnp.uint32(1) << u0s) - 1)).astype(jnp.int32)
    sp_val = ((lo48 >> u0s)
              | ((hi48 << jnp.uint32(1)) << (jnp.uint32(31) - u0s))
              ).astype(jnp.int32)

    u0_val = jnp.where(st_b, data_b, jnp.where(u0_dyn, u0_val48, 0))
    u0_wid = jnp.where(st_b & valid, 8, jnp.where(u0_dyn, u0_w, 0))
    sp_v = jnp.where(m_dyn, sp_val, 0)
    sp_wg = jnp.where(m_dyn, sp_w, 0)
    spill_v = jnp.pad(sp_v[:, :-1], ((0, 0), (1, 0)))
    spill_w = jnp.pad(sp_wg[:, :-1], ((0, 0), (1, 0)))
    # a slot holds its own emission OR a predecessor's spill, never
    # both (the spill's target is covered, hence width-0 itself)
    tok_vals = u0_val | spill_v
    tok_wids = u0_wid + spill_w

    # EOB unit per block
    eob_v = jnp.where(dyn_sel, lit_codes[:, C.END_BLOCK_MARKER], 0)[:, None]
    eob_w = jnp.where(dyn_sel, lit_lens[:, C.END_BLOCK_MARKER], 0)[:, None]

    flat_vals = jnp.concatenate([hdr_vals, tok_vals, eob_v], axis=1).reshape(-1)
    flat_wids = jnp.concatenate([hdr_wids, tok_wids, eob_w], axis=1).reshape(-1)

    # ---- stage 7: segment trailer (byte alignment) --------------------------
    # If the segment ends mid-byte, append an empty stored block whose
    # header pad realigns the stream.
    body_bits = jnp.sum(flat_wids)
    misaligned = (body_bits % 8) != 0
    t_pad = (8 - ((body_bits + 3) % 8)) % 8
    trailer_vals = jnp.stack(
        [jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0xFFFF)]
    )
    trailer_wids = jnp.where(
        misaligned,
        jnp.stack([jnp.int32(3), t_pad, jnp.int32(16), jnp.int32(16)]),
        jnp.zeros(4, jnp.int32),
    )
    all_vals = jnp.concatenate([flat_vals, trailer_vals])
    all_wids = jnp.concatenate([flat_wids, trailer_wids])

    if stage_cut == 7:
        return _cksum(all_vals, all_wids), jnp.int32(0)
    return all_vals, all_wids


@partial(jax.jit, static_argnums=(2,))
def encode_segment(data_padded: jnp.ndarray, n: jnp.ndarray, nb: int):
    """Context-free segment encode (the common path)."""
    return encode_segment_ctx(data_padded, n, jnp.int32(0), nb)


@jax.jit
def compact_streams(words: jnp.ndarray, bits: jnp.ndarray):
    """Concatenate B byte-aligned segment streams on device.

    words: uint32[B, W] per-segment stream words (zero past each
    segment's end); bits: int32[B] bit counts (multiples of 8).
    Returns (stream uint32[B*W+1] — only the first ceil(total/4) words
    are meaningful — and total_bytes int32).  Keeps the host transfer
    proportional to COMPRESSED size: fetching the padded [B, W] words
    through the device link costs ~3x the whole encode compute.
    """
    B, W = words.shape
    sizes = bits // 8
    csum = jnp.cumsum(sizes)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), csum[:-1]])

    def place(b, buf):
        off = offsets[b]
        sh = (off % 4).astype(jnp.uint32) * 8
        w = words[b].astype(jnp.uint32)
        lo = jnp.where(sh > 0, w << sh, w)
        hi = jnp.where(sh > 0, (w >> 1) >> (31 - sh), 0)
        seg = jnp.concatenate([lo, jnp.zeros(1, jnp.uint32)])
        seg = seg.at[1:].set(seg[1:] | hi)
        cur = jax.lax.dynamic_slice(buf, (off // 4,), (W + 1,))
        return jax.lax.dynamic_update_slice(buf, cur | seg, (off // 4,))

    buf = jax.lax.fori_loop(0, B, place, jnp.zeros(B * W + 1, jnp.uint32))
    return buf, csum[-1]


@partial(jax.jit, static_argnums=(3, 4))
def encode_segments(data_padded: jnp.ndarray, n: jnp.ndarray,
                    ctx: jnp.ndarray, nb: int, ctx_is_zero: bool = False):
    """Batched segment encode: one dispatch for B independent segments
    (lax.map of the single-segment pipeline).

    Measured on-chip A/B (tools/ab_encode.py): this form runs the
    corpus at 19.5 ms/MB vs the vmapped-batched form's 21-25 ms/MB
    (and compiles 2-10x faster) — XLA's fusion choices for the
    per-segment shapes beat the batched ones, and the Pallas walk
    amortizes fine through lax.map because the whole map is one
    dispatch.  The fully-batched path is kept below as
    encode_segments_batched for further work.
    """

    def one(args):
        d, nn, cc = args
        return encode_segment_ctx(d, nn, cc, nb, None, ctx_is_zero)

    return jax.lax.map(one, (data_padded, n, ctx))


@partial(jax.jit, static_argnums=(3,))
def encode_segments_batched(data_padded: jnp.ndarray, n: jnp.ndarray,
                            ctx: jnp.ndarray, nb: int):
    """Vmapped-batched segment encode: every stage batched over B.

    data_padded: uint8[B, nb*BLOCK + PAD]; n, ctx: int32[B].
    Returns (words uint32[B, W], total_bits int32[B]).

    Every stage is genuinely batched (not lax.map-serialized, which
    amortized only dispatch overhead): the matcher sorts run as
    [B*NW, 65536] batched sorts, the Pallas walk commits all B segments
    in one grid, the histogram/huffman/unit stages are vmapped (XLA
    batching rules turn them into single wider ops), and the pack
    placement kernel grids over (B, entity chunks).  Wider arrays keep
    the VPU utilized where per-segment shapes ran at small-array
    latency floors."""
    B = data_padded.shape[0]
    S = nb * BLOCK
    n = jnp.asarray(n, jnp.int32).reshape(B)
    ctx = jnp.asarray(ctx, jnp.int32).reshape(B)
    mlen, dist, block_end = jax.vmap(
        partial(_find_clip, nb=nb))(data_padded, n, ctx)
    if jax.default_backend() == "tpu":
        committed, is_match, mlen, dist = _commit_walk_batch(
            data_padded, mlen, dist, n, ctx, nb)
    else:
        committed, is_match, mlen, dist = jax.vmap(
            partial(_commit_xla, nb=nb)
        )(data_padded, mlen, dist, n, ctx, block_end)
    vals, wids = jax.vmap(
        partial(_tokens_to_units, nb=nb)
    )(data_padded, n, ctx, committed, is_match, mlen, dist)
    max_bits = 8 * S + nb * 64 + 64
    n_words = max_bits // 32 + 2
    if jax.default_backend() == "tpu":
        from .pack import pack_units_dense_batch

        words, total_bits = pack_units_dense_batch(vals, wids, n_words)
    else:
        words, total_bits = jax.vmap(
            lambda v, w: pack_units(v, w, n_words))(vals, wids)
    return words, total_bits
