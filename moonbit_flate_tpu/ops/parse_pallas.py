"""Pallas DEFLATE symbol parser: stage A of the on-device decode path.

Bitstream parsing is inherently serial (variable-length codes, tables
defined mid-stream), so — like the greedy commit — it runs on the TPU
scalar core over SMEM.  Compressed streams stay in HBM; each grid step
DMAs a sliding window of input words into SMEM at the current bit
cursor (re-DMA'd mid-step whenever the cursor nears the window edge, so
every step emits a dense block of OUT_CHUNK tokens).  All parse state
(absolute bit cursor, block state, decode tables) persists across grid
steps in SMEM scratch; the kernel is natively batched over B
independent streams (grid = (B, chunks), chunk axis innermost) — the
data-parallel axis that the segment-parallel decode rides
(SURVEY.md §7.6: throughput comes from many independent streams).

Table layout: one i32 arena per alphabet.  Root = 512 entries indexed by
9 reversed bits; entry = (value << 4) | len, where len == 10 marks a
link entry whose value is the arena offset of a fixed 64-entry
sub-table covering code bits 9..14.  Scratch tail of each arena holds
the per-length counts and next-code registers during construction.

Token records match the native scanner (mf_scan_tokens):
  literal: byte value; match: (1<<31) | ((len-3) << 15) | (dist-1).
Stage B (inflate/tpu_inflate.resolve_tokens) materializes bytes in
parallel.  Behavior parity: inflate.mbt:100-223, :345-379, :429-548,
:565-684.

Status (cnt output[1]): 0 = ran out of token chunks, 1 = done,
-3 = corrupt, -4 = truncated.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT_CHUNK = 8192          # tokens per grid step
WWIN = 8192               # input window words in SMEM (32 KB)
GUARD = 96 + 1024         # re-DMA when cursor within GUARD words of end
                          # (> max bits of one token + one header read,
                          # plus the 1024-word refill base alignment)

LIT_ARENA = 512 + 160 * 64 + 64    # root + link tables + scratch
DIST_ARENA = 512 + 16 * 64 + 64

# state slots
ST_STATUS = 0
ST_CURSOR = 1
ST_FINAL = 2
ST_INBLOCK = 3     # 0 header, 1 huffman, 2 stored
ST_FIXED = 4
ST_STORED_LEFT = 5
ST_NTOK = 6
ST_OUTPOS = 7
ST_WBASE = 8       # SMEM window base (word index into this stream)
N_STATE = 9


def _make_kernel(stream_words: int, out_chunk: int = OUT_CHUNK):
    """stream_words: words per stream in the flat HBM input array."""
    OUT_CHUNK = out_chunk  # noqa: shadows module default (test-size runs)

    def _parse_kernel(nbits_ref, words_hbm, out_ref, cnt_ref,
                      state, lit_tab, dist_tab, lens_buf, wwin, sem):
        g = pl.program_id(0)      # stream index
        t = pl.program_id(1)      # output-chunk index
        total_bits = nbits_ref[g]

        def refill(base):
            """DMA window [base&~1023, +WWIN) of this stream into SMEM.

            Mosaic tiles 1-D i32 memrefs at 1024 words, so the slice
            start must be provably 1024-aligned: stream_words is padded
            to a 1024 multiple and the base is rounded down (costing at
            most 1023 words of the window's forward headroom).
            """
            base_al = base & ~jnp.int32(1023)
            state[ST_WBASE] = base_al
            start = pl.multiple_of(g * stream_words + base_al, 1024)
            dma = pltpu.make_async_copy(
                words_hbm.at[pl.ds(start, WWIN)], wwin, sem,
            )
            dma.start()
            dma.wait()

        @pl.when(t == 0)
        def _():
            def zs(i, c):
                state[i] = 0
                return c

            jax.lax.fori_loop(0, N_STATE, zs, 0)
            refill(0)

        def zero_out(i, c):
            out_ref[i] = 0
            return c

        jax.lax.fori_loop(0, OUT_CHUNK, zero_out, 0)

        # ---- scalar helpers -----------------------------------------------

        def peek(pos, n):
            """Read n (<=24) bits at absolute bit pos (0-padded past end).

            pos must lie within the current SMEM window (the main loop
            guarantees cursor-relative reads stay GUARD words clear)."""
            wi = (pos >> 5) - state[ST_WBASE]
            sh = pos & 31
            w0 = wwin[jnp.clip(wi, 0, WWIN - 1)].astype(jnp.uint32)
            w1 = wwin[jnp.clip(wi + 1, 0, WWIN - 1)].astype(jnp.uint32)
            shu = jnp.asarray(sh, jnp.uint32)
            lo = w0 >> shu
            hi = jnp.where(sh == 0, jnp.uint32(0),
                           w1 << ((jnp.uint32(32) - shu) & jnp.uint32(31)))
            val = lo | hi
            mask = (jnp.uint32(1) << jnp.asarray(n, jnp.uint32)) - jnp.uint32(1)
            return (val & mask).astype(jnp.int32)

        def rev_low(v, n):
            """Bit-reverse the low n (<=16) bits of scalar v."""
            x = v.astype(jnp.uint32)
            x = ((x & jnp.uint32(0x5555)) << 1) | ((x >> 1) & jnp.uint32(0x5555))
            x = ((x & jnp.uint32(0x3333)) << 2) | ((x >> 2) & jnp.uint32(0x3333))
            x = ((x & jnp.uint32(0x0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F))
            x = ((x & jnp.uint32(0x00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF))
            return (x >> (jnp.uint32(16) - jnp.asarray(n, jnp.uint32))).astype(jnp.int32)

        def build_table(tab, arena_size, lens_off, n_syms):
            """Two-level decode table from lens_buf[lens_off:+n_syms].

            Returns ok (completeness per inflate.mbt:161-163).  Uses the
            arena tail: counts at [arena-16..), nextcode at [arena-32..),
            link allocator at [arena-33].
            """
            cbase = arena_size - 16
            nbase = arena_size - 32
            alloc_slot = arena_size - 33

            def z1(i, c):
                tab[cbase + i] = 0
                return c

            jax.lax.fori_loop(0, 16, z1, 0)

            def count(i, c):
                l = lens_buf[lens_off + i]

                @pl.when(l > 0)
                def _():
                    tab[cbase + l] = tab[cbase + l] + 1

                return c

            jax.lax.fori_loop(0, n_syms, count, 0)

            def mm(l, carry):
                mn, mx = carry
                has = tab[cbase + l] > 0
                return jnp.where(has & (mn == 0), l, mn), jnp.where(has, l, mx)

            mn, mx = jax.lax.fori_loop(1, 16, mm, (jnp.int32(0), jnp.int32(0)))

            def nc(l, code):
                code = code << 1
                tab[nbase + l] = code
                return code + tab[cbase + l]

            code_end = jax.lax.fori_loop(1, 16, nc, jnp.int32(0))
            # completeness at level mx: recompute by shifting code_end down
            code_mx = code_end >> (15 - mx)
            ok = (mx == 0) | (code_mx == (jnp.int32(1) << mx)) | \
                 ((code_mx == 1) & (mx == 1))

            def z2(i, c):
                tab[i] = 0
                return c

            jax.lax.fori_loop(0, arena_size - 33, z2, 0)
            tab[alloc_slot] = 512  # link allocator

            def fill(i, c):
                l = lens_buf[lens_off + i]

                @pl.when(l > 0)
                def _():
                    codev = tab[nbase + l]
                    tab[nbase + l] = codev + 1
                    chunk = (i << 4) | l
                    rev = rev_low(codev, l)

                    @pl.when(l <= 9)
                    def _():
                        def stride(kk, cc):
                            tab[rev + kk * (jnp.int32(1) << l)] = chunk
                            return cc

                        jax.lax.fori_loop(0, jnp.int32(1) << (9 - l), stride, 0)

                    @pl.when(l > 9)
                    def _():
                        root_idx = rev & 511
                        root = tab[root_idx]
                        arena_cap = arena_size - 33 - 64

                        @pl.when(root == 0)
                        def _():
                            # clip on overflow: only reachable for invalid
                            # (over-subscribed) codes, which the completeness
                            # check rejects before any decode
                            base_new = jnp.minimum(tab[alloc_slot], arena_cap)
                            tab[alloc_slot] = base_new + 64
                            tab[root_idx] = (base_new << 4) | 10

                        base = tab[root_idx] >> 4
                        sub = rev >> 9  # l-9 bits

                        def stride2(kk, cc):
                            idx = base + sub + kk * (jnp.int32(1) << (l - 9))
                            tab[jnp.clip(idx, 0, arena_size - 34)] = chunk
                            return cc

                        jax.lax.fori_loop(
                            0, jnp.int32(1) << (15 - l), stride2, 0)

                return c

            jax.lax.fori_loop(0, n_syms, fill, 0)
            return ok

        def huff_sym(tab, pos):
            """(sym, new_pos); sym = -1 on corrupt, -2 on truncation."""
            b9 = peek(pos, 9)
            chunk = tab[b9 & 511]
            ln = chunk & 15

            def long_path(_):
                base = chunk >> 4
                sub = (peek(pos, 15) >> 9) & 63
                return tab[jnp.clip(base + sub, 0, tab.shape[0] - 1)]

            chunk2 = jax.lax.cond(ln == 10, long_path, lambda _: chunk, 0)
            ln2 = chunk2 & 15
            new_pos = pos + ln2
            sym = jnp.where(ln2 == 0, jnp.int32(-1),
                            jnp.where(new_pos > total_bits, jnp.int32(-2),
                                      chunk2 >> 4))
            return sym, jnp.where(sym >= 0, new_pos, pos)

        # Closed forms instead of table lookups: dynamic indexing of
        # captured constants is not lowerable on the scalar core.
        def order_at(j):
            m = j - 3
            odd = (m & 1) == 1
            return jnp.where(
                j < 3, 16 + j,
                jnp.where(m == 0, 0,
                          jnp.where(odd, 8 + ((m - 1) >> 1), 8 - (m >> 1))))

        def len_base_extra(lc):
            eb = jnp.where(lc < 8, 0, (lc - 4) >> 2)
            base = jnp.where(
                lc < 8, 3 + lc,
                (jnp.int32(1) << (eb + 2)) + 3 + ((lc & 3) << eb))
            base = jnp.where(lc >= 28, 258, base)
            eb = jnp.where(lc >= 28, 0, eb)
            return base, eb

        def dist_base_extra(dc):
            eb = jnp.where(dc < 4, 0, (dc - 2) >> 1)
            base = jnp.where(
                dc < 4, dc + 1,
                (jnp.int32(1) << (eb + 1)) + 1 + ((dc & 1) << eb))
            return base, eb

        # ---- header processing (runs between tokens, emits nothing) -------

        def process_header():
            pos = state[ST_CURSOR]

            # EOF while reading a block header is a CLEAN end of stream
            # (inflate.mbt:345-348, :789-799 — raw eof propagates from
            # next_block; matches the native scanner's done_ok path)
            @pl.when(pos + 3 > total_bits)
            def _():
                state[ST_STATUS] = 1

            @pl.when(pos + 3 <= total_bits)
            def _():
                hdr = peek(pos, 3)
                state[ST_FINAL] = hdr & 1
                typ = (hdr >> 1) & 3
                p3 = pos + 3

                @pl.when(typ == 3)
                def _():
                    state[ST_STATUS] = -3

                @pl.when(typ == 0)
                def _():
                    aligned = (p3 + 7) & ~jnp.int32(7)
                    ln = peek(aligned, 16)
                    nln = peek(aligned + 16, 16)
                    ok_len = (nln & 0xFFFF) == ((~ln) & 0xFFFF)
                    ok_sz = aligned + 32 + 8 * ln <= total_bits

                    @pl.when(~(ok_len & ok_sz))
                    def _():
                        state[ST_STATUS] = jnp.where(ok_len, -4, -3)

                    @pl.when(ok_len & ok_sz)
                    def _():
                        state[ST_CURSOR] = aligned + 32
                        state[ST_STORED_LEFT] = ln
                        state[ST_INBLOCK] = jnp.where(ln > 0, 2, 0)
                        state[ST_STATUS] = jnp.where(
                            (ln == 0) & (state[ST_FINAL] > 0), 1,
                            state[ST_STATUS])

                @pl.when(typ == 1)
                def _():
                    def fl(i, c):
                        lens_buf[i] = jnp.where(
                            i < 144, 8,
                            jnp.where(i < 256, 9, jnp.where(i < 280, 7, 8)))
                        return c

                    jax.lax.fori_loop(0, 288, fl, 0)
                    okt = build_table(lit_tab, LIT_ARENA, 0, 288)
                    state[ST_CURSOR] = p3
                    state[ST_INBLOCK] = 1
                    state[ST_FIXED] = 1
                    state[ST_STATUS] = jnp.where(okt, state[ST_STATUS], -3)

                @pl.when(typ == 2)
                def _():
                    nlit = peek(p3, 5) + 257
                    ndist = peek(p3 + 5, 5) + 1
                    nclen = peek(p3 + 10, 4) + 4
                    p0 = p3 + 14
                    okd = (nlit <= 286) & (ndist <= 30) & \
                          (p0 + 3 * nclen <= total_bits)

                    def zl(i, c):
                        lens_buf[i] = 0
                        return c

                    jax.lax.fori_loop(0, 19, zl, 0)

                    def rl(i, pp):
                        lens_buf[order_at(i)] = peek(pp, 3)
                        return pp + 3

                    p1 = jax.lax.fori_loop(0, nclen, rl, p0)
                    ok1 = build_table(lit_tab, LIT_ARENA, 0, 19)

                    def len_cond(cc):
                        i, pp, bad = cc
                        return (i < nlit + ndist) & (~bad)

                    def len_body(cc):
                        i, pp, bad = cc
                        # the dynamic header may span > GUARD words; keep
                        # the window ahead of the cursor while scanning
                        @pl.when((pp >> 5) - state[ST_WBASE] >= WWIN - GUARD)
                        def _():
                            refill(pp >> 5)

                        sym, pp2 = huff_sym(lit_tab, pp)
                        bad = bad | (sym < 0)
                        symc = jnp.maximum(sym, 0)

                        def short_case(args):
                            i, pp2 = args
                            lens_buf[jnp.clip(i, 0, 315)] = symc
                            return i + 1, pp2

                        def rep_case(args):
                            i, pp2 = args
                            is16 = symc == 16
                            is17 = symc == 17
                            nb2 = jnp.where(is16, 2, jnp.where(is17, 3, 7))
                            basev = jnp.where(is16, 3, jnp.where(is17, 3, 11))
                            rep = basev + peek(pp2, nb2)
                            val = jnp.where(
                                is16, lens_buf[jnp.clip(i - 1, 0, 315)], 0)

                            def put(j, c):
                                lens_buf[jnp.clip(i + j, 0, 315)] = val
                                return c

                            jax.lax.fori_loop(
                                0, jnp.minimum(rep, 316 - i), put, 0)
                            return i + rep, pp2 + nb2

                        i2, pp3 = jax.lax.cond(
                            symc < 16, short_case, rep_case,
                            (i, pp2))
                        rep_bad = (symc == 16) & (i == 0) & (sym >= 0)
                        over = (i2 > nlit + ndist) | (pp3 > total_bits)
                        return i2, pp3, bad | rep_bad | over

                    iF, pF, badF = jax.lax.while_loop(
                        len_cond, len_body, (jnp.int32(0), p1, ~(okd & ok1)))
                    del iF
                    ok2 = build_table(lit_tab, LIT_ARENA, 0, nlit)
                    ok3 = build_table(dist_tab, DIST_ARENA, nlit, ndist)
                    all_ok = okd & ok1 & (~badF) & ok2 & ok3
                    state[ST_STATUS] = jnp.where(all_ok, state[ST_STATUS], -3)
                    state[ST_CURSOR] = pF
                    state[ST_INBLOCK] = 1
                    state[ST_FIXED] = 0

        # ---- one token from a huffman block -------------------------------

        def huffman_token(k):
            """Returns 1 if a token was emitted at slot k."""
            pos = state[ST_CURSOR]
            sym, np_ = huff_sym(lit_tab, pos)

            @pl.when(sym < 0)
            def _():
                state[ST_STATUS] = jnp.where(sym == -2, -4, -3)

            @pl.when((sym >= 0) & (sym < 256))
            def _():
                out_ref[k] = sym
                state[ST_CURSOR] = np_
                state[ST_OUTPOS] = state[ST_OUTPOS] + 1
                state[ST_NTOK] = state[ST_NTOK] + 1

            @pl.when(sym == 256)
            def _():
                state[ST_CURSOR] = np_
                state[ST_INBLOCK] = 0
                state[ST_STATUS] = jnp.where(state[ST_FINAL] > 0, 1,
                                             state[ST_STATUS])

            @pl.when(sym > 256)
            def _():
                bad_sym = sym >= 286
                lcc = jnp.clip(sym - 257, 0, 28)
                lb, le = len_base_extra(lcc)
                length = lb + peek(np_, le)
                p_len = np_ + le

                def fixed_dist(_):
                    return jnp.where(p_len + 5 > total_bits, jnp.int32(-2),
                                     rev_low(peek(p_len, 5), 5)), p_len + 5

                def table_dist(_):
                    return huff_sym(dist_tab, p_len)

                dsym, p_dsym = jax.lax.cond(
                    state[ST_FIXED] > 0, fixed_dist, table_dist, 0)
                trunc_d = dsym == -2
                bad_d = (dsym == -1) | (dsym >= 30)
                dcc = jnp.clip(dsym, 0, 29)
                db, de = dist_base_extra(dcc)
                dist = db + peek(p_dsym, de)
                p_end = p_dsym + de
                hist = state[ST_OUTPOS]
                trunc = trunc_d | (p_end > total_bits)
                bad = bad_sym | bad_d | (dist > jnp.minimum(hist, 32768))

                @pl.when(trunc & ~bad)
                def _():
                    state[ST_STATUS] = -4

                @pl.when(bad)
                def _():
                    state[ST_STATUS] = -3

                @pl.when(~bad & ~trunc)
                def _():
                    out_ref[k] = (
                        (jnp.int32(1) << 31) | ((length - 3) << 15) | (dist - 1)
                    )
                    state[ST_CURSOR] = p_end
                    state[ST_OUTPOS] = state[ST_OUTPOS] + length
                    state[ST_NTOK] = state[ST_NTOK] + 1

            return jnp.where((sym >= 0) & (sym != 256) &
                             (state[ST_STATUS] == 0), 1, 0)

        # ---- main loop: each iteration emits at most one token -------------
        # Loop state (slot k, status) rides the while carry: reading the
        # status REF inside the cond is stale in interpret mode (the read
        # is traced once), which turns end-of-stream into a livelock.

        def loop_cond(c):
            k, st = c
            return (k < OUT_CHUNK) & (st == 0)

        def loop_body(c):
            k, _ = c
            # keep the input window ahead of the cursor
            @pl.when((state[ST_CURSOR] >> 5) - state[ST_WBASE]
                     >= WWIN - GUARD)
            def _():
                refill(state[ST_CURSOR] >> 5)

            inblock = state[ST_INBLOCK]
            ntok_before = state[ST_NTOK]

            @pl.when(inblock == 2)
            def _():
                pos = state[ST_CURSOR]
                out_ref[k] = peek(pos, 8)
                state[ST_CURSOR] = pos + 8
                state[ST_OUTPOS] = state[ST_OUTPOS] + 1
                state[ST_NTOK] = state[ST_NTOK] + 1
                left = state[ST_STORED_LEFT] - 1
                state[ST_STORED_LEFT] = left

                @pl.when(left == 0)
                def _():
                    state[ST_INBLOCK] = 0
                    state[ST_STATUS] = jnp.where(state[ST_FINAL] > 0, 1,
                                                 state[ST_STATUS])

            @pl.when(inblock == 1)
            def _():
                huffman_token(k)

            @pl.when(inblock == 0)
            def _():
                process_header()

            return (k + (state[ST_NTOK] - ntok_before), state[ST_STATUS])

        jax.lax.while_loop(loop_cond, loop_body,
                           (jnp.int32(0), state[ST_STATUS]))
        cnt_ref[0] = state[ST_NTOK]
        cnt_ref[1] = state[ST_STATUS]
        cnt_ref[2] = state[ST_OUTPOS]

        def pad_cnt(i, c):
            cnt_ref[3 + i] = 0
            return c

        jax.lax.fori_loop(0, 1021, pad_cnt, 0)

    return _parse_kernel


@partial(jax.jit, static_argnames=("n_chunks", "interpret", "out_chunk"))
def parse_batch(nbits: jnp.ndarray, words: jnp.ndarray, n_chunks: int,
                interpret: bool = False, out_chunk: int = OUT_CHUNK):
    """Parse B raw DEFLATE streams on-device.

    nbits: int32[B] bit length of each stream.
    words: int32[B, SW] little-endian input words per stream, zero-padded
           with >= WWIN words of slack past each stream's end.
    n_chunks: token capacity / OUT_CHUNK (static).
    Returns (tokens int32[B, n_chunks*OUT_CHUNK],
             cnt int32[B, 1024]) with cnt[:, 0] = token count,
    cnt[:, 1] = status (1 done, 0 out of capacity, -3 corrupt,
    -4 truncated), cnt[:, 2] = output byte count.
    """
    B, SW = words.shape
    assert SW >= WWIN, "streams must be padded to at least WWIN words"
    # Outputs are FLAT 1-D with 1-D blocks: 2-D blocks over the stream
    # axis ((1, out_chunk) of a (B, ...) array) violate Mosaic's
    # last-two-dims tiling rule once both dims are blocked; 1-D SMEM
    # blocks only need the (1024) tile, which out_chunk=8192 satisfies.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((out_chunk,), lambda g, t, s: (g * n_chunks + t,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1024,), lambda g, t, s: (g,),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((N_STATE,), jnp.int32),
            pltpu.SMEM((LIT_ARENA,), jnp.int32),
            pltpu.SMEM((DIST_ARENA,), jnp.int32),
            pltpu.SMEM((320,), jnp.int32),
            pltpu.SMEM((WWIN,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    toks, cnt = pl.pallas_call(
        _make_kernel(SW, out_chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * n_chunks * out_chunk,), jnp.int32),
            jax.ShapeDtypeStruct((B * 1024,), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(nbits, jnp.int32), words.reshape(-1))
    return (toks.reshape(B, n_chunks * out_chunk),
            cnt.reshape(B, 1024))


def _stage_streams(streams):
    """Pad B streams into the flat word array parse_batch wants."""
    B = len(streams)
    max_words = max((len(s) + 3) // 4 for s in streams) if streams else 1
    SW = -(-(max_words + WWIN) // 1024) * 1024   # 1024-tile alignment
    words = np.zeros((B, SW), np.uint32)
    nbits = np.zeros(B, np.int32)
    for i, s in enumerate(streams):
        s = bytes(s)
        padded = s + b"\x00" * ((-len(s)) % 4)
        if padded:
            words[i, : len(padded) // 4] = np.frombuffer(padded, "<u4")
        nbits[i] = len(s) * 8
    return jnp.asarray(nbits), jnp.asarray(words.view(np.int32))


def parse_stream(data: bytes, max_out_chunks: int = 256,
                 interpret: bool = False, out_chunk: int = OUT_CHUNK):
    """Parse one raw DEFLATE stream (convenience wrapper over
    parse_batch).

    Returns (tokens int32[N], status, out_bytes) where status follows the
    kernel convention.  Grid steps = max_out_chunks bound the token count
    at max_out_chunks * out_chunk.
    """
    nbits, words = _stage_streams([data])
    toks, cnt = parse_batch(nbits, words, max_out_chunks,
                            interpret=interpret, out_chunk=out_chunk)
    cnt = np.asarray(cnt)
    ntok, status, outpos = int(cnt[0, 0]), int(cnt[0, 1]), int(cnt[0, 2])
    return np.asarray(toks[0, :ntok]), status, outpos
