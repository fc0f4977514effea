"""Lane-parallel DEFLATE inflate: 1024 streams decoded in VPU lanes.

The round-4 decode path was bounded by ONE scalar core parsing bits at
~33 MB/s (ops/parse_pallas.py).  This module decodes 1024 independent
streams *simultaneously in vector lanes* — the TPU-native answer to
"decode is bit-serial": serial per stream, data-parallel across the
shard-sized streams the framework's own sharded format produces
(SURVEY.md §7.6; the multi-chip layer and the TPU-decodable manifest
chunk output at SEGB bytes, concatenable per RFC 1951).

Two kernels (measured rationale in tools/probe_gather2.py,
tools/probe_mosaic3.py — one-hot selects cost ~40 ns/element while
tpu.dynamic_gather moves ~200 Gelt/s, so every per-stream table is a
lane-major (1024, 128) gather, never a one-hot):

- Kernel A (symbol-major parse): per step each stream decodes ONE
  Huffman code via canonical length-counting (15 unrolled rounds over
  per-stream first/count registers — no deep decode tables at all)
  plus ONE gather into a packed rank->symbol map plane.  Matches take
  two steps (lit/len code, then distance code).  Input words arrive
  through a gather-refilled 128-deep queue.  Dynamic-table builds run
  as masked "build waves" at grid-step boundaries; the per-stream map
  plane is built scatter-free by lane-compare accumulation.  Tokens
  are emitted step-major (uniform rows; gap rows where a match used
  its second step).
- Kernel BC (ops/lanes_resolve.py): output-byte-major expansion and
  128-byte block materialization (in-block pointer-doubling chase +
  chunked window gathers).

Stream-row convention: stream r of a wave sits at (sublane, lane) =
(r // 128, r % 128) in (8, 128) state and at row r in (1024, x)
lane-major planes.

Behavior parity: /root/reference/inflate.mbt:345-379 (block dispatch),
:429-548 (dynamic header), :565-684 (symbol loop), :803-854 (huff_sym);
the canonical-code arithmetic mirrors inflate.mbt:120-163.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
NSTR = SUB * LANE          # streams per wave

SEGB = 4096                # max output bytes per stream (shard size)
TOK_ROWS = 35 * 128        # step-major token rows (SEGB emissions +
                           # match-gap rows bounded by SEGB - matches,
                           # plus pause-gap slack; see module docstring)
IN_W = 1152                # input words per stream (9 gather chunks;
                           # worst case stored: ~4112 B = 1028 words)
IN_CHUNKS = IN_W // LANE

# token records (i32)
#   0                   : pad / gap row (never consumed: BC stops at
#                         the per-stream output length)
#   literal             : (1 << 30) | byte
#   match               : (1 << 31) | (len << 13) | dist   (len 3..258,
#                         dist 1..SEGB)
TOK_LIT = 1 << 30
TOK_MATCH = 1 << 31
_TOK_MATCH_I = np.int32(-(1 << 31))  # i32-safe in-kernel form

# map-plane entry classes (packed 3-per-word, 10 bits each:
# class(2) | payload(8))
CLS_LIT = 0      # payload = literal byte
CLS_LEN = 1      # payload = length-code index 0..28
CLS_EOB = 2
CLS_BAD = 3      # unused rank / invalid symbol
MAPD = 120       # sublane-major map rows (15 chunks of 8)
MAPW = LANE      # map plane lanes: lit/len ranks 0..285 at words
                 # 0..95 (3/word), dist ranks 0..31 at words 96..106,
                 # CL ranks 0..18 at words 107..113

# per-stream status
ST_ACTIVE = 0
ST_DONE = 1
ST_PAUSED = 2    # waiting for a build wave (block header pending)
ST_CORRUPT = -3
ST_TRUNC = -4
ST_OVERFLOW = -5  # out of token rows / output bytes


# ---------------------------------------------------------------------------
# layout helpers ((8,128) state <-> (1024, x) lane-major planes)
# ---------------------------------------------------------------------------

def rows_from_state(x8):
    """(8, 128) int32 -> (1024, 128) with row s*128+l = x8[s, l]
    broadcast along lanes (gather-index construction)."""
    blocks = []
    for s in range(SUB):
        col = jnp.transpose(x8[s:s + 1, :])          # (128, 1)
        blocks.append(jnp.broadcast_to(col, (LANE, LANE)))
    return jnp.concatenate(blocks, axis=0)           # (1024, 128)


def state_from_rows(col):
    """(1024, 1) (or (1024, k) taking column 0) -> (8, 128)."""
    rows = []
    for s in range(SUB):
        blk = col[s * LANE:(s + 1) * LANE, 0:1]      # (128, 1)
        rows.append(jnp.transpose(blk))              # (1, 128)
    return jnp.concatenate(rows, axis=0)             # (8, 128)


def chunked_gather_ref(ref, nchunks, idx_rows):
    """chunked_gather reading (1024,128) chunk planes from a 3-D ref
    at use time (keeps the 10 MB plane out of long-lived SSA stack
    slots, which OOM'd VMEM when held as values)."""
    lo = idx_rows & (LANE - 1)
    hi = idx_rows >> 7
    res = jnp.zeros((NSTR, LANE), jnp.int32)
    for c in range(nchunks):
        g = jnp.take_along_axis(ref[c], lo, axis=1)
        res = jnp.where(hi == c, g, res)
    return res


def chunked_gather(chunks, idx_rows):
    """Gather words at per-stream indices from lane-major chunk values.

    chunks: list of (1024, 128) int32 values (chunk c = words
    [c*128, (c+1)*128) of each stream's plane).
    idx_rows: (1024, 128) int32 word indices (per row, any per-lane
    spread).  Returns (1024, 128) gathered values.
    """
    lo = idx_rows & (LANE - 1)
    hi = idx_rows >> 7
    res = jnp.zeros((NSTR, LANE), jnp.int32)
    for c, ch in enumerate(chunks):
        g = jnp.take_along_axis(ch, lo, axis=1)
        res = jnp.where(hi == c, g, res)
    return res


def requeue(chunks, base8, depth_rows):
    """Refill a sublane-major queue from lane-major chunks.

    base8: (8, 128) per-stream starting word index.  Returns a
    (depth_rows, 8, 128) value: row j = word base+j of each stream.
    depth_rows <= 128.
    """
    idx = rows_from_state(base8)
    idx = idx + jax.lax.broadcasted_iota(jnp.int32, (NSTR, LANE), 1)
    g = chunked_gather(chunks, idx)                  # (1024, 128)
    gt = jnp.transpose(g)                            # (128, 1024)
    q = gt.reshape(LANE, SUB, LANE)                  # (128, 8, 128)
    return q[:depth_rows]


def queue_read(q_ref, pos8, depth_rows):
    """Read q_ref[pos8[s,l], s, l] from a (depth_rows, 8, 128) ref.

    pos8 entries in [0, depth_rows).  Implemented as one-hot over
    depth_rows/8 sub-chunks + a depth-8 sublane gather (free per
    probe_gather.py).  Cost scales with depth_rows - keep queues
    shallow (32) and requeue by gather.
    """
    n8 = depth_rows // 8
    sub = (pos8 >> 3)
    within = pos8 & 7
    res = jnp.zeros((SUB, LANE), jnp.int32)
    for c in range(n8):
        blk = q_ref[c * 8:(c + 1) * 8]               # (8, 8, 128)
        # depth-8 gather along axis 0 per (s,l): supported shape is
        # 2D; fold sublane state axis into lanes: (8, 8*128)
        flat = blk.reshape(8, SUB * LANE)
        iw = jnp.broadcast_to(within.reshape(1, SUB * LANE), (8, SUB * LANE))
        g = jnp.take_along_axis(flat, iw, axis=0)[0:1]
        res = jnp.where(sub == c, g.reshape(SUB, LANE), res)
    return res


# ---------------------------------------------------------------------------
# closed forms (parity: token.mbt:107-123 via parse_pallas.py:266-279)
# ---------------------------------------------------------------------------

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


def _mask(n):
    return (jnp.uint32(1) << jnp.asarray(n, jnp.uint32)) - jnp.uint32(1)


def length_decode(lo, fc, base, max_bits):
    """Canonical Huffman decode by length counting.

    lo: (8,128) uint32 bit buffer (next bit = LSB).  fc[l], base[l]:
    per-stream packed (first << 9 | count) and rank base for code
    length l (1-indexed lists of (8,128) values).  Returns
    (ln, rank, matched): code length, canonical rank, hit mask.
    Mirrors inflate.mbt:148-163's nextcode walk, evaluated per lane.
    """
    code = jnp.zeros((SUB, LANE), jnp.int32)
    ln = jnp.zeros((SUB, LANE), jnp.int32)
    rank = jnp.zeros((SUB, LANE), jnp.int32)
    done = jnp.zeros((SUB, LANE), jnp.bool_)
    for l in range(1, max_bits + 1):
        bit = ((lo >> jnp.uint32(l - 1)) & jnp.uint32(1)).astype(jnp.int32)
        code = (code << 1) | bit
        f = fc[l - 1] >> 9
        c = fc[l - 1] & 511
        o = code - f
        hit = (o >= 0) & (o < c) & (~done)
        ln = jnp.where(hit, l, ln)
        rank = jnp.where(hit, base[l - 1] + o, rank)
        done = done | hit
    return ln, rank, done


def map_lookup3(map3_ref, word8):
    """Word -> packed map-plane word, per stream.

    map3_ref: (MAPD, 8, 128) sublane-major plane [word, s, l]
    (converted from the build layout once per build wave).  The read
    is the queue_read pattern: one-hot over MAPD/8 chunks + a depth-8
    sublane gather - no (1024,128)-scale index construction per step,
    which dominated kernel A in the lane-major formulation.
    """
    sub = word8 >> 3
    within = word8 & 7
    res = jnp.zeros((SUB, LANE), jnp.int32)
    for c in range(MAPD // 8):
        blk = map3_ref[c * 8:(c + 1) * 8]
        flat = blk.reshape(8, SUB * LANE)
        iw = jnp.broadcast_to(within.reshape(1, SUB * LANE),
                              (8, SUB * LANE))
        g = jnp.take_along_axis(flat, iw, axis=0)[0:1]
        res = jnp.where(sub == c, g.reshape(SUB, LANE), res)
    return res


def entry_extract(word8, rank8):
    sh = jnp.asarray((rank8 - (rank8 // 3) * 3) * 10, jnp.uint32)
    e = (word8.astype(jnp.uint32) >> sh) & jnp.uint32(0x3FF)
    e = e.astype(jnp.int32)
    return e >> 8, e & 255          # (class, payload)


# ---------------------------------------------------------------------------
# kernel A: symbol-major parse
# ---------------------------------------------------------------------------

TOK_CHUNKS = TOK_ROWS // 128
QDEPTH = 32               # input word queue rows
_U32 = jnp.uint32
_I32 = jnp.int32

# state slots
_LO, _HI, _CNT, _WBASE, _QPOS, _STATUS, _BLKMODE, _SLEFT, _FINAL, \
    _OPOS, _EXPD, _PLEN, _NST = range(13)

# fcb rows: fc_lit 0..14, base_lit 16..30, fc_dist 32..46, base_dist 48..62
_FCL, _BAL, _FCD, _BAD_ = 0, 16, 32, 48


def _u(x):
    return x.astype(_U32) if x.dtype != _U32 else x


def _i(x):
    return x.astype(_I32) if x.dtype != _I32 else x


def _zeros8(dtype=_I32):
    return jnp.zeros((SUB, LANE), dtype)


import os
_ACUT = int(os.environ.get("MF_ACUT", "0"))


def _make_kernel_a():
    def kernel(nbits_ref, inw_ref, tok_ref, misc_ref,
               st_ref, fcb_ref, map_ref, q_ref, lens_ref, clmap_ref,
               emit_ref, map3_ref):
        t = pl.program_id(1)
        nbits = nbits_ref[0]

        chunks = [inw_ref[0, c] for c in range(IN_CHUNKS)]

        # ---- bit-buffer helpers (masked, vectorized) ----------------------

        def bitpos_of(wbase, qpos, cnt):
            return (wbase + qpos) * 32 - cnt

        def consume(bits, n, refill=True):
            """bits = (lo, hi, cnt, wbase, qpos); n int32 (8,128), may be
            0 per lane.  Refills one queue word when cnt drops < 32."""
            lo, hi, cnt, wbase, qpos = bits
            nu = _u(n)
            lo2 = jnp.where(n > 0, (lo >> nu) | _u(
                jnp.where(n > 0, _i(hi << (_U32(32) - nu)), 0)), lo)
            hi2 = jnp.where(n > 0, hi >> nu, hi)
            cnt2 = cnt - n
            if refill:
                need = cnt2 < 32
                w = _u(queue_read(q_ref, qpos, QDEPTH))
                sh = _u(jnp.clip(cnt2, 0, 31))
                lo3 = jnp.where(need & (cnt2 == 0), w, lo2)
                lo3 = jnp.where(need & (cnt2 > 0) & (cnt2 < 32),
                                lo2 | (w << sh), lo3)
                hi3 = jnp.where(need & (cnt2 > 0) & (cnt2 < 32),
                                hi2 | ((w >> _U32(1)) >> (_U32(31) - sh)),
                                jnp.where(need & (cnt2 == 0), _zeros8(_U32),
                                          hi2))
                # cnt2 == 0 loses hi alignment only when hi already 0
                # (max consume 28 < 32 keeps cnt >= 4; the == 0 arm is
                # only reachable from cold init)
                qpos2 = qpos + jnp.where(need, 1, 0)
                cnt3 = cnt2 + jnp.where(need, 32, 0)
                return lo3, hi3, cnt3, wbase, qpos2
            return lo2, hi2, cnt2, wbase, qpos

        def maybe_requeue(bits, force=False):
            lo, hi, cnt, wbase, qpos = bits
            hi_mark = jnp.max(qpos)

            def do_requeue(_):
                nb = wbase + qpos
                q_ref[...] = requeue(chunks, nb, QDEPTH)
                return nb, _zeros8()

            wbase2, qpos2 = jax.lax.cond(
                (hi_mark >= QDEPTH - 8) | force,
                do_requeue, lambda _: (wbase, qpos), 0)
            return lo, hi, cnt, wbase2, qpos2

        def load_fcb():
            fcl = [fcb_ref[_FCL + l] for l in range(15)]
            bal = [fcb_ref[_BAL + l] for l in range(15)]
            fcd = [fcb_ref[_FCD + l] for l in range(15)]
            bad = [fcb_ref[_BAD_ + l] for l in range(15)]
            return fcl, bal, fcd, bad

        # ---- one symbol step ---------------------------------------------

        def sym_step(j, bits, sstate, fcb):
            lo, hi, cnt, wbase, qpos = bits
            (status, blkmode, sleft, final, opos, expd, plen) = sstate
            fcl, bal, fcd, bad = fcb
            active = status == ST_ACTIVE
            in_huff = active & (blkmode == 1)
            in_stored = active & (blkmode == 2)

            isd = expd > 0
            if _ACUT >= 2:   # profiling cut: fixed 8-bit decode
                ln = jnp.full((SUB, LANE), 8, _I32)
                rank = _i(lo & _U32(255))
                matched = in_huff
            else:
                fc_sel = [jnp.where(isd, fcd[l], fcl[l]) for l in range(15)]
                ba_sel = [jnp.where(isd, bad[l], bal[l]) for l in range(15)]
                ln, rank, matched = length_decode(lo, fc_sel, ba_sel, 15)

            word_idx = jnp.where(isd, 96 + rank // 3, rank // 3)
            if _ACUT >= 1:   # profiling cut: fake map entry
                wplane = word_idx * 1025
                cls, payload = wplane & 3, wplane & 255
                cls = jnp.where(rank < 255, CLS_LIT, CLS_EOB)
            else:
                wplane = map_lookup3(map3_ref, word_idx)
                cls, payload = entry_extract(wplane, rank)

            is_lit = in_huff & ~isd & matched & (cls == CLS_LIT)
            is_len = in_huff & ~isd & matched & (cls == CLS_LEN)
            is_eob = in_huff & ~isd & matched & (cls == CLS_EOB)
            is_dst = in_huff & isd & matched & (cls == CLS_LEN)
            bad_code = in_huff & (
                (~matched) | (cls == CLS_BAD)
                | (isd & (cls != CLS_LEN)))

            lbase, leb = len_base_extra(jnp.clip(payload, 0, 28))
            lextra = _i((lo >> _u(ln)) & _mask(leb))
            length = lbase + lextra

            dbase, deb = dist_base_extra(jnp.clip(payload, 0, 29))
            dextra = _i((lo >> _u(ln)) & _mask(deb))
            dist = dbase + dextra

            nused = jnp.where(
                in_stored, 8,
                jnp.where(is_lit | is_eob, ln,
                          jnp.where(is_len, ln + leb,
                                    jnp.where(is_dst, ln + deb, 0))))
            newpos = bitpos_of(wbase, qpos, cnt) + nused
            trunc = (in_huff | in_stored) & (newpos > nbits) & ~bad_code
            ok = (in_huff | in_stored) & ~trunc & ~bad_code

            sbyte = _i(lo & _U32(0xFF))
            emit_lit = ok & (in_stored | is_lit)
            lit_b = jnp.where(in_stored, sbyte, payload)

            dist_over = ok & is_dst & (dist > opos)
            emit_match = ok & is_dst & ~dist_over
            len_over = emit_match & (opos + plen > SEGB)
            lit_over = emit_lit & (opos + 1 > SEGB)
            emit_match = emit_match & ~len_over
            emit_lit = emit_lit & ~lit_over

            tok = jnp.where(
                emit_lit, TOK_LIT | lit_b,
                jnp.where(emit_match,
                          _TOK_MATCH_I | (plen << 13) | dist, 0))
            emit_ref[j] = tok

            do_adv = ok & ~dist_over & ~len_over & ~lit_over
            n_adv = jnp.where(do_adv, nused, 0)
            bits2 = consume((lo, hi, cnt, wbase, qpos), n_adv)

            opos2 = opos + jnp.where(emit_lit, 1,
                                     jnp.where(emit_match, plen, 0))
            expd2 = jnp.where(do_adv & is_len, 1,
                              jnp.where(do_adv & is_dst, 0, expd))
            plen2 = jnp.where(do_adv & is_len, length, plen)
            sleft2 = sleft - jnp.where(do_adv & in_stored, 1, 0)
            stored_end = in_stored & do_adv & (sleft2 == 0)
            block_end = stored_end | (do_adv & is_eob)

            status2 = jnp.where(
                trunc, ST_TRUNC,
                jnp.where(bad_code | dist_over, ST_CORRUPT,
                          jnp.where(len_over | lit_over, ST_OVERFLOW,
                                    jnp.where(block_end,
                                              jnp.where(final > 0, ST_DONE,
                                                        ST_PAUSED),
                                              status))))
            blkmode2 = jnp.where(block_end, 0, blkmode)
            return bits2, (status2, blkmode2, sleft2, final, opos2,
                           expd2, plen2)

        # ---- build wave: block headers + table construction ---------------
        # Runs masked over status == PAUSED streams at grid-step start.
        # Parity: inflate.mbt:345-379 (next_block), :429-548
        # (read_huffman), fixed tables :886-939.

        def canonical(counts, maxb):
            """counts: list[maxb] of (8,128) per-length counts.
            Returns (fc, base, bad): packed first<<9|count, rank bases,
            and the reference's completeness rejection
            (inflate.mbt:161-163)."""
            fc, base = [], []
            code = _zeros8()
            b = _zeros8()
            kraft = _zeros8()
            mx = _zeros8()
            for l in range(1, maxb + 1):
                c = counts[l - 1]
                fc.append((code << 9) | c)
                base.append(b)
                b = b + c
                code = (code + c) << 1
                kraft = kraft + (c << (maxb - l))
                mx = jnp.where(c > 0, l, mx)
            full = jnp.int32(1 << maxb)
            ok = (kraft == 0) | (kraft == full) | \
                 ((mx == 1) & (kraft == full // 2))
            return fc, base, ~ok

        def build_wave(bits, sstate):
            (status, blkmode, sleft, final, opos, expd, plen) = sstate
            paused = status == ST_PAUSED

            # the header + CL-lens reads consume up to ~3 words before
            # the lens loop's first requeue check; entering with qpos
            # near the threshold would leave only one word of margin,
            # so start every build wave from a fresh queue window
            bits = maybe_requeue(bits, force=True)

            lo, hi, cnt, wbase, qpos = bits
            bp = bitpos_of(wbase, qpos, cnt)
            eof = paused & (bp + 3 > nbits)
            status = jnp.where(eof, ST_DONE, status)
            hdr_act = paused & ~eof

            hdr = _i(lo & _U32(7))
            final = jnp.where(hdr_act, hdr & 1, final)
            typ = jnp.where(hdr_act, (hdr >> 1) & 3, -1)
            bits = consume(bits, jnp.where(hdr_act, 3, 0))

            status = jnp.where(typ == 3, ST_CORRUPT, status)

            # --- stored blocks (typ 0) --------------------------------
            t0 = typ == 0
            lo, hi, cnt, wbase, qpos = bits
            bp = bitpos_of(wbase, qpos, cnt)
            align = (8 - (bp & 7)) & 7
            bits = consume(bits, jnp.where(t0, align, 0))
            ln16 = _i(bits[0] & _U32(0xFFFF))
            bits = consume(bits, jnp.where(t0, 16, 0))
            nln16 = _i(bits[0] & _U32(0xFFFF))
            bits = consume(bits, jnp.where(t0, 16, 0))
            lo, hi, cnt, wbase, qpos = bits
            bp = bitpos_of(wbase, qpos, cnt)
            ok_len = ((ln16 ^ nln16) & 0xFFFF) == 0xFFFF
            ok_sz = bp + 8 * ln16 <= nbits
            ovf = opos + ln16 > SEGB
            status = jnp.where(t0 & ~ok_len, ST_CORRUPT, status)
            status = jnp.where(t0 & ok_len & ~ok_sz, ST_TRUNC, status)
            status = jnp.where(t0 & ok_len & ok_sz & ovf,
                               ST_OVERFLOW, status)
            t0ok = t0 & ok_len & ok_sz & ~ovf
            sleft = jnp.where(t0ok, ln16, sleft)
            blkmode = jnp.where(t0ok & (ln16 > 0), 2, blkmode)
            status = jnp.where(
                t0ok, jnp.where(ln16 > 0, ST_ACTIVE,
                                jnp.where(final > 0, ST_DONE, ST_PAUSED)),
                status)

            # --- huffman blocks (typ 1 fixed / typ 2 dynamic) ---------
            fixed = typ == 1
            dyn = typ == 2
            lo = bits[0]
            nlit = jnp.where(dyn, 257 + _i(lo & _U32(31)), 288)
            ndist = jnp.where(dyn, 1 + _i((lo >> 5) & _U32(31)), 32)
            nclen = jnp.where(dyn, 4 + _i((lo >> 10) & _U32(15)), 0)
            bits = consume(bits, jnp.where(dyn, 14, 0))
            hdr_bad = dyn & ((nlit > 286) | (ndist > 30))
            status = jnp.where(hdr_bad, ST_CORRUPT, status)
            dyn = dyn & ~hdr_bad
            build = fixed | dyn

            # --- CL code lengths (wire order is static) ----------------
            cl_len = [_zeros8() for _ in range(19)]
            order = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3,
                     13, 2, 14, 1, 15)
            for k in range(19):
                rd = dyn & (k < nclen)
                v = jnp.where(rd, _i(bits[0] & _U32(7)), 0)
                cl_len[order[k]] = v
                bits = consume(bits, jnp.where(rd, 3, 0))
            ccnt = [_zeros8() for _ in range(7)]
            for j in range(19):
                for l in range(1, 8):
                    ccnt[l - 1] = ccnt[l - 1] + jnp.where(
                        cl_len[j] == l, 1, 0)
            fc_cl, base_cl, cl_bad = canonical(ccnt, 7)
            status = jnp.where(dyn & cl_bad, ST_CORRUPT, status)
            dyn = dyn & ~cl_bad
            build = fixed | dyn

            # CL rank -> symbol map: 7 packed words, runtime ranks, but
            # the symbol loop is static (19 iterations)
            clw = [_zeros8() for _ in range(7)]
            seen_cl = [_zeros8() for _ in range(7)]
            for j in range(19):
                lj = cl_len[j]
                rank = _zeros8()
                for l in range(1, 8):
                    rank = jnp.where(lj == l,
                                     base_cl[l - 1] + seen_cl[l - 1], rank)
                    seen_cl[l - 1] = seen_cl[l - 1] + jnp.where(lj == l, 1, 0)
                sh = _u((rank - (rank // 3) * 3) * 10)
                val = _i(jnp.where(lj > 0, _i(_u(jnp.int32(j)) << sh), 0))
                for wi in range(7):
                    clw[wi] = clw[wi] | jnp.where(rank // 3 == wi, val, 0)

            def cl_decode(lo_):
                ln_c, rank_c, m_c = length_decode(lo_, fc_cl, base_cl, 7)
                sym = _zeros8()
                for wi in range(7):
                    sh = _u((rank_c - (rank_c // 3) * 3) * 10)
                    sym = jnp.where(rank_c // 3 == wi,
                                    _i((_u(clw[wi]) >> sh)) & 0x3FF, sym)
                return ln_c, sym, m_c

            # --- lens pass: fill lens_ref[0..nlit+ndist) ---------------
            ns = jnp.where(build, nlit + ndist, 0)
            maxns = jnp.max(ns)

            def fixed_len(i):
                # inflate.mbt fixed table; dist part (i >= 288) is 5
                return jnp.where(
                    jnp.int32(i) >= 288, 5,
                    jnp.where(jnp.int32(i) < 144, 8,
                              jnp.where(jnp.int32(i) < 256, 9,
                                        jnp.where(jnp.int32(i) < 280, 7, 8))))

            def lens_cond(c):
                return c[0] < maxns

            def lens_body(c):
                (i, bits, run_rem, run_len, bad,
                 cl15, cd15) = c
                live = build & (i < ns)
                needc = dyn & live & (run_rem == 0)
                ln_c, sym, m_c = cl_decode(bits[0])
                bad = bad | jnp.where(needc & ~m_c, 1, 0)
                is16 = sym == 16
                is17 = sym == 17
                is18 = sym == 18
                eb = jnp.where(is16, 2, jnp.where(is17, 3,
                                                  jnp.where(is18, 7, 0)))
                extra = _i((bits[0] >> _u(ln_c)) & _mask(eb))
                rep = jnp.where(is16, 3 + extra,
                                jnp.where(is17, 3 + extra,
                                          jnp.where(is18, 11 + extra, 1)))
                newlen = jnp.where(sym < 16, sym,
                                   jnp.where(is16, run_len, 0))
                bad = bad | jnp.where(needc & is16 & (i == 0), 1, 0)
                nused = jnp.where(needc & m_c, ln_c + eb, 0)
                # truncation inside the header
                bpx = bitpos_of(bits[3], bits[4], bits[2])
                bad = bad | jnp.where(needc & (bpx + nused > nbits), 1, 0)
                bits = consume(bits, nused)
                run_rem2 = jnp.where(needc, rep, run_rem)
                run_len2 = jnp.where(needc, newlen, run_len)
                li = jnp.where(dyn, run_len2, fixed_len_i(i))
                li = jnp.where(live, li, 0)
                old = lens_ref[i]
                lens_ref[i] = jnp.where(live, li, old)
                is_lit_i = i < nlit
                for l in range(1, 16):
                    hit = (li == l) & live
                    cl15s = cl15[l - 1] + jnp.where(hit & is_lit_i, 1, 0)
                    cd15s = cd15[l - 1] + jnp.where(hit & ~is_lit_i, 1, 0)
                    cl15 = cl15[:l - 1] + (cl15s,) + cl15[l:]
                    cd15 = cd15[:l - 1] + (cd15s,) + cd15[l:]
                run_rem3 = run_rem2 - jnp.where(live & dyn, 1, 0)
                bits = maybe_requeue(bits)
                return (i + 1, bits, run_rem3, run_len2, bad, cl15, cd15)

            def fixed_len_i(i):
                # traced scalar i: closed form on a broadcast
                iv = jnp.full((SUB, LANE), i, _I32)
                return jnp.where(
                    iv >= 288, 5,
                    jnp.where(iv < 144, 8,
                              jnp.where(iv < 256, 9,
                                        jnp.where(iv < 280, 7, 8))))

            z15 = tuple(_zeros8() for _ in range(15))
            (iF, bits, rrF, _, badi, cl15, cd15) = jax.lax.while_loop(
                lens_cond, lens_body,
                (jnp.int32(0), bits, _zeros8(), _zeros8(),
                 _zeros8(), z15, z15))
            bad = (badi > 0) | (dyn & (rrF > 0))

            fc_l2, ba_l2, bad_l = canonical(list(cl15), 15)
            fc_d2, ba_d2, bad_d = canonical(list(cd15), 15)
            bad = bad | (build & (bad_l | bad_d))

            # persist tables for the symbol loop (masked merge)
            for l in range(15):
                fcb_ref[_FCL + l] = jnp.where(build, fc_l2[l],
                                              fcb_ref[_FCL + l])
                fcb_ref[_BAL + l] = jnp.where(build, ba_l2[l],
                                              fcb_ref[_BAL + l])
                fcb_ref[_FCD + l] = jnp.where(build, fc_d2[l],
                                              fcb_ref[_FCD + l])
                fcb_ref[_BAD_ + l] = jnp.where(build, ba_d2[l],
                                               fcb_ref[_BAD_ + l])

            # --- map-plane accumulate pass -----------------------------
            build_rows = rows_from_state(jnp.where(build, 1, 0)) > 0
            lanes_iota = jax.lax.broadcasted_iota(
                jnp.int32, (NSTR, LANE), 1)
            mapv = jnp.where(build_rows, 0, map_ref[...])

            def map_cond(c):
                return c[0] < maxns

            def map_body(c):
                (i, mapv, sl15, sd15) = c
                live = build & (i < ns)
                li = lens_ref[i]
                is_lit_i = i < nlit
                rank = _zeros8()
                for l in range(1, 16):
                    hit = li == l
                    bsel = jnp.where(is_lit_i, ba_l2[l - 1], ba_d2[l - 1])
                    ssel = jnp.where(is_lit_i, sl15[l - 1], sd15[l - 1])
                    rank = jnp.where(hit, bsel + ssel, rank)
                    sl15u = sl15[l - 1] + jnp.where(
                        hit & is_lit_i & live, 1, 0)
                    sd15u = sd15[l - 1] + jnp.where(
                        hit & ~is_lit_i & live, 1, 0)
                    sl15 = sl15[:l - 1] + (sl15u,) + sl15[l:]
                    sd15 = sd15[:l - 1] + (sd15u,) + sd15[l:]
                # entry class/payload
                sidx = jnp.where(is_lit_i, i, i - nlit)
                cls = jnp.where(
                    is_lit_i,
                    jnp.where(sidx < 256, CLS_LIT,
                              jnp.where(sidx == 256, CLS_EOB,
                                        jnp.where(sidx < 286, CLS_LEN,
                                                  CLS_BAD))),
                    jnp.where(sidx < 30, CLS_LEN, CLS_BAD))
                pay = jnp.where(
                    is_lit_i,
                    jnp.where(sidx < 256, sidx,
                              jnp.clip(sidx - 257, 0, 28)),
                    jnp.clip(sidx, 0, 29))
                entry = (cls << 8) | pay
                word = rank // 3 + jnp.where(is_lit_i, 0, 96)
                sh = (rank - (rank // 3) * 3) * 10
                val = jnp.where(live & (li > 0),
                                _i(_u(entry) << _u(sh)), 0)
                mapv = mapv | jnp.where(
                    lanes_iota == rows_from_state(word),
                    rows_from_state(val), 0)
                return (i + 1, mapv, sl15, sd15)

            (_, mapv, _, _) = jax.lax.while_loop(
                map_cond, map_body,
                (jnp.int32(0), mapv, z15, z15))
            map_ref[...] = mapv
            # sublane-major copy for the per-step lookup: [w, s, l]
            map3_ref[...] = jnp.transpose(mapv).reshape(
                LANE, SUB, LANE)[:MAPD]

            status = jnp.where(build & bad, ST_CORRUPT, status)
            done_b = build & ~bad
            status = jnp.where(done_b, ST_ACTIVE, status)
            blkmode = jnp.where(done_b, 1, blkmode)
            expd = jnp.where(done_b, 0, expd)
            return bits, (status, blkmode, sleft, final, opos, expd, plen)

        # ---- grid step main body ------------------------------------------

        @pl.when(t == 0)
        def _():
            # cold init: status PAUSED (header pending), prime the
            # queue and the 64-bit window
            q_ref[...] = requeue(chunks, _zeros8(), QDEPTH)
            st_ref[_LO] = _i(q_ref[0])
            st_ref[_HI] = _i(q_ref[1])
            st_ref[_CNT] = jnp.full((SUB, LANE), 64, _I32)
            st_ref[_WBASE] = _zeros8()
            st_ref[_QPOS] = jnp.full((SUB, LANE), 2, _I32)
            st_ref[_STATUS] = jnp.full((SUB, LANE), ST_PAUSED, _I32)
            for sl in (_BLKMODE, _SLEFT, _FINAL, _OPOS, _EXPD, _PLEN):
                st_ref[sl] = _zeros8()
            map_ref[...] = jnp.zeros((NSTR, LANE), _I32)

        bits = (_u(st_ref[_LO]), _u(st_ref[_HI]), st_ref[_CNT],
                st_ref[_WBASE], st_ref[_QPOS])
        sstate = (st_ref[_STATUS], st_ref[_BLKMODE], st_ref[_SLEFT],
                  st_ref[_FINAL], st_ref[_OPOS], st_ref[_EXPD],
                  st_ref[_PLEN])

        any_paused = jnp.any(sstate[0] == ST_PAUSED)
        bits, sstate = jax.lax.cond(
            any_paused, build_wave, lambda b, s: (b, s), bits, sstate)

        fcb = load_fcb()

        # pre-zero emissions (rows past the early exit stay zero)
        def zrow(j, c):
            emit_ref[j] = jnp.zeros((SUB, LANE), _I32)
            return c

        jax.lax.fori_loop(0, 128, zrow, 0)

        # 4 symbol steps per while iteration: the scalar any()/max()
        # reductions and the requeue cond run once per group (4 steps
        # consume at most 4 queue words, within the requeue margin)
        def loop_cond(c):
            j = c[0]
            status = c[2][0]
            return (j < 128) & jnp.any(status == ST_ACTIVE)

        def loop_body(c):
            j, bits, sstate = c
            bits = maybe_requeue(bits)
            for k in range(4):
                bits, sstate = sym_step(j + k, bits, sstate, fcb)
            return (j + 4, bits, sstate)

        jend, bits, sstate = jax.lax.while_loop(
            loop_cond, loop_body, (jnp.int32(0), bits, sstate))

        tok_ref[0, 0] = emit_ref[...]

        # last grid step: anything not finished is out of token rows
        @pl.when(t == TOK_CHUNKS - 1)
        def _():
            st = sstate[0]
            st_ref[_STATUS] = jnp.where(
                (st == ST_ACTIVE) | (st == ST_PAUSED), ST_OVERFLOW, st)

        @pl.when(t != TOK_CHUNKS - 1)
        def _():
            st_ref[_STATUS] = sstate[0]

        st_ref[_LO] = _i(bits[0])
        st_ref[_HI] = _i(bits[1])
        st_ref[_CNT] = bits[2]
        st_ref[_WBASE] = bits[3]
        st_ref[_QPOS] = bits[4]
        st_ref[_BLKMODE] = sstate[1]
        st_ref[_SLEFT] = sstate[2]
        st_ref[_FINAL] = sstate[3]
        st_ref[_OPOS] = sstate[4]
        st_ref[_EXPD] = sstate[5]
        st_ref[_PLEN] = sstate[6]

        misc_ref[0, 0] = st_ref[_STATUS]
        misc_ref[0, 1] = st_ref[_OPOS]
        misc_ref[0, 2] = bitpos_of(bits[3], bits[4], bits[2])

    return kernel


@partial(jax.jit, static_argnames=("waves", "interpret"))
def parse_waves(nbits: jnp.ndarray, inw: jnp.ndarray, waves: int,
                interpret: bool = False):
    """Kernel A over `waves` waves of 1024 streams.

    nbits: int32[waves, 8, 128] per-stream bit counts (stream r of a
    wave at (r // 128, r % 128)).
    inw:   int32[waves, IN_CHUNKS, 1024, 128] lane-major input words
           (word w of stream r at [wave, w // 128, r, w % 128]).
    Returns (tok int32[waves, TOK_CHUNKS, 128, 8, 128] step-major
    token records, misc int32[waves, 4, 8, 128]: status, out length,
    bit position).
    """
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(waves, TOK_CHUNKS),
        in_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda w, t: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IN_CHUNKS, NSTR, LANE),
                         lambda w, t: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128, SUB, LANE),
                         lambda w, t: (w, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, SUB, LANE), lambda w, t: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NST, SUB, LANE), jnp.int32),
            pltpu.VMEM((64, SUB, LANE), jnp.int32),
            pltpu.VMEM((NSTR, LANE), jnp.int32),
            pltpu.VMEM((QDEPTH, SUB, LANE), jnp.int32),
            pltpu.VMEM((320, SUB, LANE), jnp.int32),
            pltpu.VMEM((8, SUB, LANE), jnp.int32),
            pltpu.VMEM((128, SUB, LANE), jnp.int32),
            pltpu.VMEM((MAPD, SUB, LANE), jnp.int32),
        ],
    )
    tok, misc = pl.pallas_call(
        _make_kernel_a(),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((waves, TOK_CHUNKS, 128, SUB, LANE),
                                 jnp.int32),
            jax.ShapeDtypeStruct((waves, 4, SUB, LANE), jnp.int32),
        ],
        interpret=interpret,
    )(nbits, inw)
    return tok, misc


def stage_streams_lanes(streams: list[bytes], waves: int):
    """Host staging: pad B streams into (nbits, inw) for parse_waves."""
    B = waves * NSTR
    nbits = np.zeros(B, np.int32)
    words = np.zeros((B, IN_W), np.uint32)
    for i, s in enumerate(streams):
        s = bytes(s)
        nbits[i] = len(s) * 8
        padded = s + b"\x00" * ((-len(s)) % 4)
        wl = np.frombuffer(padded, "<u4")
        assert len(wl) <= IN_W, (len(s), IN_W)
        words[i, : len(wl)] = wl
    inw = np.ascontiguousarray(
        words.reshape(waves, NSTR, IN_CHUNKS, LANE).transpose(0, 2, 1, 3))
    return (jnp.asarray(nbits.reshape(waves, SUB, LANE)),
            jnp.asarray(inw.view(np.int32)))
