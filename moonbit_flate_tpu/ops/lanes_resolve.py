"""Kernel BC: token records -> output bytes, 1024 streams in lanes.

Consumes kernel A's step-major token rows (ops/lanes_inflate.py) and
materializes every stream's output with NO per-lane scatters:

- *Byte-major expansion*: all streams advance exactly one output byte
  per step, so every write lands at a uniform position.  Each stream's
  per-byte record is either a literal byte or the distance of the copy
  covering that byte.  Tokens arrive through a 128-row queue refilled
  by chunked lane-gathers; isolated gap rows (kernel A's match
  sym-steps) are absorbed by reading two queue rows per step, longer
  pause-gap runs by a rare bounded skip loop.
- *128-byte block materialization*: per block, in-block copy chains
  resolve by pointer-doubling over a lane-gathered index map (7
  rounds covers any chain depth <= 128, including dist=1 RLE), then
  one chunked gather over the window (the stream's full 2 KiB output
  history as 4x(1024,128) word planes + the current 512-byte staging
  value) fetches every remaining source byte.  Bytes pack to words by
  rolls + one stride-4 gather; staging flushes to the window and the
  output block at uniform indices.

Parity: dict-decoder.mbt:114-185 (window copy semantics incl.
overlapping RLE); the pointer-doubling trick is the round-2 XLA
root-chase (inflate/tpu_inflate.py resolve_tokens_batch) reborn at
in-block scale where the gathers are lane-shuffles, not XLA scatters.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lanes_inflate import (LANE, NSTR, SEGB, SUB,  # noqa: F401
                            TOK_CHUNKS, TOK_ROWS,
                            chunked_gather_ref, rows_from_state)

_I32 = jnp.int32
_U32 = jnp.uint32

GROUPS = SEGB // 512       # grid steps per wave: 512 output bytes each
GWORDS = SEGB // GROUPS // 4   # 128 words per group
BLOCKS = 4                 # 128-byte blocks per group
QD = 128                   # token queue rows: the fastest lane sets
                           # the prefetch cadence, so shallower queues
                           # re-gather the 19-chunk token plane too
                           # often (QD=64 doubled BC's wave time)

REC_LIT = 1 << 30
REC_MATCH = np.int32(-(1 << 31))

# state slots
_TK, _QOFF, _REM, _DIST, _NST = range(5)


def _zeros8():
    return jnp.zeros((SUB, LANE), _I32)


def _make_kernel_bc():
    def kernel(outlen_ref, tok_hbm, out_ref,
               st_ref, win_ref, q_ref, rec_ref, tok_vmem, dsem):
        w = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            # single-buffered manual copy: the 10 MB token plane would
            # blow VMEM if pipelined as a double-buffered in_spec
            dma = pltpu.make_async_copy(tok_hbm.at[w], tok_vmem, dsem)
            dma.start()
            dma.wait()

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (NSTR, LANE), 1)
        outlen = outlen_ref[0]

        def prefetch(tk8):
            """Queue rows [tk, tk+QD) per stream (clamped to TOK_ROWS)."""
            idx = rows_from_state(tk8) + lane_i
            idx = jnp.clip(idx, 0, TOK_ROWS - 1)
            gth = chunked_gather_ref(tok_vmem, TOK_CHUNKS, idx)
            qt = jnp.transpose(gth).reshape(LANE, SUB, LANE)
            q_ref[...] = qt[:QD]

        def queue_read2(pos8):
            """Rows pos and pos+1 of the queue (one fused one-hot)."""
            r0 = _zeros8()
            r1 = _zeros8()
            p1 = jnp.minimum(pos8 + 1, QD - 1)
            for c in range(QD // 8):
                blk = q_ref[c * 8:(c + 1) * 8]
                flat = blk.reshape(8, SUB * LANE)
                w0 = jnp.broadcast_to((pos8 & 7).reshape(1, SUB * LANE),
                                      (8, SUB * LANE))
                w1 = jnp.broadcast_to((p1 & 7).reshape(1, SUB * LANE),
                                      (8, SUB * LANE))
                g0 = jnp.take_along_axis(flat, w0, axis=0)[0:1]
                g1 = jnp.take_along_axis(flat, w1, axis=0)[0:1]
                r0 = jnp.where((pos8 >> 3) == c,
                               g0.reshape(SUB, LANE), r0)
                r1 = jnp.where((p1 >> 3) == c,
                               g1.reshape(SUB, LANE), r1)
            return r0, r1

        @pl.when(g == 0)
        def _():
            for sl in range(_NST):
                st_ref[sl] = _zeros8()
            prefetch(_zeros8())

        def byte_step(j, carry, b):
            """One output byte for every stream (position p uniform)."""
            tk, qoff, rem, dist = carry
            p = (g * BLOCKS + b) * 128 + j
            live = p < outlen
            need = live & (rem == 0)

            # mid-block queue top-up (live lanes only: a finished
            # stream's frozen qoff must not drive the cadence)
            def topup(args):
                tk, qoff = args
                tk2 = tk + qoff
                prefetch(tk2)
                return tk2, _zeros8()

            tk, qoff = jax.lax.cond(
                jnp.max(jnp.where(live, qoff, 0)) >= QD - 4,
                topup, lambda a: a, (tk, qoff))

            r0, r1 = queue_read2(qoff)
            head = jnp.where(r0 == 0, r1, r0)
            adv0 = jnp.where(r0 == 0, 2, 1)

            # long gap runs (pause gaps): skip until a real token,
            # sliding the queue window when a stuck lane nears its end
            def skip_cond(c):
                qoff_, head_, _, tk_ = c
                return jnp.any(need & (head_ == 0)
                               & (tk_ + qoff_ < TOK_ROWS - 2))

            def skip_body(c):
                qoff_, head_, adv_, tk_ = c
                stuck = need & (head_ == 0)

                def topup2(args):
                    tk_, qoff_ = args
                    tk2 = tk_ + qoff_
                    prefetch(tk2)
                    return tk2, _zeros8()

                tk_, qoff_ = jax.lax.cond(
                    jnp.max(jnp.where(stuck, qoff_, 0)) >= QD - 4,
                    topup2, lambda a: a, (tk_, qoff_))
                qoff2 = qoff_ + jnp.where(stuck, 2, 0)
                h0, h1 = queue_read2(jnp.where(stuck, qoff2, qoff_))
                nh = jnp.where(h0 == 0, h1, h0)
                na = jnp.where(h0 == 0, 2, 1)
                return (qoff2, jnp.where(stuck, nh, head_),
                        jnp.where(stuck, na, adv_), tk_)

            qoff, head, adv0, tk = jax.lax.while_loop(
                skip_cond, skip_body, (qoff, head, adv0, tk))

            is_m = need & (head < 0)
            is_l = need & (head > 0) & ~is_m
            rem2 = jnp.where(is_m, (head >> 13) & 511, rem)
            dist2 = jnp.where(is_m, head & 8191, dist)
            qoff = qoff + jnp.where(need & (head != 0), adv0, 0)

            copying = live & (rem2 > 0)
            rec = jnp.where(
                copying, REC_MATCH | dist2,
                jnp.where(is_l, REC_LIT | (head & 255), 0))
            rec_ref[j] = rec
            rem3 = rem2 - jnp.where(copying, 1, 0)
            return (tk, qoff, rem3, dist2)

        # ---- one 128-byte block: expand records, then materialize -----
        def block(b, stage):
            carry = (st_ref[_TK], st_ref[_QOFF], st_ref[_REM],
                     st_ref[_DIST])
            tk0 = carry[0]
            prefetch(tk0)
            carry = (tk0, _zeros8() + (carry[1]), carry[2], carry[3])

            carry = jax.lax.fori_loop(
                0, 128, lambda j, c: byte_step(j, c, b), carry)

            st_ref[_TK] = carry[0] + carry[1]
            st_ref[_QOFF] = _zeros8()
            st_ref[_REM] = carry[2]
            st_ref[_DIST] = carry[3]

            # records -> (1024, 128) lane-major
            rec3 = rec_ref[...]                       # (128, 8, 128)
            recT = jnp.transpose(rec3.reshape(128, NSTR))  # (1024, 128)

            is_m = recT < 0
            dist = jnp.where(is_m, recT & 8191, 0)
            litb = jnp.where(recT > 0, recT & 255, 0)
            j_i = lane_i
            srel = j_i - dist

            # in-block pointer-doubling chase
            m = jnp.where(is_m & (srel >= 0), srel, j_i)
            for _ in range(7):
                m = jnp.take_along_axis(m, m, axis=1)
            rec_k = jnp.take_along_axis(recT, m, axis=1)
            dist_k = jnp.where(rec_k < 0, rec_k & 8191, 0)
            lit_k = jnp.where(rec_k > 0, rec_k & 255, 0)
            k_is_m = rec_k < 0

            p0 = (g * BLOCKS + b) * 128
            src_abs = p0 + m - dist_k                 # < p0 by chase
            w = src_abs >> 2
            wl = w & (LANE - 1)
            val = _zeros8().reshape(1, -1) * 0        # placeholder
            res = jnp.zeros((NSTR, LANE), _I32)
            for c in range(GROUPS):
                gw = jnp.take_along_axis(win_ref[c], wl, axis=1)
                res = jnp.where((w >> 7) == c, gw, res)
            gs = jnp.take_along_axis(stage, wl, axis=1)
            res = jnp.where((w >> 7) == g, gs, res)
            sh = ((src_abs & 3) << 3).astype(_U32)
            wbyte = ((res.astype(_U32) >> sh) & _U32(0xFF)).astype(_I32)

            bytes_ = jnp.where(k_is_m, wbyte, lit_k)

            # pack 4 bytes -> 1 word, compact to lanes 0..31
            b1 = pltpu.roll(bytes_, LANE - 1, 1)
            b2 = pltpu.roll(bytes_, LANE - 2, 1)
            b3 = pltpu.roll(bytes_, LANE - 3, 1)
            words = _i32u(bytes_) | (_i32u(b1) << 8) | \
                (_i32u(b2) << 16) | (_i32u(b3) << 24)
            words = jax.lax.bitcast_convert_type(words, _I32)
            cidx = jnp.minimum(lane_i * 4, LANE - 1)
            wcomp = jnp.take_along_axis(words, cidx, axis=1)
            placed = pltpu.roll(wcomp, b * 32, 1)
            keep = (lane_i >= b * 32) & (lane_i < (b + 1) * 32)
            return jnp.where(keep, placed, stage)

        def _i32u(x):
            return x.astype(_U32)

        stage = jnp.zeros((NSTR, LANE), _I32)
        for b in range(BLOCKS):
            stage = block(b, stage)

        win_ref[g] = stage
        out_ref[0, 0] = stage

    return kernel


@partial(jax.jit, static_argnames=("waves", "interpret"))
def resolve_waves(outlen: jnp.ndarray, tok_lm: jnp.ndarray, waves: int,
                  interpret: bool = False):
    """Kernel BC over `waves` waves.

    outlen: int32[waves, 8, 128] per-stream output byte counts.
    tok_lm: int32[waves, TOK_CHUNKS, 1024, 128] lane-major token rows
            (row k of stream r at [w, k // 128, r, k % 128]).
    Returns int32[waves, GROUPS, 1024, 128] output words (word w of
    stream r at [wave, w // 128, r, w % 128]).
    """
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(waves, GROUPS),
        in_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda w, gr: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NSTR, LANE), lambda w, gr: (w, gr, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NST, SUB, LANE), jnp.int32),
            pltpu.VMEM((GROUPS, NSTR, LANE), jnp.int32),
            pltpu.VMEM((QD, SUB, LANE), jnp.int32),
            pltpu.VMEM((128, SUB, LANE), jnp.int32),
            pltpu.VMEM((TOK_CHUNKS, NSTR, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, = pl.pallas_call(
        _make_kernel_bc(),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((waves, GROUPS, NSTR, LANE), jnp.int32),
        ],
        interpret=interpret,
    )(outlen, tok_lm)
    return out


@partial(jax.jit, static_argnames=("waves", "interpret"))
def inflate_waves(nbits: jnp.ndarray, inw: jnp.ndarray, waves: int,
                  interpret: bool = False):
    """Fused lane decode: kernel A -> lane-major relayout -> kernel BC.

    Returns (out words int32[waves, GROUPS, 1024, 128], misc
    int32[waves, 4, 8, 128]).  One jit so the ~10 MB/wave token
    intermediate never crosses the host link.
    """
    from .lanes_inflate import parse_waves

    tok, misc = parse_waves(nbits, inw, waves, interpret=interpret)
    tok_lm = jnp.transpose(tok, (0, 1, 3, 4, 2)).reshape(
        waves, TOK_CHUNKS, NSTR, LANE)
    out = resolve_waves(misc[:, 1], tok_lm, waves, interpret=interpret)
    return out, misc


def decompress_shards(streams, out_sizes, interpret: bool = False):
    """Decode B raw-DEFLATE shard streams (each decompressing to at
    most SEGB bytes) on the lane path.  Returns list[bytes].

    Streams whose decompressed size exceeds SEGB, or that exhaust the
    lane kernel's capacities, raise ValueError - callers route those
    through the scalar path (inflate/tpu_inflate.decompress_segments).
    """
    from ..utils.errors import CorruptInputError, UnexpectedEOFError
    from .lanes_inflate import (IN_W, SEGB, ST_CORRUPT, ST_DONE,
                                ST_OVERFLOW, ST_TRUNC,
                                stage_streams_lanes)

    if not streams:
        return []
    for i, (s, o) in enumerate(zip(streams, out_sizes)):
        if o > SEGB:
            raise ValueError(f"stream {i}: out_size {o} > shard cap {SEGB}")
        if len(s) > IN_W * 4:
            raise CorruptInputError(-1)
    waves = -(-len(streams) // NSTR)
    nbits, inw = stage_streams_lanes(streams, waves)
    out, misc = inflate_waves(nbits, inw, waves, interpret=interpret)
    out_h = np.asarray(out)
    misc_h = np.asarray(misc)
    res = []
    for i in range(len(streams)):
        w, r = divmod(i, NSTR)
        st = int(misc_h[w, 0, r // LANE, r % LANE])
        n = int(misc_h[w, 1, r // LANE, r % LANE])
        if st == ST_TRUNC:
            raise UnexpectedEOFError()
        if st == ST_OVERFLOW:
            raise ValueError(
                f"stream {i}: exceeds lane-shard capacity (out_size cap "
                f"{SEGB})")
        if st != ST_DONE:
            raise CorruptInputError(-1)
        if n > out_sizes[i]:
            raise ValueError(
                f"stream {i}: decompressed size {n} exceeds caller bound "
                f"{out_sizes[i]}")
        words = out_h[w, :, i - w * NSTR, :].reshape(-1)
        res.append(words.astype("<u4").tobytes()[:n])
    return res
