"""Greedy parse + lazy match extension as one Pallas scalar-core walk.

The greedy tokenization of deflateFast (deflate-fast.mbt:123-270) is the
one inherently sequential piece of the encode pipeline.  Round 1 ran it
as a per-position walk over match lengths the vector stages had fully
resolved up front — and resolving lengths for *every* position cost
~30 ms/MB in period tables and gathered extension loops, even though
the parse only commits ~S/8 of them.

This kernel inverts that: the vector stages deliver only *capped*
candidates (sort candidates always report exactly SORT_CAP — ">= 4,
extend at commit"; exact lengths only for lags <= Z_LAGS from
lag-compare run tables), and the walk

  1. skips literal runs via a match-presence bitmask (one scan per
     32 positions, not per byte),
  2. commits matches greedily, and
  3. extends each committed match word-at-a-time against a 32 KB
     history window resident in SMEM (DMA'd from HBM per chunk) —
     O(committed match bytes), not O(positions).

The kernel is natively batched over segments (grid = (B, chunks), the
chunk axis innermost) so one dispatch parses a whole corpus — per-
dispatch tunnel overhead (~50 ms measured on the v5e link) amortizes
across segments.

Outputs are a committed-match bitmask plus the match info array with
final lengths written at committed starts (entries elsewhere are
garbage and must be masked by the bitmask — this avoids a per-position
zeroing loop).  Block-boundary clipping (65535-byte blocks,
max_store_block_size deflate-fast.mbt:46) is enforced by tracking the
next boundary as walk state; n- and 258-clipping per the wire rules
(deflate.mbt:20-25).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import constants as C
from .matcher import SORT_CAP, Z_LAGS

CHUNK = 8192          # positions per grid step (measured optimum:
                      # 16384 is ~3x slower — larger SMEM blocks cost
                      # more than fewer per-chunk overheads save — and
                      # 4096 is ~15x slower — per-grid-step block
                      # copies dominate)
HALO = 1 << 15        # history bytes needed by extension (max distance)
SLACK = 4096          # extension overrun past the chunk (needs only
                      # 258 + 8 bytes; rounded up so the DMA'd window is
                      # a multiple of the 1024-word SMEM tile)
_NW = CHUNK // 32     # bitmask words per chunk
_NWP = 1024           # bitmask words padded per chunk (XLA 1-D i32 SMEM
                      # layout is T(1024); only the first _NW are real)
_C4 = CHUNK // 4      # data words per chunk
_WWIN = (HALO + CHUNK + SLACK) // 4   # window words resident in SMEM


def _tz32(x):
    """Index of the lowest set bit of a nonzero uint32 (5 halving steps)."""
    b = jnp.int32(0)
    for sh, m in ((16, 0xFFFF), (8, 0xFF), (4, 0xF), (2, 0x3), (1, 0x1)):
        hit = (x & jnp.uint32(m)) == 0
        b = b + jnp.where(hit, sh, 0)
        x = jnp.where(hit, x >> jnp.uint32(sh), x)
    return b


def _tz_bytes(x):
    """Number of trailing zero bytes of a uint32 (0..4)."""
    b0 = (x & jnp.uint32(0xFF)) == 0
    b1 = (x & jnp.uint32(0xFFFF)) == 0
    b2 = (x & jnp.uint32(0xFFFFFF)) == 0
    b3 = x == 0
    return (b0.astype(jnp.int32) + (b0 & b1).astype(jnp.int32)
            + (b0 & b1 & b2).astype(jnp.int32)
            + (b0 & b1 & b2 & b3).astype(jnp.int32))


def _make_kernel(w4t: int):
    """w4t: words per segment in the flattened data-word array."""

    def _kernel(params_ref, bits_ref, minfo_ref, words_hbm,
                bits_out_ref, minfo_out_ref, wwin0_ref, wwin1_ref,
                sem, state_ref):
        g = pl.program_id(0)      # segment (batch) index
        t = pl.program_id(1)      # chunk index within the segment
        n_chunks = pl.num_programs(1)
        base = t * CHUNK
        ctx = params_ref[g, 0]
        n = params_ref[g, 1]

        # window of data words [base - HALO, base + CHUNK + SLACK) — each
        # segment's words are pre-padded with HALO zero bytes, so chunk
        # t's window starts at word g*w4t + t*C4 and every start is in
        # range (and 1024-word aligned).  Double-buffered: chunk t walks
        # one window buffer while chunk t+1's window streams into the
        # other (the grid is sequential, so the overwritten one is done).
        # The two buffers are SEPARATE 1-D SMEM scratches selected by
        # trace-time branching on t%2 — Mosaic rejects row-slicing a
        # (2, _WWIN) SMEM scratch ("slice along dim 0 must be aligned to
        # tiling (2)"), so a 2-D slot array cannot be used here.
        slot = jax.lax.rem(t, 2)

        def dma_for(tt, win_ref, sem_ref):
            return pltpu.make_async_copy(
                words_hbm.at[pl.ds(g * w4t + tt * _C4, _WWIN)],
                win_ref, sem_ref
            )

        @pl.when(t == 0)
        def _():
            dma_for(0, wwin0_ref, sem.at[0]).start()
            state_ref[0] = ctx                  # cursor
            state_ref[1] = ctx + C.MAX_STORE_BLOCK_SIZE  # next block boundary

        def zero_body(w, carry):
            bits_out_ref[w] = 0
            return carry

        jax.lax.fori_loop(0, _NW, zero_body, 0)

        def walk(wwin_ref, other_ref, my_si, other_si):
            """Walk chunk t out of wwin_ref; prefetch t+1 into other_ref."""

            @pl.when(t + 1 < n_chunks)
            def _():
                dma_for(t + 1, other_ref, sem.at[other_si]).start()

            dma_for(t, wwin_ref, sem.at[my_si]).wait()
            _walk_body(wwin_ref)

        def load32_from(wwin_ref, p):
            """Little-endian 4-byte load at absolute byte position p."""
            off = p - base + HALO
            w = off >> 2
            s = jnp.uint32((off & 3) << 3)
            lo = wwin_ref[w].astype(jnp.uint32)
            hi = wwin_ref[w + 1].astype(jnp.uint32)
            return jnp.where(s == 0, lo, (lo >> s) | (hi << (jnp.uint32(32) - s)))

        end = base + CHUNK

        def _walk_body(wwin_ref):
            load32 = partial(load32_from, wwin_ref)
            run_walk(load32)

        def body(load32, state):
            cur, nbe = state
            local = cur - base
            wi = local >> 5
            word = bits_ref[wi].astype(jnp.uint32) & (
                jnp.uint32(0xFFFFFFFF) << jnp.uint32(local & 31)
            )

            def scan_cond(s):
                wi_, wd_ = s
                return (wd_ == 0) & (wi_ + 1 < _NW)

            def scan_body(s):
                wi_, _ = s
                return wi_ + 1, bits_ref[wi_ + 1].astype(jnp.uint32)

            wi, word = jax.lax.while_loop(scan_cond, scan_body, (wi, word))

            def no_match(_):
                return end, nbe

            def has_match(word):
                b = _tz32(word)
                q = base + wi * 32 + b
                info = minfo_ref[q - base]
                d = info >> 9
                L0 = info & 511

                # advance the 65535-byte block boundary past q (amortized:
                # a handful of iterations per segment)
                def nbe_body(x):
                    return x + C.MAX_STORE_BLOCK_SIZE

                nbe2 = jax.lax.while_loop(lambda x: x <= q, nbe_body, nbe)

                max_l = jnp.minimum(
                    jnp.minimum(C.MAX_MATCH_LENGTH, n - q), nbe2 - q
                )

                def extend(_):
                    # 8 bytes per iteration (4 SMEM loads — same loads
                    # per byte as a 4-byte step, half the loop overhead;
                    # long matches are the common case on RLE-ish data)
                    def econd(l):
                        return (l + 8 <= max_l) & (
                            load32(q + l) == load32(q - d + l)
                        ) & (
                            load32(q + l + 4) == load32(q - d + l + 4)
                        )

                    le = jax.lax.while_loop(econd, lambda l: l + 8,
                                            jnp.int32(SORT_CAP))
                    # tail: up to 7 more matching bytes across two words
                    # (window SLACK covers reads past the chunk; the
                    # final min() clips any agreement past max_l)
                    d0 = load32(q + le) ^ load32(q - d + le)
                    t0 = _tz_bytes(d0)
                    d1 = load32(q + le + 4) ^ load32(q - d + le + 4)
                    tail = jnp.where(t0 == 4, 4 + _tz_bytes(d1), t0)
                    return le + jnp.minimum(tail, max_l - le)

                # safety net: confirm the first 4 bytes before
                # committing a sort candidate (exact today, but this
                # keeps the kernel correct under any approximate
                # matcher; ~10 cycles per commit)
                is_cand = (d > Z_LAGS) & (L0 == SORT_CAP)
                verified = ~is_cand | (load32(q) == load32(q - d))

                def commit(_):
                    L = jnp.minimum(L0, max_l)
                    need_ext = is_cand & (max_l > SORT_CAP)
                    L2 = jax.lax.cond(need_ext, extend, lambda _: L, 0)
                    bits_out_ref[wi] = (
                        bits_out_ref[wi].astype(jnp.uint32)
                        | (jnp.uint32(1) << jnp.uint32(b))
                    ).astype(jnp.int32)
                    minfo_out_ref[q - base] = (d << 9) | L2
                    return q + L2

                def reject(_):
                    # hash collision: skip just this position and rescan
                    return q + 1

                nxt = jax.lax.cond(verified, commit, reject, 0)
                return nxt, nbe2

            return jax.lax.cond(word == 0, no_match, has_match, word)

        def run_walk(load32):
            cur0 = jnp.maximum(state_ref[0], base)
            cur, nbe = jax.lax.while_loop(
                lambda s: s[0] < end, partial(body, load32),
                (cur0, state_ref[1])
            )
            state_ref[0] = cur
            state_ref[1] = nbe

        @pl.when(slot == 0)
        def _():
            walk(wwin0_ref, wwin1_ref, 0, 1)

        @pl.when(slot == 1)
        def _():
            walk(wwin1_ref, wwin0_ref, 1, 0)

    return _kernel


@partial(jax.jit, static_argnames=("interpret",))
def walk_batch(bits: jnp.ndarray, minfo: jnp.ndarray,
               words_padded: jnp.ndarray, ctx: jnp.ndarray, n: jnp.ndarray,
               interpret: bool = False):
    """Greedy-commit + extend, batched over B independent segments.

    bits:  int32[B, S/32] match-presence bitmask (bit i of word w =
           position 32w+i holds an admissible candidate).
    minfo: int32[B, S] packed (dist << 9 | capped_len) at candidates.
    words_padded: int32[B, (HALO + S + SLACK) / 4] little-endian data
           words, HALO zero bytes prepended (position p's bytes start in
           word (p + HALO) / 4).
    ctx, n: int32[B] context-prefix length and valid byte count.
    Returns (bits_out int32[B, S/32] committed-match-start mask,
             minfo_out int32[B, S] with (dist << 9 | final_len) at
             committed starts; other entries are GARBAGE — mask with
             bits_out).
    """
    B, S = minfo.shape
    assert S % CHUNK == 0, S
    w4t = (HALO + S + SLACK) // 4
    assert words_padded.shape == (B, w4t)
    words_flat = words_padded.reshape(B * w4t)
    n_chunks = S // CHUNK
    params = jnp.stack(
        [jnp.asarray(ctx, jnp.int32).reshape(B),
         jnp.asarray(n, jnp.int32).reshape(B)], axis=1
    )
    # pad each chunk's bitmask row from _NW to _NWP words (layout, §above).
    # All chunked arrays are FLAT 1-D with 1-D blocks: 2-D (1, k) blocks
    # over a (B, ...) array violate Mosaic's last-two-dims rule for any
    # B > 1; 1-D SMEM blocks only need the (1024) tile.
    bits = jnp.pad(
        bits.reshape(B, n_chunks, _NW), ((0, 0), (0, 0), (0, _NWP - _NW))
    ).reshape(B * n_chunks * _NWP)
    minfo_flat = minfo.reshape(B * S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((_NWP,), lambda g, t, s: (g * n_chunks + t,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK,), lambda g, t, s: (g * n_chunks + t,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((_NWP,), lambda g, t, s: (g * n_chunks + t,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK,), lambda g, t, s: (g * n_chunks + t,),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((_WWIN,), jnp.int32),
            pltpu.SMEM((_WWIN,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    bits_out, minfo_out = pl.pallas_call(
        _make_kernel(w4t),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * n_chunks * _NWP,), jnp.int32),
            jax.ShapeDtypeStruct((B * S,), jnp.int32),
        ],
        interpret=interpret,
    )(params, bits, minfo_flat, words_flat)
    bits_out = bits_out.reshape(B, n_chunks, _NWP)[:, :, :_NW]
    return bits_out.reshape(B, S // 32), minfo_out.reshape(B, S)
