"""Pallas stage-B decoder: token records -> output bytes.

The XLA stage-B formulation (inflate/tpu_inflate.resolve_tokens_batch:
prefix sums + 21 pointer-doubling gather rounds over a flat [B*NO]
index space) runs at ~7 MB/s on the chip — every round is a full-array
gather in the ~15 cycles/element class — and its compile HANGS outright
once the flat arrays cross VMEM size (bisected round 4).  This kernel
replaces it with the sequential formulation the wire format actually
wants (dict-decoder.mbt:114-185): a 32 KB circular history window in
SMEM, one scalar pass over the tokens, byte copies that handle
overlapping RLE copies (length > dist) for free.  ~5 scalar ops per
output byte puts it far above the Pallas parser (~33 MB/s) that feeds
it, so fused parse+resolve decode is parse-bound, as it should be.

Grid = (B, output chunks), chunk axis innermost; all decode state
(token cursor, output position, mid-copy progress) persists in SMEM
across a stream's chunks, so a 258-byte copy can straddle chunk
boundaries.  Tokens stream HBM -> SMEM through a slab window refilled
at a 1024-word alignment, like the parser's input window.  Loop
position/progress ride the while carry, not refs — reading a ref in a
while cond is stale in interpret mode (see parse_pallas.py).

Token records match the native scanner and the Pallas parser:
  literal: byte value; match: (1 << 31) | ((len - 3) << 15) | (dist - 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT_BYTES = 8192            # output bytes per grid step
_OW = OUT_BYTES // 4        # output words per grid step
_WINW = 8192                # circular history window words (32 KB)
TSLAB = 8192                # token slab words in SMEM
_GUARD = 1024               # refill slab when cursor nears its end

# state slots
ST_TOK = 0       # tokens consumed
ST_OUT = 1       # bytes produced (absolute)
ST_REM = 2       # bytes left of an in-flight copy
ST_DIST = 3      # distance of the in-flight copy
ST_SLAB = 4      # token-slab base (token index into this stream)
N_STATE = 5


def _make_kernel(nt_per: int):
    """nt_per: tokens per stream in the flat HBM token array (the array
    carries TSLAB words of zero padding past the last stream)."""

    def _kernel(ntok_ref, toks_hbm, out_ref, win, tslab, state, sem):
        g = pl.program_id(0)
        t = pl.program_id(1)
        ntok = ntok_ref[g]

        def refill(tok_idx):
            base = tok_idx & ~jnp.int32(1023)
            state[ST_SLAB] = base
            dma = pltpu.make_async_copy(
                toks_hbm.at[pl.ds(pl.multiple_of(g * nt_per + base, 1024),
                                  TSLAB)],
                tslab, sem,
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

        out_base = t * OUT_BYTES
        out_end = out_base + OUT_BYTES

        def put_byte(op, b):
            wi = (op >> 2) & (_WINW - 1)
            sh = jnp.asarray((op & 3) << 3, jnp.uint32)
            old = win[wi].astype(jnp.uint32)
            win[wi] = (
                (old & ~(jnp.uint32(0xFF) << sh))
                | ((jnp.asarray(b, jnp.uint32) & jnp.uint32(0xFF)) << sh)
            ).astype(jnp.int32)

        def get_byte(p):
            wi = (p >> 2) & (_WINW - 1)
            sh = jnp.asarray((p & 3) << 3, jnp.uint32)
            return ((win[wi].astype(jnp.uint32) >> sh)
                    & jnp.uint32(0xFF)).astype(jnp.int32)

        def get_word(p):
            """Unaligned little-endian 4-byte window load at byte p."""
            wi = (p >> 2) & (_WINW - 1)
            wj = ((p >> 2) + 1) & (_WINW - 1)
            sh = jnp.asarray((p & 3) << 3, jnp.uint32)
            lo = win[wi].astype(jnp.uint32)
            hi = win[wj].astype(jnp.uint32)
            return jnp.where(
                sh == 0, lo, (lo >> sh) | (hi << (jnp.uint32(32) - sh))
            ).astype(jnp.int32)

        def loop_cond(c):
            op, rem, tk = c
            return (op < out_end) & ((rem > 0) | (tk < ntok))

        def loop_body(c):
            op, rem, tk = c

            def do_copy(c):
                op, rem, tk = c
                d = state[ST_DIST]
                stop = jnp.minimum(out_end, op + rem)

                def cbody(o):
                    put_byte(o, get_byte(o - d))
                    return o + 1

                # bytes until the destination is word-aligned (d < 4 —
                # the overlapping-RLE regime — stays byte-wise: a word
                # copy there would read bytes not yet written)
                def head_cond(o):
                    return (o < stop) & (((o & 3) != 0) | (d < 4))

                op1 = jax.lax.while_loop(head_cond, cbody, op)

                # full destination words: one unaligned source load +
                # one aligned store per 4 bytes (source bytes all
                # precede the destination since d >= 4)
                def wbody(o):
                    win[(o >> 2) & (_WINW - 1)] = get_word(o - d)
                    return o + 4

                op2 = jax.lax.cond(
                    d >= 4,
                    lambda o: jax.lax.while_loop(
                        lambda o2: o2 + 4 <= stop, wbody, o),
                    lambda o: o, op1)

                op3 = jax.lax.while_loop(lambda o: o < stop, cbody, op2)
                return op3, rem - (op3 - op), tk

            def do_token(c):
                op, rem, tk = c

                @pl.when(tk - state[ST_SLAB] >= TSLAB - _GUARD)
                def _():
                    refill(tk)

                tok = tslab[tk - state[ST_SLAB]]

                def lit(op):
                    put_byte(op, tok & 0xFF)
                    return op + 1, jnp.int32(0)

                def mat(op):
                    state[ST_DIST] = (tok & 0x7FFF) + 1
                    return op, ((tok >> 15) & 0xFF) + 3

                op2, rem2 = jax.lax.cond(tok < 0, mat, lit, op)
                return op2, rem2, tk + 1

            return jax.lax.cond(rem > 0, do_copy, do_token, c)

        op_end, rem_end, tok_end = jax.lax.while_loop(
            loop_cond, loop_body,
            (state[ST_OUT], state[ST_REM], state[ST_TOK]),
        )
        state[ST_OUT] = op_end
        state[ST_REM] = rem_end
        state[ST_TOK] = tok_end

        # emit this chunk: the window's last OUT_BYTES are exactly the
        # chunk (word-aligned: chunk boundaries are multiples of 4);
        # zero any bytes past the stream's real output
        def emit(k, c):
            wi = ((out_base >> 2) + k) & (_WINW - 1)
            src = win[wi]
            wbyte = out_base + 4 * k
            part = jnp.clip(op_end - wbyte, 0, 4)
            mask = jnp.where(
                part >= 4,
                jnp.uint32(0xFFFFFFFF),
                (jnp.uint32(1) << jnp.asarray(part << 3, jnp.uint32))
                - jnp.uint32(1),
            )
            out_ref[k] = (src.astype(jnp.uint32) & mask).astype(jnp.int32)
            return c

        jax.lax.fori_loop(0, _OW, emit, 0)

    return _kernel


@partial(jax.jit, static_argnums=(2, 3, 4))
def resolve_batch_pallas(tokens: jnp.ndarray, ntok: jnp.ndarray,
                         nt_pad: int, no_pad: int,
                         interpret: bool = False):
    """Materialize B token streams into bytes on the scalar core.

    tokens: int32[B, nt_pad] (padding past ntok[b] is ignored);
    ntok: int32[B] real token counts; no_pad: output capacity per
    stream (multiple of OUT_BYTES).  Returns int32[B, no_pad/4]
    little-endian output WORDS, zero past each stream's real output
    (callers view the bytes with numpy; keeping words avoids a
    device-side 4x reshape to uint8).
    """
    B, NT = tokens.shape
    assert NT == nt_pad and nt_pad % 1024 == 0, nt_pad
    assert no_pad % OUT_BYTES == 0, no_pad
    n_chunks = no_pad // OUT_BYTES
    toks_flat = jnp.concatenate(
        [tokens.reshape(-1), jnp.zeros(TSLAB, jnp.int32)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((_OW,), lambda g, t, s: (g * n_chunks + t,),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((_WINW,), jnp.int32),
            pltpu.SMEM((TSLAB,), jnp.int32),
            pltpu.SMEM((N_STATE,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_words, = pl.pallas_call(
        _make_kernel(nt_pad),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B * no_pad // 4,), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(ntok, jnp.int32), toks_flat)
    return out_words.reshape(B, no_pad // 4)
