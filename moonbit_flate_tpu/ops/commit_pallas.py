"""Greedy-commit as a Pallas kernel: sequential token walk on the scalar core.

The greedy tokenization (walk next(i) = i + max(len_i, 1) from `start`)
is inherently sequential but touches only O(#tokens) scalars.  The XLA
pointer-doubling formulation costs ~20 full-array gather+scatter rounds
(~350 ms/MB on v5e); this kernel instead walks the match-length array on
the TPU scalar core while Pallas pipelines chunks through SMEM (the only
memory with dynamic scalar indexing).  The committed mask is emitted as
packed bits (one i32 word per 32 positions) and unpacked with vector ops
outside the kernel; the walk cursor persists across sequential grid
steps in SMEM scratch.

``start`` (the preset-dictionary / context boundary, SURVEY §5.7's halo)
arrives as a scalar-prefetch argument.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import constants as C

CHUNK = 8192  # positions per grid step (32 KB of SMEM for the lengths)


def _kernel(start_ref, mlen_ref, out_ref, cursor_ref):
    t = pl.program_id(0)
    tile_start = t * CHUNK

    @pl.when(t == 0)
    def _():
        cursor_ref[0] = start_ref[0]

    def zero_body(w, carry):
        out_ref[w] = 0
        return carry

    jax.lax.fori_loop(0, 1024, zero_body, 0)

    def cond(cur):
        return cur < tile_start + CHUNK

    def body(cur):
        local = cur - tile_start
        m = mlen_ref[local]
        w = local >> 5
        out_ref[w] = out_ref[w] | (1 << (local & 31))
        return cur + jnp.where(m >= C.MIN_MATCH_LENGTH, m, 1)

    cursor_ref[0] = jax.lax.while_loop(
        cond, body, jnp.maximum(cursor_ref[0], tile_start)
    )


def greedy_commit(mlen: jnp.ndarray, n: jnp.ndarray,
                  start: jnp.ndarray | int = 0) -> jnp.ndarray:
    """bool[S] mask of committed token start positions (greedy parse
    beginning at `start`; positions before it are context only)."""
    S = mlen.shape[0]
    S_pad = ((S + CHUNK - 1) // CHUNK) * CHUNK
    n_chunks = S_pad // CHUNK
    mlen_p = jnp.zeros(S_pad, jnp.int32).at[:S].set(mlen)
    start_arr = jnp.asarray(start, jnp.int32).reshape(1)
    # output rows are padded to 1024 words per chunk to satisfy the XLA
    # SMEM layout (1-D i32 tiling is T(1024))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda t, s: (t,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1024,), lambda t, s: (t,), memory_space=pltpu.SMEM
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    bits = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks * 1024,), jnp.int32),
    )(start_arr, mlen_p)
    bits = bits.reshape(n_chunks, 1024)[:, : CHUNK // 32].reshape(-1)
    # dense unpack: expand each word to its 32 positions with a broadcast
    # shift (a [S/32, 32] vector op), never a per-position gather
    committed = (
        (bits[:, None] >> jnp.arange(32, dtype=jnp.int32)[None, :]) & 1
    ).reshape(-1)[:S]
    pos = jnp.arange(S, dtype=jnp.int32)
    return (committed > 0) & (pos < n) & (pos >= start_arr[0])
