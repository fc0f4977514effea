"""Interpret-mode coverage of the production TPU encode kernels.

The TPU branch of ops/pipeline.encode_segment_ctx runs two Pallas
kernels that the CPU test suite otherwise never exercises:

- ops/walk_pallas.walk_batch  (greedy commit + lazy match extension)
- ops/pack.pack_units_dense   (hierarchical dense merge + placement)

Both support interpret mode, so their exact production configuration is
differential-tested here on the CPU backend against their XLA twins
(greedy_commit_xla + extend_matches_xla, pack_units) — the parity chain
back to the reference: deflate-fast.mbt:123-270 (greedy parse),
huffman-bit-writer.mbt:170-199 (bit packing).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from moonbit_flate_tpu.formats import constants as C
from moonbit_flate_tpu.ops.matcher import (extend_matches_xla, find_matches,
                                           greedy_commit_xla,
                                           pack_match_info)
from moonbit_flate_tpu.ops.pipeline import BLOCK, PAD, pack_units


def _unit_cases():
    rng = np.random.default_rng(7)
    cases = []
    # dense random units across the width range
    for n in (1, 7, 256, 4097, 70000):
        w = rng.integers(0, 29, n).astype(np.int32)
        v = rng.integers(0, 1 << 28, n).astype(np.int64).astype(np.int32)
        cases.append((v, w))
    # heavy zero-width population (the common token-zone shape)
    w = rng.integers(0, 29, 30000).astype(np.int32)
    w[rng.random(30000) < 0.7] = 0
    v = rng.integers(0, 1 << 28, 30000).astype(np.int64).astype(np.int32)
    cases.append((v, w))
    # all-zero widths except one
    w = np.zeros(1000, np.int32)
    w[500] = 13
    v = np.full(1000, 0x1ABC, np.int32)
    cases.append((v, w))
    return cases


@pytest.mark.parametrize("idx", range(7))
def test_pack_units_dense_matches_scatter(idx):
    from moonbit_flate_tpu.ops.pack import pack_units_dense

    v, w = _unit_cases()[idx]
    n_words = int(w.sum()) // 32 + 4
    ref_words, ref_total = pack_units(jnp.asarray(v), jnp.asarray(w), n_words)
    got_words, got_total = pack_units_dense(
        jnp.asarray(v), jnp.asarray(w), n_words, interpret=True
    )
    assert int(ref_total) == int(got_total)
    assert np.array_equal(np.asarray(ref_words), np.asarray(got_words))


def _walk_inputs(data_padded, n, ctx, S):
    """Mirror of the TPU branch's kernel-input staging (pipeline.py)."""
    from moonbit_flate_tpu.ops.walk_pallas import CHUNK, HALO, SLACK

    pos = jnp.arange(S, dtype=jnp.int32)
    ctx_j = jnp.asarray(ctx, jnp.int32)
    blk_orig = jnp.clip(pos - ctx_j, 0, S - 1) // BLOCK
    mlen, dist = find_matches(data_padded, n)
    block_end = ctx_j + (blk_orig + 1) * BLOCK
    mlen = jnp.minimum(mlen, block_end - pos)
    mlen = jnp.where(mlen >= C.MIN_MATCH_LENGTH, mlen, 0)

    S_pad = -(-S // CHUNK) * CHUNK
    minfo, grp = pack_match_info(mlen, dist, ctx_j, S_pad)
    nbytes = HALO + S_pad + SLACK
    pb = jnp.concatenate([
        jnp.zeros(HALO, jnp.uint8), data_padded,
        jnp.zeros(nbytes - HALO - data_padded.shape[0], jnp.uint8),
    ]).reshape(-1, 4).astype(jnp.uint32)
    words = pb[:, 0] | (pb[:, 1] << 8) | (pb[:, 2] << 16) | (pb[:, 3] << 24)
    words = jax.lax.bitcast_convert_type(words, jnp.int32)
    return mlen, dist, block_end - pos, minfo, grp, words


import jax  # noqa: E402


def _case_payloads():
    rng = np.random.default_rng(3)
    ramp = (bytes(range(128)) * 2000)[:130000]
    text = (b"compression window huffman block stream symbol match " * 4000)[
        :130000
    ]
    mixed = bytearray(rng.integers(0, 256, 130000, np.uint8).tobytes())
    mixed[60000:120000] = mixed[:60000]  # long-range matches
    rle = (b"aaaaabbbbb" * 20000)[:130000]
    return {"ramp": ramp, "text": text, "mixed": bytes(mixed), "rle": rle}


@pytest.mark.parametrize("name", ["ramp", "text", "mixed", "rle"])
@pytest.mark.parametrize("ctx", [0, 1000])
def test_walk_batch_matches_xla_commit(name, ctx):
    """walk_batch (production TPU config, interpret mode) produces the
    same committed parse as extend_matches_xla + greedy_commit_xla."""
    from moonbit_flate_tpu.ops.walk_pallas import walk_batch

    payload = _case_payloads()[name]
    nb = 2
    S = nb * BLOCK
    buf = np.zeros(S + PAD, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    n = jnp.int32(len(payload))
    data_padded = jnp.asarray(buf)

    mlen0, dist0, cap, minfo, grp, words = _walk_inputs(
        data_padded, n, ctx, S
    )

    # XLA twin: extend everything, then pointer-double commit
    mlen_x = extend_matches_xla(data_padded, mlen0, dist0, n, cap)
    mlen_x = jnp.where(mlen_x >= C.MIN_MATCH_LENGTH, mlen_x, 0)
    committed_x = greedy_commit_xla(mlen_x, n, ctx)
    is_match_x = np.asarray(committed_x & (mlen_x > 0))
    len_x = np.asarray(jnp.where(committed_x, mlen_x, 0))

    # Pallas walk in interpret mode, exact production staging
    bits_o, minfo_o = walk_batch(
        grp[None], minfo[None], words[None],
        jnp.asarray([ctx], jnp.int32), jnp.asarray([n], jnp.int32),
        interpret=True,
    )
    bits_o, minfo_o = np.asarray(bits_o[0]), np.asarray(minfo_o[0])
    match_start = (
        (bits_o[:, None] >> np.arange(32)) & 1
    ).reshape(-1)[:S] > 0
    len_w = np.where(match_start, minfo_o[:S] & 511, 0)
    dist_w = np.where(match_start, minfo_o[:S] >> 9, 0)

    assert np.array_equal(match_start, is_match_x)
    assert np.array_equal(len_w, np.where(is_match_x, len_x, 0))
    assert np.array_equal(
        dist_w, np.where(is_match_x, np.asarray(dist0), 0)
    )
