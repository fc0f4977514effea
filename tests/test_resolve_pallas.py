"""Differential tests of the Pallas stage-B decoder (interpret mode)
against zlib-derived token streams and the XLA resolver.

The compiled-TPU path is exercised by `make check-tpu` (tools/
tpu_smoke.py); interpret mode validates semantics here — including the
overlapping-RLE copies (dict-decoder.mbt:136-149) and copies straddling
the kernel's output-chunk boundary.
"""

import zlib

import numpy as np
import pytest

import jax.numpy as jnp

from moonbit_flate_tpu.inflate.tpu_inflate import scan_tokens
from moonbit_flate_tpu.ops.resolve_pallas import (OUT_BYTES,
                                                  resolve_batch_pallas)


def _resolve(tokens_list):
    """Run B token streams through the kernel; return bytes per stream."""
    B = len(tokens_list)
    nt = max(max((len(t) for t in tokens_list), default=1), 1)
    nt_pad = -(-nt // 1024) * 1024
    toks = np.zeros((B, nt_pad), np.int32)
    ntok = np.zeros(B, np.int32)
    out_lens = []
    for i, t in enumerate(tokens_list):
        toks[i, : len(t)] = t
        ntok[i] = len(t)
        lens = np.where(t < 0, ((t >> 15) & 0xFF) + 3, 1)
        out_lens.append(int(lens.sum()))
    no_pad = -(-(max(out_lens) + 1) // OUT_BYTES) * OUT_BYTES
    outw = resolve_batch_pallas(jnp.asarray(toks), jnp.asarray(ntok),
                                nt_pad, no_pad, interpret=True)
    flat = np.asarray(outw).view(np.uint8).reshape(B, no_pad)
    return [flat[i, : out_lens[i]].tobytes() for i in range(B)], flat, out_lens


def _toks(data, level=6):
    return scan_tokens(zlib.compress(data, level)[2:-4])


def test_zlib_token_roundtrip_batch():
    rng = np.random.default_rng(1)
    datas = [
        b"hello world, " * 40,
        bytes(rng.integers(0, 256, 1000, np.uint8)),           # literals
        b"\x00" * 3000,                                         # RLE d=1
        (b"abcdefg" * 300)[:1900],                              # period 7
        b"x" + b"yz" * 5 + bytes(rng.integers(0, 256, 50, np.uint8)) * 30,
    ]
    outs, _, _ = _resolve([_toks(d) for d in datas])
    for got, want in zip(outs, datas):
        assert got == want


def test_copy_straddles_chunk_boundary():
    # a 258-byte copy crossing the OUT_BYTES boundary must park and
    # resume mid-copy
    head = bytes(np.random.default_rng(2).integers(0, 256, 300, np.uint8))
    data = (head * ((OUT_BYTES + 2000) // 300 + 2))[: OUT_BYTES + 1500]
    outs, _, _ = _resolve([_toks(data)])
    assert outs[0] == data


def test_overlapping_rle_copies():
    # length > dist at several small distances
    for d in (1, 2, 3, 5):
        data = bytes(range(d)) * 400
        outs, _, _ = _resolve([_toks(data)])
        assert outs[0] == data


def test_padding_is_zeroed():
    data = b"q" * 100
    outs, flat, out_lens = _resolve([_toks(data)])
    assert outs[0] == data
    assert not flat[0, out_lens[0]:].any()


def test_matches_xla_resolver():
    from moonbit_flate_tpu.inflate.tpu_inflate import resolve_tokens_batch

    rng = np.random.default_rng(3)
    data = (b"the quick brown fox " * 60
            + bytes(rng.integers(0, 256, 400, np.uint8)) + b"Z" * 500)
    t = _toks(data)
    nt_pad = -(-len(t) // 1024) * 1024
    toks = np.zeros((1, nt_pad), np.int32)
    toks[0, : len(t)] = t
    no_pad = -(-(len(data) + 1) // OUT_BYTES) * OUT_BYTES
    outw = resolve_batch_pallas(jnp.asarray(toks),
                                jnp.asarray([len(t)], np.int32),
                                nt_pad, no_pad, interpret=True)
    got = np.asarray(outw).view(np.uint8).reshape(-1)[: len(data)].tobytes()
    ref, _ = resolve_tokens_batch(jnp.asarray(toks), nt_pad, no_pad)
    assert got == np.asarray(ref)[0, : len(data)].tobytes() == data
