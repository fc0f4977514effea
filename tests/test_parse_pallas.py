"""Differential tests of the Pallas stage-A parser (interpret mode on
CPU) against the native C scanner — the production decode kernel parity
chain: inflate.mbt:69-223 (tables), :345-379 (block dispatch),
:429-548 (dynamic header), :565-684 (symbol loop).

Interpret mode executes the scalar loop per-token in Python, so payloads
here are small and chunk sizes reduced (out_chunk is a static kernel
parameter; the TPU path uses the 8192 default — covered by bench.py's
round-trip and tests/test_tpu_decode.py's staging checks).
"""

import zlib

import numpy as np
import pytest

from moonbit_flate_tpu import native
from moonbit_flate_tpu.ops.parse_pallas import (parse_batch, parse_stream,
                                                _stage_streams)

pytestmark = pytest.mark.skipif(
    native._load() is None, reason="native library unavailable"
)


def _scan_native(stream):
    from moonbit_flate_tpu.inflate.tpu_inflate import scan_tokens

    return scan_tokens(stream)


def _payloads():
    rng = np.random.default_rng(11)
    text = (b"the quick brown fox jumps over the lazy dog | " * 40)[:1800]
    rnd = rng.integers(0, 256, 1200, np.uint8).tobytes()
    rle = b"abc" * 500
    mixed = text + rnd[:400] + rle[:600] + text[:300]
    return {"text": text, "random": rnd, "rle": rle, "mixed": mixed,
            "tiny": b"x", "empty": b""}


@pytest.mark.parametrize("level", [0, 1, 9])
@pytest.mark.parametrize("name", ["text", "random", "rle", "mixed",
                                  "tiny", "empty"])
def test_parse_matches_native_zlib(level, name):
    payload = _payloads()[name]
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    stream = co.compress(payload) + co.flush()
    toks, status, outpos = parse_stream(stream, max_out_chunks=8,
                                        interpret=True, out_chunk=512)
    assert status == 1
    assert outpos == len(payload)
    ref = _scan_native(stream)
    assert np.array_equal(toks, ref)


def test_parse_matches_native_own_stream():
    """Streams from our own encoder (dynamic + stored mix)."""
    from moonbit_flate_tpu.api.stream import compress as host_compress

    for name, payload in _payloads().items():
        stream = host_compress(payload)
        toks, status, outpos = parse_stream(stream, max_out_chunks=8,
                                            interpret=True, out_chunk=512)
        assert status == 1, name
        assert outpos == len(payload), name
        assert np.array_equal(toks, _scan_native(stream)), name


def test_parse_fixed_huffman_block():
    """Fixed-Huffman blocks (BTYPE=1), which our encoder never emits."""
    payload = b"fixed huffman block round trip " * 20
    co = zlib.compressobj(1, zlib.DEFLATED, -15, 9, zlib.Z_FIXED)
    stream = co.compress(payload) + co.flush()
    toks, status, outpos = parse_stream(stream, interpret=True,
                                        max_out_chunks=4, out_chunk=256)
    assert status == 1 and outpos == len(payload)
    assert np.array_equal(toks, _scan_native(stream))


def test_parse_truncated_and_corrupt():
    payload = (b"truncate me " * 100)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    stream = co.compress(payload) + co.flush()

    # truncated mid-block -> -4
    toks, status, outpos = parse_stream(stream[: len(stream) // 2],
                                        interpret=True, max_out_chunks=2,
                                        out_chunk=256)
    assert status == -4

    # reserved block type 3 -> -3
    bad = bytes([0x06]) + stream[1:]
    toks, status, outpos = parse_stream(bad, interpret=True,
                                        max_out_chunks=2, out_chunk=256)
    assert status == -3

    # EOF at a block-header boundary is a CLEAN end of stream
    # (inflate.mbt:345-348; the r2 truncation-semantics alignment)
    toks, status, outpos = parse_stream(b"", interpret=True,
                                        max_out_chunks=1, out_chunk=256)
    assert status == 1 and outpos == 0
    # non-final stream cut exactly at a block boundary: also clean,
    # and the tokens match the native scanner
    co2 = zlib.compressobj(6, zlib.DEFLATED, -15)
    part = co2.compress(payload) + co2.flush(zlib.Z_SYNC_FLUSH)
    # sync flush ends ... 00 00 FF FF (empty stored block), byte aligned
    toks, status, outpos = parse_stream(part, interpret=True,
                                        max_out_chunks=4, out_chunk=512)
    assert status == 1 and outpos == len(payload)
    assert np.array_equal(toks, _scan_native(part))


def test_parse_batch_multiple_streams():
    """One dispatch parses several independent streams."""
    payloads = list(_payloads().values())
    streams = []
    for i, p in enumerate(payloads):
        co = zlib.compressobj((i % 9) + 1, zlib.DEFLATED, -15)
        streams.append(co.compress(p) + co.flush())
    nbits, words = _stage_streams(streams)
    toks, cnt = parse_batch(nbits, words, 8, interpret=True, out_chunk=512)
    toks, cnt = np.asarray(toks), np.asarray(cnt)
    for i, (p, s) in enumerate(zip(payloads, streams)):
        assert cnt[i, 1] == 1, i
        assert cnt[i, 2] == len(p), i
        assert np.array_equal(toks[i, : cnt[i, 0]], _scan_native(s)), i


def test_parse_chunk_boundary_spanning():
    """A stream whose token count crosses chunk boundaries parses
    densely (the mid-step window refill keeps chunks full)."""
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 256, 700, np.uint8).tobytes()
    co = zlib.compressobj(1, zlib.DEFLATED, -15)
    stream = co.compress(payload) + co.flush()  # mostly literals
    toks, status, outpos = parse_stream(stream, max_out_chunks=4,
                                        interpret=True, out_chunk=256)
    assert status == 1 and outpos == len(payload)
    assert np.array_equal(toks, _scan_native(stream))
