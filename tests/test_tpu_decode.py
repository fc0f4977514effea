"""TPU decode path: native stage-A scan + data-parallel stage-B resolve."""

import zlib

import numpy as np
import pytest

from moonbit_flate_tpu import compress as mf_compress, native
from moonbit_flate_tpu.inflate.tpu_inflate import decompress as tpu_dec, scan_tokens
from moonbit_flate_tpu.utils.errors import FlateError

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native scanner unavailable"
)


def _cases():
    rng = np.random.default_rng(0)
    return [
        b"", b"x", b"hello world " * 5,
        b"a" * 100000,                       # deep dist-1 RLE chains
        b"abcdef" * 50000,                   # periodic
        rng.integers(0, 256, 150000, np.uint8).tobytes(),
        b"The quick brown fox jumps over the lazy dog. " * 5000,
    ]


def test_roundtrip_zlib_and_own_streams():
    for t in _cases():
        for lvl in (0, 1, 6, 9):
            co = zlib.compressobj(lvl, zlib.DEFLATED, -15)
            s = co.compress(t) + co.flush()
            assert tpu_dec(s) == t
        assert tpu_dec(mf_compress(t)) == t


def test_preset_dictionary():
    d = b"shared dictionary content! " * 100
    co = zlib.compressobj(6, zlib.DEFLATED, -15, zdict=d)
    s = co.compress(b"shared dictionary content! and more") + co.flush()
    assert tpu_dec(s, dictionary=d) == b"shared dictionary content! and more"


def test_scan_token_semantics():
    # "aaaa..." at level 1: one literal + one long RLE match chain
    s_ = zlib.compressobj(1, zlib.DEFLATED, -15)
    stream = s_.compress(b"a" * 300) + s_.flush()
    toks = scan_tokens(stream)
    assert toks[0] == ord("a")
    matches = toks[toks < 0]
    assert len(matches) >= 1
    lens = ((matches >> 15) & 0xFF) + 3
    dists = (matches & 0x7FFF) + 1
    n_literals = int((toks >= 0).sum())
    assert int(lens.sum()) + n_literals == 300
    assert (dists >= 1).all()


def test_corrupt_stream_raises():
    with pytest.raises(FlateError):
        tpu_dec(b"\x01\x05\x00\x00\x00hello")


def test_decompress_segments_device_parse():
    """Fully on-device decode path: batched Pallas stage A (interpret
    mode here) + stage B, over independent segment streams."""
    from moonbit_flate_tpu.inflate.tpu_inflate import decompress_segments

    rng = np.random.default_rng(9)
    payloads = [
        b"segment zero " * 50,
        rng.integers(0, 256, 900, np.uint8).tobytes(),
        b"ab" * 700,
        b"",
    ]
    streams = []
    for p in payloads:
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        streams.append(co.compress(p) + co.flush())
    outs = decompress_segments(streams, [len(p) for p in payloads],
                               interpret=True)
    assert outs == payloads


def test_decompress_parse_on_device():
    from moonbit_flate_tpu.inflate.tpu_inflate import decompress

    payload = b"on-device stage A parse " * 40
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    s = co.compress(payload) + co.flush()
    import moonbit_flate_tpu.ops.parse_pallas as pp
    import moonbit_flate_tpu.inflate.tpu_inflate as ti
    orig = pp.parse_stream
    # interpret mode on the CPU backend

    def _interp(data, max_out_chunks=256, interpret=False, out_chunk=512):
        return orig(data, max_out_chunks=max_out_chunks, interpret=True,
                    out_chunk=out_chunk)

    pp.parse_stream = _interp
    ti_parse = ti.scan_tokens_device
    try:
        assert decompress(s, parse_on_device=True) == payload
    finally:
        pp.parse_stream = orig
