"""Round-trip and cross-validation tests against CPython zlib.

Ports the reference's TestBestSpeed grid (deflate-fast_test.mbt:14-100):
16 write-size patterns x 6 first-write sizes straddling the enc_speed
thresholds (0/16/128) and max_store_block_size (65535), over a repeating
128-byte ramp so cross-block matches and RLE paths are exercised.
"""

import zlib

import numpy as np
import pytest

from moonbit_flate_tpu.api.stream import Writer, compress
from moonbit_flate_tpu.inflate.decoder import Reader, decompress

ABC = bytes(range(128)) * (131072 // 128)

TEST_CASES = [
    [65536, 0],
    [65536, 1],
    [65536, 1, 256],
    [65536, 1, 65536],
    [65536, 14],
    [65536, 15],
    [65536, 16],
    [65536, 16, 256],
    [65536, 16, 65536],
    [65536, 127],
    [65536, 128],
    [65536, 128, 256],
    [65536, 128, 65536],
    [65536, 129],
    [65536, 65536, 256],
    [65536, 65536, 65536],
]

FIRST_NS = [1, 65534, 65535, 65536, 65537, 131072]


@pytest.mark.parametrize("first_n", FIRST_NS)
def test_best_speed_grid(first_n):
    for tc in TEST_CASES:
        sizes = [first_n] + tc[1:]
        w = Writer()
        want = b""
        for n in sizes:
            chunk = ABC[:n]
            want += chunk
            w.write(chunk)
        w.close()
        stream = w.getvalue()
        # our decoder round-trip
        got = Reader(stream).read()
        assert got == want, f"sizes={sizes}"
        # zlib as independent oracle
        assert zlib.decompress(stream, wbits=-15) == want


@pytest.mark.parametrize("seed", range(3))
def test_random_data_roundtrip(seed):
    rng = np.random.default_rng(seed)
    for size in [0, 1, 15, 17, 127, 129, 65535, 65536, 70000, 200001]:
        # mixed compressibility: random bytes with repeated islands
        raw = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        data = raw[: size // 2] + raw[: size // 4] + raw[: size - size // 2 - size // 4]
        c = compress(data)
        assert zlib.decompress(c, wbits=-15) == data
        assert decompress(c) == data


def test_decode_zlib_all_levels():
    rng = np.random.default_rng(7)
    payload = (b"The quick brown fox jumps over the lazy dog. " * 3000
               + rng.integers(0, 256, 50000, dtype=np.uint8).tobytes())
    for level in range(0, 10):
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        s = co.compress(payload) + co.flush()
        assert decompress(s) == payload


def test_close_emits_final_empty_stored_block():
    # Every stream ends with bits 1,00, pad, 0x0000 0xFFFF
    # (deflate.mbt:171-176).
    c = compress(b"")
    assert c == bytes([0x01, 0x00, 0x00, 0xFF, 0xFF])


def test_incompressible_uses_stored_or_literal():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 100000, dtype=np.uint8).tobytes()
    c = compress(data)
    # must not blow up much beyond input
    assert len(c) < len(data) + 200
    assert decompress(c) == data


def test_streaming_reader_chunked():
    data = ABC[:100000]
    stream = compress(data)
    r = Reader(stream)
    out = bytearray()
    while True:
        chunk = r.read(777)
        if not chunk:
            break
        out.extend(chunk)
    assert bytes(out) == data


def test_reader_reset_reuse():
    a, b = ABC[:5000], ABC[1:4001]
    r = Reader(compress(a))
    assert r.read() == a
    r.reset(compress(b))
    assert r.read() == b
