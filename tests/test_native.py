"""Native codec: byte-exactness vs the Python oracle, round-trips, dicts."""

import zlib

import numpy as np
import pytest

from moonbit_flate_tpu import native
from moonbit_flate_tpu.api.stream import compress as py_compress
from moonbit_flate_tpu.inflate.decoder import decompress as py_decompress
from moonbit_flate_tpu.utils.errors import FlateError

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec unavailable"
)


def test_native_matches_python_oracle_bytes():
    rng = np.random.default_rng(0)
    cases = [
        b"", b"x", b"hello world", b"abcabcabc",
        b"a" * 100000,
        b"the quick brown fox jumps over the lazy dog. " * 9000,
        bytes(range(256)) * 700,
        rng.integers(0, 256, 300000, np.uint8).tobytes(),
        (b"mixed " + rng.integers(0, 256, 500, np.uint8).tobytes()) * 300,
    ]
    for t in cases:
        assert native.compress(t) == py_compress(t)


@pytest.mark.parametrize("seed", range(5))
def test_native_fuzz_roundtrip(seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        n = int(rng.integers(0, 200000))
        base = rng.integers(0, 256, max(n // int(rng.integers(1, 20)), 1),
                            np.uint8).tobytes()
        data = (base * (n // max(len(base), 1) + 1))[:n]
        c = native.compress(data)
        assert c == py_compress(data)
        assert zlib.decompress(c, wbits=-15) == data
        assert native.decompress(c) == data


def test_native_decodes_zlib_levels():
    payload = b"inter-codec compatibility " * 20000
    for level in range(10):
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        s = co.compress(payload) + co.flush()
        assert native.decompress(s) == payload


def test_native_dicts():
    d = b"hello world"
    assert native.compress(b"hello again world", dictionary=d) == \
        py_compress(b"hello again world", dictionary=d)
    co = zlib.compressobj(9, zlib.DEFLATED, -15, zdict=d)
    s = co.compress(b"hello world once more") + co.flush()
    assert native.decompress(s, dictionary=d) == b"hello world once more"
    assert py_decompress(s, dictionary=d) == b"hello world once more"


def test_native_corrupt_input():
    with pytest.raises(FlateError):
        native.decompress(b"\x01\x05\x00\x00\x00hello")
    with pytest.raises(FlateError):
        native.decompress(b"\x07")
