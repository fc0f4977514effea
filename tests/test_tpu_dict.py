"""TPU-encoder context support: preset dictionaries and shard halos."""

import zlib

import numpy as np
import pytest

from moonbit_flate_tpu.api.tpu import TPUCompressor
from moonbit_flate_tpu.inflate.decoder import decompress as py_dec


@pytest.fixture(scope="module")
def tc():
    return TPUCompressor(blocks_per_segment=2)


def test_preset_dict_roundtrip_and_gain(tc):
    rng = np.random.default_rng(0)
    d = (b"dictionary of shared material 0123456789 " * 900)[:32768]
    payload = (
        d[:5000] + b" fresh " + d[10000:15000]
        + rng.integers(0, 256, 2000, np.uint8).tobytes()
    )
    c = tc.compress(payload, dictionary=d)
    assert py_dec(c, dictionary=d) == payload
    assert len(c) < len(tc.compress(payload))


def test_preset_dict_interop_with_zlib_decoder(tc):
    d = bytes(range(256)) * 64  # 16 KB dict
    payload = d[1000:9000] + b"tail"
    c = tc.compress(payload, dictionary=d)
    dec = zlib.decompressobj(-15, zdict=d)
    assert dec.decompress(c) + dec.flush() == payload


def test_halo_recovers_cross_segment_matches():
    rng = np.random.default_rng(1)
    rep = rng.integers(0, 256, 30000, np.uint8).tobytes()
    data = rep + bytes(40000) + rep + rep
    halo = TPUCompressor(blocks_per_segment=1, halo=True).compress(data)
    indep = TPUCompressor(blocks_per_segment=1).compress(data)
    assert zlib.decompress(halo, wbits=-15) == data
    assert len(halo) < len(indep)


def test_empty_and_dictless_paths_unchanged(tc):
    assert zlib.decompress(tc.compress(b""), wbits=-15) == b""
    payload = b"no context " * 10000
    assert zlib.decompress(tc.compress(payload), wbits=-15) == payload
