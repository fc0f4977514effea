"""Lane-parallel inflate (ops/lanes_inflate.py + ops/lanes_resolve.py)
in interpret mode: kernel A token parity and fused A+BC byte parity
against zlib-produced streams, plus error-path statuses.

The TPU-backend twin of these checks runs in tools/tpu_smoke.py
(`make check-tpu`).
"""

import zlib

import numpy as np
import pytest

import jax.numpy as jnp

from moonbit_flate_tpu.ops import lanes_inflate as L
from moonbit_flate_tpu.ops import lanes_resolve as R


def _mat(tokens):
    out = bytearray()
    for t in tokens:
        t = int(t)
        if t == 0:
            continue
        if t & L.TOK_MATCH:
            ln, d = (t >> 13) & 511, t & 8191
            for _ in range(ln):
                out.append(out[-d])
        elif t & L.TOK_LIT:
            out.append(t & 255)
    return bytes(out)


def _cases():
    rng = np.random.default_rng(0)
    multi = []
    co = zlib.compressobj(1, zlib.DEFLATED, -15)
    m1 = co.compress(b"A" * 600) + co.flush(zlib.Z_FULL_FLUSH)
    m2 = co.compress(b"B" * 500 + b"A" * 100) + co.flush()
    cases = [
        b"hello hello hello world",                      # fixed block
        (b"the quick brown fox " * 60)[:1200],           # dynamic
        rng.integers(0, 256, 700, np.uint8).tobytes(),   # stored
        b"",                                             # empty
        b"A" * L.SEGB,                                   # dist-1 RLE
        (b"xyz" * 700)[:L.SEGB],                         # period-3 RLE
        rng.integers(0, 256, 900, np.uint8).tobytes() + b"abc" * 300,
    ]
    streams = [zlib.compress(c, 1)[2:-4] for c in cases]
    streams.append(m1 + m2)                              # multi-block
    cases.append(b"A" * 600 + b"B" * 500 + b"A" * 100)
    return cases, streams


def test_kernel_a_tokens_interpret():
    cases, streams = _cases()
    nbits, inw = L.stage_streams_lanes(streams, 1)
    tok, misc = L.parse_waves(nbits, inw, 1, interpret=True)
    tok = np.asarray(tok).reshape(L.TOK_ROWS, 8, 128)
    misc = np.asarray(misc)
    for i, want in enumerate(cases):
        s, l = i // 128, i % 128
        assert misc[0, 0, s, l] == L.ST_DONE, (i, misc[0, 0, s, l])
        assert misc[0, 1, s, l] == len(want)
        assert _mat(tok[:, s, l]) == want, i


def test_fused_bytes_interpret():
    cases, streams = _cases()
    nbits, inw = L.stage_streams_lanes(streams, 1)
    out, misc = R.inflate_waves(nbits, inw, 1, interpret=True)
    out_h, misc_h = np.asarray(out), np.asarray(misc)
    for i, want in enumerate(cases):
        s, l = i // 128, i % 128
        words = out_h[0, :, i, :].reshape(-1)
        got = words.astype("<u4").tobytes()[: int(misc_h[0, 1, s, l])]
        assert got == want, i


def test_error_statuses_interpret():
    good = zlib.compress(b"some reasonable text " * 40, 1)[2:-4]
    streams = [good[: len(good) // 2],      # truncated
               bytes([0x07]),               # BTYPE=3
               good]
    nbits, inw = L.stage_streams_lanes(streams, 1)
    _, misc = L.parse_waves(nbits, inw, 1, interpret=True)
    misc = np.asarray(misc)
    assert misc[0, 0, 0, 0] == L.ST_TRUNC
    assert misc[0, 0, 0, 1] == L.ST_CORRUPT
    assert misc[0, 0, 0, 2] == L.ST_DONE


def test_manifest_routes_small_shards_to_lane_path(monkeypatch):
    """decompress_with_manifest routes shard payloads <= SEGB through
    the lane decoder (and still round-trips byte-exactly)."""
    import jax

    from moonbit_flate_tpu.parallel import sharded as sh

    mesh = sh.make_mesh(jax.devices("cpu")[:2])
    payload = (b"lane manifest shard | " * 80)[:1500]
    stream, man = sh.compress_with_manifest(payload, mesh,
                                            blocks_per_segment=1)
    called = {}
    import moonbit_flate_tpu.ops.lanes_resolve as lr

    orig = lr.decompress_shards

    def spy(parts, sizes, interpret=False):
        called["lane"] = True
        return orig(parts, sizes, interpret=interpret)

    monkeypatch.setattr(lr, "decompress_shards", spy)
    got = sh.decompress_with_manifest(stream, man, interpret=True)
    assert got == payload
    assert called.get("lane"), "small shards did not take the lane path"


def test_lane_fuzz_statuses_interpret():
    """Mutated shard streams must never crash the lane kernels or
    produce a false DONE with wrong bytes: each mutant either decodes
    to whatever zlib's permissive partial decode accepts (flips in
    literal data are legal streams) or lands on a -3/-4/-5 status.
    One wave, 24 mutants of 3 base streams."""
    rng = np.random.default_rng(11)
    bases = [
        zlib.compress((b"fuzz seed payload " * 60)[:1024], 1)[2:-4],
        zlib.compress(rng.integers(0, 256, 800, np.uint8).tobytes(),
                      1)[2:-4],
        zlib.compress(b"r" * 1500, 1)[2:-4],
    ]
    streams, wants = [], []
    for k in range(24):
        b = bytearray(bases[k % 3])
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        mb = bytes(b)
        streams.append(mb)
        d = zlib.decompressobj(-15)
        try:
            out = d.decompress(mb, L.SEGB)
            ok = d.eof or len(out) == L.SEGB
            wants.append(out if ok else None)
        except zlib.error:
            wants.append(None)

    nbits, inw = L.stage_streams_lanes(streams, 1)
    out, misc = R.inflate_waves(nbits, inw, 1, interpret=True)
    out_h, misc_h = np.asarray(out), np.asarray(misc)
    for i, want in enumerate(wants):
        s, l = i // 128, i % 128
        st = int(misc_h[0, 0, s, l])
        n = int(misc_h[0, 1, s, l])
        if st == L.ST_DONE and want is not None:
            got = out_h[0, :, i, :].reshape(-1).astype(
                "<u4").tobytes()[:n]
            assert got == want[:n] and n == len(want), i
        else:
            # error statuses only; zlib-undecodable streams must not
            # report clean completion
            assert st in (L.ST_DONE, L.ST_TRUNC, L.ST_CORRUPT,
                          L.ST_OVERFLOW), (i, st)
            if want is None:
                assert st != L.ST_DONE, (i, "false DONE on bad stream")
