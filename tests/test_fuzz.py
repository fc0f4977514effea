"""Randomized corrupt-stream fuzzing of the decode paths (SURVEY §5.3).

The reference's corrupt-input semantics (inflate.mbt:38-46,161-163,
724-729) boil down to: any byte stream either decodes or raises a
distinguished error — never hangs, never crashes, never returns wrong
bytes silently.  This suite mutates valid DEFLATE streams (bit flips,
byte substitutions, truncations, insertions) and asserts exactly that
over all three decoders (native C, pure Python, TPU/XLA), plus:

- anything CPython zlib accepts and we accept must decode to the SAME
  bytes (zlib is the external oracle for valid streams);
- native and Python decoders implement the same reference semantics, so
  their accept/reject verdicts and outputs must agree exactly.

Acceptance may legitimately differ from zlib in rare mutated cases
(e.g. zlib tolerates incomplete distance trees per the RFC note; the
reference rejects any incomplete tree except the degenerate single
1-bit code, inflate.mbt:161-163) — those show up as accept-mismatch
counts, bounded loosely below.
"""

import random
import zlib

import pytest

from moonbit_flate_tpu import native
from moonbit_flate_tpu.inflate.decoder import decompress as py_decompress
from moonbit_flate_tpu.utils.errors import FlateError

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec unavailable"
)


def _base_streams():
    rng = random.Random(0xF00D)
    inputs = [
        bytes(rng.randrange(256) for _ in range(3000)),          # random
        (b"the quick brown fox jumps over the lazy dog. " * 90), # text
        bytes(1500),                                             # zeros
        bytes(rng.choices(range(8), k=4000)),                    # low-entropy
        b"ab" * 2000,                                            # RLE
    ]
    streams = []
    for d in inputs:
        streams.append((d, native.compress(d)))
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        streams.append((d, co.compress(d) + co.flush()))
        co = zlib.compressobj(1, zlib.DEFLATED, -15)
        streams.append((d, co.compress(d) + co.flush()))
    return streams


def _mutate(rng: random.Random, s: bytes) -> bytes:
    b = bytearray(s)
    kind = rng.randrange(4)
    if kind == 0:                       # single bit flip
        i = rng.randrange(len(b))
        b[i] ^= 1 << rng.randrange(8)
    elif kind == 1:                     # byte substitution (1-4 bytes)
        for _ in range(rng.randrange(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
    elif kind == 2:                     # truncation
        b = b[: rng.randrange(len(b))]
    else:                               # insertion
        i = rng.randrange(len(b) + 1)
        b[i:i] = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 4)))
    return bytes(b)


def _try(fn, stream):
    try:
        return True, fn(stream)
    except FlateError:
        return False, None


def _zlib_verdict(stream):
    try:
        return True, zlib.decompress(stream, wbits=-15)
    except zlib.error:
        return False, None


def test_fuzz_native_vs_zlib_bulk():
    """10k mutated streams through the native decoder.

    Accept/reject verdicts may differ from zlib in two documented ways:

    - the reference surfaces a *clean* EOF when the stream ends at any
      direct more_bits fill site (inflate.mbt:347,432,455,513,620,634,
      663 propagate the raw ioeof), so truncated streams zlib rejects
      can decode here — but then our bytes must be exactly zlib's
      *partial* decode of the same stream (we never fabricate output);
    - zlib tolerates incomplete distance trees (RFC note) that the
      reference rejects (inflate.mbt:161-163) — rare, bounded below.
    """
    rng = random.Random(1)
    bases = _base_streams()
    n_reject_only_ours = 0
    for i in range(10_000):
        _, s = bases[i % len(bases)]
        m = _mutate(rng, s)
        ok_n, out_n = _try(native.decompress, m)
        ok_z, out_z = _zlib_verdict(m)
        if ok_n and ok_z:
            assert out_n == out_z, f"iter {i}: accepted with different bytes"
        elif ok_n and not ok_z:
            # clean-EOF acceptance of a truncated stream: bytes must match
            # zlib's partial decode exactly (no fabricated output)
            dco = zlib.decompressobj(-15)
            try:
                partial = dco.decompress(m)
            except zlib.error:
                partial = None
            assert partial is not None and out_n == partial, (
                f"iter {i}: accepted bytes diverge from zlib partial decode"
            )
        elif ok_z and not ok_n:
            n_reject_only_ours += 1
    # incomplete-tree corner cases must stay rare
    assert n_reject_only_ours < 100, n_reject_only_ours


def test_fuzz_python_matches_native():
    """Native C and pure-Python decoders are twins of the same reference
    semantics: identical accept/reject and identical bytes, 1.5k streams."""
    rng = random.Random(2)
    bases = _base_streams()
    for i in range(1500):
        _, s = bases[i % len(bases)]
        m = _mutate(rng, s)
        ok_n, out_n = _try(native.decompress, m)
        ok_p, out_p = _try(py_decompress, m)
        assert ok_n == ok_p, f"iter {i}: native={ok_n} python={ok_p}"
        if ok_n:
            assert out_n == out_p, f"iter {i}: outputs differ"


def test_fuzz_tpu_decoder():
    """TPU decode path (XLA stage B): raise-or-roundtrip on 200 streams."""
    from moonbit_flate_tpu.inflate.tpu_inflate import decompress as tpu_dec

    rng = random.Random(3)
    bases = _base_streams()
    for i in range(200):
        _, s = bases[i % len(bases)]
        m = _mutate(rng, s)
        ok_t, out_t = _try(tpu_dec, m)
        ok_n, out_n = _try(native.decompress, m)
        assert ok_t == ok_n, f"iter {i}: tpu={ok_t} native={ok_n}"
        if ok_t:
            assert out_t == out_n, f"iter {i}: outputs differ"


def test_unmutated_bases_roundtrip():
    for d, s in _base_streams():
        assert native.decompress(s) == d
        assert py_decompress(s) == d
        assert zlib.decompress(s, wbits=-15) == d
