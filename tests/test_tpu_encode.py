"""XLA encode pipeline: round-trip, ratio-vs-reference, and component
differential tests (all on the CPU backend with the virtual device mesh).
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonbit_flate_tpu.api.stream import compress as host_compress
from moonbit_flate_tpu.api.tpu import TPUCompressor
from moonbit_flate_tpu.blocks.emitters import generate_codegen
from moonbit_flate_tpu.huffman import encode as henc
from moonbit_flate_tpu.inflate.decoder import decompress
from moonbit_flate_tpu.ops.header import SEQ_LEN, codegen_emissions
from moonbit_flate_tpu.ops.huffman_jax import build_codes
from moonbit_flate_tpu.ops.matcher import find_matches, greedy_commit_xla


@pytest.fixture(scope="module")
def tc():
    return TPUCompressor(blocks_per_segment=4)


def _cases():
    rng = np.random.default_rng(0)
    return {
        "text": (b"the quick brown fox jumps over the lazy dog. " * 8000)[:300000],
        "ramp": (bytes(range(128)) * 3000)[:300000],
        "random": rng.integers(0, 256, 120000, np.uint8).tobytes(),
        "zeros": b"\0" * 300000,
        "tiny": b"abcabcabc",
        "one": b"x",
        "empty": b"",
        "exactblock": (b"ab" * 40000)[:65535],
        "blockplus1": (b"ab" * 40000)[:65536],
        "segboundary": (b"xy" * 200000)[: 4 * 65535],
        "segplus1": (b"xy" * 200000)[: 4 * 65535 + 1],
    }


def test_roundtrip_and_ratio(tc):
    for name, payload in _cases().items():
        c = tc.compress(payload)
        assert zlib.decompress(c, wbits=-15) == payload, name
        assert decompress(c) == payload, name
        # north-star ratio bar: at or below the reference's size
        assert len(c) <= len(host_compress(payload)), name


def test_matcher_validity():
    """Every reported match must be byte-true and in-window."""
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, 40000, np.uint8)
    raw[20000:40000] = raw[:20000]  # force long-distance matches
    buf = np.zeros(4 * 65535 + 320, np.uint8)
    buf[: len(raw)] = raw
    n = len(raw)
    mlen, dist = map(
        np.array, find_matches(jnp.asarray(buf), jnp.int32(n))
    )
    pos = np.nonzero(mlen)[0]
    assert len(pos) > 0
    for p in pos[:: max(1, len(pos) // 200)]:
        L, d = int(mlen[p]), int(dist[p])
        assert 4 <= L <= 258 and 1 <= d <= 32768
        assert p + L <= n
        src = buf[p - d : p - d + L]
        dst = buf[p : p + L]
        assert np.array_equal(src, dst)


def test_greedy_commit_equals_sequential():
    rng = np.random.default_rng(2)
    S = 4 * 65535
    n = 10000
    mlen = np.zeros(S, np.int32)
    # random sprinkle of match lengths
    idx = rng.integers(0, n - 300, 800)
    mlen[idx] = rng.integers(4, 259, 800)
    got = np.array(greedy_commit_xla(jnp.asarray(mlen), jnp.int32(n)))
    # sequential model
    want = np.zeros(S, bool)
    i = 0
    while i < n:
        want[i] = True
        i += mlen[i] if mlen[i] >= 4 else 1
    assert np.array_equal(got[:n], want[:n])
    assert not got[n:].any()


def test_jax_huffman_matches_host():
    rng = np.random.default_rng(3)
    for alphabet, max_bits in [(286, 15), (30, 15), (19, 7)]:
        fb = rng.integers(0, 3000, (8, alphabet))
        fb[rng.random((8, alphabet)) < 0.6] = 0
        fb[:, 0] += 1  # ensure at least one live
        codes_j, lens_j = map(
            np.array, build_codes(jnp.asarray(fb.astype(np.int32)), max_bits)
        )
        for i in range(8):
            c_np, l_np = henc.generate(fb[i], max_bits)
            assert np.array_equal(l_np, lens_j[i])
            assert np.array_equal(c_np.astype(np.int64), codes_j[i].astype(np.int64))


def test_jax_codegen_matches_host():
    rng = np.random.default_rng(4)
    jfn = jax.jit(codegen_emissions)
    for _ in range(30):
        nl = int(rng.integers(257, 287))
        no = int(rng.integers(1, 31))
        lit = np.zeros(286, np.int64)
        off = np.zeros(30, np.int64)
        i = 0
        while i < nl:
            r = int(rng.integers(1, 160))
            lit[i : min(nl, i + r)] = int(rng.choice([0, 0, 1, 5, 8, 15]))
            i += r
        off[:no] = rng.choice([0, 0, 2, 5], no)
        seq = np.zeros(SEQ_LEN, np.int32)
        seq[:nl] = lit[:nl]
        seq[nl : nl + no] = off[:no]
        sym, pv, pw, freq = map(np.array, jfn(jnp.asarray(seq), jnp.int32(nl + no)))
        got_syms = [int(s) for s in sym if s >= 0]
        got_extras = [
            int(pv[j]) if pw[j] > 0 else -1 for j in range(SEQ_LEN) if sym[j] >= 0
        ]
        w_syms, w_extras, w_freq = generate_codegen(lit, off, nl, no)
        assert got_syms == list(w_syms)
        assert got_extras == list(w_extras)
        assert np.array_equal(freq, w_freq.astype(np.int32))


def test_segment_independence(tc):
    """Each segment's bytes must be identical whether compressed alone
    (modulo the final block) or as part of a longer stream."""
    payload = (b"alpha beta gamma delta " * 50000)[: 2 * tc.seg_bytes]
    whole = tc.compress(payload)
    first = tc.compress(payload[: tc.seg_bytes])
    # first segment bytes coincide (strip 5-byte final marker from `first`)
    seg1 = first[:-5]
    assert whole[: len(seg1)] == seg1


def test_compact_streams_matches_host_concat():
    """Device-side stream compaction == host byte concatenation."""
    import numpy as np

    from moonbit_flate_tpu.ops.pipeline import compact_streams

    rng = np.random.default_rng(9)
    B, W = 5, 64
    words = np.zeros((B, W), np.uint32)
    sizes = []
    blobs = []
    for b in range(B):
        nbytes = int(rng.integers(0, 4 * W - 8))
        blob = rng.integers(0, 256, nbytes, np.uint8).tobytes()
        padded = blob + b"\x00" * ((-len(blob)) % 4)
        if padded:
            words[b, : len(padded) // 4] = np.frombuffer(padded, "<u4")
        sizes.append(nbytes)
        blobs.append(blob)
    bits = jnp.asarray(np.asarray(sizes, np.int32) * 8)
    stream, total = compact_streams(jnp.asarray(words), bits)
    assert int(total) == sum(sizes)
    got = np.asarray(stream).view("<u4").tobytes()[: int(total)]
    assert got == b"".join(blobs)
