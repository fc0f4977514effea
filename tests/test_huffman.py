"""Huffman construction: optimality, Kraft completeness, decode-table duality."""

import numpy as np
import pytest

from moonbit_flate_tpu.huffman import encode as henc
from moonbit_flate_tpu.huffman.decode_table import HuffmanDecoder


def _kraft(lengths):
    live = lengths[lengths > 0]
    return sum(2.0 ** -live.astype(np.float64))


def _optimal_cost_unlimited(freqs):
    """Classic Huffman cost via two-queue merge (no length limit)."""
    import heapq

    live = sorted(int(f) for f in freqs if f > 0)
    if len(live) <= 1:
        return len(live) and live[0]
    h = list(live)
    heapq.heapify(h)
    cost = 0
    while len(h) > 1:
        a, b = heapq.heappop(h), heapq.heappop(h)
        cost += a + b
        heapq.heappush(h, a + b)
    return cost


@pytest.mark.parametrize("seed", range(10))
@pytest.mark.parametrize("alphabet,max_bits", [(286, 15), (30, 15), (19, 7)])
def test_lengths_complete_and_optimal(seed, alphabet, max_bits):
    rng = np.random.default_rng(seed)
    freqs = rng.integers(0, 1000, alphabet)
    freqs[rng.random(alphabet) < 0.5] = 0
    if np.count_nonzero(freqs) < 3:
        freqs[:3] = [5, 3, 1]
    lengths = henc.lengths_from_freqs(freqs, max_bits)
    assert lengths.max() <= max_bits
    assert (lengths[freqs > 0] > 0).all() and (lengths[freqs == 0] == 0).all()
    assert _kraft(lengths) == pytest.approx(1.0)
    # When no symbol would exceed the limit, the length-limited cost must
    # equal the unlimited Huffman cost.
    cost = int((lengths * freqs).sum())
    unlimited = _optimal_cost_unlimited(freqs)
    assert cost >= unlimited
    if lengths.max() < max_bits:
        assert cost == unlimited


def test_degenerate_cases():
    codes, lengths = henc.generate(np.array([0, 7, 0, 0]), 15)
    assert lengths[1] == 1 and codes[1] == 0
    codes, lengths = henc.generate(np.array([3, 0, 9]), 15)
    assert list(lengths) == [1, 0, 1]
    assert codes[0] == 0 and codes[2] == 1
    codes, lengths = henc.generate(np.zeros(5, np.int64), 15)
    assert (lengths == 0).all()


def test_encode_decode_table_duality():
    """Codes from the encoder must be decodable by the decoder tables."""
    rng = np.random.default_rng(42)
    freqs = rng.integers(1, 500, 286)
    codes, lengths = henc.generate(freqs, 15)
    h = HuffmanDecoder()
    assert h.initialize(lengths)
    # decode each symbol's code via the chunk tables
    from moonbit_flate_tpu.huffman.decode_table import (
        CHUNK_BITS, COUNT_MASK, NUM_CHUNKS, VALUE_SHIFT)
    for sym in range(286):
        n = int(lengths[sym])
        if n == 0:
            continue
        b = int(codes[sym])  # wire-ready (bit-reversed) code, LSB-first
        chunk = int(h.chunks[b & (NUM_CHUNKS - 1)])
        cn = chunk & COUNT_MASK
        if cn > CHUNK_BITS:
            chunk = int(h.links[chunk >> VALUE_SHIFT][(b >> CHUNK_BITS) & h.link_mask])
            cn = chunk & COUNT_MASK
        assert cn == n
        assert (chunk >> VALUE_SHIFT) == sym


def test_oversubscribed_rejected():
    h = HuffmanDecoder()
    lengths = np.zeros(10, np.int64)
    lengths[:5] = 2  # 5 codes of length 2 -> oversubscribed
    assert not h.initialize(lengths)
    lengths = np.zeros(10, np.int64)
    lengths[0] = 2  # undersubscribed
    assert not h.initialize(np.array([2, 0]))
    # degenerate single length-1 code is allowed
    h2 = HuffmanDecoder()
    assert h2.initialize(np.array([1, 0]))
    # empty tree allowed
    h3 = HuffmanDecoder()
    assert h3.initialize(np.zeros(4, np.int64))
