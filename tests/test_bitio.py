"""Bit packer: vectorized prefix-sum scatter vs a naive sequential model."""

import numpy as np

from moonbit_flate_tpu.bitio.writer import BitWriter, pack_bits


def _naive_pack(values, nbits, bit_offset=0):
    acc, n = 0, bit_offset
    for v, w in zip(values, nbits):
        acc |= (int(v) & ((1 << int(w)) - 1)) << n
        n += int(w)
    nbytes = (n + 7) // 8
    return acc.to_bytes(nbytes, "little") if nbytes else b"", n


def test_pack_bits_matches_naive():
    rng = np.random.default_rng(0)
    for trial in range(20):
        k = rng.integers(1, 200)
        nbits = rng.integers(0, 29, k)
        values = rng.integers(0, 1 << 28, k, dtype=np.uint64) & ((1 << nbits.astype(np.uint64)) - 1)
        off = int(rng.integers(0, 8))
        got, gbits = pack_bits(values, nbits, off)
        want, wbits = _naive_pack(values, nbits, off)
        assert gbits == wbits
        assert got.tobytes() == want


def test_bitwriter_interleaving():
    rng = np.random.default_rng(1)
    bw = BitWriter()
    naive_acc, naive_n = 0, 0
    for _ in range(50):
        if rng.random() < 0.5:
            v, w = int(rng.integers(0, 1 << 16)), int(rng.integers(1, 17))
            v &= (1 << w) - 1
            bw.write_bits(v, w)
            naive_acc |= v << naive_n
            naive_n += w
        else:
            k = int(rng.integers(1, 30))
            wid = rng.integers(0, 20, k)
            vals = rng.integers(0, 1 << 19, k, dtype=np.uint64) & ((1 << wid.astype(np.uint64)) - 1)
            bw.write_packed(vals, wid)
            for v, w in zip(vals, wid):
                naive_acc |= int(v) << naive_n
                naive_n += int(w)
    bw.flush()
    want = naive_acc.to_bytes((naive_n + 7) // 8, "little")
    assert bw.getvalue() == want


def test_stored_alignment():
    bw = BitWriter()
    bw.write_bits(0b101, 3)
    bw.flush()
    bw.write_bytes(b"abc")
    out = bw.getvalue()
    assert out == bytes([0b101]) + b"abc"
