"""Corrupt-stream handling: the decode path's fault-injection suite.

Mirrors the reference's distinguished error conditions (SURVEY.md §5.3):
LEN/~LEN mismatch, reserved block type, oversubscribed trees, repeat code
16 with no previous length, out-of-window distances, truncation.
"""

import pytest

from moonbit_flate_tpu.api.stream import compress
from moonbit_flate_tpu.bitio.writer import BitWriter
from moonbit_flate_tpu.inflate.decoder import Reader, decompress
from moonbit_flate_tpu.utils.errors import (
    CorruptInputError,
    FlateError,
    UnexpectedEOFError,
)


def test_reserved_block_type():
    bw = BitWriter()
    bw.write_bits(1, 1)  # BFINAL
    bw.write_bits(3, 2)  # BTYPE=11 reserved
    bw.flush()
    with pytest.raises(CorruptInputError):
        decompress(bw.getvalue())


def test_stored_len_mismatch():
    with pytest.raises(CorruptInputError):
        decompress(b"\x01\x05\x00\x00\x00hello")  # ~LEN wrong


def test_stored_truncated_payload():
    with pytest.raises(UnexpectedEOFError):
        decompress(b"\x01\x05\x00\xfa\xffhe")  # LEN=5 but 2 bytes present


def test_stored_truncated_header():
    with pytest.raises(UnexpectedEOFError):
        decompress(b"\x01\x05\x00")


def test_repeat_code_at_start():
    # Dynamic block whose first code-length symbol is 16 (copy previous)
    # with no previous length -> corrupt (inflate.mbt:495-497).
    bw = BitWriter()
    bw.write_bits(1, 1)   # BFINAL
    bw.write_bits(2, 2)   # BTYPE=dynamic
    bw.write_bits(0, 5)   # HLIT=257
    bw.write_bits(0, 5)   # HDIST=1
    bw.write_bits(15, 4)  # HCLEN=19
    # code-length code lengths: give symbols 16 and 0 length 1 each
    # order: 16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1,15
    lens = [1, 0, 0, 1] + [0] * 15
    for v in lens:
        bw.write_bits(v, 3)
    # now emit symbol 16 first (canonical: sym 0 -> code 0, sym 16 -> code 1)
    bw.write_bits(1, 1)
    bw.write_bits(0, 2)  # repeat payload
    bw.flush()
    with pytest.raises(CorruptInputError):
        decompress(bw.getvalue())


def test_oversubscribed_code_length_tree():
    bw = BitWriter()
    bw.write_bits(1, 1)
    bw.write_bits(2, 2)
    bw.write_bits(0, 5)
    bw.write_bits(0, 5)
    bw.write_bits(15, 4)
    for _ in range(19):
        bw.write_bits(1, 3)  # nineteen 1-bit codes: oversubscribed
    bw.flush()
    with pytest.raises(CorruptInputError):
        decompress(bw.getvalue())


def test_distance_too_far_back():
    # fixed-huffman block: match at distance 1 with no history
    bw = BitWriter()
    bw.write_bits(1, 1)
    bw.write_bits(1, 2)           # fixed
    # length symbol 257 (len 3): fixed code for 257 is 7 bits, value 0000001
    # canonical code for 257 = 0b0000001, reversed 7 bits -> 0b1000000
    from moonbit_flate_tpu.formats.constants import fixed_literal_lengths
    from moonbit_flate_tpu.huffman.encode import canonical_codes
    codes = canonical_codes(fixed_literal_lengths())
    bw.write_bits(int(codes[257]), 7)
    bw.write_bits(0, 5)           # distance code 0 => dist 1, but no history
    bw.flush()
    with pytest.raises(CorruptInputError):
        decompress(bw.getvalue())


def test_error_offset_reported():
    try:
        decompress(b"\x01\x05\x00\x00\x00hello")
    except CorruptInputError as e:
        assert e.offset == 5  # after the 4-byte LEN/~LEN + 1 header byte
    else:
        pytest.fail("no error")


def test_sticky_error_on_reuse():
    r = Reader(b"\x01\x05\x00\x00\x00hello")
    with pytest.raises(CorruptInputError):
        r.read()
    with pytest.raises(CorruptInputError):
        r.read()


def test_data_before_error_is_served():
    good = compress(b"A" * 1000)
    # strip final-block bytes and append garbage stored-header
    trunc = good[:-5] + b"\x01\x09\x00\x00\x00"
    r = Reader(trunc)
    out = bytearray()
    with pytest.raises(FlateError):
        while True:
            c = r.read(100)
            if not c:
                break
            out.extend(c)
    assert bytes(out[:1000]) == b"A" * 1000 or len(out) <= 1000
