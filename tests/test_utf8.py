"""UTF-8 side-package tests (encoder/lib_test.mbt, decoder/lib_test.mbt parity)."""

from moonbit_flate_tpu.utils.utf8 import utf8_decode, utf8_encode


def test_encode_all_widths():
    s = "Aé世\U0001F600"  # 1,2,3,4-byte sequences
    got = bytes(utf8_encode(s))
    assert got == s.encode("utf-8")


def test_decode_roundtrip():
    s = "Hello, 世界! \U0001F680 café"
    assert "".join(utf8_decode(s.encode("utf-8"))) == s


def test_decode_stops_on_invalid():
    # stray continuation byte stops the iterator (no exception)
    assert "".join(utf8_decode(b"ab\x80cd")) == "ab"
    # truncated multi-byte sequence
    assert "".join(utf8_decode(b"ok\xe4\xb8")) == "ok"
    # invalid leading byte 0xF8+
    assert "".join(utf8_decode(b"x\xf9y")) == "x"


def test_empty():
    assert bytes(utf8_encode("")) == b""
    assert "".join(utf8_decode(b"")) == ""
