"""Dictionary semantics on both sides.

- Writer: *prepend* semantics (deflate_test.mbt:12-35 parity, including
  the exact 38-byte fixture).
- Reader: true preset-dictionary semantics (inflate.mbt:315-317),
  cross-checked against zlib's zdict.
"""

import zlib

from moonbit_flate_tpu.api.stream import Writer, compress
from moonbit_flate_tpu.inflate.decoder import Reader, decompress


def test_writer_dict_equals_prepend_fixture():
    dictionary = b"hello world"
    text = b"hello again world"
    w = Writer(dictionary=dictionary)
    w.write(text)
    w.close()
    with_dict = w.getvalue()

    w2 = Writer()
    w2.write(dictionary)
    w2.write(text)
    w2.close()
    assert with_dict == w2.getvalue()
    # The reference's only exact size fixture (deflate_test.mbt:23,33).
    assert len(with_dict) == 38
    assert zlib.decompress(with_dict, wbits=-15) == dictionary + text


def test_writer_dict_truncated_to_window():
    dictionary = bytes(range(256)) * 200  # 51200 > 32768
    text = b"tail data that matches " + dictionary[-100:]
    w = Writer(dictionary=dictionary)
    w.write(text)
    w.close()
    out = zlib.decompress(w.getvalue(), wbits=-15)
    assert out == dictionary[-32768:] + text


def test_reader_preset_dict_vs_zlib():
    dictionary = b"A common preamble with shared phrases and tokens. " * 40
    payload = b"shared phrases and tokens appear again: common preamble!" * 20
    co = zlib.compressobj(6, zlib.DEFLATED, -15, zdict=dictionary)
    s = co.compress(payload) + co.flush()
    assert decompress(s, dictionary=dictionary) == payload


def test_reader_preset_dict_roundtrip_with_our_decoder():
    # Compress dict+payload with prepend semantics, then decode only the
    # payload part is NOT possible for a writer-prepend stream; instead
    # verify reader-dict streams produced by zlib with various dict sizes.
    for dsize in [1, 100, 32768, 40000]:
        dictionary = (b"x" * 7 + b"abcdefgh") * (dsize // 15 + 1)
        dictionary = dictionary[:dsize]
        payload = dictionary[-min(dsize, 500):] + b" fresh bytes"
        co = zlib.compressobj(9, zlib.DEFLATED, -15, zdict=dictionary)
        s = co.compress(payload) + co.flush()
        assert decompress(s, dictionary=dictionary) == payload
