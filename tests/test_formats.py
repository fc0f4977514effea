"""Wire-format table sanity: derived tables must match RFC 1951 values."""

import numpy as np

from moonbit_flate_tpu.formats import constants as C
from moonbit_flate_tpu.utils.bits import reverse8, reverse16, reverse_bits


def test_length_tables():
    # RFC 1951 §3.2.5 canonical values.
    assert list(C.LENGTH_BASE[:8]) == [3, 4, 5, 6, 7, 8, 9, 10]
    assert list(C.LENGTH_BASE[8:12]) == [11, 13, 15, 17]
    assert C.LENGTH_BASE[27] == 227 and C.LENGTH_BASE[28] == 258
    assert list(C.LENGTH_EXTRA_BITS[:8]) == [0] * 8
    assert C.LENGTH_EXTRA_BITS[27] == 5 and C.LENGTH_EXTRA_BITS[28] == 0
    # Every length 3..258 maps into its code's range.
    for length in range(3, 259):
        code = int(C.LENGTH_CODES[length - 3])
        base = int(C.LENGTH_BASE[code])
        eb = int(C.LENGTH_EXTRA_BITS[code])
        if length == 258:
            assert code == 28
        else:
            assert base <= length < base + (1 << eb)


def test_offset_tables():
    assert list(C.OFFSET_BASE[:6]) == [1, 2, 3, 4, 5, 7]
    assert C.OFFSET_BASE[29] == 24577 and C.OFFSET_EXTRA_BITS[29] == 13
    for dist in [1, 2, 3, 4, 5, 256, 257, 4096, 32768]:
        code = C.offset_code(dist - 1)
        base = int(C.OFFSET_BASE[code])
        eb = int(C.OFFSET_EXTRA_BITS[code])
        assert base <= dist < base + (1 << eb)
    # vectorized form agrees with scalar on the full range
    dists = np.arange(1, 32769)
    vec = C.offset_code_array(dists - 1)
    scalar = np.array([C.offset_code(d - 1) for d in [1, 2, 4, 5, 192, 256, 300, 32768]])
    sel = np.array([0, 1, 3, 4, 191, 255, 299, 32767])
    assert np.array_equal(vec[sel], scalar)


def test_fixed_lengths():
    lit = C.fixed_literal_lengths()
    assert (lit[:144] == 8).all() and (lit[144:256] == 9).all()
    assert (lit[256:280] == 7).all() and (lit[280:] == 8).all()
    assert (C.fixed_distance_lengths() == 5).all()


def test_bit_reversal():
    assert reverse8(0b00000001) == 0b10000000
    assert reverse16(1) == 0x8000
    # reference inline test (huffman-code.mbt:289-292)
    assert reverse_bits(64, 7) == 1
    for v in range(256):
        assert reverse8(reverse8(v)) == v


def test_token_layout():
    t = C.match_token(10, 100)
    assert t & C.TOKEN_TYPE_MASK == C.TOKEN_MATCH_TYPE
    assert (t >> C.TOKEN_LENGTH_SHIFT) & 0xFF == 10
    assert t & C.TOKEN_OFFSET_MASK == 100
    assert C.literal_token(65) == 65


def test_closed_form_code_tables_match():
    """ops.tables closed forms == the wire tables over their full domains
    (token.mbt:30-61, huffman-bit-writer.mbt:49-78)."""
    import jax.numpy as jnp

    from moonbit_flate_tpu.ops import tables as T

    xlen = jnp.arange(256)
    lc = np.asarray(T.length_code(xlen))
    assert np.array_equal(lc, np.asarray(C.LENGTH_CODES)), \
        np.nonzero(lc != np.asarray(C.LENGTH_CODES))

    lcodes = jnp.arange(29)
    base, eb = T.length_base_extra(lcodes)
    assert np.array_equal(np.asarray(base), np.asarray(C.LENGTH_BASE))
    assert np.array_equal(np.asarray(eb), np.asarray(C.LENGTH_EXTRA_BITS))

    xoff = jnp.arange(32768)
    dc = np.asarray(T.offset_code(xoff))
    expect = np.asarray(C.offset_code_array(np.arange(32768)))
    assert np.array_equal(dc, expect)

    dcodes = jnp.arange(30)
    dbase, deb = T.offset_base_extra(dcodes)
    assert np.array_equal(np.asarray(dbase), np.asarray(C.OFFSET_BASE))
    assert np.array_equal(np.asarray(deb), np.asarray(C.OFFSET_EXTRA_BITS))


def test_codec_config():
    from moonbit_flate_tpu.config import CodecConfig

    cfg = CodecConfig(blocks_per_segment=2)
    assert cfg.segment_bytes == 2 * 65535
    tc = cfg.tpu_compressor()
    assert tc.nb == 2 and tc.halo is False
    import pytest as _pytest
    with _pytest.raises(ValueError):
        CodecConfig(backend="gpu")
    with _pytest.raises(ValueError):
        CodecConfig(blocks_per_segment=0)
