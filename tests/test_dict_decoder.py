"""Whitebox DictDecoder tests (dict-decoder_wbtest.mbt:9-291 parity).

Drives the window API directly with a small 2 KB window to force
wraparound, overlapping RLE copies (length > dist), single-byte dist=1
runs, and copy-from-full-history — then validates against a naive
append-only model.
"""

import numpy as np

from moonbit_flate_tpu.inflate.dict_decoder import DictDecoder

POEM = (
    b"The woods are lovely, dark and deep,\n"
    b"But I have promises to keep,\n"
    b"And miles to go before I sleep,\n"
    b"And miles to go before I sleep.\n"
) * 8


class _Model:
    """Naive reference: unbounded output list."""

    def __init__(self, dictionary=b""):
        self.out = bytearray(dictionary)

    def literal(self, data: bytes):
        self.out.extend(data)

    def copy(self, dist: int, length: int):
        for _ in range(length):
            self.out.append(self.out[-dist])


def _drain(dd, sink: bytearray):
    sink.extend(dd.read_flush().tobytes())


def _run_script(window, script, dictionary=b""):
    dd = DictDecoder(window, dictionary)
    model = _Model(dictionary)
    got = bytearray()
    for op, *args in script:
        if op == "lit":
            (data,) = args
            model.literal(data)
            arr = np.frombuffer(data, dtype=np.uint8)
            while len(arr):
                if dd.avail_write() == 0:
                    _drain(dd, got)
                n = dd.write_bytes(arr)
                arr = arr[n:]
        elif op == "copy":
            dist, length = args
            model.copy(dist, length)
            rem = length
            while rem > 0:
                if dd.avail_write() == 0:
                    _drain(dd, got)
                cnt = dd.try_write_copy(dist, rem)
                if cnt == 0:
                    cnt = dd.write_copy(dist, rem)
                rem -= cnt
    _drain(dd, got)
    want = bytes(model.out[len(dictionary):])
    assert bytes(got) == want, f"window={window}"


def test_literals_and_wraparound():
    _run_script(2048, [("lit", POEM)])


def test_backward_copies_with_wrap():
    script = [
        ("lit", POEM[:300]),
        ("copy", 100, 200),
        ("copy", 300, 500),   # reaches back past writes, forces wrap copies
        ("lit", b"interlude"),
        ("copy", 509, 1000),  # long copy spanning multiple window fills
    ]
    _run_script(2048, script)


def test_rle_overlapping_copies():
    script = [
        ("lit", b"z"),
        ("copy", 1, 60),      # 60x single-char run, dist=1
        ("lit", b"ab"),
        ("copy", 2, 57),      # alternating run
        ("copy", 3, 258),     # max-length overlapped copy
    ]
    _run_script(2048, script)


def test_copy_from_full_history():
    filler = bytes(range(256)) * 8  # exactly 2048
    script = [
        ("lit", filler),
        ("copy", 2048, 100),  # copy from the very edge of history
        ("copy", 1, 258),
    ]
    _run_script(2048, script)


def test_preset_dictionary_preload():
    dictionary = b"0123456789" * 30
    script = [("copy", 300, 300), ("lit", b"x"), ("copy", 1, 10)]
    _run_script(2048, script, dictionary)


def test_preset_dictionary_truncated_to_tail():
    dd = DictDecoder(64, b"A" * 100 + b"B" * 32)
    assert dd.hist_size() == 64
    # history must be the *last* 64 bytes
    assert dd.try_write_copy(32, 10) or dd.write_copy(32, 10)
    out = dd.read_flush().tobytes()
    assert out == b"B" * 10
