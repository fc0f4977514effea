"""Ratio regression gate (VERDICT r4 weak #8).

The perf bar has two clauses; this test pins the ratio clause into
`make check` so a matcher/walk "optimization" that wins speed by losing
compression cannot land silently.  Bar: TPU-pipeline compressed size
<= the reference-policy size (native/flate_native.c, the byte-exact
deflateFast twin of /root/reference/deflate-fast.mbt:123-270) on a
fixed 1 MiB bench-corpus slice, plus an absolute ceiling at the
round-4 measured ratio with 1% slack.
"""

import zlib

import numpy as np
import jax.numpy as jnp

import bench
from moonbit_flate_tpu import native
from moonbit_flate_tpu.ops.pipeline import BLOCK, PAD, encode_segments

SEG = 4 * BLOCK          # 256 KiB segments, 4 of them = 1 MiB
N_SEG = 4
# the primary bar is TPU <= reference-policy below; this absolute
# ceiling is a backstop at this 1 MiB slice's measured pipeline ratio
# (0.3540 at round-4 state; the slice is less compressible than the
# full corpus, whose ratio was 0.3149) + ~1.5% slack
RATIO_CEILING = 0.360


def test_ratio_not_worse_than_reference_policy():
    corpus = bench.make_corpus(total=N_SEG * SEG, seed=0)

    buf = np.zeros((N_SEG, SEG + PAD), np.uint8)
    for i in range(N_SEG):
        buf[i, :SEG] = np.frombuffer(corpus[i * SEG:(i + 1) * SEG], np.uint8)
    wb, bb = encode_segments(jnp.asarray(buf),
                             jnp.full(N_SEG, SEG, jnp.int32),
                             jnp.zeros(N_SEG, jnp.int32), 4, True)
    wb_h, bits_h = np.asarray(wb), np.asarray(bb)
    outs = [wb_h[i].view("<u4").tobytes()[: int(bits_h[i]) // 8]
            for i in range(N_SEG)]
    tpu_size = sum(len(o) for o in outs)

    # round-trip while we're here (bit-exactness clause)
    check = b"".join(outs) + bytes([1, 0, 0, 0xFF, 0xFF])
    assert zlib.decompress(check, wbits=-15) == corpus

    assert native.available(), "native reference-policy oracle missing"
    ref_size = sum(
        len(native.compress(corpus[i * SEG:(i + 1) * SEG]))
        for i in range(N_SEG))

    ratio = tpu_size / len(corpus)
    assert tpu_size <= ref_size, (
        f"ratio regression: TPU {tpu_size} > reference-policy {ref_size}")
    assert ratio <= RATIO_CEILING, (
        f"ratio regression: {ratio:.4f} > ceiling {RATIO_CEILING}")
