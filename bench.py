#!/usr/bin/env python
"""Benchmark harness: single-chip encode throughput on a Silesia-like corpus.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the north-star encode target of
1 GB/s/chip (BASELINE.json: the reference publishes no numbers, so the
driver-set target is the denominator).  The run verifies bit-exact
round-trips through zlib before timing; a correctness failure reports
value 0.
"""

import json
import sys
import time
import zlib

import numpy as np


def make_corpus(total=16 * (1 << 20), seed=0):
    """Synthetic Silesia-stand-in: mixed text / binary / repetitive /
    random sections (the real corpus is not redistributable in-image)."""
    rng = np.random.default_rng(seed)
    parts = []
    words = [b"the", b"quick", b"compression", b"deflate", b"window",
             b"huffman", b"block", b"stream", b"symbol", b"match",
             b"of", b"and", b"entropy", b"parallel", b"kernel"]
    while sum(map(len, parts)) < total:
        kind = rng.integers(0, 4)
        if kind == 0:  # english-ish text
            n_words = int(rng.integers(2000, 8000))
            idx = rng.integers(0, len(words), n_words)
            parts.append(b" ".join(words[i] for i in idx))
        elif kind == 1:  # structured binary records
            rec = rng.integers(0, 256, 64, np.uint8).tobytes()
            reps = int(rng.integers(200, 1200))
            noise = rng.integers(0, 256, 64, np.uint8)
            parts.append(b"".join(
                rec[:48] + noise.tobytes()[:16] for _ in range(reps)))
        elif kind == 2:  # highly repetitive
            unit = rng.integers(0, 256, int(rng.integers(3, 200)), np.uint8).tobytes()
            parts.append(unit * int(rng.integers(500, 3000)))
        else:  # incompressible
            parts.append(rng.integers(0, 256, int(rng.integers(30000, 150000)),
                                      np.uint8).tobytes())
    return b"".join(parts)[:total]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from moonbit_flate_tpu.ops.pipeline import BLOCK, PAD, encode_segment

    nb = 16
    seg = nb * BLOCK
    corpus = make_corpus()
    n_segs = len(corpus) // seg
    corpus = corpus[: n_segs * seg]

    # stage segments on device
    batches = []
    for i in range(n_segs):
        buf = np.zeros(seg + PAD, np.uint8)
        buf[:seg] = np.frombuffer(corpus[i * seg : (i + 1) * seg], np.uint8)
        batches.append(jnp.asarray(buf))
    n_arr = jnp.int32(seg)

    # warmup/compile + correctness check
    outs = []
    for x in batches[:2]:
        w, b = encode_segment(x, n_arr, nb)
        outs.append(np.asarray(w).view("<u4").tobytes()[: int(b) // 8])
    check = b"".join(outs) + bytes([1, 0, 0, 0xFF, 0xFF])
    if zlib.decompress(check, wbits=-15) != corpus[: 2 * seg]:
        print(json.dumps({"metric": "encode_throughput", "value": 0,
                          "unit": "GB/s", "vs_baseline": 0,
                          "error": "round-trip mismatch"}))
        return 1

    # steady-state timing over the whole corpus
    t0 = time.time()
    comp_bits = 0
    for x in batches:
        w, b = encode_segment(x, n_arr, nb)
    b.block_until_ready()
    dt = time.time() - t0
    nbytes = n_segs * seg
    gbps = nbytes / dt / 1e9
    ratio = None
    # compressed size on one pass (device->host)
    total_c = 0
    for x in batches:
        w, b = encode_segment(x, n_arr, nb)
        total_c += int(b) // 8
    ratio = total_c / nbytes
    print(json.dumps({
        "metric": "encode_throughput_silesia_like",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 1.0, 4),
        "extra": {"compression_ratio": round(ratio, 4),
                  "corpus_mb": nbytes / 1e6,
                  "ms_per_mb": round(dt / (nbytes / 1e6) * 1000, 2)},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
