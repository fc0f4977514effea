#!/usr/bin/env python
"""A/B the batched vs lax.map encode paths on the bench corpus (TPU),
with round-trip + ratio checks.  One process, sync via np.asarray."""

import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402

from bench import make_corpus  # noqa: E402
from functools import partial  # noqa: E402

from moonbit_flate_tpu.ops.pipeline import (BLOCK, PAD, _cksum,  # noqa: E402
                                            encode_segments,
                                            encode_segments_batched)

NB = 16
SEG = NB * BLOCK


def main():
    corpus = make_corpus(total=16 * (1 << 20), seed=0)
    n_segs = len(corpus) // SEG
    corpus = corpus[: n_segs * SEG]
    buf = np.zeros((n_segs, SEG + PAD), np.uint8)
    for i in range(n_segs):
        buf[i, :SEG] = np.frombuffer(corpus[i * SEG:(i + 1) * SEG], np.uint8)
    xb = jnp.asarray(buf)
    n = jnp.full(n_segs, SEG, jnp.int32)
    ctx = jnp.zeros(n_segs, jnp.int32)
    mb = n_segs * SEG / 1e6

    for name, fn in (("mapped", encode_segments),
                     ("batched", encode_segments_batched)):
        t0 = time.time()
        wb, bb = fn(xb, n, ctx, NB)
        wb_h, bits_h = np.asarray(wb), np.asarray(bb)
        cold = time.time() - t0
        outs = [wb_h[i].view("<u4").tobytes()[: int(bits_h[i]) // 8]
                for i in range(n_segs)]
        check = b"".join(outs) + bytes([1, 0, 0, 0xFF, 0xFF])
        ok = zlib.decompress(check, wbits=-15) == corpus
        ratio = sum(int(b) // 8 for b in bits_h) / (n_segs * SEG)
        fsum = jax.jit(lambda x, nn, cc: _cksum(*fn(x, nn, cc, NB)))
        np.asarray(fsum(xb, n, ctx))
        reps = 3
        t0 = time.time()
        for r in range(reps):
            xr = xb.at[0, 0].set((int(buf[0, 0]) + r + 1) % 256)
            np.asarray(fsum(xr, n, ctx))
        dt = (time.time() - t0) / reps
        print(f"{name:8s}: cold {cold:6.1f}s warm {dt*1000:7.1f} ms = "
              f"{dt/mb*1000:6.2f} ms/MB = {mb/1000/dt:.4f} GB/s  "
              f"ratio {ratio:.4f}  roundtrip {'OK' if ok else 'FAIL'}",
              flush=True)


if __name__ == "__main__":
    main()
