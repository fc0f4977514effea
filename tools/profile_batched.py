#!/usr/bin/env python
"""Per-stage timing of the batched encode path on the real chip.

Times cumulative prefixes of the pipeline (stage1 sorts / walk /
token-to-units / pack) as separate jits with checksum outputs, over
DISTINCT inputs per rep (the tunnel memoizes identical dispatches).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

from bench import make_corpus  # noqa: E402
from moonbit_flate_tpu.ops import pipeline as PL  # noqa: E402

NB = 16
SEG = NB * PL.BLOCK
B = int(os.environ.get("MF_PROF_B", "16"))


@partial(jax.jit, static_argnames=("upto",))
def run(data, n, ctx, upto="pack"):
    mlen, dist, block_end = jax.vmap(
        partial(PL._find_clip, nb=NB))(data, n, ctx)
    if upto == "stage1":
        return PL._cksum(mlen, dist)
    committed, is_match, mlen, dist = PL._commit_walk_batch(
        data, mlen, dist, n, ctx, NB)
    if upto == "walk":
        return PL._cksum(committed, mlen, dist)
    vals, wids = jax.vmap(
        partial(PL._tokens_to_units, nb=NB)
    )(data, n, ctx, committed, is_match, mlen, dist)
    if upto == "units":
        return PL._cksum(vals, wids)
    from moonbit_flate_tpu.ops.pack import pack_units_dense_batch
    n_words = (8 * SEG + NB * 64 + 64) // 32 + 2
    words, bits = pack_units_dense_batch(vals, wids, n_words)
    return PL._cksum(words, bits)


def main():
    corpus = make_corpus(total=B * SEG, seed=int(os.environ.get("MF_PROF_SEED", "5")))
    buf = np.zeros((B, SEG + PL.PAD), np.uint8)
    for i in range(B):
        buf[i, :SEG] = np.frombuffer(corpus[i * SEG:(i + 1) * SEG], np.uint8)
    xb = jnp.asarray(buf)
    n = jnp.full(B, SEG, jnp.int32)
    ctx = jnp.zeros(B, jnp.int32)
    mb = B * SEG / 1e6

    # full encode_segments: words output materialized vs checksummed
    from moonbit_flate_tpu.ops.pipeline import encode_segments

    @jax.jit
    def full_sum(d, nn, cc):
        w, b = encode_segments(d, nn, cc, NB)
        return PL._cksum(w, b)

    for name, f in (("full", lambda d, nn, cc: encode_segments(d, nn, cc, NB)[1]),
                    ("full_sum", full_sum)):
        t0 = time.time()
        np.asarray(f(xb, n, ctx))
        cold = time.time() - t0
        t0 = time.time()
        for r in range(3):
            xr = xb.at[0, 0].set((int(buf[0, 0]) + r + 1) % 256)
            np.asarray(f(xr, n, ctx))
        dt = (time.time() - t0) / 3
        print(f"{name:8s}: cold {cold:6.2f}s  warm {dt*1000:8.1f} ms "
              f"= {dt/mb*1000:6.2f} ms/MB", flush=True)

    prev = 0.0
    for upto in ("stage1", "walk", "units", "pack"):
        t0 = time.time()
        np.asarray(run(xb, n, ctx, upto))
        cold = time.time() - t0
        reps = 3
        t0 = time.time()
        for r in range(reps):
            xr = xb.at[0, 0].set((int(buf[0, 0]) + r + 1) % 256)
            np.asarray(run(xr, n, ctx, upto))
        dt = (time.time() - t0) / reps
        print(f"{upto:8s}: cold {cold:6.2f}s  warm {dt*1000:8.1f} ms "
              f"= {dt/mb*1000:6.2f} ms/MB  (delta {((dt - prev)/mb)*1000:6.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
