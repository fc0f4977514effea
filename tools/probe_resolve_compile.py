#!/usr/bin/env python
"""Bisect the resolve_tokens_batch B=8 stall: trace vs compile vs run,
and which sub-op is responsible."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402

from moonbit_flate_tpu.inflate.tpu_inflate import resolve_tokens_batch  # noqa


def synth_tokens(B, NT, seed=0):
    rng = np.random.default_rng(seed)
    toks = np.zeros((B, NT), np.int32)
    for b in range(B):
        outpos = 0
        for i in range(NT):
            if outpos > 4 and rng.random() < 0.2:
                L = int(rng.integers(3, 20))
                d = int(rng.integers(1, min(outpos, 100) + 1))
                toks[b, i] = np.int32(np.uint32((1 << 31) | ((L - 3) << 15) | (d - 1)))
                outpos += L
            else:
                toks[b, i] = int(rng.integers(32, 127))
                outpos += 1
            if outpos >= 60000:
                break
    return jnp.asarray(toks)


def probe(B, NT, NO):
    print(f"B={B} NT={NT} NO={NO}", flush=True)
    toks = synth_tokens(B, min(NT, 65536))
    if NT > toks.shape[1]:
        toks = jnp.pad(toks, ((0, 0), (0, NT - toks.shape[1])))
    t0 = time.time()
    lowered = resolve_tokens_batch.lower(toks, NT, NO)
    print(f"  lower:   {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"  compile: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    out, n = compiled(toks)
    out.block_until_ready()
    print(f"  run:     {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    probe(2, 524288, 1048576)
    probe(4, 524288, 1048576)
    probe(8, 524288, 1048576)
