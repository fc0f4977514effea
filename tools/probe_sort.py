#!/usr/bin/env python
"""A/B the windowed candidate-sort formulations (encode stage 1).

Stage 1 (two sorts) is 7.1 ms/MB — 41% of encode.  Variants:

  v0: production — sort1 (u32 exact key + u16 pos payload), router
      sort2 (fused u32 pos<<16|cand)
  v1: sort1 on a 16-bit multiplicative hash key (u16) + u16 pos
      payload; router unchanged.  Collisions only cost ratio (the walk
      verifies 4 bytes before committing and rescans on mismatch).
  v2: sort1 fused single u32 (hash16 << 16 | pos16) — stability
      implicit (pos in low bits); router unchanged.

Timed bench-style over 16 x 1 MiB segments (lax.map), distinct inputs
per rep, checksummed outputs.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

import bench
from moonbit_flate_tpu.ops.matcher import _WIN, _WIN_STRIDE

H, W = _WIN_STRIDE, _WIN
SEG = 16 * 65535
NB = 16


def _windows(u32e, S):
    NH = -(-S // H)
    NW = max(NH - 1, 1)
    need = (NW + 1) * H + 8
    u32p = jnp.concatenate(
        [u32e, jnp.zeros(max(0, need - u32e.shape[0]), jnp.uint32)])
    halves = u32p[: (NW + 1) * H].reshape(NW + 1, H)
    key = jnp.concatenate([halves[:-1], halves[1:]], axis=1)
    return key, NW


def _route(sj_u32, cand16, NW):
    k2 = (sj_u32 << 16) | cand16
    k2s = jax.lax.sort(k2, dimension=1)
    cand_w = (k2s & jnp.uint32(0xFFFF)).astype(jnp.int32)
    return jnp.where(cand_w == 0xFFFF, -1, cand_w)


def v0(u32e, S):
    key, NW = _windows(u32e, S)
    jloc = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint16), (NW, W))
    skey, sj = jax.lax.sort((key, jloc), dimension=1, is_stable=True,
                            num_keys=1)
    same = skey == jnp.pad(skey, ((0, 0), (1, 0)))[:, :W]
    same = same.at[:, 0].set(False)
    prevj = jnp.pad(sj, ((0, 0), (1, 0)))[:, :W]
    cand16 = jnp.where(same, prevj, jnp.uint16(0xFFFF))
    return _route(sj.astype(jnp.uint32), cand16.astype(jnp.uint32), NW)


def v1(u32e, S):
    key, NW = _windows(u32e, S)
    h16 = ((key * jnp.uint32(0x1E35A7BD)) >> 16).astype(jnp.uint16)
    jloc = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint16), (NW, W))
    skey, sj = jax.lax.sort((h16, jloc), dimension=1, is_stable=True,
                            num_keys=1)
    same = skey == jnp.pad(skey, ((0, 0), (1, 0)))[:, :W]
    same = same.at[:, 0].set(False)
    prevj = jnp.pad(sj, ((0, 0), (1, 0)))[:, :W]
    cand16 = jnp.where(same, prevj, jnp.uint16(0xFFFF))
    return _route(sj.astype(jnp.uint32), cand16.astype(jnp.uint32), NW)


def v2(u32e, S):
    key, NW = _windows(u32e, S)
    h16 = (key * jnp.uint32(0x1E35A7BD)) >> 16
    jpos = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.uint32), (NW, W))
    fused = (h16 << 16) | jpos
    fs = jax.lax.sort(fused, dimension=1)
    sj = fs & jnp.uint32(0xFFFF)
    sh = fs >> 16
    same = sh == jnp.pad(sh, ((0, 0), (1, 0)))[:, :W]
    same = same.at[:, 0].set(False)
    prevj = jnp.pad(sj, ((0, 0), (1, 0)))[:, :W]
    cand16 = jnp.where(same, prevj, jnp.uint32(0xFFFF))
    return _route(sj, cand16, NW)


def main():
    corpus = bench.make_corpus(total=NB * (1 << 20), seed=0)
    S = 1 << 20

    def stage(fn):
        @jax.jit
        def run(xb):
            def one(x):
                d32 = x.astype(jnp.uint32)
                SE = S + 8
                u32e = (d32[:SE] | (d32[1:SE + 1] << 8)
                        | (d32[2:SE + 2] << 16) | (d32[3:SE + 3] << 24))
                c = fn(u32e, S)
                return jnp.sum(c.astype(jnp.int32))
            return jnp.sum(jax.lax.map(one, xb))
        return run

    buf = np.zeros((NB, S + 320), np.uint8)
    for i in range(NB):
        buf[i, :S] = np.frombuffer(corpus[i * S:(i + 1) * S], np.uint8)

    for name, fn in (("v0-exact-u32+u16", v0),
                     ("v1-hash16-u16+u16", v1),
                     ("v2-fused-u32", v2)):
        try:
            run = stage(fn)
            xb = jnp.asarray(buf)
            np.asarray(run(xb))
            dts = []
            for r in range(3):
                xb2 = jnp.asarray(buf).at[0, 0].set((int(buf[0, 0]) + r + 1) % 256)
                t0 = time.time()
                np.asarray(run(xb2))
                dts.append(time.time() - t0)
            dt = min(dts)
            print(f"{name}: {dt / NB * 1000:7.2f} ms/MB", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
