#!/usr/bin/env python
"""Feasibility measurement for a lane-parallel inflate stage A.

The scalar Pallas parser decodes ~5-10 M symbols/s on one scalar core
(~33 MB/s) — the on-device decode ceiling.  The lane-parallel design
decodes L independent streams "simultaneously": each VPU lane holds one
stream's bit buffer, and the per-stream root-table lookup runs as a
dense one-hot multiply-reduce over [L, 512] (no gathers), exactly the
trick the encoder uses for its table lookups (ops/dense.py).

This prototype measures the CORE SYMBOL STEP cost in XLA on the real
chip: peek 9 bits per lane -> one-hot lookup into per-stream tables ->
variable per-lane bit advance -> masked refill.  Two variants isolate
the refill strategy:

- 'gather'  : refill words with a per-lane take_along_axis (the XLA
              gather cost the Pallas version would avoid);
- 'nogather': refill from a rolling broadcast (lower bound — models a
              Pallas bulk-DMA refill whose cost is amortized off the
              critical path).

The bit bookkeeping is semantically simplified (symbols are consumed
from synthetic self-consistent tables) but op-for-op representative.
Output: symbols/s and the byte-throughput equivalent at ~6 output
bytes per symbol (bench-corpus token mix).
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

L = 1024          # streams in flight (8 sublanes x 128 lanes)
W = 4096          # words per stream
STEPS = 4096      # symbols decoded per stream per run


def make_state(seed):
    rng = np.random.default_rng(seed)
    # synthetic root tables: entry = (sym << 4) | nbits, nbits in 2..9
    nbits = rng.integers(2, 10, (L, 512)).astype(np.int32)
    sym = rng.integers(0, 286, (L, 512)).astype(np.int32)
    tables = (sym << 4) | nbits
    data = rng.integers(0, 1 << 32, (L, W), np.uint32).astype(np.uint32)
    return jnp.asarray(tables), jnp.asarray(data)


@partial(jax.jit, static_argnums=(2,))
def run(tables, data, use_gather):
    k512 = jnp.arange(512, dtype=jnp.int32)[None, :]

    def step(carry, _):
        lo, hi, cnt, cur, acc = carry
        b9 = (lo & jnp.uint32(511)).astype(jnp.int32)
        e = jnp.sum(jnp.where(b9[:, None] == k512, tables, 0), axis=1)
        nb = (e & 15).astype(jnp.uint32)
        acc = acc + (e >> 4)
        lo = (lo >> nb) | jnp.where(nb > 0, hi << (jnp.uint32(32) - nb), 0)
        hi = hi >> nb
        cnt = cnt - nb.astype(jnp.int32)
        need = cnt < 32
        if use_gather:
            w = jnp.take_along_axis(
                data, (cur % W).astype(jnp.int32)[:, None], axis=1)[:, 0]
        else:
            w = jnp.roll(data[:, 0], 1)
        sh = jnp.clip(cnt, 0, 31).astype(jnp.uint32)
        hi = jnp.where(need, hi | (w << sh), hi)
        cnt = jnp.where(need, cnt + 32, cnt)
        cur = jnp.where(need, cur + 1, cur)
        return (lo, hi, cnt, cur, acc), None

    lo0 = data[:, 0]
    hi0 = data[:, 1]
    cnt0 = jnp.full(L, 64, jnp.int32)
    cur0 = jnp.full(L, 2, jnp.int32)
    acc0 = jnp.zeros(L, jnp.int32)
    (lo, hi, cnt, cur, acc), _ = jax.lax.scan(
        step, (lo0, hi0, cnt0, cur0, acc0), None, length=STEPS)
    return jnp.sum(acc) + jnp.sum(cnt) + jnp.sum(cur)


@partial(jax.jit, static_argnums=())
def run_shared(table1, data):
    """Same loop with ONE shared [512] table (fits VMEM/registers) —
    isolates the per-stream-table HBM traffic of the scan formulation."""
    k512 = jnp.arange(512, dtype=jnp.int32)[None, :]

    def step(carry, _):
        lo, hi, cnt, cur, acc = carry
        b9 = (lo & jnp.uint32(511)).astype(jnp.int32)
        e = jnp.sum(jnp.where(b9[:, None] == k512, table1[None, :], 0), axis=1)
        nb = (e & 15).astype(jnp.uint32)
        acc = acc + (e >> 4)
        lo = (lo >> nb) | jnp.where(nb > 0, hi << (jnp.uint32(32) - nb), 0)
        hi = hi >> nb
        cnt = cnt - nb.astype(jnp.int32)
        need = cnt < 32
        w = jnp.roll(data[:, 0], 1)
        sh = jnp.clip(cnt, 0, 31).astype(jnp.uint32)
        hi = jnp.where(need, hi | (w << sh), hi)
        cnt = jnp.where(need, cnt + 32, cnt)
        cur = jnp.where(need, cur + 1, cur)
        return (lo, hi, cnt, cur, acc), None

    lo0 = data[:, 0]; hi0 = data[:, 1]
    (lo, hi, cnt, cur, acc), _ = jax.lax.scan(
        step, (lo0, hi0, jnp.full(L, 64, jnp.int32),
               jnp.full(L, 2, jnp.int32), jnp.zeros(L, jnp.int32)),
        None, length=STEPS)
    return jnp.sum(acc) + jnp.sum(cnt) + jnp.sum(cur)


def main():
    tables, data = make_state(11)
    np.asarray(run_shared(tables[0], data))
    dts = []
    for r in range(3):
        tables, data = make_state(12 + r)
        t0 = time.time()
        np.asarray(run_shared(tables[0], data))
        dts.append(time.time() - t0)
    dt = min(dts)
    syms = L * STEPS
    print(f"shared   :                warm {dt*1000:7.1f} ms  "
          f"{syms/dt/1e6:8.1f} Msym/s  ~{syms*6/dt/1e9:6.3f} GB/s-equiv",
          flush=True)
    for name, g in (("gather", True), ("nogather", False)):
        t0 = time.time()
        tables, data = make_state(1)
        np.asarray(run(tables, data, g))
        cold = time.time() - t0
        dts = []
        for r in range(3):
            tables, data = make_state(2 + r)   # distinct inputs per rep
            t0 = time.time()
            np.asarray(run(tables, data, g))
            dts.append(time.time() - t0)
        dt = min(dts)
        syms = L * STEPS
        print(f"{name:9s}: cold {cold:6.1f}s  warm {dt*1000:7.1f} ms  "
              f"{syms/dt/1e6:8.1f} Msym/s  ~{syms*6/dt/1e9:6.3f} GB/s-equiv",
              flush=True)


if __name__ == "__main__":
    main()
