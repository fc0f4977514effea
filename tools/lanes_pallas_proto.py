#!/usr/bin/env python
"""Pallas version of the lane-parallel symbol-step prototype.

tools/lanes_proto.py showed the XLA scan formulation is LOOP-OVERHEAD
bound (~100 us per iteration regardless of body — shared-table,
gather, and no-gather variants all measure the same), which says
nothing about the VPU cost of the actual work.  This kernel runs the
identical synthetic symbol step inside ONE Pallas kernel: per-stream
state lives in (8, 128) vector registers, the per-stream root tables
are VMEM-resident as (8, 128, 512), and the lookup is the same dense
one-hot multiply-reduce along the last axis.  STEPS iterations of a
fori_loop, no kernel relaunches.

This measures the true per-symbol-step cost of a lane-parallel
inflate's inner loop on the VPU (refill modeled as a roll, as in the
XLA variant's lower bound).
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

SUB, LANE = 8, 128
L = SUB * LANE            # 1024 streams
STEPS = 4096


def _kernel(tab_ref, d0_ref, d1_ref, acc_ref):
    k512 = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE, 512), 2)
    tab = tab_ref[...]

    def body(i, carry):
        lo, hi, cnt, acc = carry
        b9 = (lo & jnp.uint32(511)).astype(jnp.int32)
        oh = b9[:, :, None] == k512
        e = jnp.sum(jnp.where(oh, tab, 0), axis=2)
        nb = (e & 15).astype(jnp.uint32)
        acc = acc + (e >> 4)
        lo = (lo >> nb) | jnp.where(nb > 0, hi << (jnp.uint32(32) - nb), 0)
        hi = hi >> nb
        cnt = cnt - (e & 15)
        need = cnt < 32
        w = pltpu.roll(d0_ref[...], 1, 1).astype(jnp.uint32)
        sh = jnp.clip(cnt, 0, 31).astype(jnp.uint32)
        hi = jnp.where(need, hi | (w << sh), hi)
        cnt = jnp.where(need, cnt + 32, cnt)
        return lo, hi, cnt, acc

    lo0 = d0_ref[...].astype(jnp.uint32)
    hi0 = d1_ref[...].astype(jnp.uint32)
    cnt0 = jnp.full((SUB, LANE), 64, jnp.int32)
    acc0 = jnp.zeros((SUB, LANE), jnp.int32)
    lo, hi, cnt, acc = jax.lax.fori_loop(
        0, STEPS, body, (lo0, hi0, cnt0, acc0))
    acc_ref[...] = acc + cnt + jax.lax.bitcast_convert_type(lo, jnp.int32)


def _kernel_klead(tab_ref, d0_ref, d1_ref, acc_ref):
    """Tables laid out (512, 8, 128): the lookup reduces over a
    LEADING axis in native (8, 128) tiles — no 3-D relayout."""

    def body(i, carry):
        lo, hi, cnt, acc = carry
        b9 = (lo & jnp.uint32(511)).astype(jnp.int32)

        def red(k, e):
            return e + jnp.where(b9 == k, tab_ref[k], 0)

        e = jax.lax.fori_loop(0, 512, red, jnp.zeros((SUB, LANE), jnp.int32))
        nb = (e & 15).astype(jnp.uint32)
        acc = acc + (e >> 4)
        lo = (lo >> nb) | jnp.where(nb > 0, hi << (jnp.uint32(32) - nb), 0)
        hi = hi >> nb
        cnt = cnt - (e & 15)
        need = cnt < 32
        w = pltpu.roll(d0_ref[...], 1, 1).astype(jnp.uint32)
        sh = jnp.clip(cnt, 0, 31).astype(jnp.uint32)
        hi = jnp.where(need, hi | (w << sh), hi)
        cnt = jnp.where(need, cnt + 32, cnt)
        return lo, hi, cnt, acc

    lo0 = d0_ref[...].astype(jnp.uint32)
    hi0 = d1_ref[...].astype(jnp.uint32)
    cnt0 = jnp.full((SUB, LANE), 64, jnp.int32)
    acc0 = jnp.zeros((SUB, LANE), jnp.int32)
    lo, hi, cnt, acc = jax.lax.fori_loop(
        0, STEPS, body, (lo0, hi0, cnt0, acc0))
    acc_ref[...] = acc + cnt + jax.lax.bitcast_convert_type(lo, jnp.int32)


@jax.jit
def run_klead(tables_k, d0, d1):
    return pl.pallas_call(
        _kernel_klead,
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tables_k, d0, d1)


@jax.jit
def run(tables, d0, d1):
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tables, d0, d1)


def main():
    rng = np.random.default_rng(7)

    def mk(seed):
        r = np.random.default_rng(seed)
        nbits = r.integers(2, 10, (SUB, LANE, 512)).astype(np.int32)
        sym = r.integers(0, 286, (SUB, LANE, 512)).astype(np.int32)
        tables = (sym << 4) | nbits
        d0 = r.integers(0, 1 << 31, (SUB, LANE)).astype(np.int32)
        d1 = r.integers(0, 1 << 31, (SUB, LANE)).astype(np.int32)
        return (jnp.asarray(tables), jnp.asarray(d0), jnp.asarray(d1))

    t0 = time.time()
    np.asarray(run(*mk(1)))
    cold = time.time() - t0
    dts = []
    for r in range(3):
        args = mk(2 + r)
        t0 = time.time()
        np.asarray(run(*args))
        dts.append(time.time() - t0)
    dt = min(dts)
    syms = L * STEPS
    print(f"pallas lanes: cold {cold:6.1f}s  warm {dt*1000:7.1f} ms  "
          f"{syms/dt/1e6:8.1f} Msym/s  ~{syms*6/dt/1e9:6.3f} GB/s-equiv",
          flush=True)

    t0 = time.time()
    a = mk(1)
    np.asarray(run_klead(jnp.transpose(a[0], (2, 0, 1)), a[1], a[2]))
    cold = time.time() - t0
    dts = []
    for r in range(3):
        a = mk(20 + r)
        tk = jnp.transpose(a[0], (2, 0, 1))
        t0 = time.time()
        np.asarray(run_klead(tk, a[1], a[2]))
        dts.append(time.time() - t0)
    dt = min(dts)
    print(f"pallas klead: cold {cold:6.1f}s  warm {dt*1000:7.1f} ms  "
          f"{syms/dt/1e6:8.1f} Msym/s  ~{syms*6/dt/1e9:6.3f} GB/s-equiv",
          flush=True)


if __name__ == "__main__":
    main()
