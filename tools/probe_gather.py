#!/usr/bin/env python
"""Probe Mosaic's tpu.dynamic_gather: supported shapes + per-step cost.

jax 0.9.0 lowers jnp.take_along_axis on 2D arrays inside Pallas TPU
kernels to tpu.dynamic_gather along sublanes (axis 0) or lanes
(axis 1), with x/idx/out all the same shape.  If a (D, 128) axis-0
gather is cheap, per-stream decode tables and LZ77 windows can live as
columns and the lane-parallel inflate needs no one-hot reduces at all.

Timing: each kernel runs STEPS data-dependent gathers in a fori_loop
(the result feeds the next index, so nothing hoists); two STEPS values
give a slope that cancels launch overhead.  Distinct inputs per rep
(the tunnel memoizes identical dispatches).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def time_fn(fn, mk, reps=3):
    np.asarray(fn(*mk(0)))
    dts = []
    for r in range(reps):
        a = mk(r + 1)
        t0 = time.time()
        np.asarray(fn(*a))
        dts.append(time.time() - t0)
    return min(dts)


def gather0_kernel(steps, D):
    def k(tab_ref, idx0_ref, out_ref):
        tab = tab_ref[...]

        def body(i, idx):
            g = jnp.take_along_axis(tab, idx, axis=0)
            return (g + i) % D

        idx = jax.lax.fori_loop(0, steps, body, idx0_ref[...])
        out_ref[...] = idx

    return k


def probe_gather0(D, steps):
    @jax.jit
    def run(tab, idx0):
        return pl.pallas_call(
            gather0_kernel(steps, D),
            out_shape=jax.ShapeDtypeStruct((D, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx0)

    def mk(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.integers(0, D, (D, 128)), jnp.int32),
                jnp.asarray(r.integers(0, D, (D, 128)), jnp.int32))

    return run, mk


def gather1_kernel(steps):
    def k(tab_ref, idx0_ref, out_ref):
        tab = tab_ref[...]

        def body(i, idx):
            g = jnp.take_along_axis(tab, idx, axis=1)
            return (g + i) % 128

        idx = jax.lax.fori_loop(0, steps, body, idx0_ref[...])
        out_ref[...] = idx

    return k


def probe_gather1(steps):
    @jax.jit
    def run(tab, idx0):
        return pl.pallas_call(
            gather1_kernel(steps),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx0)

    def mk(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.integers(0, 128, (8, 128)), jnp.int32),
                jnp.asarray(r.integers(0, 128, (8, 128)), jnp.int32))

    return run, mk


def main():
    # correctness first, interpret-free, tiny steps
    for axis, (runf, mk) in (("0", probe_gather0(16, 1)),
                             ("1", probe_gather1(1))):
        try:
            tab, idx = mk(0)
            got = np.asarray(runf(tab, idx))
            t, ix = np.asarray(tab), np.asarray(idx)
            if axis == "0":
                want = (t[ix, np.arange(128)[None, :]] + 0) % 16
            else:
                want = (t[np.arange(8)[:, None], ix] + 0) % 128
            ok = np.array_equal(got, want)
            print(f"gather axis{axis}: correct={ok}", flush=True)
        except Exception as e:
            print(f"gather axis{axis}: FAIL {repr(e)[:200]}", flush=True)

    for D in (8, 64, 512, 2048, 8192):
        try:
            r1, mk = probe_gather0(D, 512)
            r2, _ = probe_gather0(D, 2048)
            dt1 = time_fn(r1, mk)
            dt2 = time_fn(r2, mk)
            per = (dt2 - dt1) / (2048 - 512)
            print(f"gather0 D={D:5d}: {per*1e9:9.1f} ns/step "
                  f"({dt1*1e3:.2f}/{dt2*1e3:.2f} ms)", flush=True)
        except Exception as e:
            print(f"gather0 D={D:5d}: FAIL {repr(e)[:160]}", flush=True)

    try:
        r1, mk = probe_gather1(512)
        r2, _ = probe_gather1(2048)
        dt1, dt2 = time_fn(r1, mk), time_fn(r2, mk)
        per = (dt2 - dt1) / 1536
        print(f"gather1 (8,128): {per*1e9:9.1f} ns/step "
              f"({dt1*1e3:.2f}/{dt2*1e3:.2f} ms)", flush=True)
    except Exception as e:
        print(f"gather1: FAIL {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
