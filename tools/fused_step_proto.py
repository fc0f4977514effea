#!/usr/bin/env python
"""Micro-costs for the fused output-byte-major lane inflate step.

First run (level-cumulative form) measured ~70 us/step REGARDLESS of
level — per-step VMEM *ref loads* dominate everything (the round-4
lanes proto read its table into a VALUE once and got 11 ns/op; reading
refs inside the loop is ~400+ ns each).  This version isolates costs:

  u0: empty fori loop (carry of 5 vregs)         -> loop floor
  u1: +length-loop on PRELOADED values (~150 ops)
  u2: +one-hot over 104 preloaded values (~320 ops)
  u3: 16 static ref-loads per step               -> ref-load cost
  u4: 1 dynamic-index VMEM store per step        -> uniform store cost
  u5: 1 (2048,128) lane-gather per step          -> deep-read cost
  u6: 1 (8192,128) lane-gather per step

Design consequence: every per-stream table the step touches must be
preloaded into values (register/VMEM-resident SSA), refs only for the
big mirrors + stores.
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

SUB, LANE = 8, 128
STEPS = 2048


def make_kernel(unit: str, steps: int, D: int = 2048):
    def kernel(tabs_ref, deep_ref, d0_ref, d1_ref, out_ref, store_ref):
        # preload everything once
        tabs = tabs_ref[...]          # (128, SUB, LANE) value
        first = [tabs[i] for i in range(15)]
        count = [tabs[15 + i] for i in range(15)]
        base = [tabs[30 + i] for i in range(15)]
        litmap = [tabs[45 + i] for i in range(72)]
        deep = deep_ref[...] if unit in ("u5", "u6") else None

        def body(i, carry):
            lo, hi, cnt, acc, opos = carry
            if unit in ("u1", "u2"):
                code = jnp.zeros((SUB, LANE), jnp.int32)
                ln = jnp.zeros((SUB, LANE), jnp.int32)
                off = jnp.zeros((SUB, LANE), jnp.int32)
                done = jnp.zeros((SUB, LANE), jnp.bool_)
                for l in range(1, 16):
                    bit = ((lo >> jnp.uint32(l - 1)) & jnp.uint32(1)).astype(jnp.int32)
                    code = (code << 1) | bit
                    o = code - first[l - 1]
                    hit = (o >= 0) & (o < count[l - 1]) & (~done)
                    ln = jnp.where(hit, l, ln)
                    off = jnp.where(hit, base[l - 1] + o, off)
                    done = done | hit
                nb = jnp.clip(ln, 1, 15).astype(jnp.uint32)
                lo = (lo >> nb) | (hi << (jnp.uint32(32) - nb))
                hi = hi >> nb
                cnt = cnt - ln
                acc = acc + off
            if unit == "u2":
                slot = acc & 127
                lit4 = jnp.zeros((SUB, LANE), jnp.int32)
                for k in range(72):
                    lit4 = jnp.where(slot == k, litmap[k], lit4)
                lc = jnp.zeros((SUB, LANE), jnp.int32)
                j = acc & 31
                for k in range(32):
                    lc = jnp.where(j == k, tabs[k], lc)
                acc = acc + lit4 + lc
            if unit == "u3":
                s = jnp.zeros((SUB, LANE), jnp.int32)
                for k in range(16):
                    s = s + tabs_ref[k]
                acc = acc + s
            if unit == "u4":
                store_ref[i & 63] = acc
                acc = acc + 1
            if unit in ("u5", "u6"):
                idx = jnp.broadcast_to((acc[0:1, :] & 127), (D, LANE))
                g = jnp.take_along_axis(deep, idx, axis=1)
                acc = acc + g[:SUB, :]
            if unit == "u0":
                acc = acc + 1
            return (lo, hi, cnt, acc, opos + 1)

        lo0 = d0_ref[...].astype(jnp.uint32)
        hi0 = d1_ref[...].astype(jnp.uint32)
        cnt0 = jnp.full((SUB, LANE), 64, jnp.int32)
        acc0 = jnp.zeros((SUB, LANE), jnp.int32)
        op0 = jnp.zeros((SUB, LANE), jnp.int32)
        lo, hi, cnt, acc, _ = jax.lax.fori_loop(
            0, steps, body, (lo0, hi0, cnt0, acc0, op0))
        out_ref[...] = acc + cnt + jax.lax.bitcast_convert_type(lo, jnp.int32)

    return kernel


def build(unit, steps, D=2048):
    @jax.jit
    def run(tabs, deep, d0, d1):
        return pl.pallas_call(
            make_kernel(unit, steps, D),
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((64, SUB, LANE), jnp.int32)],
        )(tabs, deep, d0, d1)

    def mk(seed):
        r = np.random.default_rng(seed)
        def a(shape, hi=1 << 30):
            return jnp.asarray(r.integers(0, hi, shape), jnp.int32)
        return (a((128, SUB, LANE)), a((D, LANE)),
                a((SUB, LANE)), a((SUB, LANE)))

    return run, mk


def timed(run, mk):
    np.asarray(run(*mk(0)))
    dts = []
    for rep in range(3):
        a = mk(rep + 1)
        t0 = time.time()
        np.asarray(run(*a))
        dts.append(time.time() - t0)
    return min(dts)


def main():
    S1, S2 = 2048, 8192
    for unit, D in (("u0", 2048), ("u1", 2048), ("u2", 2048),
                    ("u3", 2048), ("u4", 2048), ("u5", 2048),
                    ("u6", 8192)):
        try:
            ra, mk = build(unit, S1, D)
            rb, _ = build(unit, S2, D)
            d1, d2 = timed(ra, mk), timed(rb, mk)
            per = (d2 - d1) / (S2 - S1)
            print(f"{unit}: {per*1e9:9.1f} ns/step (slope; "
                  f"{d1*1e3:.1f}/{d2*1e3:.1f} ms)", flush=True)
        except Exception as e:
            print(f"{unit}: FAIL {repr(e)[:240]}", flush=True)


if __name__ == "__main__":
    main()
