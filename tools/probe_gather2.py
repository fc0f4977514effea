#!/usr/bin/env python
"""gather1 (lane dynamic_gather) THROUGHPUT, not latency.

The fused-inflate design's cost pivots on how fast independent
tpu.dynamic_gather ops pipeline: in-block chase rounds and window
chunk-reads issue many gathers whose indices do not depend on each
other's results.  Measures ns per gather (slope over step counts,
inputs built on device so the ~21 MB/s link tax cancels) for table
shapes (8,128), (128,128), (1024,128), and a 32-chunk masked window
read over (1024,128) chunks.
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

LANE = 128


def make_kernel(mode: str, R: int, steps: int):
    def kernel(seed_ref, out_ref):
        s0 = seed_ref[...]                        # (8, 128)
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
        tab = rows * 7 + cols + s0[0, 0]
        idx0 = (rows + cols * 3) & 127

        def body(i, carry):
            idx, acc = carry
            if mode == "g":
                # 4 independent gathers per step on the (R,128) table
                for k in range(4):
                    g = jnp.take_along_axis(tab, (idx + k) & 127, axis=1)
                    acc = acc + g
                idx = (idx + acc[0:1, :].astype(jnp.int32) * 0 + i) & 127
            elif mode == "chunk32":
                # windowed read: 32 chunk gathers + masked combine
                hi = (idx[0:1, :] + i) & 31
                lo = (idx[0:1, :] * 5 + i) & 127
                res = jnp.zeros((1, LANE), jnp.int32)
                for c in range(32):
                    tc = jax.lax.dynamic_slice(
                        tab, (c * (R // 32), 0), (R // 32, LANE))
                    g = jnp.take_along_axis(
                        tc, jnp.broadcast_to(lo, (R // 32, LANE)), axis=1)
                    res = jnp.where(hi == c, g[0:1, :], res)
                acc = acc.at[0:1, :].add(res) if False else acc + jnp.pad(
                    res, ((0, R - 1), (0, 0)))
                idx = (idx + 1) & 127
            return idx, acc

        idx, acc = jax.lax.fori_loop(
            0, steps, body, (idx0, jnp.zeros((R, LANE), jnp.int32)))
        out_ref[...] = jnp.sum(acc, axis=0, keepdims=True)[
            :, :LANE] + idx[0:1, :]

    return kernel


def build(mode, R, steps):
    @jax.jit
    def run(seed):
        return pl.pallas_call(
            make_kernel(mode, R, steps),
            out_shape=jax.ShapeDtypeStruct((1, LANE), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(seed)

    def mk(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.integers(0, 128, (8, LANE)), jnp.int32),)

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
    cfgs = [("g", 8, 4), ("g", 128, 4), ("g", 1024, 4),
            ("chunk32", 1024, 32)]
    for mode, R, per_step in cfgs:
        try:
            S1, S2 = 1024, 4096
            ra, mk = build(mode, R, S1)
            rb, _ = build(mode, R, S2)
            d1, d2 = timed(ra, mk), timed(rb, mk)
            per = (d2 - d1) / (S2 - S1)
            elts = R * LANE * per_step
            print(f"{mode} R={R:5d}: {per*1e9:9.1f} ns/step "
                  f"({per_step} gathers, {elts/max(per,1e-12)/1e9:7.1f} "
                  f"Gelt/s; {d1*1e3:.1f}/{d2*1e3:.1f} ms)", flush=True)
        except Exception as e:
            print(f"{mode} R={R}: FAIL {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
