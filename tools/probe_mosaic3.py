#!/usr/bin/env python
"""Mosaic feasibility probes for the lane-inflate BC kernel.

  t1: transpose (128, 1024) -> (1024, 128) per step (record relayout)
  t2: wide-lane gather on (1024, 1024) (deep window read, one call)
  t3: chunked deep read: 8 static chunks of (1024,128) + masked combine
  t4: dynamic 128-aligned lane-slice store ref[:, pl.ds(k*128, 128)]
  t5: 64-deep packed one-hot with tight live set (symbol map cost)
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


def make_kernel(mode: str, steps: int):
    def kernel(seed_ref, out_ref, big_ref, big3_ref):
        s0 = seed_ref[...]
        r1k = jax.lax.broadcasted_iota(jnp.int32, (1024, LANE), 0)
        c1k = jax.lax.broadcasted_iota(jnp.int32, (1024, LANE), 1)

        if mode == "t1":
            rows = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1024), 0)
            mat0 = rows * 3 + s0[0, 0]

            def body(i, carry):
                mat, acc = carry
                t = mat.T  # (1024, 128)
                acc = acc + t
                return mat + 1, acc

            _, acc = jax.lax.fori_loop(
                0, steps, body, (mat0, jnp.zeros((1024, LANE), jnp.int32)))
            out_ref[...] = jnp.sum(acc, axis=0, keepdims=True)

        elif mode == "t2":
            tab = jax.lax.broadcasted_iota(jnp.int32, (1024, 1024), 1) + s0[0, 0]

            def body(i, carry):
                idx, acc = carry
                g = jnp.take_along_axis(tab, idx, axis=1)
                acc = acc + g[:, :LANE]
                return (idx + 1) & 1023, acc

            idx0 = jax.lax.broadcasted_iota(jnp.int32, (1024, 1024), 0) & 1023
            _, acc = jax.lax.fori_loop(
                0, steps, body, (idx0, jnp.zeros((1024, LANE), jnp.int32)))
            out_ref[...] = jnp.sum(acc, axis=0, keepdims=True)

        elif mode == "t3":
            # chunk-major 3D window: big_ref viewed (8, 1024, 128);
            # chunk reads are leading-index ref loads, then gather1
            def body(i, carry):
                idx, acc = carry
                lo = idx & 127
                hi = (idx >> 7) & 7
                res = jnp.zeros((1024, LANE), jnp.int32)
                for c in range(8):
                    g = jnp.take_along_axis(big3_ref[c], lo, axis=1)
                    res = jnp.where(hi == c, g, res)
                return (idx + 1) & 1023, acc + res

            idx0 = (r1k * 5 + c1k) & 1023
            _, acc = jax.lax.fori_loop(
                0, steps, body, (idx0, jnp.zeros((1024, LANE), jnp.int32)))
            out_ref[...] = jnp.sum(acc, axis=0, keepdims=True)

        elif mode == "t4b":
            # leading-dynamic-index store of a (1024,128) staging block
            def body(i, carry):
                v = carry + 1
                big3_ref[i & 7] = v
                return v

            v = jax.lax.fori_loop(0, steps, body, r1k + s0[0, 0])
            out_ref[...] = jnp.sum(v, axis=0, keepdims=True) \
                + big3_ref[0][0:1, :LANE]

        elif mode == "t4":
            def body(i, carry):
                v = carry + 1
                big_ref[:, pl.ds(((i & 7) * 128), 128)] = v
                return v

            v = jax.lax.fori_loop(
                0, steps, body, r1k + s0[0, 0])
            out_ref[...] = jnp.sum(v, axis=0, keepdims=True) + big_ref[0:1, :LANE]

        elif mode == "t5":
            maps = [r1k[0:8, :] * k + s0[0, 0] for k in range(64)]

            def body(i, carry):
                slot, acc = carry
                r = jnp.zeros((8, LANE), jnp.int32)
                for k in range(64):
                    r = jnp.where(slot == k, maps[k], r)
                return (slot + 1) & 63, acc + r

            slot0 = (r1k[0:8, :] + c1k[0:8, :]) & 63
            _, acc = jax.lax.fori_loop(
                0, steps, body, (slot0, jnp.zeros((8, LANE), jnp.int32)))
            out_ref[...] = jnp.sum(acc, axis=0, keepdims=True)

    return kernel


def build(mode, steps):
    @jax.jit
    def run(seed):
        out, _, _ = pl.pallas_call(
            make_kernel(mode, steps),
            out_shape=[jax.ShapeDtypeStruct((1, LANE), jnp.int32),
                       jax.ShapeDtypeStruct((1024, 1024), jnp.int32),
                       jax.ShapeDtypeStruct((8, 1024, 128), jnp.int32)],
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        )(seed)
        return out

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
    for mode in ("t3", "t4b"):
        try:
            S1, S2 = 512, 2048
            ra, mk = build(mode, S1)
            rb, _ = build(mode, S2)
            d1, d2 = timed(ra, mk), timed(rb, mk)
            per = (d2 - d1) / (S2 - S1)
            print(f"{mode}: {per*1e9:9.1f} ns/step "
                  f"({d1*1e3:.1f}/{d2*1e3:.1f} ms)", flush=True)
        except Exception as e:
            print(f"{mode}: FAIL {repr(e)[:220]}", flush=True)


if __name__ == "__main__":
    main()
