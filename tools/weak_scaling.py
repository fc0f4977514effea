"""Weak-scaling measurement of the sharded encode step.

Runs the full sharded step (per-shard encode -> on-device size psum ->
prefix placement -> psum stream stitch) at D = 1, 2, 4, 8 on the
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8),
with a constant per-device payload (weak scaling).  Reports, per D:

- step wall time (device compute + collectives)
- host-stitch fraction: the bytes-assembly epilogue on the host
  (slice + final-block append), the only serial-per-wave host work left
  after the on-device stitch

Virtual CPU devices share host cores, so absolute step times do NOT
model TPU weak scaling; the point is the SERIAL-FRACTION evidence:
host work that does not shrink with D bounds scaling efficiency
(north star: >= 80% at 1 chip -> 2 hosts, BASELINE.json).

Usage:  python tools/weak_scaling.py [nb]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from bench import make_corpus
from moonbit_flate_tpu.api.tpu import FINAL_EMPTY_BLOCK
from moonbit_flate_tpu.ops.pipeline import BLOCK, PAD
from moonbit_flate_tpu.parallel.sharded import make_mesh, make_sharded_encoder


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    seg = nb * BLOCK
    data = make_corpus(total=8 * seg + 4096, seed=1)
    results = []
    for D in (1, 2, 4, 8):
        devs = jax.devices()[:D]
        if len(devs) < D:
            break
        mesh = make_mesh(devs)
        step = make_sharded_encoder(mesh, nb)
        batch = np.zeros((D, seg + PAD), np.uint8)
        ns = np.full(D, seg, np.int32)
        cs = np.zeros(D, np.int32)
        for d in range(D):
            batch[d, :seg] = np.frombuffer(
                data[d * seg : (d + 1) * seg], np.uint8)
        xb, nn, cc = jnp.asarray(batch), jnp.asarray(ns), jnp.asarray(cs)
        stream, sizes, total = step(xb, nn, cc)  # compile + warm
        jax.block_until_ready(stream)

        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            stream, sizes, total = step(xb, nn, cc)
        jax.block_until_ready(stream)
        t_step = (time.perf_counter() - t0) / reps

        t0 = time.perf_counter()
        for _ in range(reps):
            body = np.asarray(stream).view("<u4").tobytes()[: int(total)]
            out = body + FINAL_EMPTY_BLOCK
        t_host = (time.perf_counter() - t0) / reps

        thr = D * seg / t_step / 1e6
        results.append((D, t_step, t_host))
        print(f"D={D}  step {t_step*1e3:8.1f} ms  host-stitch "
              f"{t_host*1e3:6.2f} ms ({t_host/(t_step+t_host)*100:4.1f}%)  "
              f"{thr:7.1f} MB/s aggregate", flush=True)

    if len(results) > 1:
        d1 = results[0][1]
        print("\nweak-scaling efficiency vs D=1 (per-device time ratio):")
        for D, t, th in results[1:]:
            print(f"  D={D}: {d1 / t * 100:5.1f}% "
                  f"(serial host fraction {th/(t+th)*100:4.2f}%)")


if __name__ == "__main__":
    main()
