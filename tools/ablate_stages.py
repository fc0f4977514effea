"""Honest prefix ablation of the TPU encode pipeline.

Times encode_segment_ctx cut after each stage (pipeline.py stage_cut)
with the ubench *slope* method: N chained applications inside one jit,
cost = (t_N - t_1) / (N - 1).  This defeats the three lies the axon
tunnel tells naive timers (round 2 findings, tools/ubench.py):

- dispatches are ACKed before execution completes, so
  block_until_ready() returns at round-trip latency;
- identical dispatches are memoized;
- XLA dead-code-eliminates stages the return value doesn't need
  (each cut returns a checksum of all live arrays, pipeline._cksum,
  and the chain feeds it back into the next iteration's input).

Successive-cut differences are per-stage costs.  Usage:
    python tools/ablate_stages.py [cut ...]   # default: all
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from bench import make_corpus
from moonbit_flate_tpu.ops.pipeline import BLOCK, PAD, encode_segment_ctx
from tools.ubench import slope

NB = 16
SEG = NB * BLOCK

LABELS = {
    1: "match find (sorts + lag tables)",
    2: "greedy walk (pallas) + mask expand",
    3: "token attrs + blkify",
    4: "histograms",
    5: "huffman build_codes",
    6: "codegen + dyn sizes",
    7: "policy + unit assembly",
    None: "FULL (incl. pack)",
}


def main():
    cuts = [int(a) if a != "full" else None for a in sys.argv[1:]] or \
        [1, 2, 3, 4, 5, 6, 7, None]
    corpus = make_corpus(total=SEG + PAD, seed=0)
    data0 = jnp.asarray(np.frombuffer(corpus, np.uint8))
    n = jnp.int32(SEG)
    ctx0 = jnp.int32(0)

    results = {}
    for cut in cuts:
        def op(d, cut=cut):
            w, b = encode_segment_ctx(d, n, ctx0, NB, cut)
            probe = (jnp.sum(w.astype(jnp.uint32)) + b.astype(jnp.uint32))
            return d.at[0].set((probe % 251).astype(jnp.uint8))

        dt = slope(op, data0, n_hi=4, reps=2)
        results[cut] = dt
        print(f"cut={str(cut):>4}  {LABELS[cut]:<40} "
              f"{dt*1e3:8.1f} ms  {dt / (SEG/1e6) * 1e3:7.2f} ms/MB",
              flush=True)
    prev = 0.0
    print("\nper-stage deltas:")
    for cut in cuts:
        d = results[cut] - prev
        print(f"  {LABELS[cut]:<40} {d / (SEG/1e6) * 1e3:7.2f} ms/MB")
        prev = results[cut]


if __name__ == "__main__":
    main()
