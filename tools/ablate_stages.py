"""Honest prefix ablation of the TPU encode pipeline.

Times encode_segment_ctx cut after each stage (pipeline.py stage_cut),
batched over the full bench corpus via lax.map in ONE dispatch per
measurement.  Two lies this defeats (both bit us in round 2):

- the axon tunnel memoizes identical dispatches -> every timed rep uses
  a DIFFERENT corpus variant;
- XLA dead-code-eliminates everything the returned value doesn't need
  -> each cut returns a checksum of all live arrays (pipeline._cksum).

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


def make_variant(seed: int):
    corpus = make_corpus(total=16 << 20, seed=seed)
    n_segs = len(corpus) // SEG
    buf = np.zeros((n_segs, SEG + PAD), np.uint8)
    for i in range(n_segs):
        buf[i, :SEG] = np.frombuffer(corpus[i * SEG : (i + 1) * SEG], np.uint8)
    return (jnp.asarray(buf), jnp.full(n_segs, SEG, jnp.int32),
            jnp.zeros(n_segs, jnp.int32))


def batched(cut):
    @jax.jit
    def f(xb, nn, cc):
        def one(args):
            d, n_, c_ = args
            w, b = encode_segment_ctx(d, n_, c_, NB, cut)
            return jnp.sum(w.astype(jnp.uint32)), b
        s, b = jax.lax.map(one, (xb, nn, cc))
        return jnp.sum(s), jnp.sum(b)
    return f


def main():
    cuts = [int(a) if a != "full" else None for a in sys.argv[1:]] or \
        [1, 2, 3, 4, 5, 6, 7, None]
    variants = [make_variant(s) for s in (0, 101, 202)]
    nbytes = int(variants[0][0].shape[0]) * SEG
    results = {}
    for cut in cuts:
        f = batched(cut)
        s, b = f(*variants[0])  # compile + warm
        jax.block_until_ready((s, b))
        best = float("inf")
        for v in variants[1:]:
            t0 = time.perf_counter()
            s, b = f(*v)
            jax.block_until_ready((s, b))
            best = min(best, time.perf_counter() - t0)
        results[cut] = best
        print(f"cut={str(cut):>4}  {LABELS[cut]:<40} "
              f"{best*1e3:8.1f} ms  {best/ (nbytes/1e6) * 1e3:7.2f} ms/MB",
              flush=True)
    prev = 0.0
    print("\nper-stage deltas:")
    for cut in cuts:
        d = results[cut] - prev
        print(f"  {LABELS[cut]:<40} {d/ (nbytes/1e6) * 1e3:7.2f} ms/MB")
        prev = results[cut]


if __name__ == "__main__":
    main()
