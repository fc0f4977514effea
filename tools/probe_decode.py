#!/usr/bin/env python
"""Stage-A / stage-B decode timing probe on the real chip.

Round-3 judge probe: 8 x 1 MiB through decompress_segments did not
finish in 9.5 min.  This isolates where the time goes: parse_batch
compile, parse_batch run, resolve_tokens_batch compile, run, or host
staging.  Streams come from zlib (level 1, raw) so the probe is
independent of encode health (VERDICT r4 task 3).
"""

import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402

from bench import make_corpus  # noqa: E402
from moonbit_flate_tpu.inflate.tpu_inflate import (_round_up,  # noqa: E402
                                                   resolve_tokens_batch)
from moonbit_flate_tpu.ops.parse_pallas import (OUT_CHUNK,  # noqa: E402
                                                _stage_streams, parse_batch)


def probe(B, seg_bytes):
    corpus = make_corpus(total=B * seg_bytes, seed=11)
    segs = [corpus[i * seg_bytes:(i + 1) * seg_bytes] for i in range(B)]
    streams = [zlib.compress(s, 1)[2:-4] for s in segs]
    print(f"B={B} seg={seg_bytes} comp={sum(map(len, streams))}", flush=True)

    n_chunks = -(-(seg_bytes + 1) // OUT_CHUNK)
    t0 = time.time()
    nbits, words = _stage_streams(streams)
    words.block_until_ready()
    print(f"  stage host->dev: {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    toks, cnt = parse_batch(nbits, words, n_chunks)
    cnt.block_until_ready()
    print(f"  parse (cold):    {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    toks, cnt = parse_batch(nbits, words, n_chunks)
    cnt.block_until_ready()
    dt = time.time() - t0
    print(f"  parse (warm):    {dt:.2f}s = "
          f"{B*seg_bytes/dt/1e9:.3f} GB/s out", flush=True)
    cnt_h = np.asarray(cnt)
    assert (cnt_h[:, 1] == 1).all(), cnt_h[:, :3]

    nt_pad = _round_up(max(int(cnt_h[:, 0].max()), 1))
    no_pad = _round_up(seg_bytes + 1)
    toks_in = toks[:, :nt_pad] if nt_pad <= toks.shape[1] else jnp.pad(
        toks, ((0, 0), (0, nt_pad - toks.shape[1])))
    print(f"  nt_pad={nt_pad} no_pad={no_pad}", flush=True)
    t0 = time.time()
    out, _ = resolve_tokens_batch(toks_in, nt_pad, no_pad)
    out.block_until_ready()
    print(f"  resolve (cold):  {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    out, _ = resolve_tokens_batch(toks_in, nt_pad, no_pad)
    out.block_until_ready()
    dt = time.time() - t0
    print(f"  resolve (warm):  {dt:.2f}s = "
          f"{B*seg_bytes/dt/1e9:.3f} GB/s out", flush=True)
    t0 = time.time()
    out_h = np.asarray(out)
    print(f"  dev->host:       {time.time()-t0:.2f}s", flush=True)
    got = b"".join(out_h[i, :int(cnt_h[i, 2])].tobytes() for i in range(B))
    assert got == corpus, "decode mismatch"
    print("  round-trip ok", flush=True)


if __name__ == "__main__":
    probe(1, 4 * 65535)
    probe(2, 16 * 65535)
    probe(8, 16 * 65535)
    probe(16, 16 * 65535)
