#!/usr/bin/env python
"""Benchmark harness: single-chip encode + decode throughput on a
Silesia-like corpus.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

The headline metric is encode throughput; extras carry decode
throughput (native stage A + TPU stage B, and the native C decoder),
compression ratio, and per-block-type/token observability counters
(SURVEY.md §5.5).  vs_baseline is measured against the north-star
encode target of 1 GB/s/chip (BASELINE.json: the reference publishes no
numbers, so the driver-set target is the denominator).  The run
verifies bit-exact round-trips through zlib before timing; a
correctness failure reports value 0.

MF_BENCH_SMOKE=1 runs a tiny-corpus CPU variant as the `make check`
gate.
"""

import json
import os
import sys
import time
import zlib

import numpy as np

SMOKE = os.environ.get("MF_BENCH_SMOKE") == "1"


def make_corpus(total=16 * (1 << 20), seed=0):
    """Synthetic Silesia-stand-in: mixed text / binary / repetitive /
    random sections (the real corpus is not redistributable in-image)."""
    rng = np.random.default_rng(seed)
    parts = []
    words = [b"the", b"quick", b"compression", b"deflate", b"window",
             b"huffman", b"block", b"stream", b"symbol", b"match",
             b"of", b"and", b"entropy", b"parallel", b"kernel"]
    while sum(map(len, parts)) < total:
        kind = rng.integers(0, 4)
        if kind == 0:  # english-ish text
            n_words = int(rng.integers(2000, 8000))
            idx = rng.integers(0, len(words), n_words)
            parts.append(b" ".join(words[i] for i in idx))
        elif kind == 1:  # structured binary records
            rec = rng.integers(0, 256, 64, np.uint8).tobytes()
            reps = int(rng.integers(200, 1200))
            noise = rng.integers(0, 256, 64, np.uint8)
            parts.append(b"".join(
                rec[:48] + noise.tobytes()[:16] for _ in range(reps)))
        elif kind == 2:  # highly repetitive
            unit = rng.integers(0, 256, int(rng.integers(3, 200)), np.uint8).tobytes()
            parts.append(unit * int(rng.integers(500, 3000)))
        else:  # incompressible
            parts.append(rng.integers(0, 256, int(rng.integers(30000, 150000)),
                                      np.uint8).tobytes())
    return b"".join(parts)[:total]


def _count_block_types(streams) -> dict:
    """Observability (SURVEY §5.5): stored/fixed/dynamic block counts,
    via a header walk with the pure-python streaming decoder."""
    from moonbit_flate_tpu.inflate.decoder import Decompressor

    counts = {"stored": 0, "fixed": 0, "dynamic": 0}
    for s in streams:
        d = Decompressor(s)
        while True:
            try:
                if not d.read(1 << 16):
                    break
            except Exception:
                break
        bt = getattr(d, "block_type_counts", None)
        if bt:
            for k in counts:
                counts[k] += bt.get(k, 0)
    return counts


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from moonbit_flate_tpu import native
    from moonbit_flate_tpu.ops.pipeline import BLOCK, PAD, encode_segments

    nb = 4 if SMOKE else 16
    seg = nb * BLOCK
    corpus = make_corpus(total=(2 * seg if SMOKE else 16 * (1 << 20)))
    n_segs = len(corpus) // seg
    corpus = corpus[: n_segs * seg]

    # stage the whole corpus on device as one [B, seg + PAD] batch:
    # a single dispatch compresses everything (per-dispatch overhead on
    # the tunnel is ~50 ms — 3x one segment's compute)
    buf = np.zeros((n_segs, seg + PAD), np.uint8)
    for i in range(n_segs):
        buf[i, :seg] = np.frombuffer(corpus[i * seg : (i + 1) * seg], np.uint8)
    xb = jnp.asarray(buf)
    n_arr = jnp.full(n_segs, seg, jnp.int32)
    ctx0 = jnp.zeros(n_segs, jnp.int32)

    # warmup/compile + correctness check over the whole corpus
    wb, bb = encode_segments(xb, n_arr, ctx0, nb, True)
    wb_h = np.asarray(wb)
    bits_h = np.asarray(bb)
    outs = [wb_h[i].view("<u4").tobytes()[: int(bits_h[i]) // 8]
            for i in range(n_segs)]
    check = b"".join(outs) + bytes([1, 0, 0, 0xFF, 0xFF])
    if zlib.decompress(check, wbits=-15) != corpus:
        print(json.dumps({"metric": "encode_throughput", "value": 0,
                          "unit": "GB/s", "vs_baseline": 0,
                          "error": "round-trip mismatch"}))
        return 1

    # steady-state timing.  The device link ships EVERY jit output to
    # the host eagerly (~21 MB/s measured: a no-op jit returning a
    # 16.8 MB array costs 790 ms; the same compute checksummed costs
    # 36 ms), so the headline times a compute-only wrapper whose
    # outputs are the bit counts plus an on-device checksum of the
    # stream words — all the compression work happens, none of the
    # dev-tunnel plumbing is billed to the chip.  A with-fetch number
    # (compact stream retrieved through the link) is reported as an
    # extra.  Each rep flips one input byte so no dispatch is
    # identical to a previous one — the link memoizes identical
    # dispatches.
    from functools import partial as _partial

    from moonbit_flate_tpu.ops.pipeline import _cksum, compact_streams

    @_partial(jax.jit, static_argnums=(3,))
    def enc_compute(x, nn, cc, nb):
        w, b = encode_segments(x, nn, cc, nb, True)
        return b, _cksum(w)

    reps = 1 if SMOKE else 5
    np.asarray(enc_compute(xb, n_arr, ctx0, nb)[1])  # warm
    dts = []
    for r in range(reps):
        xr = xb.at[0, 0].set((int(buf[0, 0]) + r + 1) % 256)
        t0 = time.time()
        bb_t, ck = enc_compute(xr, n_arr, ctx0, nb)
        np.asarray(ck)  # per-rep host sync
        dts.append(time.time() - t0)
    dt = min(dts)  # best rep: robust to transient host/link stalls
    nbytes = n_segs * seg
    gbps = nbytes / dt / 1e9
    ratio = sum(int(b) // 8 for b in bits_h) / nbytes

    extra_fetch = {}
    if not SMOKE:
        # end-to-end including retrieval of the COMPRESSED bytes: the
        # device-side compaction bounds the shipped output at cap_words
        # (compressed size, not the padded worst case)
        cap_words = (nbytes // 2) // 4

        @_partial(jax.jit, static_argnums=(3, 4))
        def enc_fetch(x, nn, cc, nb, cap):
            w, b = encode_segments(x, nn, cc, nb, True)
            stream, total = compact_streams(w, b)
            return stream[:cap], total

        np.asarray(enc_fetch(xb, n_arr, ctx0, nb, cap_words)[1])  # warm
        dts_f = []
        for r in range(reps):
            xr = xb.at[0, 0].set((int(buf[0, 0]) + r + 5) % 256)
            t0 = time.time()
            stream, total = enc_fetch(xr, n_arr, ctx0, nb, cap_words)
            assert int(np.asarray(total)) <= 4 * cap_words
            np.asarray(stream)
            dts_f.append(time.time() - t0)
        dt_f = min(dts_f)
        extra_fetch["encode_with_fetch_gbps"] = round(nbytes / dt_f / 1e9, 4)

    # methodology marker (ADVICE r4): the headline is COMPUTE-ONLY
    # (on-device checksum, best-of-N distinct-input reps) since round 4;
    # earlier rounds' headline included the ~21 MB/s dev-link output
    # shipping.  Consumers must not compare across methodology versions.
    extra = {"methodology": "compute-only-v2",
             "compression_ratio": round(ratio, 4),
             "corpus_mb": nbytes / 1e6,
             "ms_per_mb": round(dt / (nbytes / 1e6) * 1000, 2)}
    extra.update(extra_fetch)

    # ---- observability counters (SURVEY §5.5) ---------------------------
    try:
        from moonbit_flate_tpu.inflate.tpu_inflate import scan_tokens
        tok_counts = {"literals": 0, "matches": 0}
        for s in outs[: (1 if SMOKE else len(outs))]:
            toks = scan_tokens(s)
            tok_counts["matches"] += int((toks < 0).sum())
            tok_counts["literals"] += int((toks >= 0).sum())
        extra["tokens"] = tok_counts
    except Exception:
        pass
    extra["blocks"] = _count_block_types(outs[: (1 if SMOKE else len(outs))])

    # ---- decode throughput ----------------------------------------------
    # native C decoder (host single core)
    if native.available():
        t0 = time.time()
        dec = b"".join(native.decompress(s) for s in outs)
        dt_n = time.time() - t0
        assert dec == corpus
        extra["decode_native_gbps"] = round(nbytes / dt_n / 1e9, 4)

    # TPU path: batched Pallas stage A + data-parallel stage B.  The
    # timed streams come from ZLIB (level 1, raw), not our encoder, so
    # the decode record is independent of encode health (VERDICT r3
    # weak #7).  The warm rep decodes the streams in rotated order so
    # no dispatch is identical to the warmup.
    if not SMOKE:
        try:
            from moonbit_flate_tpu.inflate.tpu_inflate import \
                decompress_segments

            zsegs = [corpus[i * seg:(i + 1) * seg] for i in range(n_segs)]
            zstreams = [zlib.compress(s, 1)[2:-4] for s in zsegs]
            outs_dec = decompress_segments(zstreams, [seg] * n_segs)
            assert b"".join(outs_dec) == corpus
            rot = list(range(1, n_segs)) + [0]
            t0 = time.time()
            outs_dec = decompress_segments([zstreams[i] for i in rot],
                                           [seg] * n_segs)
            dt_d = time.time() - t0
            assert b"".join(outs_dec) == b"".join(zsegs[i] for i in rot)
            extra["decode_tpu_gbps"] = round(nbytes / dt_d / 1e9, 4)

            # compute-only decode (same convention as the encode
            # headline: all work happens on device, the decoded bytes
            # are checksummed instead of shipped through the link)
            from moonbit_flate_tpu.inflate.tpu_inflate import _parse_resolve
            from moonbit_flate_tpu.ops.parse_pallas import (OUT_CHUNK,
                                                            _stage_streams)
            from moonbit_flate_tpu.ops.pipeline import _cksum as _ck

            n_chunks_d = -(-(seg + 1) // OUT_CHUNK)
            no_pad_d = ((seg + 1 + (1 << 18) - 1) // (1 << 18)) * (1 << 18)
            nt_pad_d = min(no_pad_d, n_chunks_d * OUT_CHUNK)

            @jax.jit
            def dec_compute(nb_d, w_d):
                out, cnt = _parse_resolve(nb_d, w_d, n_chunks_d, nt_pad_d,
                                          no_pad_d, False, True)
                return _ck(out, cnt)

            nb_d, w_d = _stage_streams(zstreams)
            np.asarray(dec_compute(nb_d, w_d))  # warm
            nb_r, w_r = _stage_streams([zstreams[i] for i in rot])
            t0 = time.time()
            np.asarray(dec_compute(nb_r, w_r))
            dt_dc = time.time() - t0
            extra["decode_tpu_compute_gbps"] = round(nbytes / dt_dc / 1e9, 4)
            # our own streams must round-trip on-device too
            outs_own = decompress_segments(outs, [seg] * n_segs)
            assert b"".join(outs_own) == corpus
        except Exception as e:  # pragma: no cover - report, don't mask
            extra["decode_tpu_error"] = repr(e)[:200]

    print(json.dumps({
        "metric": "encode_throughput_silesia_like",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 1.0, 4),
        "extra": extra,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
