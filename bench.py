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

    # TPU decode headline: the LANE-PARALLEL inflate (round 5) on a
    # 64 MiB corpus of 2 KiB shard streams — the geometry the
    # framework's own sharded/manifest format produces (SURVEY §7.6:
    # throughput comes from many independent streams).  Streams come
    # from ZLIB (level 1, raw), not our encoder, so the record is
    # independent of encode health.  Reps use distinct inputs (the
    # dev link memoizes identical dispatches).
    if not SMOKE:
        try:
            import jax.numpy as _jnp

            from moonbit_flate_tpu.ops import lanes_inflate as LI
            from moonbit_flate_tpu.ops import lanes_resolve as LR

            DEC_WAVES = 32
            n_sh = DEC_WAVES * 1024
            dcorpus = make_corpus(total=n_sh * LI.SEGB, seed=0)
            shards = [dcorpus[i * LI.SEGB:(i + 1) * LI.SEGB]
                      for i in range(n_sh)]
            zstreams = [zlib.compress(s, 1)[2:-4] for s in shards]
            dbytes = n_sh * LI.SEGB

            # compute-only headline (encode-headline convention:
            # decoded bytes checksummed on device, not shipped), with
            # FULL-corpus correctness via the checksum: the wrapping
            # int32 word sum of the decode must equal the host-side
            # sum of the expected corpus (all shards are exactly SEGB,
            # so the word layout has no partial-word padding)
            @jax.jit
            def dec_compute(nb_d, iw_d):
                out, misc = LR.inflate_waves(nb_d, iw_d, DEC_WAVES)
                return jnp.sum(out), jnp.sum(misc)

            nb_d, iw_d = LI.stage_streams_lanes(zstreams, DEC_WAVES)
            nb_d, iw_d = jnp.asarray(nb_d), jnp.asarray(iw_d)
            s_out, _ = dec_compute(nb_d, iw_d)  # warm
            expect = int(np.frombuffer(dcorpus, "<i4")
                         .astype(np.int32).sum(dtype=np.int32))
            assert int(np.asarray(s_out)) == expect, \
                "lane decode checksum mismatch vs corpus"
            _, misc_d = LR.inflate_waves(nb_d, iw_d, DEC_WAVES)
            st_d = np.asarray(misc_d[:, 0]).reshape(-1)
            assert (st_d == 1).all(), "lane decode statuses not all done"
            dts_d = []
            for r in range(3):
                iw2 = iw_d.at[0, LI.IN_CHUNKS - 1, 0, 127].set(r + 9)
                t0 = time.time()
                jax.block_until_ready(dec_compute(nb_d, iw2))
                dts_d.append(time.time() - t0)
            extra["decode_tpu_compute_gbps"] = round(
                dbytes / min(dts_d) / 1e9, 4)
            extra["decode_shards"] = {"n": n_sh, "shard_bytes": LI.SEGB,
                                      "mb": dbytes / 1e6}

            # end-to-end on a subset (includes shipping decoded bytes
            # through the ~21 MB/s dev link — PROFILE_r5 isolates that
            # tax; production chips keep decoded bytes in HBM)
            n_e2e = 4 * 1024
            LR.decompress_shards(zstreams[:n_e2e],
                                 [LI.SEGB] * n_e2e)   # warm (compile)
            t0 = time.time()
            outs_dec = LR.decompress_shards(zstreams[n_e2e:2 * n_e2e],
                                            [LI.SEGB] * n_e2e)
            dt_d = time.time() - t0
            assert b"".join(outs_dec) == dcorpus[
                n_e2e * LI.SEGB: 2 * n_e2e * LI.SEGB]
            extra["decode_tpu_gbps"] = round(
                n_e2e * LI.SEGB / dt_d / 1e9, 4)
        except Exception as e:  # pragma: no cover - report, don't mask
            extra["decode_tpu_error"] = repr(e)[:200]

        # the scalar (non-sharded) decode path still serves monolithic
        # streams; record it at 8 MiB so regressions stay visible
        try:
            from moonbit_flate_tpu.inflate.tpu_inflate import \
                decompress_segments

            nseg_s = 8
            zsegs = [corpus[i * seg:(i + 1) * seg] for i in range(nseg_s)]
            zstr_s = [zlib.compress(s, 1)[2:-4] for s in zsegs]
            outs_s = decompress_segments(zstr_s, [seg] * nseg_s)
            assert b"".join(outs_s) == b"".join(zsegs)
            rot = list(range(1, nseg_s)) + [0]
            t0 = time.time()
            outs_s = decompress_segments([zstr_s[i] for i in rot],
                                         [seg] * nseg_s)
            dt_s = time.time() - t0
            extra["decode_scalar_path_gbps"] = round(
                nseg_s * seg / dt_s / 1e9, 4)
            # our own encoder's streams round-trip on-device (scalar
            # path: encode emits 1 MiB segments)
            outs_own = decompress_segments(outs[:nseg_s], [seg] * nseg_s)
            assert b"".join(outs_own) == corpus[: nseg_s * seg]
        except Exception as e:  # pragma: no cover
            extra["decode_scalar_error"] = repr(e)[:200]

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
