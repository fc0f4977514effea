#!/usr/bin/env python
"""End-to-end public-API verification on the real TPU (one process).

Drives moonbit_flate_tpu.compress/decompress over probe inputs with
CPython zlib as the external oracle, per .claude/skills/verify.
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

import moonbit_flate_tpu as mf  # noqa: E402
from bench import make_corpus  # noqa: E402


def probes():
    rng = np.random.default_rng(42)
    yield "empty", b""
    yield "one", b"A"
    yield "zeros-200k", bytes(200_000)
    yield "random-131072", rng.integers(0, 256, 131072, np.uint8).tobytes()
    yield "period7-x65535", (b"abcdefg" * 9364)[:65535]
    yield "straddle-65536", make_corpus(total=65536, seed=1)
    yield "straddle-131073", make_corpus(total=131073, seed=2)
    yield "mixed-1.5M", make_corpus(total=3 * (1 << 19), seed=3)


def main() -> int:
    t0 = time.time()
    n_checked = 0
    for name, data in probes():
        c_tpu = mf.compress(data, backend="tpu")
        assert zlib.decompress(c_tpu, wbits=-15) == data, \
            f"{name}: zlib cannot reproduce tpu stream"
        assert mf.decompress(c_tpu) == data, f"{name}: own decode (tpu enc)"
        c_nat = mf.compress(data)
        assert zlib.decompress(c_nat, wbits=-15) == data, \
            f"{name}: zlib cannot reproduce native stream"
        # our decoder must decode zlib-produced streams too
        z = zlib.compress(data, 6)[2:-4]
        assert mf.decompress(z) == data, f"{name}: own decode (zlib enc)"
        print(f"{name}: ok (tpu {len(c_tpu)}B, native {len(c_nat)}B)",
              flush=True)
        n_checked += 1
    print(f"verify_api: {n_checked} probes OK in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
