"""Independent ratio-parity corpus (VERDICT r2 item 10).

The primary ratio bar rests on bench.make_corpus, which this repo
generates; this second corpus is assembled from files that ship in the
image and owe nothing to this repo: CPython stdlib sources (text),
compiled ELF shared objects (binary), and terminfo/zoneinfo data.
Deterministic: files are discovered by fixed glob order and truncated
to a fixed budget.

Reports per-section and total compressed sizes for:
- reference policy (native/flate_native.c — byte-exact deflateFast)
- the TPU pipeline (CPU backend here; the encoder is bit-deterministic
  across backends, asserted by tests/test_parallel.py)
- CPython zlib level 1 (proxy anchor)

The north-star bar is TPU <= reference on every section.
Usage: python tools/ratio_corpus2.py
"""

import glob
import os
import sys
import zlib

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")


def _concat(paths, budget):
    out = []
    total = 0
    for p in paths:
        try:
            with open(p, "rb") as f:
                b = f.read()
        except OSError:
            continue
        out.append(b)
        total += len(b)
        if total >= budget:
            break
    return b"".join(out)[:budget]


def build_sections(budget=2 << 20):
    py_root = "/usr/local/lib/python3.12"
    sections = {
        "stdlib_py": _concat(
            sorted(glob.glob(py_root + "/*.py")), budget),
        "elf_so": _concat(
            sorted(glob.glob(
                "/opt/venv/lib/python3.12/site-packages/numpy/**/*.so",
                recursive=True)), budget),
        "json_meta": _concat(
            sorted(glob.glob(
                "/opt/venv/lib/python3.12/site-packages/*.dist-info/METADATA"))
            + sorted(glob.glob(py_root + "/**/*.txt", recursive=True)),
            budget // 2),
    }
    return {k: v for k, v in sections.items() if len(v) > 65536}


def main():
    from moonbit_flate_tpu import native
    from moonbit_flate_tpu.api.tpu import TPUCompressor

    assert native.available(), "native reference-policy codec required"
    tc = TPUCompressor(blocks_per_segment=4)
    rows = []
    for name, data in build_sections().items():
        ref = native.compress(data)
        tpu = tc.compress(data)
        z1 = zlib.compress(data, 1)[2:-4]
        assert zlib.decompress(tpu, wbits=-15) == data
        rows.append((name, len(data), len(ref), len(tpu), len(z1)))
    print(f"{'section':<12} {'raw':>9} {'reference':>10} {'tpu':>10} "
          f"{'zlib1':>10}  tpu<=ref")
    ok = True
    for name, raw, ref, tpu, z1 in rows:
        good = tpu <= ref
        ok &= good
        print(f"{name:<12} {raw:>9} {ref:>10} {tpu:>10} {z1:>10}  "
              f"{'YES' if good else 'NO'}")
    t_raw = sum(r[1] for r in rows)
    t_ref = sum(r[2] for r in rows)
    t_tpu = sum(r[3] for r in rows)
    print(f"{'TOTAL':<12} {t_raw:>9} {t_ref:>10} {t_tpu:>10} "
          f"{sum(r[4] for r in rows):>10}  "
          f"ratio ref={t_ref/t_raw:.4f} tpu={t_tpu/t_raw:.4f}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
