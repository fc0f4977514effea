# Top-level gates, mirroring the reference's CI
# (/root/reference/.github/workflows/check.yml:34-52: check + test on
# every push).  `make check` is the commit gate: native build + full
# test suite + a bench smoke run (tiny corpus, CPU backend).

PY ?= python

.PHONY: check native test bench-smoke clean

check: native test bench-smoke

native:
	$(MAKE) -C native

test: native
	$(PY) -m pytest tests/ -q -x

bench-smoke: native
	JAX_PLATFORMS=cpu MF_BENCH_SMOKE=1 $(PY) bench.py

clean:
	$(MAKE) -C native clean
