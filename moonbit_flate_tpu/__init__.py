"""moonbit_flate_tpu — a TPU-native DEFLATE (RFC 1951) framework.

Capability parity with gmlewis/moonbit-flate (see SURVEY.md), rebuilt
TPU-first:

- ``compress`` / ``decompress``: one-shot raw DEFLATE with pluggable
  backends — 'native' (C fast path, exact reference policy), 'python'
  (pure-Python oracle), 'tpu' (jit XLA/Pallas pipeline).
- ``Writer`` / ``Reader``: streaming surfaces mirroring the reference's
  io.WriteCloser / io.ReadCloser semantics, including writer-side
  prepend-dictionary and reader-side preset-dictionary behavior.
- ``TPUCompressor`` / ``parallel.ShardedCompressor``: single-chip and
  mesh-sharded device pipelines.
"""

from __future__ import annotations

from .api.stream import Writer, compress as _py_compress
from .inflate.decoder import Reader, decompress as _py_decompress
from . import native as _native

__all__ = [
    "Writer", "Reader", "compress", "decompress",
]


def compress(data: bytes, dictionary: bytes | None = None,
             backend: str = "auto") -> bytes:
    """One-shot BestSpeed raw-DEFLATE compression.

    backend 'auto' prefers the native fast path, falling back to pure
    Python; 'tpu' runs the device pipeline (dictionaries there follow
    reader-style preset semantics, SURVEY §2.9.4).
    """
    if backend == "auto":
        backend = "native" if _native.available() else "python"
    if backend == "native":
        return _native.compress(data, dictionary)
    if backend == "python":
        return _py_compress(data, dictionary)
    if backend == "tpu":
        # Reader-style preset-dict semantics on the TPU path
        # (SURVEY §2.9.4 — deliberately not the writer's prepend quirk).
        from .api.tpu import compress as tpu_compress

        return tpu_compress(data, dictionary=dictionary)
    raise ValueError(f"unknown backend {backend!r}")


def decompress(data: bytes, dictionary: bytes = b"",
               backend: str = "auto") -> bytes:
    """One-shot raw-DEFLATE decompression (reader-style preset dict)."""
    if backend == "auto":
        backend = "native" if _native.available() else "python"
    if backend == "native":
        return _native.decompress(data, dictionary)
    if backend == "python":
        return _py_decompress(data, dictionary)
    if backend == "tpu":
        from .inflate.tpu_inflate import decompress as tpu_decompress

        return tpu_decompress(data, dictionary)
    raise ValueError(f"unknown backend {backend!r}")
