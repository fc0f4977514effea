"""TPU decode path: data-parallel LZ77 window resolution.

DEFLATE decode splits into two very different computations
(SURVEY.md §7.6):

- *Stage A — symbol parsing* is bit-serial by construction (variable
  length codes, tables defined mid-stream).  It runs on the scalar side:
  the native C scanner (``mf_scan_tokens``) emits one packed i32 token
  record per symbol at ~memory speed.  A Pallas scalar-core port of the
  scanner (same shape as ops/commit_pallas.py) is the planned follow-up
  so the whole decode stays on-device.
- *Stage B — byte materialization* touches every output byte and is the
  throughput-critical part.  Here it is fully parallel on the TPU: token
  output offsets come from a prefix sum; every output byte's ultimate
  source literal is found with pointer-doubling root-chase over the
  "i -> i - dist" jump graph (overlapping RLE copies — length > dist,
  dict-decoder.mbt:136-149 — are exactly chains in this graph, resolved
  in O(log depth) gathers instead of byte-serial copies).

Preset dictionaries (reader semantics, inflate.mbt:315-317) enter as
literal tokens prepended to the jump graph.
"""

from __future__ import annotations

import ctypes
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.errors import CorruptInputError, UnexpectedEOFError

_MATCH_BIT = np.int64(1) << 31


def scan_tokens(data: bytes, dictionary: bytes = b"") -> np.ndarray:
    """Stage A: bitstream -> packed token records (native scanner)."""
    from .. import native

    lib = native._load()
    if lib is None:
        raise RuntimeError("native scanner unavailable")
    if not hasattr(lib, "_scan_ready"):
        lib.mf_scan_tokens.restype = ctypes.c_long
        lib.mf_scan_tokens.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long]
        lib._scan_ready = True
    data = bytes(data)
    cap = max(4096, len(data) * 9)
    while True:
        buf = (ctypes.c_int32 * cap)()
        res = lib.mf_scan_tokens(data, len(data), buf, cap, len(dictionary))
        if res == -5:
            cap *= 4
            continue
        if res == -4:
            raise UnexpectedEOFError()
        if res < 0:
            raise CorruptInputError(-1)
        return np.frombuffer(buf, dtype=np.int32, count=res).copy()


@partial(jax.jit, static_argnums=(1, 2))
def resolve_tokens(tokens: jnp.ndarray, n_tokens_max: int, n_out_max: int):
    """Stage B: token records -> output bytes, fully data-parallel.

    tokens: int32[n_tokens_max], padded with zeros past the real count
    (zero = literal 0 contributing one byte; callers slice the result).
    Returns (out uint8[n_out_max], out_len int32).
    """
    toks = tokens
    is_match = toks < 0
    length = jnp.where(is_match, ((toks >> 15) & 0xFF) + 3, 1)
    dist = jnp.where(is_match, (toks & 0x7FFF) + 1, 0)
    lit = jnp.where(is_match, 0, toks & 0xFF)

    out_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(length)[:-1]]
    )
    out_len = out_off[-1] + length[-1]

    # covering token of each output byte: scatter token ids at their
    # start offsets, then a running max fills the interiors.
    tid0 = (
        jnp.zeros(n_out_max, jnp.int32)
        .at[jnp.minimum(out_off, n_out_max - 1)]
        .max(jnp.arange(n_tokens_max, dtype=jnp.int32))
    )
    tid = jax.lax.associative_scan(jnp.maximum, tid0)

    pos = jnp.arange(n_out_max, dtype=jnp.int32)
    d = jnp.where(is_match[tid], dist[tid], 0)
    jump = jnp.where(d > 0, pos - d, pos)
    jump = jnp.clip(jump, 0, n_out_max - 1)

    # root-chase: literals are fixed points, chains contract by doubling
    def chase(_, j):
        return j[j]

    root = jax.lax.fori_loop(0, 21, chase, jump)

    lit_at = jnp.zeros(n_out_max, jnp.uint8).at[
        jnp.minimum(out_off, n_out_max - 1)
    ].set(lit.astype(jnp.uint8))
    out = lit_at[root]
    return out, out_len


def _round_up(x: int, quantum: int = 1 << 18) -> int:
    return ((x + quantum - 1) // quantum) * quantum


def decompress(data: bytes, dictionary: bytes = b"") -> bytes:
    """Raw-DEFLATE decode: native stage A + TPU stage B."""
    dictionary = bytes(dictionary)[-32768:]
    toks = scan_tokens(data, dictionary)
    if dictionary:
        dict_toks = np.frombuffer(dictionary, np.uint8).astype(np.int32)
        toks = np.concatenate([dict_toks, toks])
    if len(toks) == 0:
        return b""
    is_match = toks < 0
    lens = np.where(is_match, ((toks >> 15) & 0xFF) + 3, 1)
    n_out = int(lens.sum())

    nt_pad = _round_up(len(toks))
    # +1 so padded-token scatters (clipped to the last slot) can never
    # land on a real output byte
    no_pad = _round_up(n_out + 1)
    toks_p = np.zeros(nt_pad, np.int32)
    toks_p[: len(toks)] = toks
    out, out_len = resolve_tokens(jnp.asarray(toks_p), nt_pad, no_pad)
    out = np.asarray(out[:n_out])
    return out[len(dictionary) :].tobytes()
