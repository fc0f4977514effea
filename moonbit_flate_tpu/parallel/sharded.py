"""Multi-chip data-parallel compression over a jax.sharding.Mesh.

TPU-native equivalent of the reference's (absent) distribution story
(SURVEY.md §5.7-5.8): DEFLATE blocks with BFINAL=0 are concatenable, and
our segments are additionally byte-aligned and history-independent
(ops/pipeline.py), so scaling is pure data parallelism:

  shard segments over the 'data' mesh axis (and sub-segments over the
  'seq' axis for long inputs) -> each device runs the full jit encode
  pipeline on its shard -> compressed sizes are combined with psum /
  all_gather over ICI -> the host performs the ordered stitch and
  appends the close-time final empty stored block (deflate.mbt:171-176).

No other collectives are needed; recovery from a lost shard is re-running
that shard (blocks are independent, SURVEY §5.3).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

from ..api.tpu import FINAL_EMPTY_BLOCK
from ..ops.pipeline import BLOCK, PAD, encode_segment


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def make_sharded_encoder(mesh: Mesh, nb: int):
    """Build the jitted multi-device encode step.

    Input:  data uint8[D, nb*BLOCK+PAD] sharded over 'data',
            n int32[D] valid byte counts.
    Output: words uint32[D, W] sharded, bits int32[D] sharded,
            total_bits int32 replicated (psum over ICI).
    """

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P("data")),
        out_specs=(P("data", None), P("data"), P()),
        # the pipeline mixes shard-varying data with replicated loop
        # carries (e.g. extension-round state); skip the VMA strictness
        check_vma=False,
    )
    def step(data, n):
        words, bits = encode_segment(data[0], n[0], nb)
        total = jax.lax.psum(bits, "data")
        return words[None], bits[None], total[None]

    return step


class ShardedCompressor:
    """Data-parallel one-shot compressor over all local devices."""

    def __init__(self, mesh: Mesh | None = None, blocks_per_segment: int = 16):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.nb = blocks_per_segment
        self.seg = self.nb * BLOCK
        self.n_dev = self.mesh.devices.size
        self._step = make_sharded_encoder(self.mesh, self.nb)

    def compress(self, data: bytes) -> bytes:
        data = bytes(data)
        D, seg = self.n_dev, self.seg
        out: list[bytes] = []
        wave = D * seg
        for wstart in range(0, max(len(data), 1), wave):
            chunk = data[wstart : wstart + wave]
            batch = np.zeros((D, seg + PAD), np.uint8)
            ns = np.zeros(D, np.int32)
            for d in range(D):
                part = chunk[d * seg : (d + 1) * seg]
                ns[d] = len(part)
                batch[d, : len(part)] = np.frombuffer(part, np.uint8)
            words, bits, _total = self._step(jnp.asarray(batch), jnp.asarray(ns))
            words = np.asarray(words)
            bits = np.asarray(bits)
            for d in range(D):
                if ns[d] == 0:
                    continue
                nbytes = int(bits[d]) // 8
                out.append(words[d].view("<u4").tobytes()[:nbytes])
        out.append(FINAL_EMPTY_BLOCK)
        return b"".join(out)


def compress(data: bytes, mesh: Mesh | None = None, blocks_per_segment: int = 16) -> bytes:
    return ShardedCompressor(mesh, blocks_per_segment).compress(data)
