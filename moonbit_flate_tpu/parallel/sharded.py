"""Multi-chip data-parallel compression over a jax.sharding.Mesh.

TPU-native equivalent of the reference's (absent) distribution story
(SURVEY.md §5.7-5.8): DEFLATE blocks with BFINAL=0 are concatenable, and
our segments are additionally byte-aligned and history-independent
(ops/pipeline.py), so scaling is pure data parallelism:

  shard segments over the 'data' mesh axis -> each device runs the full
  jit encode pipeline on its shard -> per-shard byte sizes are
  all-gathered over ICI -> an exclusive prefix sum places every shard's
  words at its absolute byte offset in the output stream -> one psum
  assembles the stream ON DEVICE (regions are byte-disjoint, so
  add == or) -> the host appends the close-time final empty stored
  block (deflate.mbt:171-176).

Context flows in as a per-shard prefix (reader-style preset-dict
semantics, inflate.mbt:315-317): ``dictionary=`` seeds shard 0, and
``halo=True`` hands each later shard the previous shard's 32 KB tail so
cross-shard matches survive sharding — the decoder needs no signalling
because the stitched stream is one ordinary DEFLATE stream whose window
naturally spans segment boundaries.

No other collectives are needed; recovery from a lost shard is
re-running that shard (blocks are independent, SURVEY §5.3).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

from ..api.tpu import FINAL_EMPTY_BLOCK
from ..formats import constants as C
from ..ops.pipeline import BLOCK, PAD, encode_segment_ctx


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def make_sharded_encoder(mesh: Mesh, nb: int, word_cap: int | None = None):
    """Build the jitted multi-device encode + on-device stitch step.

    Input:  data uint8[D, nb*BLOCK+PAD] sharded over 'data',
            n int32[D] valid byte counts (context + payload),
            ctx int32[D] context-prefix lengths.
    Output: stream uint32[D*Wc+2] replicated assembled stream words,
            sizes int32[D] per-shard compressed byte counts (replicated),
            total int32 total stream bytes (replicated).

    Comms are size-proportional (SURVEY §5.8): each shard contributes
    ``word_cap`` words to ONE all-gather (ring comm ~ D * word_cap per
    device) and the byte-exact stitch happens locally from the gathered
    shards + sizes.  ``word_cap`` defaults to the incompressible worst
    case; callers that know their data compresses pass a tighter cap
    (ShardedCompressor checks the returned sizes and retries a wave at
    full cap on overflow — sizes are exact regardless of the cap, only
    the gathered words truncate).  The earlier design psum'd a
    replicated D*W-word stream buffer instead, moving ~2x the data of
    the all-gather at FULL cap regardless of compressed size.
    """
    D = mesh.devices.size
    W_full = (8 * nb * BLOCK + nb * 64 + 64) // 32 + 2  # worst-case words
    Wc = W_full if word_cap is None else min(word_cap, W_full)
    GW = D * Wc + 2                                     # stream buffer words

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data")),
        out_specs=(P(), P(), P()),
    )
    def step(data, n, ctx):
        words, bits = encode_segment_ctx(data[0], n[0], ctx[0], nb)
        nbytes = bits // 8            # segments end byte-aligned
        my = jax.lax.axis_index("data")
        # psum'd one-hots: replication is statically inferrable under
        # shard_map's VMA checking (a plain all_gather is not)
        sizes = jax.lax.psum(
            jnp.where(jnp.arange(D) == my, nbytes, 0), "data"
        )                                                    # [D]
        total = jax.lax.psum(nbytes, "data")
        onehot = (jnp.arange(D) == my).astype(jnp.uint32)
        aw = jax.lax.psum(
            onehot[:, None] * words[:Wc].astype(jnp.uint32)[None, :], "data"
        )                                                    # [D, Wc]

        # local stitch (replicated compute): place each shard's words at
        # its absolute byte offset — byte-granular shift, then OR into
        # the stream buffer (shard regions are byte-disjoint, and words
        # past a shard's size are zero, so OR composes exactly).
        csum = jnp.cumsum(sizes)
        offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), csum[:-1]])

        def place(d, buf):
            off = offsets[d]
            sh = (off % 4).astype(jnp.uint32) * 8
            w = aw[d]
            lo = jnp.where(sh > 0, w << sh, w)
            hi = jnp.where(sh > 0, (w >> 1) >> (31 - sh), 0)
            seg = jnp.concatenate([lo, jnp.zeros(1, jnp.uint32)])
            seg = seg.at[1:].set(seg[1:] | hi)
            cur = jax.lax.dynamic_slice(buf, (off // 4,), (Wc + 1,))
            return jax.lax.dynamic_update_slice(buf, cur | seg, (off // 4,))

        stream = jax.lax.fori_loop(0, D, place, jnp.zeros(GW, jnp.uint32))
        return stream, sizes, total

    return step


class ShardedCompressor:
    """Data-parallel one-shot compressor over a device mesh.

    ``dictionary=`` is a reader-style preset dictionary (the decoder must
    be constructed with the same dictionary); ``halo=True`` feeds each
    shard the previous shard's 32 KB tail as context, recovering
    cross-shard matches (the output is still one plain DEFLATE stream).
    """

    def __init__(self, mesh: Mesh | None = None, blocks_per_segment: int = 16,
                 halo: bool = False, word_cap: int | None = None):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.nb = blocks_per_segment
        self.seg = self.nb * BLOCK
        self.halo = halo
        self.n_dev = self.mesh.devices.size
        self.word_cap = word_cap
        self._step = make_sharded_encoder(self.mesh, self.nb, word_cap)
        self._step_full = self._step if word_cap is None else None

    def _full_step(self):
        if self._step_full is None:
            self._step_full = make_sharded_encoder(self.mesh, self.nb)
        return self._step_full

    def compress(self, data: bytes, dictionary: bytes | None = None) -> bytes:
        """Pre-sharded, device-resident wave loop (VERDICT r4 weak #6):
        the whole input is staged into per-wave batches in ONE host
        pass and ONE upload; each wave then runs on device-resident
        slices, so the loop never rebuilds [D, seg] host arrays while
        the chips wait.  Only the compressed bytes return per wave."""
        data = bytes(data)
        D = self.n_dev
        context = bytes(dictionary or b"")[-C.WINDOW_SIZE:]
        payload_cap = self.seg - (
            C.WINDOW_SIZE if (self.halo or context) else 0
        )
        if payload_cap <= 0:
            raise ValueError("segment too small for context")
        wave = D * payload_cap
        W = max(1, -(-len(data) // wave))

        batches = np.zeros((W, D, self.seg + PAD), np.uint8)
        ns = np.zeros((W, D), np.int32)
        cs = np.zeros((W, D), np.int32)
        for w in range(W):
            for d in range(D):
                start = w * wave + d * payload_cap
                part = data[start : start + payload_cap]
                if self.halo:
                    ctxd = data[max(0, start - C.WINDOW_SIZE) : start]
                    if w == 0 and d == 0:
                        ctxd = context
                elif w == 0 and d == 0:
                    ctxd = context
                else:
                    ctxd = b""
                cs[w, d] = len(ctxd)
                ns[w, d] = len(ctxd) + len(part)
                blob = ctxd + part
                if blob:
                    batches[w, d, : len(blob)] = np.frombuffer(blob, np.uint8)
        batches_dev = jnp.asarray(batches)
        ns_dev = jnp.asarray(ns)
        cs_dev = jnp.asarray(cs)

        out: list[bytes] = []
        for w in range(W):
            stream, sizes, total = self._step(
                batches_dev[w], ns_dev[w], cs_dev[w]
            )
            if self.word_cap is not None and (
                np.asarray(sizes) > 4 * self.word_cap - 4
            ).any():
                # a shard overflowed the tight gather cap (incompressible
                # data): redo this wave with the worst-case cap — sizes
                # are exact either way, only gathered words truncate
                stream, sizes, total = self._full_step()(
                    batches_dev[w], ns_dev[w], cs_dev[w]
                )
            out.append(np.asarray(stream).view("<u4").tobytes()[: int(total)])
        out.append(FINAL_EMPTY_BLOCK)
        return b"".join(out)


def compress(data: bytes, mesh: Mesh | None = None,
             blocks_per_segment: int = 16, halo: bool = False,
             dictionary: bytes | None = None) -> bytes:
    return ShardedCompressor(mesh, blocks_per_segment, halo).compress(
        data, dictionary
    )


# ---------------------------------------------------------------------------
# Per-shard progress manifest (SURVEY §5.4): the shard-granular state
# vector that makes multi-host recovery and parallel decode trivial —
# blocks are independent, so a lost shard is re-run and a stored
# manifest turns decode into pure data parallelism as well.

class ShardManifest:
    """Sidecar index of a sharded stream: per-shard compressed sizes and
    payload sizes.  ``segments()`` recovers each shard's byte range, so
    a failed shard re-runs alone and decode parallelizes per shard
    (inflate/tpu_inflate.decompress_segments).  Only halo-free,
    dictionary-free streams are segment-decodable in isolation."""

    def __init__(self, comp_sizes, payload_sizes, blocks_per_segment):
        self.comp_sizes = list(map(int, comp_sizes))
        self.payload_sizes = list(map(int, payload_sizes))
        self.blocks_per_segment = blocks_per_segment

    def segments(self, stream: bytes):
        """Split the stream body back into per-shard streams."""
        parts, off = [], 0
        for sz in self.comp_sizes:
            parts.append(stream[off : off + sz])
            off += sz
        return parts

    def to_dict(self):
        return {"version": 1, "blocks_per_segment": self.blocks_per_segment,
                "comp_sizes": self.comp_sizes,
                "payload_sizes": self.payload_sizes}

    @classmethod
    def from_dict(cls, d):
        assert d["version"] == 1
        return cls(d["comp_sizes"], d["payload_sizes"],
                   d["blocks_per_segment"])


def compress_with_manifest(data: bytes, mesh: Mesh | None = None,
                           blocks_per_segment: int = 16):
    """Sharded compress returning (stream, ShardManifest).

    halo/dictionary are deliberately unsupported here: the manifest's
    point is shard-independent decode, which cross-shard history breaks.
    """
    sc = ShardedCompressor(mesh, blocks_per_segment)
    data = bytes(data)
    comp_sizes, payload_sizes = [], []
    out = []
    D, seg = sc.n_dev, sc.seg
    wave = D * seg
    for wstart in range(0, max(len(data), 1), wave):
        batch = np.zeros((D, seg + PAD), np.uint8)
        ns = np.zeros(D, np.int32)
        cs = np.zeros(D, np.int32)
        for d in range(D):
            start = wstart + d * seg
            part = data[start : start + seg]
            ns[d] = len(part)
            if part:
                batch[d, : len(part)] = np.frombuffer(part, np.uint8)
        stream, sizes, total = sc._step(
            jnp.asarray(batch), jnp.asarray(ns), jnp.asarray(cs)
        )
        out.append(np.asarray(stream).view("<u4").tobytes()[: int(total)])
        for d in range(D):
            if ns[d] > 0:
                comp_sizes.append(int(np.asarray(sizes)[d]))
                payload_sizes.append(int(ns[d]))
    body = b"".join(out)
    return body + FINAL_EMPTY_BLOCK, ShardManifest(
        comp_sizes, payload_sizes, blocks_per_segment
    )


def decompress_with_manifest(stream: bytes, manifest: ShardManifest,
                             interpret: bool = False) -> bytes:
    """Shard-parallel decode driven by the manifest.

    Shards at or under the lane-inflate cap decode on the round-5
    lane-parallel path (1024 streams in VPU lanes,
    ops/lanes_resolve.decompress_shards); larger shards fall back to
    the scalar-core parser batch (inflate/tpu_inflate)."""
    from ..inflate.tpu_inflate import decompress_segments

    body = stream[: sum(manifest.comp_sizes)]
    parts = manifest.segments(body)
    if not parts:
        return b""
    from ..ops.lanes_inflate import IN_W, SEGB

    if (max(manifest.payload_sizes) <= SEGB
            and max(len(p) for p in parts) <= IN_W * 4):
        from ..ops.lanes_resolve import decompress_shards

        outs = decompress_shards(parts, manifest.payload_sizes,
                                 interpret=interpret)
    else:
        outs = decompress_segments(parts, manifest.payload_sizes,
                                   interpret=interpret)
    return b"".join(outs)
