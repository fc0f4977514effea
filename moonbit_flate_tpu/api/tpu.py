"""TPU one-shot compression API over the jit segment pipeline.

Segments (nb * 65535 bytes) are compressed independently on-device; each
segment's bitstream is byte-aligned by construction (ops/pipeline.py), so
the host just concatenates segment bytes and appends the reference's
close-time final empty stored block (deflate.mbt:171-176).  The same
segment independence is what the multi-chip layer shards over
(moonbit_flate_tpu/parallel).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..formats import constants as C
from ..ops.pipeline import BLOCK, PAD, encode_segment

FINAL_EMPTY_BLOCK = bytes([0x01, 0x00, 0x00, 0xFF, 0xFF])


class TPUCompressor:
    """Reusable compressor; compiles one kernel per segment geometry."""

    def __init__(self, blocks_per_segment: int = 16):
        self.nb = blocks_per_segment
        self.seg_bytes = self.nb * BLOCK

    def _encode_segment_np(self, seg: bytes) -> bytes:
        n = len(seg)
        buf = np.zeros(self.seg_bytes + PAD, np.uint8)
        buf[:n] = np.frombuffer(seg, np.uint8)
        words, total_bits = encode_segment(
            jnp.asarray(buf), jnp.int32(n), self.nb
        )
        total_bits = int(total_bits)
        assert total_bits % 8 == 0
        out = np.asarray(words).view("<u4").tobytes()[: total_bits // 8]
        return out

    def compress(self, data: bytes) -> bytes:
        data = bytes(data)
        parts = []
        for start in range(0, len(data), self.seg_bytes):
            parts.append(self._encode_segment_np(data[start : start + self.seg_bytes]))
        parts.append(FINAL_EMPTY_BLOCK)
        return b"".join(parts)


def compress(data: bytes, blocks_per_segment: int = 16) -> bytes:
    return TPUCompressor(blocks_per_segment).compress(data)
