"""TPU one-shot compression API over the jit segment pipeline.

Segments (nb * 65535 payload bytes) are compressed independently
on-device; each segment's bitstream is byte-aligned by construction
(ops/pipeline.py), so the host just concatenates segment bytes and
appends the reference's close-time final empty stored block
(deflate.mbt:171-176).

Dictionary / halo support (SURVEY §2.9.4, §5.7): the pipeline takes a
*context prefix* — bytes the matcher may reference but that emit no
tokens.  ``dictionary=`` uses it for reader-style preset-dict encoding;
``halo=True`` feeds each segment the previous segment's 32 KB tail,
recovering cross-segment matches at the cost of segment decode
independence.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..formats import constants as C
from ..ops.pipeline import BLOCK, PAD, encode_segment_ctx

FINAL_EMPTY_BLOCK = bytes([0x01, 0x00, 0x00, 0xFF, 0xFF])


class TPUCompressor:
    """Reusable compressor; compiles one kernel per segment geometry."""

    def __init__(self, blocks_per_segment: int = 16, halo: bool = False):
        self.nb = blocks_per_segment
        self.seg_bytes = self.nb * BLOCK
        self.halo = halo

    def _encode_segment_np(self, context: bytes, seg: bytes) -> bytes:
        ctx = len(context)
        n = ctx + len(seg)
        buf = np.zeros(self.seg_bytes + PAD, np.uint8)
        if ctx:
            buf[:ctx] = np.frombuffer(context, np.uint8)
        buf[ctx:n] = np.frombuffer(seg, np.uint8)
        words, total_bits = encode_segment_ctx(
            jnp.asarray(buf), jnp.int32(n), jnp.int32(ctx), self.nb,
            None, ctx == 0
        )
        total_bits = int(total_bits)
        assert total_bits % 8 == 0
        return np.asarray(words).view("<u4").tobytes()[: total_bits // 8]

    def compress(self, data: bytes, dictionary: bytes | None = None) -> bytes:
        data = bytes(data)
        context = bytes(dictionary or b"")[-C.WINDOW_SIZE :]
        payload_cap = self.seg_bytes - (
            C.WINDOW_SIZE if (self.halo or context) else 0
        )
        if payload_cap <= 0:
            raise ValueError("segment too small for context")
        parts = []
        for start in range(0, max(len(data), 1), payload_cap):
            seg = data[start : start + payload_cap]
            parts.append(self._encode_segment_np(context[-C.WINDOW_SIZE :], seg))
            context = (context + seg)[-C.WINDOW_SIZE :] if self.halo else b""
        parts.append(FINAL_EMPTY_BLOCK)
        return b"".join(parts)


def compress(data: bytes, blocks_per_segment: int = 16,
             dictionary: bytes | None = None, halo: bool = False) -> bytes:
    return TPUCompressor(blocks_per_segment, halo).compress(data, dictionary)
