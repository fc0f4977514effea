"""User-facing configuration (SURVEY §5.6).

The reference exposes no knobs beyond its constructors (everything else
is a compile-time constant, formats/constants.py being our single
source of truth for those).  This frozen dataclass is the analogue of a
"config system" for the knobs this framework *does* add: segment
geometry, backend selection, sharding, and context semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

from .formats import constants as C


@dataclass(frozen=True)
class CodecConfig:
    """Immutable codec configuration.

    blocks_per_segment: DEFLATE blocks (65535 B) per jit segment — the
        compile geometry of the device pipeline.
    backend: 'auto' | 'native' | 'python' | 'tpu' (one-shot API).
    halo: feed each segment/shard the previous 32 KB as context
        (recovers cross-boundary matches; SURVEY §5.7).
    mesh_axis: name of the data-parallel mesh axis (parallel/sharded).
    """

    blocks_per_segment: int = 16
    backend: str = "auto"
    halo: bool = False
    mesh_axis: str = "data"

    def __post_init__(self):
        if self.blocks_per_segment < 1:
            raise ValueError("blocks_per_segment must be >= 1")
        if self.backend not in ("auto", "native", "python", "tpu"):
            raise ValueError(f"unknown backend {self.backend!r}")

    @property
    def segment_bytes(self) -> int:
        return self.blocks_per_segment * C.MAX_STORE_BLOCK_SIZE

    def tpu_compressor(self):
        from .api.tpu import TPUCompressor

        return TPUCompressor(self.blocks_per_segment, self.halo)

    def sharded_compressor(self, mesh=None):
        from .parallel.sharded import ShardedCompressor

        return ShardedCompressor(mesh, self.blocks_per_segment, self.halo)
