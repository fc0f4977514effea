"""Multi-device data-parallel encode over the virtual CPU mesh."""

import zlib

import jax
import numpy as np
import pytest

from moonbit_flate_tpu.parallel.sharded import ShardedCompressor, make_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return make_mesh(jax.devices())


def test_sharded_roundtrip(mesh):
    sc = ShardedCompressor(mesh, blocks_per_segment=1)
    rng = np.random.default_rng(0)
    payload = (
        b"distributed deflate over a device mesh | " * 20000
        + rng.integers(0, 256, 100000, np.uint8).tobytes()
    )
    c = sc.compress(payload)
    assert zlib.decompress(c, wbits=-15) == payload


def test_sharded_matches_single_device_bytes(mesh):
    """Sharding must not change the bytes: segments are independent, so
    the sharded stream equals the single-device segment-loop stream."""
    from moonbit_flate_tpu.api.tpu import TPUCompressor

    payload = (b"determinism across meshes " * 30000)[: 3 * 65535 + 1234]
    sc = ShardedCompressor(mesh, blocks_per_segment=1)
    tc = TPUCompressor(blocks_per_segment=1)
    assert sc.compress(payload) == tc.compress(payload)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert int(out[1]) > 0
    g.dryrun_multichip(min(8, len(jax.devices())))


def test_sharded_uneven_and_empty_shards(mesh):
    """Wave with fewer bytes than devices: trailing shards are empty."""
    sc = ShardedCompressor(mesh, blocks_per_segment=1)
    payload = b"short payload, most shards empty" * 100
    c = sc.compress(payload)
    assert zlib.decompress(c, wbits=-15) == payload


def test_sharded_empty_input(mesh):
    sc = ShardedCompressor(mesh, blocks_per_segment=1)
    c = sc.compress(b"")
    assert zlib.decompress(c, wbits=-15) == b""


def test_sharded_halo_improves_ratio(mesh):
    """halo=True recovers cross-shard matches: smaller output, same
    round-trip (the stream is still one plain DEFLATE stream)."""
    unit = bytes(np.random.default_rng(2).integers(0, 256, 20000, np.uint8))
    payload = unit * 15  # heavy cross-segment redundancy (period < 32 KB)
    plain = ShardedCompressor(mesh, blocks_per_segment=1).compress(payload)
    halo = ShardedCompressor(mesh, blocks_per_segment=1,
                             halo=True).compress(payload)
    assert zlib.decompress(halo, wbits=-15) == payload
    assert len(halo) < len(plain)


def test_sharded_dictionary(mesh):
    """Reader-style preset dictionary on the sharded path
    (inflate.mbt:315-317 semantics)."""
    from moonbit_flate_tpu.inflate.decoder import decompress as py_inflate

    dictionary = b"the quick brown fox jumps over the lazy dog | " * 50
    payload = dictionary[200:1800] * 3 + b" tail data"
    sc = ShardedCompressor(mesh, blocks_per_segment=1)
    c = sc.compress(payload, dictionary=dictionary)
    d = zlib.decompressobj(wbits=-15, zdict=dictionary)
    assert d.decompress(c) == payload
    assert py_inflate(c, dictionary=dictionary) == payload
    # the dictionary must actually help
    plain = sc.compress(payload)
    assert len(c) < len(plain)


def test_manifest_roundtrip_parallel_decode(mesh):
    """Per-shard manifest (SURVEY §5.4): shard-independent decode via
    the batched device parser, and single-shard recovery."""
    import json

    from moonbit_flate_tpu.parallel.sharded import (compress_with_manifest,
                                                    decompress_with_manifest,
                                                    ShardManifest)

    rng = np.random.default_rng(4)
    payload = (b"manifest shard payload | " * 300
               + rng.integers(0, 256, 3000, np.uint8).tobytes())
    stream, man = compress_with_manifest(payload, mesh,
                                         blocks_per_segment=1)
    assert zlib.decompress(stream, wbits=-15) == payload
    # manifest survives serialization
    man2 = ShardManifest.from_dict(json.loads(json.dumps(man.to_dict())))
    assert decompress_with_manifest(stream, man2,
                                    interpret=True) == payload
    # recovery: each shard re-decodes in isolation
    parts = man2.segments(stream)
    assert sum(man2.comp_sizes) == len(stream) - 5
    assert len(parts) == len(man2.payload_sizes)
