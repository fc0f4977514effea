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
