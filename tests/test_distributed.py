"""Multi-host helper tests (single-process semantics on the virtual
8-device CPU mesh; the multi-process paths use the same sharding)."""

import numpy as np
import pytest

import jax


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_global_mesh_and_shard_batch(rng):
    _require_devices(8)
    from fibers_tpu.parallel.distributed import (global_mesh,
                                                 process_local_rows,
                                                 shard_voxel_batch)

    mesh = global_mesh(model_axis=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}

    n = 100
    local = rng.standard_normal((n, 6)).astype(np.float32)
    sl = process_local_rows(n)
    assert sl == slice(0, 100)

    arr = shard_voxel_batch(local, 104, mesh)   # padded to the mesh
    assert arr.shape == (104, 6)
    np.testing.assert_allclose(np.asarray(arr)[:n], local)
    np.testing.assert_allclose(np.asarray(arr)[n:], 0.0)

    # the sharded array works inside jit with a data-parallel reduction
    s = jax.jit(lambda x: x.sum(axis=0))(arr)
    np.testing.assert_allclose(np.asarray(s), local.sum(axis=0),
                               rtol=1e-5, atol=1e-4)
