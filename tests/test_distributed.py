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


_CHILD_SCRIPT = r"""
import os, sys
import numpy as np

rank = int(sys.argv[1])
npz_path = sys.argv[2]
port = sys.argv[3]
out_path = sys.argv[4]

import jax
from fibers_tpu.parallel.distributed import (global_mesh,
                                             initialize,
                                             process_local_rows,
                                             shard_voxel_batch)
initialize(coordinator_address=f"127.0.0.1:{port}", num_processes=2,
           process_id=rank)
assert jax.process_count() == 2, jax.process_count()

with np.load(npz_path) as z:
    signals, A, ib0, want = z["signals"], z["A"], z["ib0"], z["want"]

from fibers_tpu.models.dti import _dti_kernel

n = signals.shape[0]
mesh = global_mesh()
sl = process_local_rows(n)
arr = shard_voxel_batch(signals[sl], n, mesh)
out = _dti_kernel(arr, np.asarray(A), np.asarray(ib0))
jax.block_until_ready(out)

# every addressable shard must match the single-process reference rows
checked = 0
for sh in out.addressable_shards:
    rows = sh.index[0]
    got = np.asarray(sh.data)
    ref = want[rows]
    np.testing.assert_allclose(got[:len(ref)], ref, rtol=1e-4, atol=2e-5)
    checked += len(ref)
assert checked > 0
with open(out_path, "w") as f:
    f.write(f"OK {checked}")
"""


def test_two_process_distributed_dti(tmp_path):
    """Spawn two real jax.distributed CPU processes with a coordinator;
    each contributes its half of the voxel batch via
    make_array_from_process_local_data and verifies the sharded DTI
    kernel against the single-process result (exercises the
    multi-process branch of shard_voxel_batch, distributed.py:84-91)."""
    import os
    import socket
    import subprocess
    import sys

    from fibers_tpu.models.dti import _design_dti, _dti_kernel

    rng = np.random.default_rng(11)
    ndir = 12
    dirs = rng.standard_normal((ndir, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    bval = np.concatenate([[0.0], np.full(ndir, 1000.0)]).astype(np.float32)
    bvec = np.concatenate([np.zeros((1, 3), np.float32), dirs])
    A = _design_dti(bval, bvec)
    ib0 = (bval == 0).astype(np.float32)
    signals = np.abs(rng.standard_normal((64, ndir + 1))).astype(np.float32)

    want = np.asarray(_dti_kernel(signals, np.asarray(A),
                                  np.asarray(ib0)))

    npz = tmp_path / "dti_inputs.npz"
    np.savez(npz, signals=signals, A=A, ib0=ib0, want=want)
    script = tmp_path / "child.py"
    script.write_text(_CHILD_SCRIPT)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_NUM_CPU_DEVICES", None)
    here = os.path.join(os.path.dirname(__file__), "..")
    # repo only: ambient site hooks (e.g. an accelerator plugin autoload
    # on this box) would initialize the backend before jax.distributed
    env["PYTHONPATH"] = here

    procs, outs = [], []
    for rank in range(2):
        out = tmp_path / f"rank{rank}.ok"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(rank), str(npz), str(port),
             str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"rank {rank} failed:\n{logs[rank][-3000:]}"
        assert out.read_text().startswith("OK")
