"""LazyVolume / MRI.vol property semantics."""

import numpy as np
import jax.numpy as jnp

import fibers_tpu as ft
from fibers_tpu.core.lazy import LazyVolume
from fibers_tpu.ops.transfer import sync


def _mri(shape3):
    m = ft.MRI(vol=np.zeros(shape3, np.float32))
    m.vox2ras0 = np.eye(4, dtype=np.float32)
    m.volsize = np.asarray(shape3)
    m.width, m.height, m.depth = shape3
    m.nframes = 1
    m.set_geometry()
    return m


def test_lazy_volume_materializes_once(rng):
    shape3 = (4, 5, 3)
    idx = np.array([0, 7, 13, 30], np.int64)
    vals = jnp.asarray(rng.standard_normal((8, 6)).astype(np.float32))

    m = _mri(shape3)
    m.vol = LazyVolume(vals, idx, shape3, 6)

    got = m.vol                       # triggers materialization
    assert isinstance(got, np.ndarray)
    assert got.shape == (4, 5, 3, 6)
    flat = got.reshape(-1, 6)
    np.testing.assert_allclose(flat[idx], np.asarray(vals)[:4], rtol=1e-6)
    assert flat[1].sum() == 0         # unmasked voxels zero

    # second access returns the SAME cached array (no refetch)
    assert m.vol is got


def test_lazy_stack_volumes_share_one_fetch(rng, monkeypatch):
    """k stacked maps materialize from ONE wide device->host transfer
    (models/rumba.py returns its four scalar maps this way)."""
    from fibers_tpu.core import lazy as lazy_mod
    from fibers_tpu.core.lazy import lazy_stack_volumes
    from fibers_tpu.ops import transfer

    shape3 = (4, 5, 3)
    idx = np.array([0, 7, 13, 30], np.int64)
    stack = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))

    calls = []
    real = transfer.to_host

    def counting(x, **kw):
        calls.append(x.shape)
        return real(x, **kw)

    monkeypatch.setattr(transfer, "to_host", counting)
    vols = lazy_stack_volumes(stack, idx, shape3)
    assert len(vols) == 3 and not calls    # nothing fetched yet
    outs = [np.asarray(v) for v in vols]
    assert len(calls) == 1                 # ONE shared fetch
    for i, o in enumerate(outs):
        assert o.shape == shape3
        np.testing.assert_allclose(
            o.reshape(-1)[idx], np.asarray(stack)[i, :4], rtol=1e-6)
        assert o.reshape(-1)[1] == 0


def test_mri_vol_plain_assignment_roundtrip(rng):
    m = _mri((3, 3, 2))
    arr = rng.standard_normal((3, 3, 2)).astype(np.float32)
    m.vol = arr
    assert m.vol is arr


def test_lazy_vol_feeds_io(tmp_path, rng):
    """mri_write on a lazy volume materializes transparently."""
    shape3 = (4, 4, 2)
    idx = np.arange(32, dtype=np.int64)
    vals = jnp.asarray(rng.standard_normal((32, 1)).astype(np.float32))
    m = _mri(shape3)
    m.vol = LazyVolume(vals, idx, shape3, 1)

    p = str(tmp_path / "lazy.nii.gz")
    ft.mri_write(m, p)
    back = ft.mri_read(p)
    np.testing.assert_allclose(
        back.vol.reshape(-1), np.asarray(vals)[:, 0], atol=1e-6)


def test_sync_returns_input_and_handles_pytrees(rng):
    x = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32)) * 2
    assert sync(x) is x
    tree = {"a": x, "b": [x + 1]}
    assert sync(tree) is tree
    sync(())                          # empty pytree is a no-op
    sync(jnp.zeros(()))               # 0-d leaf
