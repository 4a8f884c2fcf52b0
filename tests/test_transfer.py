"""Unit tests for the tuned host<->device transfer layer (CPU backend;
the chunking/trim logic is backend-independent)."""

import numpy as np
import jax.numpy as jnp

from fibers_tpu.ops import transfer
from fibers_tpu.ops.transfer import to_device, to_host


def test_to_host_roundtrip_shapes(rng):
    for shape in [(7,), (5, 3), (4, 6, 2), (1,), (3, 1)]:
        x = rng.standard_normal(shape).astype(np.float32)
        got = to_host(jnp.asarray(x) * 2.0)
        np.testing.assert_allclose(got, x * 2.0, rtol=1e-6)
        assert got.shape == shape


def test_to_host_chunked_and_n_lead(rng, monkeypatch):
    # force tiny chunks so the aligned-chunk + overread-trim paths run
    monkeypatch.setattr(transfer, "_CHUNK_BYTES", 256)
    x = rng.standard_normal((100, 7)).astype(np.float32)
    d = jnp.asarray(x) + 1.0

    got = to_host(d)
    np.testing.assert_allclose(got, x + 1.0, rtol=1e-6)

    for n_lead in (1, 13, 99, 100, 250):
        got = to_host(d, n_lead=n_lead)
        n = min(n_lead, 100)
        assert got.shape == (n, 7)
        np.testing.assert_allclose(got, x[:n] + 1.0, rtol=1e-6)


def test_to_host_int_dtypes(rng, monkeypatch):
    monkeypatch.setattr(transfer, "_CHUNK_BYTES", 128)
    x = rng.integers(-100, 100, (64, 5)).astype(np.int32)
    got = to_host(jnp.asarray(x))
    np.testing.assert_array_equal(got, x)


def test_to_device_chunked(rng, monkeypatch):
    monkeypatch.setattr(transfer, "_UP_CHUNK_BYTES", 512)
    x = rng.standard_normal((200, 9)).astype(np.float32)
    d = to_device(x)
    assert d.shape == x.shape
    np.testing.assert_allclose(np.asarray(d), x, rtol=1e-7)

    small = rng.standard_normal((3, 2)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(to_device(small)), small)


def test_prepare_batch_pipelined_matches_gather(rng, monkeypatch):
    """The slab-pipelined single-device upload must equal the plain
    gather_frames+pad_rows batch, including straddling/padding slabs."""
    import fibers_tpu as ft
    from fibers_tpu.ops.masked import gather_frames, mask_indices

    monkeypatch.setattr(transfer, "_UP_CHUNK_BYTES", 1024)  # tiny slabs

    vol = rng.standard_normal((9, 8, 7, 5)).astype(np.float32)
    dwi = ft.MRI(vol=vol)
    dwi.vox2ras0 = np.eye(4, dtype=np.float32)
    dwi.volsize = np.asarray(vol.shape[:3])
    dwi.width, dwi.height, dwi.depth = vol.shape[:3]
    dwi.nframes = 5
    dwi.set_geometry()
    mask = ft.MRI.like(dwi, 1, np.float32)
    mask.vol = (rng.random(vol.shape[:3]) < 0.4).astype(np.float32)

    batch = ft.prepare_batch(dwi, mask)
    idx = mask_indices(mask.vol)
    ref = gather_frames(vol, idx).astype(np.float32)

    got = np.asarray(batch.signals)
    np.testing.assert_array_equal(got[:len(idx)], ref)
    np.testing.assert_array_equal(got[len(idx):], 0.0)
