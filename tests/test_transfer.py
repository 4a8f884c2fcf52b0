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
