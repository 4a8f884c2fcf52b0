"""Structure-tensor tests: oriented texture recovers gradient direction."""

import numpy as np

import fibers_tpu as ft


class TestStructens:
    def test_planar_texture_orientation(self):
        # sinusoidal grating varying along x: dominant gradient axis = x
        shape = (24, 24, 24)
        x = np.arange(shape[0])[:, None, None]
        vol = np.sin(2 * np.pi * x / 6.0) * np.ones(shape)
        eigvec, eigval = ft.st_recon(vol.astype(np.float32), 1.0, 1.5)

        assert eigvec.shape == shape + (3, 3)
        assert eigval.shape == shape + (3,)
        # ascending eigenvalues
        assert (np.diff(eigval, axis=-1) >= -1e-4).all()

        # dominant eigenvector (largest eigenvalue = last) along x in the
        # interior
        inner = (slice(6, -6),) * 3
        v = eigvec[inner + (slice(None), 2)]
        assert np.abs(v[..., 0]).min() > 0.95

    def test_isotropic_noise_no_dominant(self):
        rng = np.random.default_rng(0)
        vol = rng.standard_normal((20, 20, 20)).astype(np.float32)
        eigvec, eigval = ft.st_recon(vol, 1.0, 2.0)
        inner = (slice(5, -5),) * 3
        ev = eigval[inner]
        # eigenvalues of similar magnitude: anisotropy ratio modest
        ratio = ev[..., 2] / np.maximum(ev[..., 0], 1e-12)
        assert np.median(ratio) < 10.0

    def test_st_eigen_matches_numpy(self, rng):
        n = 50
        u = rng.standard_normal((n, 6)).astype(np.float32)
        evec, eval_ = ft.st_eigen(u[:, 0], u[:, 1], u[:, 2], u[:, 3],
                                  u[:, 4], u[:, 5])
        for i in range(n):
            m = np.array([[u[i, 0], u[i, 1], u[i, 2]],
                          [u[i, 1], u[i, 3], u[i, 4]],
                          [u[i, 2], u[i, 4], u[i, 5]]])
            ref = np.linalg.eigvalsh(m)
            assert np.allclose(eval_[i], ref, atol=2e-4)


class TestShardedStructens:
    def test_sharded_equals_local(self):
        """st_recon(mesh=) shards the volume over the data axis; the
        banded-GEMM filters and eigensolve must reproduce the local
        result exactly (GSPMD inserts the filter-axis collectives)."""
        from fibers_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(3)
        vol = rng.standard_normal((16, 12, 10)).astype(np.float32)
        evec0, eval0 = ft.st_recon(vol, 1.0, 1.5)
        mesh = make_mesh(8)
        evec1, eval1 = ft.st_recon(vol, 1.0, 1.5, mesh=mesh)
        np.testing.assert_allclose(eval1, eval0, atol=1e-5)
        # eigenvectors have sign freedom; compare |dot| per voxel
        dots = np.abs((evec1 * evec0).sum(axis=-2))
        np.testing.assert_allclose(dots, 1.0, atol=1e-4)

    def test_no_divisible_axis_falls_back(self):
        from fibers_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(4)
        vol = rng.standard_normal((9, 7, 11)).astype(np.float32)
        mesh = make_mesh(8)
        evec, evall = ft.st_recon(vol, 1.0, 1.0, mesh=mesh)
        evec0, eval0 = ft.st_recon(vol, 1.0, 1.0)
        np.testing.assert_allclose(evall, eval0, atol=1e-5)
