"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"need {n} devices, have {len(jax.devices())}")


class TestMesh:
    def test_make_mesh_shapes(self):
        _require_devices(8)
        from fibers_tpu.parallel.mesh import make_mesh
        m = make_mesh(8, model_axis=2)
        assert dict(m.shape) == {"data": 4, "model": 2}
        m1 = make_mesh(4)
        assert dict(m1.shape) == {"data": 4, "model": 1}

    def test_put_batch_pads_and_shards(self):
        _require_devices(8)
        from fibers_tpu.parallel.mesh import make_mesh, put_batch
        mesh = make_mesh(8, model_axis=2)
        x = np.arange(10, dtype=np.float32)[:, None]
        arr = put_batch(x, mesh)
        assert arr.shape[0] % 4 == 0
        assert len(arr.sharding.device_set) == 8 or \
            len(arr.sharding.device_set) == 4


class TestDryRun:
    @pytest.mark.parametrize("n", [2, 8])
    def test_dryrun_multichip(self, n):
        _require_devices(n)
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__ as g
        g.dryrun_multichip(n)

    def test_entry_compiles(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        fa = np.asarray(out[0])
        assert fa.shape == (256,)
        assert np.isfinite(fa).all()


class TestShardedFitMatchesLocal:
    def test_dti_kernel_sharded_equals_unsharded(self):
        """The DTI kernel gives identical results when its batch is placed
        sharded across the mesh (GSPMD inserts any needed collectives)."""
        _require_devices(8)
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from fibers_tpu.models.dti import _design_dti, _dti_kernel
        from fibers_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(0)
        ndir = 12
        dirs = rng.standard_normal((ndir, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        bval = np.concatenate([[0.0], np.full(ndir, 1000.0)]).astype(
            np.float32)
        bvec = np.concatenate([np.zeros((1, 3), np.float32), dirs])
        A = _design_dti(bval, bvec)
        ib0 = (bval == 0).astype(np.float32)
        signals = np.abs(rng.standard_normal((64, ndir + 1))).astype(
            np.float32)

        local = _dti_kernel(jnp.asarray(signals), jnp.asarray(A),
                            jnp.asarray(ib0))

        mesh = make_mesh(8, model_axis=1)
        sig_sharded = jax.device_put(signals,
                                     NamedSharding(mesh, P("data")))
        sharded = _dti_kernel(sig_sharded, jnp.asarray(A), jnp.asarray(ib0))

        np.testing.assert_allclose(np.asarray(local), np.asarray(sharded),
                                   rtol=1e-4, atol=2e-5)


class TestShardedBatchAPI:
    def test_prepare_batch_with_mesh_runs_fits(self, tmp_mri):
        """prepare_batch(mesh=...) makes dti_fit/gqi_rec data-parallel
        with no other code changes."""
        _require_devices(8)
        import fibers_tpu as ft
        from fibers_tpu.parallel.mesh import make_mesh

        mri, _ = tmp_mri
        mask = ft.MRI.like(mri, 1, np.float32)
        mask.vol[:] = 1

        mesh = make_mesh(8)
        batch = ft.prepare_batch(mri, mask, mesh=mesh)
        assert batch.signals.shape[0] % 8 == 0

        dti_sharded = ft.dti_fit(mri, mask, batch=batch)
        dti_local = ft.dti_fit(mri, mask)
        np.testing.assert_allclose(dti_sharded.fa.vol, dti_local.fa.vol,
                                   rtol=1e-4, atol=2e-5)

        gqi_sharded = ft.gqi_rec(mri, mask, ft.sphere_362, batch=batch)
        gqi_local = ft.gqi_rec(mri, mask, ft.sphere_362)
        np.testing.assert_allclose(np.asarray(gqi_sharded.odf.vol),
                                   np.asarray(gqi_local.odf.vol),
                                   rtol=1e-4, atol=2e-5)

    def test_prepare_batch_mesh_u12_equals_local_u12(self, tmp_mri):
        """The packed 12-bit wire dequantizes identically on a sharded
        mesh batch (the unpack is elementwise over the sharded row
        axis)."""
        _require_devices(8)
        import fibers_tpu as ft
        from fibers_tpu.parallel.mesh import make_mesh

        mri, _ = tmp_mri
        mask = ft.MRI.like(mri, 1, np.float32)
        mask.vol[:] = 1

        mesh = make_mesh(8)
        b_mesh = ft.prepare_batch(mri, mask, mesh=mesh, wire="u12")
        b_loc = ft.prepare_batch(mri, mask, wire="u12")
        n = b_loc.n
        np.testing.assert_array_equal(
            np.asarray(b_mesh.signals)[:n], np.asarray(b_loc.signals)[:n])

        dti_sharded = ft.dti_fit(mri, mask, batch=b_mesh)
        dti_local = ft.dti_fit(mri, mask, batch=b_loc)
        np.testing.assert_allclose(dti_sharded.fa.vol, dti_local.fa.vol,
                                   rtol=1e-4, atol=2e-5)


class TestShardedRumba:
    def test_rumba_sharded_equals_local_with_tv(self):
        """rumba_rec over a mesh-sharded VoxelBatch — WITH the TV term,
        whose stencils reshard over the component axis — matches the
        single-device fit."""
        _require_devices(8)
        import fibers_tpu as ft
        from fibers_tpu.parallel.mesh import make_mesh
        from phantom import make_phantom

        dwi, mask, _, _ = make_phantom(shape=(6, 5, 4), ndir=30)
        local = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=8)

        mesh = make_mesh(8, model_axis=2)
        batch = ft.prepare_batch(dwi, mask, mesh=mesh)
        sharded = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=8,
                               batch=batch)

        np.testing.assert_allclose(np.asarray(sharded.fodf.vol),
                                   np.asarray(local.fodf.vol),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(sharded.gfa.vol, local.gfa.vol,
                                   rtol=1e-4, atol=1e-6)
        for p_s, p_l in zip(sharded.peak, local.peak):
            np.testing.assert_allclose(p_s.vol, p_l.vol,
                                       rtol=1e-3, atol=1e-5)
        assert abs(sharded.snr_mean - local.snr_mean) < 1e-2


class TestShardedDSI:
    def test_dsi_sharded_equals_local(self):
        """dsi_rec over a mesh-sharded VoxelBatch (q-space grid, FFT, and
        radial GEMM all row-parallel) matches the single-device recon."""
        _require_devices(8)
        import fibers_tpu as ft
        from fibers_tpu.parallel.mesh import make_mesh
        from phantom import make_phantom

        dwi, mask, _, _ = make_phantom(shape=(5, 4, 3), ndir=40,
                                       bmax=4000.0, two_shell=True)
        local = ft.dsi_rec(dwi, mask, ft.sphere_362, hann_width=8)

        mesh = make_mesh(8)
        batch = ft.prepare_batch(dwi, mask, mesh=mesh)
        sharded = ft.dsi_rec(dwi, mask, ft.sphere_362, hann_width=8,
                             batch=batch)

        np.testing.assert_allclose(np.asarray(sharded.odf.vol),
                                   np.asarray(local.odf.vol),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sharded.pdf.vol),
                                   np.asarray(local.pdf.vol),
                                   rtol=1e-4, atol=1e-6)
        for p_s, p_l in zip(sharded.peak, local.peak):
            np.testing.assert_allclose(p_s.vol, p_l.vol,
                                       rtol=1e-3, atol=1e-5)
        for q_s, q_l in zip(sharded.qa, local.qa):
            np.testing.assert_allclose(q_s.vol, q_l.vol,
                                       rtol=1e-3, atol=1e-5)

    def test_dsi_batch_reuse_single_device(self):
        import fibers_tpu as ft
        from phantom import make_phantom
        dwi, mask, _, _ = make_phantom(shape=(4, 3, 3), ndir=40,
                                       bmax=4000.0, two_shell=True)
        base = ft.dsi_rec(dwi, mask, ft.sphere_362, hann_width=8)
        batch = ft.prepare_batch(dwi, mask)
        reused = ft.dsi_rec(dwi, mask, ft.sphere_362, hann_width=8,
                            batch=batch)
        np.testing.assert_allclose(np.asarray(reused.odf.vol),
                                   np.asarray(base.odf.vol),
                                   rtol=1e-5, atol=1e-7)


class TestShardedStream:
    def test_stream_sharded_equals_local(self):
        """Deterministic tractography with mesh= shards the seed axis;
        propagation gathers stay device-local and the output Tract is
        identical to the single-device run."""
        _require_devices(8)
        import fibers_tpu as ft

        from fibers_tpu.parallel.mesh import make_mesh

        shape = (16, 12, 10)
        x, y, z = np.meshgrid(*[np.linspace(0, 1, s) for s in shape],
                              indexing="ij")
        th = 0.8 * x + 0.4 * y
        v = np.stack([np.cos(th), np.sin(th), np.zeros_like(th)], axis=-1)
        ov = ft.MRI(vol=v.astype(np.float32))
        ov.vox2ras0 = np.eye(4, dtype=np.float32)
        ov.volsize = np.asarray(shape)
        ov.width, ov.height, ov.depth = shape
        ov.nframes = 3
        ov.set_geometry()

        local = ft.stream(ov, nsub=2, seed_rng=7)
        mesh = make_mesh(8)
        sharded = ft.stream(ov, nsub=2, seed_rng=7, mesh=mesh)

        ln, sn = np.asarray(local.npts), np.asarray(sharded.npts)
        np.testing.assert_array_equal(ln, sn)
        for i in range(0, len(ln), max(1, len(ln) // 20)):
            np.testing.assert_allclose(sharded.xyz[i], local.xyz[i],
                                       atol=1e-6)

    def test_stream_sharded_i6_wire(self):
        """The packed 6-bit wire composes with mesh sharding: _compact's
        field packing runs under GSPMD and the sharded tract matches the
        local i6 run exactly (same quantizer, same seeds)."""
        _require_devices(8)
        import fibers_tpu as ft

        from fibers_tpu.parallel.mesh import make_mesh

        shape = (16, 12, 10)
        x, y, z = np.meshgrid(*[np.linspace(0, 1, s) for s in shape],
                              indexing="ij")
        th = 0.8 * x + 0.4 * y
        v = np.stack([np.cos(th), np.sin(th), np.zeros_like(th)], axis=-1)
        ov = ft.MRI(vol=v.astype(np.float32))
        ov.vox2ras0 = np.eye(4, dtype=np.float32)
        ov.volsize = np.asarray(shape)
        ov.width, ov.height, ov.depth = shape
        ov.nframes = 3
        ov.set_geometry()

        local = ft.stream(ov, nsub=2, seed_rng=7, wire="i6")
        sharded = ft.stream(ov, nsub=2, seed_rng=7, wire="i6",
                            mesh=make_mesh(8))
        np.testing.assert_array_equal(np.asarray(local.npts),
                                      np.asarray(sharded.npts))
        np.testing.assert_allclose(sharded.packed_xyz, local.packed_xyz,
                                   atol=1e-6)


class TestMeshEdgeCases:
    def test_stream_mesh_chunk_not_divisible(self):
        """Chunked + sharded padding compose: a chunk size that is not a
        multiple of the data axis still shards (pads to both)."""
        _require_devices(8)
        import fibers_tpu as ft
        from fibers_tpu.parallel.mesh import make_mesh

        shape = (12, 10, 8)
        v = np.zeros(shape + (3,), np.float32)
        v[..., 0] = 1.0
        ov = ft.MRI(vol=v)
        ov.vox2ras0 = np.eye(4, dtype=np.float32)
        ov.volsize = np.asarray(shape)
        ov.width, ov.height, ov.depth = shape
        ov.nframes = 3
        ov.set_geometry()

        mesh = make_mesh(8)
        # chunk=100 is not a multiple of 8; total seeds not a multiple
        # of the chunk either -> exercises both pads at once
        local = ft.stream(ov, nsub=1, chunk=100)
        sharded = ft.stream(ov, nsub=1, chunk=100, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(local.npts),
                                      np.asarray(sharded.npts))
        np.testing.assert_allclose(sharded.packed_xyz, local.packed_xyz,
                                   atol=1e-6)

    def test_dsi_mesh_chunk_rounds_to_data_axis(self):
        """The memory-guarded DSI chunk rounds to a data-axis multiple —
        on a NON-power-of-two data axis (6 devices), where the
        power-of-two guard chunk is genuinely not divisible."""
        _require_devices(8)
        import fibers_tpu as ft
        from fibers_tpu.parallel.mesh import make_mesh
        from phantom import make_phantom

        dwi, mask, _, _ = make_phantom(shape=(4, 3, 3), ndir=40,
                                       bmax=4000.0, two_shell=True)
        mesh = make_mesh(6)
        batch = ft.prepare_batch(dwi, mask, mesh=mesh)
        # tiny memory budget forces the power-of-two guard path
        local = ft.dsi_rec(dwi, mask, ft.sphere_362, hann_width=8)
        sharded = ft.dsi_rec(dwi, mask, ft.sphere_362, hann_width=8,
                             batch=batch, mem_budget=2e6)
        np.testing.assert_allclose(np.asarray(sharded.odf.vol),
                                   np.asarray(local.odf.vol),
                                   rtol=1e-4, atol=1e-6)

    def test_rumba_data_only_mesh(self):
        """rumba_rec works on a mesh with only a 'data' axis."""
        _require_devices(8)
        import jax
        import fibers_tpu as ft
        from jax.sharding import Mesh
        from phantom import make_phantom

        dwi, mask, _, _ = make_phantom(shape=(4, 4, 3), ndir=30)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        batch = ft.prepare_batch(dwi, mask, mesh=mesh)
        local = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=6)
        sharded = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=6,
                               batch=batch)
        np.testing.assert_allclose(np.asarray(sharded.fodf.vol),
                                   np.asarray(local.fodf.vol),
                                   rtol=1e-4, atol=1e-6)

    def test_stream_mesh_with_sink(self, tmp_path):
        """Sharded propagation composes with the streaming .trk sink."""
        _require_devices(8)
        import fibers_tpu as ft
        from fibers_tpu.parallel.mesh import make_mesh

        shape = (10, 8, 6)
        v = np.zeros(shape + (3,), np.float32)
        v[..., 0] = 1.0
        ov = ft.MRI(vol=v)
        ov.vox2ras0 = np.eye(4, dtype=np.float32)
        ov.volsize = np.asarray(shape)
        ov.width, ov.height, ov.depth = shape
        ov.nframes = 3
        ov.set_geometry()

        mem = ft.stream(ov, nsub=1)
        out = str(tmp_path / "sharded.trk")
        ft.stream(ov, nsub=1, mesh=make_mesh(8), trk_sink=out)
        back = ft.trk_read(out)
        assert back.n_count == mem.n_count
        mem.materialize()
        for i in range(0, mem.n_count, max(1, mem.n_count // 10)):
            np.testing.assert_allclose(back.xyz[i], mem.xyz[i], atol=1e-4)


class TestDevicePeaksSharded:
    def test_handoff_stream_sharded_equals_local(self):
        """DevicePeaks handoff composes with stream(mesh=): the device-
        built orientation field replicates across the mesh and the
        sharded tract matches the local one."""
        _require_devices(8)
        import fibers_tpu as ft

        from fibers_tpu.parallel.mesh import make_mesh
        from phantom import make_phantom

        dwi, mask, _, _ = make_phantom(shape=(10, 10, 10), ndir=30)
        gqi = ft.gqi_rec(dwi, mask, ft.sphere_362)
        pk = ft.peaks_to_ovecs(gqi, device=True)

        local = ft.stream(pk, mask=mask, nsub=1, f_thresh=0.0)
        sharded = ft.stream(pk, mask=mask, nsub=1, f_thresh=0.0,
                            mesh=make_mesh(8))
        ln, sn = np.asarray(local.npts), np.asarray(sharded.npts)
        np.testing.assert_array_equal(ln, sn)
        for i in range(0, len(ln), max(1, len(ln) // 10)):
            np.testing.assert_allclose(sharded.xyz[i], local.xyz[i],
                                       atol=1e-6)
