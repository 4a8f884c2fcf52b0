"""RUMBA-SD tests: Bessel ratio, kernel, and fODF recovery on phantoms."""

import numpy as np
import pytest

import fibers_tpu as ft
from fibers_tpu.models.rumba import (_angular_neighbors, _build_kernel,
                                     besseli_ratio, tensor_model)

from phantom import make_phantom


class TestPieces:
    def test_besseli_ratio_against_scipy(self):
        try:
            from scipy.special import iv
        except ImportError:
            pytest.skip("scipy unavailable")
        z = np.linspace(0.5, 50, 40)
        ours = besseli_ratio(1, z)
        exact = iv(1, z) / iv(0, z)
        # the truncated Perron fraction (same depth as the reference)
        # carries ~1% error at small z
        assert np.allclose(ours, exact, rtol=1.5e-2)
        assert np.allclose(ours[z > 20], exact[z > 20], rtol=1e-3)

    def test_besseli_ratio_limits(self):
        # ratio -> 1 for large z, -> z/2 for small z (nu=1)
        assert abs(besseli_ratio(1, 200.0) - 1.0) < 0.01
        assert abs(besseli_ratio(1, 0.01) - 0.005) < 1e-4

    def test_tensor_model_isotropy(self):
        b = np.array([0.0, 1000.0, 1000.0])
        g = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
        s = tensor_model(0.3, 0.7, [1e-3] * 3, b, g, 1.0)
        assert np.isclose(s[0], 1.0)
        assert np.isclose(s[1], s[2])

    def test_kernel_shape_and_b0(self):
        dwi, mask, _, _ = make_phantom(shape=(2, 2, 2), ndir=30)
        k, ib0 = _build_kernel(dwi.bval, dwi.bvec, ft.sphere_362,
                               1.7e-3, 0.2e-3, 3.0e-3, 0.8e-4)
        assert k.shape == (31, 183)       # ndir nonb0 + 1, nvert + 2
        assert np.allclose(k[0], 1.0)     # b=0 row: unit signal
        # CSF column decays faster than GM column
        assert k[1:, 181].mean() < k[1:, 182].mean()

    def test_angular_neighbors_symmetric(self):
        nbr, ok = _angular_neighbors(ft.sphere_362)
        assert nbr.shape[0] == 181
        deg = ok.sum(axis=1)
        assert deg.min() >= 1
        for v in range(0, 181, 37):
            for w in nbr[v][ok[v]]:
                assert v in nbr[w][ok[w]]


class TestRumbaRec:
    def test_single_fiber_recovery(self):
        dwi, mask, axes, _ = make_phantom(shape=(4, 4, 4), ndir=60,
                                          bmax=2000.0, two_shell=True)
        rec = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=80)
        m = mask.vol > 0

        # primary peak direction close to the true axis
        v1 = rec.peak[0].vol[m]
        norms = np.linalg.norm(v1, axis=1)
        assert (norms > 0).all()
        ax = axes[m]
        dots = np.abs((v1 * ax).sum(axis=1)) / norms
        angs = np.degrees(np.arccos(np.clip(dots, 0, 1)))
        assert np.median(angs) < 8.0
        assert angs.max() < 15.0

        # volume fractions form a distribution
        total = (rec.fodf.vol[m].sum(axis=-1))
        assert np.allclose(total, 1.0, atol=1e-3)
        # noiseless single-fiber phantom: little isotropic contamination
        assert (rec.fcsf.vol[m] + rec.fgm.vol[m]).mean() < 0.2

        # GFA in (0, 1]; SNR summary clamped to [8, 80]
        gfa = rec.gfa.vol[m]
        assert (gfa > 0).all() and (gfa <= 1.0 + 1e-5).all()
        assert 8.0 <= rec.snr_mean <= 80.0
        assert np.isfinite(rec.snr_std)

    def test_csf_voxel_goes_isotropic(self):
        from phantom import dwi_signal, fibonacci_dirs
        shape = (3, 3, 3)
        ndir = 30
        dirs = fibonacci_dirs(ndir)
        bval = np.concatenate([[0.0], np.full(ndir, 1000.0)]).astype(
            np.float32)
        bvec = np.concatenate([np.zeros((1, 3), np.float32), dirs])
        d_csf = 3.0e-3 * np.eye(3)
        sig = dwi_signal(d_csf, bval, bvec)
        vol = np.broadcast_to(sig, shape + sig.shape).copy()
        dwi = ft.MRI(vol=vol)
        dwi.vox2ras0 = np.eye(4, dtype=np.float32)
        dwi.volsize = np.asarray(shape)
        dwi.width, dwi.height, dwi.depth = shape
        dwi.nframes = len(bval)
        dwi.set_geometry()
        dwi.bval, dwi.bvec = bval, bvec
        mask = ft.MRI.like(dwi, 1, np.float32)
        mask.vol = np.ones(shape, np.float32)

        rec = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=80)
        # CSF fraction dominates in free-water voxels
        assert rec.fcsf.vol[1, 1, 1] > 0.5

    def test_no_tv_runs(self):
        dwi, mask, _, _ = make_phantom(shape=(3, 3, 3), ndir=30)
        rec = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=10, use_tv=False)
        assert np.isfinite(rec.fodf.vol).all()

    def test_write_roundtrip(self, tmp_path):
        import os
        dwi, mask, _, _ = make_phantom(shape=(3, 3, 3), ndir=30)
        rec = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=5)
        base = str(tmp_path / "rumba")
        ft.rumba_write(rec, base)
        for f in ("fodf", "fgm", "fcsf", "peak1", "peak5", "gfa", "var"):
            assert os.path.isfile(f"{base}_{f}.nii.gz"), f
        assert os.path.isfile(f"{base}_snr_mean.txt")
        back = ft.mri_read_struct(base, ft.RUMBASD)
        assert np.allclose(back.fodf.vol, rec.fodf.vol, atol=1e-6)
        assert abs(back.snr_mean - rec.snr_mean) < 1e-4


class TestCheckpoint:
    def test_resume_matches_uninterrupted(self, tmp_path):
        import numpy as np
        from phantom import make_phantom
        dwi, mask, _, _ = make_phantom(shape=(3, 3, 3), ndir=30)
        full = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=16)

        ck = str(tmp_path / "rumba.ckpt.npz")
        # run the first half, checkpointing
        ft.rumba_rec(dwi, mask, ft.sphere_362, niter=8,
                     checkpoint_path=ck, checkpoint_every=4)
        # restamp the checkpoint for the 16-iteration schedule and resume
        with np.load(ck) as z:
            state = dict(z)
        state["niter"] = 16
        ck2 = str(tmp_path / "rumba16.ckpt.npz")
        np.savez(ck2, **state)
        resumed = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=16,
                               checkpoint_path=ck2)
        assert np.abs(resumed.fodf.vol - full.fodf.vol).max() < 1e-6

    def test_mismatched_checkpoint_raises(self, tmp_path):
        """A checkpoint from a different problem fails LOUDLY instead of
        silently discarding an hour-scale fit's progress."""
        import numpy as np
        import pytest
        from phantom import make_phantom
        dwi, mask, _, _ = make_phantom(shape=(3, 3, 3), ndir=30)
        ck = str(tmp_path / "bad.npz")
        np.savez(ck, fodf=np.zeros((5, 5)), sig2=np.zeros((5, 1)),
                 lam_flat=np.zeros(27), iteration=3, nmask=5, ncomp=5,
                 niter=4)
        with pytest.raises(ValueError, match="does not match"):
            ft.rumba_rec(dwi, mask, ft.sphere_362, niter=4,
                         checkpoint_path=ck)

    def test_mismatched_checkpoint_fresh_restarts(self, tmp_path):
        """on_mismatch='fresh' (for unattended runs) warns and starts
        from scratch instead of raising."""
        import numpy as np
        import pytest
        from phantom import make_phantom
        dwi, mask, _, _ = make_phantom(shape=(3, 3, 3), ndir=30)
        ck = str(tmp_path / "bad.npz")
        np.savez(ck, fodf=np.zeros((5, 5)), sig2=np.zeros((5, 1)),
                 lam_flat=np.zeros(27), iteration=3, nmask=5, ncomp=5,
                 niter=4)
        fresh = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=4)
        with pytest.warns(UserWarning, match="starting fresh"):
            rec = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=4,
                               checkpoint_path=ck, on_mismatch="fresh")
        assert np.abs(rec.fodf.vol - fresh.fodf.vol).max() < 1e-6
        with pytest.raises(ValueError, match="on_mismatch"):
            ft.rumba_rec(dwi, mask, ft.sphere_362, niter=4,
                         checkpoint_path=ck, on_mismatch="retry")

    def test_corrupt_arrays_fresh_restart_is_clean(self, tmp_path):
        """A checkpoint whose IDENTITY metadata matches but whose arrays
        are malformed (fodf missing columns) must not leave a partially
        applied hybrid state behind: on_mismatch='fresh' restarts from
        the true initial state and matches an uncheckpointed run."""
        import numpy as np
        import pytest
        from phantom import make_phantom
        dwi, mask, _, _ = make_phantom(shape=(3, 3, 3), ndir=30)
        ck = str(tmp_path / "good.npz")
        ft.rumba_rec(dwi, mask, ft.sphere_362, niter=4,
                     checkpoint_path=ck, checkpoint_every=2)
        with np.load(ck) as z:
            state = dict(z)
        # identity keys intact; fodf loses half its columns and sig2 is
        # flattened — both malformed layouts the resume must reject
        state["fodf"] = state["fodf"][:, : int(state["ncomp"]) // 2]
        state["sig2"] = state["sig2"].reshape(-1)
        bad = str(tmp_path / "corrupt.npz")
        np.savez(bad, **state)
        fresh = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=4)
        with pytest.warns(UserWarning, match="starting fresh"):
            rec = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=4,
                               checkpoint_path=bad, on_mismatch="fresh")
        assert np.abs(rec.fodf.vol - fresh.fodf.vol).max() < 1e-6
        # and the default still fails loudly on the same file
        with pytest.raises(ValueError, match="fodf shape"):
            ft.rumba_rec(dwi, mask, ft.sphere_362, niter=4,
                         checkpoint_path=bad)

    def test_legacy_fullvolume_lam_remapped(self, tmp_path):
        """Pre-v2 checkpoints stored lam_flat on the full volume; resume
        remaps it onto the TV crop instead of discarding progress."""
        import numpy as np
        from phantom import make_phantom
        dwi, mask, _, _ = make_phantom(shape=(3, 3, 3), ndir=30)
        full = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=16)

        ck = str(tmp_path / "rumba.ckpt.npz")
        ft.rumba_rec(dwi, mask, ft.sphere_362, niter=8,
                     checkpoint_path=ck, checkpoint_every=4)
        with np.load(ck) as z:
            state = dict(z)
        # rewrite as a legacy checkpoint: full-volume lam grid (here the
        # crop IS the full volume, so embed in the identical layout but
        # drop the v2 metadata), and stale n_rows/version keys absent
        shape3 = mask.vol.shape[:3]
        lam_full = np.zeros(int(np.prod(shape3)), np.float32)
        lo, sh = state["tv_lo"], state["tv_shape3"]
        grid = np.zeros(shape3, np.float32)
        grid[tuple(slice(l, l + s) for l, s in zip(lo, sh))] = \
            state["lam_flat"].reshape(sh)
        lam_full = grid.reshape(-1)
        legacy = {k: state[k] for k in
                  ("fodf", "sig2", "iteration", "nmask", "ncomp")}
        legacy["lam_flat"] = lam_full
        legacy["niter"] = 16
        ck2 = str(tmp_path / "legacy.ckpt.npz")
        np.savez(ck2, **legacy)
        resumed = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=16,
                               checkpoint_path=ck2)
        assert np.abs(resumed.fodf.vol - full.fodf.vol).max() < 1e-6


class TestTVBboxCrop:
    def test_crop_matches_full_volume_grid(self):
        """rumba_rec crops the TV grid to the mask bbox + halo; with an
        interior mask in a larger volume this must be EXACTLY the
        full-volume stencil of the reference (src/rusd.jl:183-235)."""
        import jax.numpy as jnp
        from fibers_tpu.models.rumba import (_build_kernel, _rumba_post,
                                             _rumba_step)
        from fibers_tpu.ops.masked import mask_indices

        dwi, _, _, _ = make_phantom(shape=(4, 4, 4), ndir=30)
        # embed in a 10^3 volume, mask strictly interior at [3:7]^3
        shape = (10, 10, 10)
        vol = np.zeros(shape + (dwi.vol.shape[3],), np.float32)
        vol[3:7, 3:7, 3:7] = dwi.vol
        big = ft.MRI(vol=vol)
        big.vox2ras0 = np.eye(4, dtype=np.float32)
        big.volsize = np.asarray(shape)
        big.width, big.height, big.depth = shape
        big.nframes = vol.shape[3]
        big.set_geometry()
        big.bval, big.bvec = dwi.bval, dwi.bvec
        mask = ft.MRI.like(big, 1, np.float32)
        mask.vol = np.zeros(shape, np.float32)
        mask.vol[3:7, 3:7, 3:7] = 1

        niter = 6
        rec = ft.rumba_rec(big, mask, ft.sphere_362, niter=niter)

        # manual full-volume-grid iteration (pre-crop semantics)
        idx = mask_indices(mask.vol)
        n = len(idx)
        kernel, ib0 = _build_kernel(big.bval, big.bvec, ft.sphere_362,
                                    1.7e-3, 0.2e-3, 3.0e-3, 0.8e-4)
        ndirk, ncomp = kernel.shape
        flat = vol.reshape(-1, vol.shape[3])
        b0m = np.maximum(flat[idx][:, ib0], 0).mean(axis=1)
        dwis = np.maximum(flat[idx][:, ~ib0], 0) / b0m[:, None]
        signal = np.minimum(np.concatenate(
            [(b0m > 0).astype(np.float32)[:, None],
             dwis.astype(np.float32)], axis=1), 1.0)

        fodf0 = np.full(ncomp, 1.0 / ncomp, np.float32)
        lam0 = (1.0 / 15) ** 2
        st = (jnp.broadcast_to(jnp.asarray(fodf0), (n, ncomp)).copy(),
              jnp.broadcast_to(jnp.asarray(kernel @ fodf0),
                               (n, ndirk)).copy(),
              None, jnp.full((n, 1), lam0, jnp.float32),
              jnp.full((int(np.prod(shape)),), lam0, jnp.float32))
        sig_j = jnp.asarray(signal)
        st = (st[0], st[1], (sig_j * st[1]) / st[3], st[3], st[4])
        for _ in range(niter):
            f, d, ds, s2, lam, _snr = _rumba_step(
                *st, sig_j, jnp.asarray(kernel), jnp.asarray(idx),
                1, 1, True, shape, int(np.prod(shape)))
            st = (f, d, ds, s2, lam)

        fodf_full, fgm, fcsf, f_iso, gfa = _rumba_post(st[0], ncomp - 2)
        got = np.asarray(rec.fodf.vol)[3:7, 3:7, 3:7]
        want = np.asarray(fodf_full).reshape(4, 4, 4, ncomp - 2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(rec.var.vol)[3:7, 3:7, 3:7].reshape(-1),
            np.asarray(st[3])[:, 0], rtol=1e-6, atol=1e-9)

    def test_batch_reuse_matches_host_path(self):
        dwi, mask, _, _ = make_phantom(shape=(4, 4, 4), ndir=30)
        base = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=8)
        batch = ft.prepare_batch(dwi, mask)
        reused = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=8,
                              batch=batch)
        np.testing.assert_allclose(np.asarray(reused.fodf.vol),
                                   np.asarray(base.fodf.vol),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(reused.gfa.vol, base.gfa.vol,
                                   rtol=1e-5, atol=1e-7)
        assert abs(reused.snr_mean - base.snr_mean) < 1e-3

    def test_tv_bf16_close_to_f32(self):
        dwi, mask, _, _ = make_phantom(shape=(4, 4, 4), ndir=30)
        f32 = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=10)
        b16 = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=10,
                           tv_bf16=True)
        # TV is a bounded multiplicative regularizer; bf16 stencils move
        # the fODF by well under a percent of its scale
        np.testing.assert_allclose(np.asarray(b16.fodf.vol),
                                   np.asarray(f32.fodf.vol),
                                   rtol=0.05, atol=2e-3)


def test_pace_abort_gate():
    """rumba_rec(abort_s_per_iter=): an impossible budget raises
    PaceAbortError once the first gate is reached; a generous budget
    completes (the gate syncs must not perturb the fit)."""
    import pytest
    from phantom import make_phantom
    from fibers_tpu.models.rumba import PaceAbortError

    import fibers_tpu as ft

    dwi, mask, _, _ = make_phantom(shape=(8, 8, 6), ndir=20)
    with pytest.raises(PaceAbortError, match="s/iter"):
        ft.rumba_rec(dwi, mask, ft.sphere_362, niter=60,
                     abort_s_per_iter=1e-9)

    ok = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=60,
                      abort_s_per_iter=1e9)
    ref = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=60)
    np.testing.assert_array_equal(np.asarray(ok.gfa.vol),
                                  np.asarray(ref.gfa.vol))


class TestSignalWire:
    def test_u12_signal_grid_robustness(self):
        """The default u12 signal wire's quantization (1/4095 on the
        normalized [0,1] signal) must not move the fit: emulate the
        wire on CPU by re-synthesizing the DWI from the u12-gridded
        normalized signal (the wire itself only engages on accelerator
        backends) and compare 40-iteration results."""
        import numpy as np
        from phantom import make_phantom
        dwi, mask, _, _ = make_phantom(shape=(6, 6, 5), ndir=30)
        base = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=40)

        v = np.asarray(dwi.vol).astype(np.float64)
        bval = np.asarray(dwi.bval)
        ib0 = bval == bval.min()
        b0 = np.maximum(v[..., ib0], 0).mean(-1, keepdims=True)
        sig = np.clip(np.where(b0 > 0, v / b0, 0), 0, 1)
        v2 = np.where(b0 > 0, np.round(sig * 4095) / 4095 * b0, 0)
        v2[..., ib0] = v[..., ib0]
        dwi2 = ft.MRI(vol=v2.astype(np.float32))
        dwi2.vox2ras0 = dwi.vox2ras0
        dwi2.bval, dwi2.bvec = dwi.bval, dwi.bvec
        pert = ft.rumba_rec(dwi2, mask, ft.sphere_362, niter=40)

        d_gfa = np.abs(np.asarray(pert.gfa.vol)
                       - np.asarray(base.gfa.vol)).max()
        assert d_gfa < 1e-3, d_gfa
        assert abs(pert.snr_mean - base.snr_mean) < 0.05
        pk = np.asarray(base.peak[0].vol)
        pk2 = np.asarray(pert.peak[0].vol)
        n = np.linalg.norm(pk, axis=-1) * np.linalg.norm(pk2, axis=-1)
        ok = n > 0
        cosang = np.abs((pk * pk2).sum(-1)[ok]) / n[ok]
        ang = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
        assert ang.max() < 0.2, ang.max()
