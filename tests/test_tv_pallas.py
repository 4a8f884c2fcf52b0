"""Fused Pallas TV stencil vs the XLA reference stencil (interpret mode)."""

import numpy as np

import jax.numpy as jnp


def test_tv_kernel_matches_xla_stencil(rng):
    from fibers_tpu.models.rumba import _tv_stencil
    from fibers_tpu.ops.pallas.tv_stencil import tv_multiplier

    X, Y, Z, C = 6, 5, 4, 8
    v = rng.standard_normal((X, Y, Z, C)).astype(np.float32)
    # zero a margin + random interior zeros, like a masked embedding
    v[0] = 0
    v[:, -1] = 0
    v[rng.random((X, Y, Z)) < 0.3] = 0
    lam = rng.uniform(0.001, 0.01, (X, Y, Z)).astype(np.float32)

    want = np.asarray(_tv_stencil(jnp.asarray(v), jnp.asarray(lam)))
    got = np.asarray(tv_multiplier(jnp.asarray(v), jnp.asarray(lam),
                                   cb=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_tv_kernel_multichunk(rng):
    from fibers_tpu.models.rumba import _tv_stencil
    from fibers_tpu.ops.pallas.tv_stencil import tv_multiplier

    X, Y, Z, C = 4, 3, 3, 16
    v = rng.standard_normal((X, Y, Z, C)).astype(np.float32)
    lam = np.full((X, Y, Z), 0.004, np.float32)
    want = np.asarray(_tv_stencil(jnp.asarray(v), jnp.asarray(lam)))
    got = np.asarray(tv_multiplier(jnp.asarray(v), jnp.asarray(lam),
                                   cb=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_tv_kernel_bf16_input(rng):
    """bf16 stacks run the differences in bf16 but sqrt/divide in f32
    (the v5e EUP has no bf16 transcendentals); the multiplier stays
    close to the f32 stencil on the same rounded input."""
    import jax.numpy as jnp
    from fibers_tpu.models.rumba import _tv_stencil
    from fibers_tpu.ops.pallas.tv_stencil import tv_multiplier

    X, Y, Z, C = 5, 4, 4, 8
    v = rng.uniform(0.0, 1.0, (X, Y, Z, C)).astype(np.float32)
    lam = np.full((X, Y, Z), 0.004, np.float32)

    vb = jnp.asarray(v).astype(jnp.bfloat16)
    got = np.asarray(tv_multiplier(vb, jnp.asarray(lam), cb=8,
                                   interpret=True))
    assert got.dtype == np.float32
    want = np.asarray(_tv_stencil(vb.astype(jnp.float32),
                                  jnp.asarray(lam)))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def test_tv_term_shardmap_pallas_matches_local(rng, monkeypatch):
    """The mesh path of _tv_term runs the Pallas kernel per-device inside
    a shard_map (interpret mode here; Mosaic on real TPUs) and must match
    the single-device XLA stencil bit-for-bit in f32."""
    import functools

    import jax

    from fibers_tpu.models.rumba import _gather_index, _tv_term
    from fibers_tpu.ops.pallas import tv_stencil as tvs
    from fibers_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("FIBERS_TV_INTERPRET", "1")
    calls = []
    real_tv = tvs.tv_multiplier

    def spy(*a, **k):
        calls.append(k)
        return real_tv(*a, **k)

    monkeypatch.setattr(tvs, "tv_multiplier", spy)

    shape3 = (5, 4, 4)
    nxyz = 80
    n, ncomp = 16, 24
    idx_mask = np.sort(rng.choice(nxyz, n, replace=False)).astype(np.int32)
    fodf = rng.uniform(0.0, 1.0, (n, ncomp)).astype(np.float32)
    lam_flat = rng.uniform(0.001, 0.01, nxyz).astype(np.float32)

    import jax.numpy as jnp2
    fodf_j = jnp2.asarray(fodf)
    idx_j = jnp2.asarray(idx_mask)
    lam_j = jnp2.asarray(lam_flat)
    gidx = _gather_index(idx_j, n, nxyz)

    want = np.asarray(_tv_term(fodf_j, gidx, idx_j, lam_j, shape3, nxyz,
                               mesh=None, use_pallas=False))

    mesh = make_mesh(8)
    f = jax.jit(functools.partial(_tv_term, shape3=shape3, nxyz=nxyz,
                                  mesh=mesh))
    got = np.asarray(f(fodf_j, gidx, idx_j, lam_j))

    assert calls, "shard_map path did not invoke the Pallas kernel"
    assert all(k.get("interpret") for k in calls)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


class TestFusedTV:
    """Fully fused embed+stencil+unembed kernel (ops.pallas.tv_fused),
    interpret mode — Mosaic compilation is probed at runtime on TPU."""

    def _compose_reference(self, rows, idx_tv, shape3, lam3):
        """Unfused composition: embed -> XLA stencil -> unembed."""
        import jax.numpy as jnp
        from fibers_tpu.models.rumba import _tv_stencil

        X, Y, Z = shape3
        nxyz = X * Y * Z
        n_rows, Cp = rows.shape
        nmask = len(idx_tv)
        gidx = np.full(nxyz, n_rows, np.int64)
        gidx[idx_tv] = np.arange(nmask)
        rows_p = np.concatenate([rows, np.zeros((1, Cp), np.float32)])
        v = jnp.asarray(rows_p[gidx].reshape(X, Y, Z, Cp))
        tv = np.asarray(_tv_stencil(v, jnp.asarray(lam3)))
        return tv.reshape(nxyz, Cp)[idx_tv]

    def test_kernel_matches_unfused_composition(self, rng):
        import jax.numpy as jnp
        from fibers_tpu.ops.pallas.tv_fused import build_tables, tv_fused

        for X, Y, Z, frac in [(5, 4, 32, 0.5), (4, 8, 16, 0.15),
                              (6, 4, 32, 0.02), (7, 2, 64, 0.95),
                              (4, 5, 26, 0.4), (3, 7, 9, 0.6)]:
            yz = Y * Z
            m = rng.random(X * yz) < frac
            m[3] = True
            idx_tv = np.flatnonzero(m)
            nmask = len(idx_tv)
            Cp = 128
            n_rows = max(yz, ((nmask + 7) // 8) * 8 + 16)
            rows = np.zeros((n_rows, Cp), np.float32)
            rows[:nmask] = rng.random((nmask, Cp)).astype(np.float32)
            lam3 = rng.uniform(0.001, 0.01, (X, Y, Z)).astype(np.float32)

            tabs = build_tables(idx_tv, (X, Y, Z), n_rows)
            assert tabs is not None
            tv_buf = jnp.full((n_rows + yz, Cp), 7.0, jnp.float32)
            out = np.asarray(tv_fused(
                jnp.asarray(rows), tv_buf, jnp.asarray(lam3),
                tabs.lo, tabs.starts, tabs.gl, tabs.inmask, tabs.cellidx,
                (X, Y, Z), cb=128, interpret=True))

            want = self._compose_reference(rows, idx_tv, (X, Y, Z), lam3)
            np.testing.assert_allclose(out[:nmask], want,
                                       rtol=1e-6, atol=1e-6)
            # rows past the last write keep the aliased (donated) values
            top = int(np.asarray(tabs.lo)[-1]) + yz
            if top < out.shape[0]:
                assert (out[top:] == 7.0).all()

    def test_empty_slices_do_not_clobber(self, rng):
        """A slice with no masked cells writes garbage that the next
        slice's (same-offset) write must fully overwrite."""
        import jax.numpy as jnp
        from fibers_tpu.ops.pallas.tv_fused import build_tables, tv_fused

        X, Y, Z = 6, 4, 32
        yz = Y * Z
        m = np.zeros(X * yz, bool)
        m[:yz] = rng.random(yz) < 0.6          # slice 0 populated
        m[3 * yz:4 * yz] = rng.random(yz) < 0.6  # slices 1-2, 4-5 empty
        idx_tv = np.flatnonzero(m)
        nmask = len(idx_tv)
        n_rows = max(yz, nmask + 8)
        rows = np.zeros((n_rows, 128), np.float32)
        rows[:nmask] = rng.random((nmask, 128)).astype(np.float32)
        lam3 = np.full((X, Y, Z), 0.004, np.float32)

        tabs = build_tables(idx_tv, (X, Y, Z), n_rows)
        tv_buf = jnp.ones((n_rows + yz, 128), jnp.float32)
        out = np.asarray(tv_fused(
            jnp.asarray(rows), tv_buf, jnp.asarray(lam3),
            tabs.lo, tabs.starts, tabs.gl, tabs.inmask, tabs.cellidx,
            (X, Y, Z), cb=128, interpret=True))
        want = self._compose_reference(rows, idx_tv, (X, Y, Z), lam3)
        np.testing.assert_allclose(out[:nmask], want, rtol=1e-6,
                                   atol=1e-6)

    def test_rumba_fused_matches_unfused(self, rng, monkeypatch):
        import sys
        sys.path.insert(0, "tests")
        import fibers_tpu as ft
        from phantom import make_phantom

        dwi, mask, _, _ = make_phantom(shape=(6, 5, 4), ndir=30)
        mv = np.asarray(mask.vol).copy()
        mv[rng.random(mv.shape) < 0.3] = 0
        mask.vol = mv

        base = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=10)
        monkeypatch.setenv("FIBERS_TV_FUSED", "interpret")
        fused = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=10)
        np.testing.assert_allclose(np.asarray(fused.fodf.vol),
                                   np.asarray(base.fodf.vol),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fused.var.vol),
                                   np.asarray(base.var.vol),
                                   rtol=1e-6, atol=1e-10)
        assert abs(fused.snr_mean - base.snr_mean) < 1e-3

    def test_rumba_fused_checkpoint_resume(self, rng, monkeypatch,
                                           tmp_path):
        """Checkpoints written under the fused path store UNPADDED
        components and resume identically (also across fused/unfused)."""
        import sys
        sys.path.insert(0, "tests")
        import fibers_tpu as ft
        from phantom import make_phantom

        dwi, mask, _, _ = make_phantom(shape=(4, 4, 4), ndir=30)
        monkeypatch.setenv("FIBERS_TV_FUSED", "interpret")
        full = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=12)

        ck = str(tmp_path / "f.ckpt.npz")
        ft.rumba_rec(dwi, mask, ft.sphere_362, niter=6,
                     checkpoint_path=ck, checkpoint_every=3)
        with np.load(ck) as z:
            state = dict(z)
        assert state["fodf"].shape[1] == int(state["ncomp"])
        state["niter"] = 12
        ck2 = str(tmp_path / "f12.ckpt.npz")
        np.savez(ck2, **state)
        resumed = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=12,
                               checkpoint_path=ck2)
        np.testing.assert_allclose(np.asarray(resumed.fodf.vol),
                                   np.asarray(full.fodf.vol),
                                   rtol=1e-6, atol=1e-7)
        # resume the fused checkpoint on the UNFUSED path too
        monkeypatch.setenv("FIBERS_TV_FUSED", "0")
        resumed2 = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=12,
                                checkpoint_path=ck2)
        np.testing.assert_allclose(np.asarray(resumed2.fodf.vol),
                                   np.asarray(full.fodf.vol),
                                   rtol=1e-5, atol=1e-6)

    def test_rumba_fused_falls_back_on_kernel_failure(self, rng,
                                                      monkeypatch,
                                                      capsys):
        """A full-scale Mosaic failure (probe passed, real shape did
        not) must fall back to the unfused path, not crash the fit."""
        import sys
        sys.path.insert(0, "tests")
        import fibers_tpu as ft
        import fibers_tpu.ops.pallas.tv_fused as tvf
        from phantom import make_phantom

        dwi, mask, _, _ = make_phantom(shape=(5, 4, 4), ndir=30)
        base = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=6)

        def boom(*a, **k):
            raise RuntimeError("Mosaic says no")

        monkeypatch.setenv("FIBERS_TV_FUSED", "interpret")
        monkeypatch.setattr(tvf, "tv_fused", boom)
        rec = ft.rumba_rec(dwi, mask, ft.sphere_362, niter=6)
        assert "falling back" in capsys.readouterr().err
        np.testing.assert_allclose(np.asarray(rec.fodf.vol),
                                   np.asarray(base.fodf.vol),
                                   rtol=1e-6, atol=1e-7)
