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
