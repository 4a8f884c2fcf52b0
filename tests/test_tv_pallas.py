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
