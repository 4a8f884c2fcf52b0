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
