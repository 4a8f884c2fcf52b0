"""Batched closed-form eigendecomposition of symmetric 3x3 matrices.

Fully vectorized elementwise math (no per-matrix LAPACK calls), so XLA fuses
it into surrounding code and it runs on the VPU at memory bandwidth.  This
replaces the reference's per-voxel StaticArrays `eigen(Symmetric(D))` calls
(reference: src/dti.jl:307-311, src/structens.jl:23-28).

Eigenvalues by the trigonometric (Smith) method; eigenvectors by cross
products of rows of (A - lambda I), picking the best-conditioned pair, with
graceful fallbacks for (near-)degenerate spectra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["eigvalsh3", "eigh3"]

_EPS = 1e-30


def _sym_from_unique(u):
    """[..., 6] (xx, xy, xz, yy, yz, zz) -> [..., 3, 3] symmetric."""
    xx, xy, xz, yy, yz, zz = (u[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def eigvalsh3(u):
    """Eigenvalues (descending) of symmetric 3x3 matrices.

    `u` is [..., 6] with unique elements (xx, xy, xz, yy, yz, zz).
    Returns [..., 3] with l1 >= l2 >= l3.
    """
    xx, xy, xz, yy, yz, zz = (u[..., i] for i in range(6))

    q = (xx + yy + zz) / 3.0
    bxx, byy, bzz = xx - q, yy - q, zz - q
    p2 = (bxx * bxx + byy * byy + bzz * bzz
          + 2.0 * (xy * xy + xz * xz + yz * yz)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))

    # det(B) / (2 p^3)
    detb = (bxx * (byy * bzz - yz * yz)
            - xy * (xy * bzz - yz * xz)
            + xz * (xy * yz - byy * xz))
    r = jnp.clip(detb / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    l1 = q + 2.0 * p * jnp.cos(phi)
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l2 = 3.0 * q - l1 - l3

    iso = p2 <= _EPS  # (near-)isotropic: all eigenvalues equal q
    l1 = jnp.where(iso, q, l1)
    l2 = jnp.where(iso, q, l2)
    l3 = jnp.where(iso, q, l3)
    return jnp.stack([l1, l2, l3], axis=-1)


def _null_vector(m):
    """Unit vector (approximately) in the null space of symmetric [...,3,3]
    m, via the largest cross product of row pairs."""
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = (c01 * c01).sum(-1)
    n02 = (c02 * c02).sum(-1)
    n12 = (c12 * c12).sum(-1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
    c = jnp.take_along_axis(
        jnp.stack([c01, c02, c12], axis=-2), best[..., None, None], axis=-2
    )[..., 0, :]
    norm2 = (c * c).sum(-1, keepdims=True)
    ok = norm2 > _EPS
    c = jnp.where(ok, c / jnp.sqrt(jnp.maximum(norm2, _EPS)),
                  jnp.zeros_like(c).at[..., 0].set(1.0))
    return c, ok[..., 0]


def _any_orthonormal(v):
    """A unit vector orthogonal to unit vector v."""
    # Pick the coordinate axis least aligned with v, project out, normalize
    ax = jnp.argmin(jnp.abs(v), axis=-1)
    e = jnp.zeros_like(v)
    e = e.at[..., :].set(0.0)
    one = jnp.ones(v.shape[:-1], v.dtype)
    e = e.at[..., 0].set(jnp.where(ax == 0, one, 0.0))
    e = e.at[..., 1].set(jnp.where(ax == 1, one, 0.0))
    e = e.at[..., 2].set(jnp.where(ax == 2, one, 0.0))
    w = e - (e * v).sum(-1, keepdims=True) * v
    return w / jnp.sqrt(jnp.maximum((w * w).sum(-1, keepdims=True), _EPS))


def eigh3(u):
    """Eigen-decomposition of symmetric 3x3 matrices.

    `u` is [..., 6] with unique elements (xx, xy, xz, yy, yz, zz).
    Returns (evals [..., 3] descending, evecs [..., 3, 3]) with
    evecs[..., :, k] the unit eigenvector for evals[..., k].
    Within (near-)degenerate eigenspaces the basis is arbitrary but
    orthonormal, as with any eigensolver.
    """
    a = _sym_from_unique(u)
    evals = eigvalsh3(u)
    eye = jnp.eye(3, dtype=u.dtype)

    v1, ok1 = _null_vector(a - evals[..., 0, None, None] * eye)
    v3, ok3 = _null_vector(a - evals[..., 2, None, None] * eye)

    # Degenerate handling: if v1 failed (l1 ~= l2) build it orthogonal to
    # v3; if v3 failed build orthogonal to v1; if both failed (isotropic)
    # fall back to coordinate axes.
    both_bad = ~ok1 & ~ok3
    v1 = jnp.where(both_bad[..., None],
                   jnp.zeros_like(v1).at[..., 0].set(1.0), v1)
    v3 = jnp.where((~ok3 & ok1)[..., None], _any_orthonormal(v1), v3)
    v1 = jnp.where((~ok1)[..., None], _any_orthonormal(v3), v1)
    # Re-orthogonalize v3 against v1 (cheap, improves near-degenerate cases)
    v3 = v3 - (v3 * v1).sum(-1, keepdims=True) * v1
    v3 = v3 / jnp.sqrt(jnp.maximum((v3 * v3).sum(-1, keepdims=True), _EPS))

    v2 = jnp.cross(v3, v1)

    evecs = jnp.stack([v1, v2, v3], axis=-1)

    # Rayleigh-quotient refinement: the f32 trigonometric eigenvalues lose
    # ~1e-4 relative accuracy near degenerate spectra; v' A v recovers it
    # (error is O(sin^2 theta) in the eigenvector angle error).
    rq = jnp.einsum("...ik,...ij,...jk->...k", evecs, a, evecs,
                    precision=jax.lax.Precision.HIGHEST)
    order = jnp.argsort(-rq, axis=-1)
    evals = jnp.take_along_axis(rq, order, axis=-1)
    evecs = jnp.take_along_axis(evecs, order[..., None, :], axis=-1)
    return evals, evecs
