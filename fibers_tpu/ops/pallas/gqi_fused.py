"""Pallas TPU kernel: fused GQI reconstruction tile.

One pass per voxel tile: clamp signals, ODF GEMM on the MXU, face-neighbor
peak NMS and per-voxel min/mean on the VPU — the ODF tile is written to HBM
once and never re-read, where the unfused XLA path re-reads the [N, nvert]
ODF for the NMS gather and reductions (~2.5 KB/voxel of extra HBM traffic).

Mosaic has no general in-kernel gather, so the neighbor lookup is phrased
as `maxdeg` one-hot permutation matmuls (nvert x nvert, a few MB in VMEM):
y_k = odf @ P_k gives each vertex its k-th face neighbor's amplitude, and
the NMS max-reduces over k.  maxdeg is 6 on these tessellations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gqi_fused", "neighbor_permutations", "TILE_N"]

TILE_N = 256


def neighbor_permutations(nbr: np.ndarray, nbr_ok: np.ndarray):
    """[maxdeg, nvert, nvert] one-hot matrices P with P[k, nbr[v,k], v] = 1
    for valid neighbors, plus a [1, nvert] row-mask of any-valid-k (unused
    entries yield 0 through P and are masked to -inf via `okmask`)."""
    nvert, maxdeg = nbr.shape
    P = np.zeros((maxdeg, nvert, nvert), np.float32)
    for k in range(maxdeg):
        v = np.arange(nvert)
        valid = nbr_ok[:, k]
        P[k, nbr[valid, k], v[valid]] = 1.0
    okmask = nbr_ok.T.astype(np.float32)          # [maxdeg, nvert]
    return P, okmask


def _kernel(sig_ref, a_ref, p_ref, ok_ref, odf_ref, peakmask_ref,
            stats_ref):
    s = jnp.maximum(sig_ref[:], 0.0)
    odf = jnp.dot(s, a_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    odf_ref[:] = odf

    odfmin = odf.min(axis=1)
    odfmean = odf.mean(axis=1)
    valid = (s.max(axis=1) > 0).astype(jnp.float32)
    stats_ref[:, 0] = odfmin
    stats_ref[:, 1] = odfmean
    stats_ref[:, 2] = valid

    # neighbor max via one-hot matmuls over the maxdeg axis
    maxdeg = p_ref.shape[0]
    neg = jnp.float32(-jnp.inf)
    nbr_max = jnp.full_like(odf, neg)
    for k in range(maxdeg):
        yk = jnp.dot(odf, p_ref[k], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        yk = jnp.where(ok_ref[k][None, :] > 0, yk, neg)
        nbr_max = jnp.maximum(nbr_max, yk)
    peakmask_ref[:] = (odf > nbr_max).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gqi_fused(signals, A_t, P, okmask, interpret=False):
    """signals [N, nvol] (N multiple of TILE_N), A_t [nvol, nvert], P/okmask
    from `neighbor_permutations`.

    Returns (odf [N, nvert], peak_mask [N, nvert] (0/1), stats [N, 3]
    (min, mean, valid)).
    """
    n, nvol = signals.shape
    nvert = A_t.shape[1]
    maxdeg = P.shape[0]
    grid = (n // TILE_N,)

    out_shapes = (
        jax.ShapeDtypeStruct((n, nvert), jnp.float32),
        jax.ShapeDtypeStruct((n, nvert), jnp.float32),
        jax.ShapeDtypeStruct((n, 3), jnp.float32),
    )
    odf, peakmask, stats = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, nvol), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nvol, nvert), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((maxdeg, nvert, nvert), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((maxdeg, nvert), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_N, nvert), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, nvert), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(signals, A_t, P, okmask)
    return odf, peakmask, stats
