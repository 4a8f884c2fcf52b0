"""Pallas TPU kernel: fused GQI reconstruction tile.

One pass per voxel tile: clamp signals, ODF GEMM on the MXU, face-neighbor
peak NMS and per-voxel min/mean on the VPU — the ODF tile is written to HBM
once and never re-read, where the unfused XLA path re-reads the [N, nvert]
ODF for the NMS gather and reductions (~2.5 KB/voxel of extra HBM traffic).

Falls back to the jnp path off-TPU (pallas_call with interpret=True under
tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gqi_fused", "TILE_N"]

TILE_N = 256


def _kernel(sig_ref, a_ref, nbr_ref, nbrok_ref, odf_ref, peakmask_ref,
            stats_ref):
    # signals tile [T, nvol] -> odf tile [T, nvert]
    s = jnp.maximum(sig_ref[:], 0.0)
    odf = jnp.dot(s, a_ref[:], preferred_element_type=jnp.float32)
    odf_ref[:] = odf

    # stats: per-voxel min, mean, and signal validity
    odfmin = odf.min(axis=1)
    odfmean = odf.mean(axis=1)
    valid = (s.max(axis=1) > 0).astype(jnp.float32)
    stats_ref[:, 0] = odfmin
    stats_ref[:, 1] = odfmean
    stats_ref[:, 2] = valid

    # neighbor max via gather along the vertex axis
    nbr = nbr_ref[:]                     # [nvert, maxdeg]
    ok = nbrok_ref[:] != 0
    gathered = odf[:, nbr]               # [T, nvert, maxdeg]
    neg = jnp.float32(-jnp.inf)
    nbr_max = jnp.where(ok[None], gathered, neg).max(axis=2)
    peakmask_ref[:] = (odf > nbr_max).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gqi_fused(signals, A_t, nbr, nbr_ok_i, interpret=False):
    """signals [N, nvol] (N multiple of TILE_N), A_t [nvol, nvert] (the
    transposed system matrix), nbr/nbr_ok_i [nvert, maxdeg].

    Returns (odf [N, nvert], peak_mask [N, nvert] (0/1), stats [N, 3]
    (min, mean, valid)).
    """
    n, nvol = signals.shape
    nvert = A_t.shape[1]
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
            pl.BlockSpec((nvert, nbr.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nvert, nbr.shape[1]), lambda i: (0, 0),
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
    )(signals, A_t, nbr, nbr_ok_i)
    return odf, peakmask, stats
