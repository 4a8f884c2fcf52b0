"""Fused TPU kernel for the RUMBA-SD total-variation stencil.

One pass over a channels-minor [X, Y, Z, C] component stack computes the
TV multiplier 1/(|1 - lambda*div(grad v/|grad v|)| + eps) that the XLA
path (`models.rumba._tv_stencil`) assembles from ~10 materialized
full-volume intermediates (gx/gy/gz, norm, normalized gradients, three
divergence terms).  Measured at HCP scale the XLA stencil moves ~30x the
speed-of-light HBM traffic (183 ms for work whose minimal read+write is
~6 ms); this kernel reads each x-slice once, keeps the running state in
VMEM, and writes the multiplier directly.

Structure: the grid is (component-chunks, X) with X innermost — TPU grid
steps run sequentially on the core, so VMEM scratch carries the
normalized x-gradient of the previous slice across steps (the divergence
at x needs gxn[x] - gxn[x-1]).  The x+1 neighbor arrives as a second
view of the same input with a clamped index map, which reproduces the
reference's clamped-edge semantics exactly (gx at the last slice is 0,
divergence lead/last rows fall out of the zero-padded differences; see
models.rumba._tv_stencil and reference src/rusd.jl:183-235).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["tv_multiplier", "tv_available", "TV_VMEM_BUDGET",
           "TV_LIVE_BUFFERS"]

# Mosaic VMEM budget the kernel compiles under, and the number of
# [Y, Z, cb] f32 buffers live at once inside one grid step (center +
# x+1 views, three gradients, three normalized gradients, the scratch
# slice, and the output — callers size their component chunk so
# Y*Z*cb*4*TV_LIVE_BUFFERS stays below TV_VMEM_BUDGET).
TV_VMEM_BUDGET = 100 * 1024 * 1024
TV_LIVE_BUFFERS = 10


def _tv_kernel(v_ref, vn_ref, lam_ref, out_ref, prev_gxn_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)

    v = v_ref[0]                       # [Y, Z, C]
    vn = vn_ref[0]

    # Forward differences, clamped upper edge (gx at X-1 is vn==v -> 0).
    # bf16 inputs: the differences run in bf16 (halving the input read)
    # but sqrt/divide move to f32 — the v5e EUP has no bf16 ops.
    gx = (vn - v).astype(jnp.float32)
    gy = (jnp.concatenate([v[1:], v[-1:]], axis=0) - v).astype(jnp.float32)
    gz = (jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)
          - v).astype(jnp.float32)

    # One divide + three multiplies instead of three divides: the kernel
    # is EUP-bound (bf16 inputs only bought 6%), and divide/sqrt are the
    # multi-cycle ops.  g * (1/norm) rounds within 1 ulp of g / norm and
    # keeps cross-backend parity with the XLA stencil, which uses the
    # identical formulation.
    ninv = 1.0 / jnp.sqrt(gx * gx + gy * gy + gz * gz + 1e-7)
    gxn = gx * ninv
    gyn = gy * ninv
    gzn = gz * ninv

    @pl.when(i == 0)
    def _():
        prev_gxn_ref[...] = jnp.zeros_like(prev_gxn_ref)

    # Divergence: lead row = g[0], mid = g[i]-g[i-1], last = -g[n-2]
    # (g[n-1] is 0 by the clamped gradient, so the generic difference
    # reproduces the boundary rows exactly)
    ddx = gxn - prev_gxn_ref[...]
    ddy = gyn - jnp.concatenate([jnp.zeros_like(gyn[:1]), gyn[:-1]],
                                axis=0)
    ddz = gzn - jnp.concatenate([jnp.zeros_like(gzn[:, :1]), gzn[:, :-1]],
                                axis=1)
    div = (ddx + ddy + ddz).astype(jnp.float32)

    lam = lam_ref[0][..., None]
    out_ref[0] = 1.0 / (jnp.abs(1.0 - lam * div) + 1e-7)

    prev_gxn_ref[...] = gxn


@partial(jax.jit, static_argnames=("cb", "interpret"))
def tv_multiplier(vol4, lam3, cb=128, interpret=False):
    """TV multiplier volume for a [X, Y, Z, C] component stack.

    `vol4` may be float32 or bfloat16 (the stencil runs in its dtype;
    the multiplier is always float32).  C must be a multiple of `cb`.
    `lam3` is the [X, Y, Z] regularization weight volume.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    X, Y, Z, C = vol4.shape
    if C % cb:
        raise ValueError(f"C={C} not a multiple of the chunk {cb}")
    nc = C // cb

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=TV_VMEM_BUDGET)

    return pl.pallas_call(
        _tv_kernel,
        grid=(nc, X),
        in_specs=[
            pl.BlockSpec((1, Y, Z, cb), lambda c, i: (i, 0, 0, c)),
            pl.BlockSpec((1, Y, Z, cb),
                         lambda c, i: (jnp.minimum(i + 1, X - 1), 0, 0, c)),
            pl.BlockSpec((1, Y, Z), lambda c, i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Y, Z, cb), lambda c, i: (i, 0, 0, c)),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Y, Z, cb), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(vol4, vol4, lam3)   # same stack twice: center + clamped x+1 view


def tv_available():
    """Whether the fused kernel can run on the current default backend."""
    return jax.default_backend() == "tpu"


def interpret_forced():
    """Whether FIBERS_TV_INTERPRET=1 asks for the Pallas kernel in
    interpret mode — the CPU-mesh test hook for the shard_map TV path
    (the real Mosaic kernel needs a TPU)."""
    import os

    return os.environ.get("FIBERS_TV_INTERPRET") == "1"
