"""Fully fused TPU kernel for the RUMBA-SD TV term: mask embed + stencil
+ mask unembed in ONE pass over the batch rows.

The unfused path (models.rumba._tv_term) moves ~16 GB of HBM traffic per
iteration at HCP scale: a pad copy of the fODF rows, a gather embedding
them into the dense [X, Y, Z, C] TV grid, the stencil itself, and a
gather compacting the multiplier back to rows — and the two gathers run
at only ~194 GB/s (54% of the stencil kernel's rate).  This kernel reads
the fODF ROW TABLE directly and writes the multiplier ROW TABLE directly
(~6 GB/iter), exploiting one structural fact: batch rows are in
volume-scan order (ops.masked.mask_indices sorts flat indices), so the
rows belonging to one x-slice of the TV grid are a single contiguous
range [lo[x], lo[x]+cnt[x]).

Per grid step (component-chunk c, slice x — x innermost, sequential on
the core):
  1. one dynamic-offset DMA pulls the row window for slice x+1 from HBM
     into VMEM (window size is a static YZ rows; the start is clamped so
     the window always fits the table),
  2. an in-VMEM sublane gather (take_along_axis over axis 0, [YZ, 1]
     indices) + mask expands the window into the dense slice
     (out-of-mask cells -> 0, exactly like the unfused embed whose
     padding row is zero),
  3. the stencil runs with arithmetic identical to
     ops.pallas.tv_stencil._tv_kernel, but formulated on the FLAT
     [YZ, C] slice: the y/z shifts become sublane shifts by Z/1 with
     iota masks reproducing the clamped-edge/boundary-row semantics
     exactly (no [YZ]->[Y,Z] reshape, which Mosaic cannot relayout for
     Z not a sublane multiple).  The center slice is carried in VMEM
     from the previous step.
  4. a second sublane gather compacts the dense multiplier back into row
     order and one DMA writes YZ rows at offset lo[x].  Writes overlap
     across steps; steps run in slice order and each write starts
     exactly where the previous slice's real rows ended (lo[x+1] =
     lo[x] + cnt[x]), so every real row's FINAL value is its own
     slice's multiplier.  Rows past the last write keep the aliased
     previous-iteration buffer's values (finite by induction; they only
     ever multiply identically-zero padding fODF rows).

(reference: src/rusd.jl:183-235, 282-296 — the TV gradient/divergence
term; the embed/compact structure has no reference counterpart, it is
the TPU-side inverse of the reference's per-component scatter/gather.)

Backend status (2026-08-19, libtpu on the v5e): Mosaic lowers the
sublane `take_along_axis` to `tpu.dynamic_gather`, whose current
lowering supports only a SINGLE source vreg (8 f32 sublanes) along the
gather dimension — any yz > 8 slice fails with "Not implemented:
Multiple source vregs along gather dimension".  The monotone-window
decomposition (each 8-row destination vreg reads an 8-row source window
at offset gl[8k], so the local gather is single-vreg) is correct but
degenerates to a per-vreg fori_loop (~1600 iterations/slice), costing
about the same as the XLA gathers it would replace (~22 ms/direction at
HCP scale) — the VPU processes one vreg per ~15 cycles instead of one
per cycle.  Until Mosaic grows a multi-vreg gather (or a compaction
primitive), `fused_probe_ok()` returns False on real TPUs and RUMBA
uses the unfused tv_stencil path; the kernel remains exact in interpret
mode (tests/test_tv_pallas.py) and self-enables the day the lowering
lands.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FusedTVTables", "build_tables", "tv_fused", "fused_viable",
           "fused_probe_ok", "TV_FUSED_LIVE_BUFFERS"]

# live [YZ, cb] f32 buffers inside one grid step: 4 scratch (v_curr,
# v_next, prev_gxn, row window) plus ~10 stencil temporaries the Mosaic
# scheduler keeps in flight (gx/gy/gz, ninv, gxn/gyn/gzn, div, tv,
# compact).  Callers gate on YZ*cb*4*TV_FUSED_LIVE_BUFFERS against the
# tv_stencil VMEM budget.
TV_FUSED_LIVE_BUFFERS = 14
_LANE = 128


@dataclass(frozen=True)
class FusedTVTables:
    """Iteration-invariant index tables for the fused TV kernel (device
    arrays; built once per rumba_rec call).  The per-cell tables are
    stored as [X*YZp, 1] COLUMNS so the kernel sees them as [YZp, 1]
    blocks (2-D sublane vectors, the layout Mosaic gathers want)."""
    lo: "jnp.ndarray"        # [X] i32: first batch row of slice x
    starts: "jnp.ndarray"    # [X] i32: clamped input-DMA window start
    gl: "jnp.ndarray"        # [X*YZp, 1] i32: cell -> window-local row
    inmask: "jnp.ndarray"    # [X*YZp, 1] f32: 1 for in-mask cells
    cellidx: "jnp.ndarray"   # [X*YZp, 1] i32: local row -> local cell
    shape3: tuple            # static (X, Y, Z) of the TV grid
    n_rows: int              # static row-table length


def _pad_cols(a: np.ndarray, yzp: int) -> np.ndarray:
    """[X, yz] -> [X*yzp, 1] with per-slice lane padding."""
    x, yz = a.shape
    return np.pad(a, ((0, 0), (0, yzp - yz))).reshape(x * yzp, 1)


def build_tables(idx_tv: np.ndarray, tv_shape3, n_rows: int):
    """Build the kernel's index tables from the mask's TV-crop flat
    indices (ascending — batch rows ARE mask-scan order).

    Returns None when the fused kernel cannot run on this problem
    (fewer table rows than one slice's cells)."""
    X, Y, Z = (int(s) for s in tv_shape3)
    yz = Y * Z
    if n_rows < yz or len(idx_tv) == 0:
        return None
    yzp = ((yz + 7) // 8) * 8
    nmask = len(idx_tv)

    lo = np.searchsorted(idx_tv, np.arange(X, dtype=np.int64) * yz)
    lo = lo.astype(np.int32)
    hi = np.concatenate([lo[1:], np.int32([nmask])])
    starts = np.minimum(lo, n_rows - yz).astype(np.int32)

    ranks = np.full(X * yz, -1, np.int32)
    ranks[idx_tv] = np.arange(nmask, dtype=np.int32)
    ranks = ranks.reshape(X, yz)
    inm = ranks >= 0
    gl = np.where(inm, ranks - starts[:, None], 0).astype(np.int32)

    cellidx = np.zeros((X, yz), np.int32)
    for x in range(X):
        cells = (idx_tv[lo[x]:hi[x]] - x * yz).astype(np.int32)
        cnt = len(cells)
        if cnt:
            cellidx[x, :cnt] = cells
            cellidx[x, cnt:] = cells[-1]
        # cnt == 0: all-zero indices; garbage rows are overwritten by
        # the next slice (its write starts at the same lo) or land in
        # the padding tail

    return FusedTVTables(
        lo=jnp.asarray(lo), starts=jnp.asarray(starts),
        gl=jnp.asarray(_pad_cols(gl, yzp)),
        inmask=jnp.asarray(_pad_cols(inm.astype(np.float32), yzp)),
        cellidx=jnp.asarray(_pad_cols(cellidx, yzp)),
        shape3=(X, Y, Z), n_rows=n_rows)


def fused_viable(tv_shape3, n_rows: int, cb: int) -> bool:
    """Whether the fused kernel fits this problem: the row table must
    cover one slice window and the live VMEM buffers must fit the
    Mosaic budget."""
    from .tv_stencil import TV_VMEM_BUDGET
    X, Y, Z = (int(s) for s in tv_shape3)
    yz = Y * Z
    return (n_rows >= yz
            and yz * cb * 4 * TV_FUSED_LIVE_BUFFERS < TV_VMEM_BUDGET)


_probe_result = None


def fused_probe_ok() -> bool:
    """Compile + run a tiny instance of the fused kernel on the current
    backend ONCE per process; False (with a warning) if Mosaic rejects
    it — callers then fall back to the unfused TV path.  The kernel
    leans on two Mosaic features that are probe-worthy: dynamic-offset
    HBM DMAs and in-VMEM sublane gathers (take_along_axis, axis 0)."""
    global _probe_result
    if _probe_result is None:
        import sys
        try:
            X, Y, Z = 2, 8, 16
            yz = Y * Z
            n_rows = 2 * yz
            idx_tv = np.arange(0, X * yz, 2, dtype=np.int64)
            tabs = build_tables(idx_tv, (X, Y, Z), n_rows)
            rows = jnp.zeros((n_rows, _LANE), jnp.float32)
            buf = jnp.ones((n_rows + yz, _LANE), jnp.float32)
            lam3 = jnp.full((X, Y, Z), 0.004, jnp.float32)
            out = tv_fused(rows, buf, lam3, tabs.lo, tabs.starts,
                           tabs.gl, tabs.inmask, tabs.cellidx, (X, Y, Z))
            # force execution (block_until_ready is a no-op on some
            # tunneled runtimes; a one-element fetch is not)
            assert np.isfinite(float(out[0, 0]))
            _probe_result = True
        except Exception as e:          # pragma: no cover - backend dep
            sys.stderr.write(
                f"fibers_tpu.tv_fused: fused TV kernel unavailable on "
                f"this backend ({type(e).__name__}: {e}); RUMBA falls "
                "back to the unfused TV path\n")
            _probe_result = False
    return _probe_result


def _kernel(yz, z_len, cb, lo_ref, st_ref, glc_ref, inc_ref, gln_ref,
            inn_ref, cell_ref, lam_ref, rows_hbm, prev_hbm, out_hbm,
            vcur, vnext, pgxn, rwin, isem, osem):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = pl.program_id(0)
    x = pl.program_id(1)
    nx = pl.num_programs(1)

    def expand(start, gl_ref, in_ref, dst):
        cp = pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start, yz), pl.ds(c * cb, cb)], rwin, isem)
        cp.start()
        cp.wait()
        # Mosaic's gather (tpu.dynamic_gather) needs indices of the
        # operand's exact [yz, cb] shape (lane-batched sublane gather);
        # broadcast the [yz, 1] column — in bounds by construction.
        gl = jnp.broadcast_to(gl_ref[:yz], (yz, cb))
        msk = in_ref[:yz]                      # [yz, 1] f32
        dst[...] = jnp.where(
            msk > 0,
            jnp.take_along_axis(rwin[...], gl, axis=0,
                                mode="promise_in_bounds"),
            0.0)

    @pl.when(x == 0)
    def _():
        expand(st_ref[0], glc_ref, inc_ref, vcur)
        pgxn[...] = jnp.zeros_like(pgxn)

    @pl.when(x != 0)
    def _():
        vcur[...] = vnext[...]

    xn = jnp.minimum(x + 1, nx - 1)
    expand(st_ref[xn], gln_ref, inn_ref, vnext)

    # Stencil on the FLAT [yz, cb] slice (row-major cells, j = y*Z + z):
    # arithmetic identical to tv_stencil._tv_kernel.  The y neighbor is
    # a sublane shift by Z (the tail Z rows read themselves -> gy = 0,
    # the clamped upper edge); the z neighbor is a shift by 1 with the
    # last-z rows masked to 0 (their flat neighbor is the next row's
    # first cell, but the clamped edge makes the true gradient 0).
    v = vcur[...]
    vn = vnext[...]
    zi = jax.lax.broadcasted_iota(jnp.int32, (yz, 1), 0) % z_len
    lastz = zi == (z_len - 1)
    firstz = zi == 0

    gx = vn - v
    gy = jnp.concatenate([v[z_len:], v[yz - z_len:]], axis=0) - v
    gz = jnp.where(lastz, 0.0,
                   jnp.concatenate([v[1:], v[yz - 1:]], axis=0) - v)

    ninv = 1.0 / jnp.sqrt(gx * gx + gy * gy + gz * gz + 1e-7)
    gxn = gx * ninv
    gyn = gy * ninv
    gzn = gz * ninv

    # Divergence: lead row = g[0], mid = g[j] - g[j-neighbor], last =
    # -g[n-2] (the clamped gradient is 0 at the upper edge, so the
    # generic difference reproduces the boundary rows exactly)
    ddx = gxn - pgxn[...]
    ddy = gyn - jnp.concatenate(
        [jnp.zeros_like(gyn[:z_len]), gyn[:yz - z_len]], axis=0)
    ddz = gzn - jnp.where(
        firstz, 0.0,
        jnp.concatenate([jnp.zeros_like(gzn[:1]), gzn[:-1]], axis=0))
    div = ddx + ddy + ddz

    lam = lam_ref[:yz]                         # [yz, 1] f32
    tv = 1.0 / (jnp.abs(1.0 - lam * div) + 1e-7)

    pgxn[...] = gxn

    # Compact to row order and write at this slice's row offset; the
    # write is serialized within the step so the next (overlapping)
    # slice's write lands after it.
    rwin[...] = jnp.take_along_axis(
        tv, jnp.broadcast_to(cell_ref[:yz], (yz, cb)), axis=0,
        mode="promise_in_bounds")
    ocp = pltpu.make_async_copy(
        rwin, out_hbm.at[pl.ds(lo_ref[x], yz), pl.ds(c * cb, cb)], osem)
    ocp.start()
    ocp.wait()


@partial(jax.jit, static_argnames=("shape3", "cb", "interpret"))
def tv_fused(rows, tv_buf, lam3, lo, starts, gl, inmask, cellidx,
             shape3, cb=_LANE, interpret=False):
    """Fused TV multiplier over a row table.

    rows:   [R, Cp] f32 fODF rows, Cp a multiple of cb, rows >= nmask
            identically zero, R >= Y*Z.
    tv_buf: [R + Y*Z, Cp] f32 previous multiplier buffer (DONATED: the
            result aliases it; rows the kernel never writes keep their
            old — finite — values).
    lam3:   [X, Y, Z] f32 regularization weights.
    Returns the new [R + Y*Z, Cp] buffer; rows [:R] are the multiplier.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    X, Y, Z = shape3
    yz = Y * Z
    yzp = ((yz + 7) // 8) * 8
    R, Cp = rows.shape
    if Cp % cb:
        raise ValueError(f"Cp={Cp} not a multiple of cb={cb}")
    if tv_buf.shape != (R + yz, Cp):
        raise ValueError(f"tv_buf shape {tv_buf.shape} != {(R + yz, Cp)}")
    nc = Cp // cb

    # lam as [X*yzp, 1] columns, padded per slice (cheap: ~6 MB/iter)
    lam_cols = jnp.pad(lam3.reshape(X, yz),
                       ((0, 0), (0, yzp - yz))).reshape(X * yzp, 1)

    kwargs = {}
    if not interpret:
        from .tv_stencil import TV_VMEM_BUDGET
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=TV_VMEM_BUDGET)

    col = pl.BlockSpec((yzp, 1), lambda c, x: (x, 0))
    coln = pl.BlockSpec((yzp, 1), lambda c, x: (jnp.minimum(x + 1, X - 1),
                                                0))
    return pl.pallas_call(
        partial(_kernel, yz, Z, cb),
        grid=(nc, X),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),          # starts
            col,                                            # gl center
            col,                                            # inmask c.
            coln,                                           # gl next
            coln,                                           # inmask n.
            col,                                            # cellidx
            col,                                            # lam cols
            pl.BlockSpec(memory_space=pl.ANY),              # rows
            pl.BlockSpec(memory_space=pl.ANY),              # prev tv
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((R + yz, Cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((yz, cb), jnp.float32),
                        pltpu.VMEM((yz, cb), jnp.float32),
                        pltpu.VMEM((yz, cb), jnp.float32),
                        pltpu.VMEM((yz, cb), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={9: 0},
        interpret=interpret,
        **kwargs,
    )(lo, starts, gl, inmask, gl, inmask, cellidx, lam_cols,
      rows, tv_buf)
