"""TV-stencil kernel variant experiment (not part of the benchmark queue).

Times the production tv_multiplier against variants: (a) declaring the
component-chunk grid axis parallel via dimension_semantics, (b) 2-slice
x-blocks (halved grid steps, doubled DMA size).  Run manually between
recorder activities; informs whether to change the production kernel.

Findings (2026-08-17, tunneled v5e, a ~1.2x-slow window):
  production 41.0 ms / dimsem 41.6 ms — the parallel component axis does
  not help (the x axis, which carries the running-divergence dependency,
  already bounds the pipeline).  2slice-cb64 cannot lower: Mosaic
  requires the minor block dim divisible by 128 (or the full axis), and
  cb=128 with 2 slices exceeds the 100 MB VMEM budget (107.8 MB).  The
  production kernel stands.
"""

import time
import sys

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fibers_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from functools import partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fibers_tpu.ops.pallas.tv_stencil import (TV_VMEM_BUDGET, _tv_kernel,
                                              tv_multiplier)


@partial(jax.jit, static_argnames=("cb",))
def tv_dimsem(vol4, lam3, cb=128):
    X, Y, Z, C = vol4.shape
    nc = C // cb
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=TV_VMEM_BUDGET,
            dimension_semantics=("parallel", "arbitrary")),
    )(vol4, vol4, lam3)


def _tv_kernel2(v_ref, vn_ref, lam_ref, out_ref, prev_gxn_ref):
    """Two x-slices per grid step."""
    i = pl.program_id(1)

    def slice_step(v, vn, lam, prev_gxn):
        gx = (vn - v).astype(jnp.float32)
        gy = (jnp.concatenate([v[1:], v[-1:]], axis=0) - v
              ).astype(jnp.float32)
        gz = (jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1) - v
              ).astype(jnp.float32)
        norm = jnp.sqrt(gx * gx + gy * gy + gz * gz + 1e-7)
        gxn, gyn, gzn = gx / norm, gy / norm, gz / norm
        ddx = gxn - prev_gxn
        ddy = gyn - jnp.concatenate(
            [jnp.zeros_like(gyn[:1]), gyn[:-1]], axis=0)
        ddz = gzn - jnp.concatenate(
            [jnp.zeros_like(gzn[:, :1]), gzn[:, :-1]], axis=1)
        div = (ddx + ddy + ddz).astype(jnp.float32)
        out = 1.0 / (jnp.abs(1.0 - lam[..., None] * div) + 1e-7)
        return out, gxn

    @pl.when(i == 0)
    def _():
        prev_gxn_ref[...] = jnp.zeros_like(prev_gxn_ref)

    v0, v1 = v_ref[0], v_ref[1]
    # clamped x+1 for the volume's last slice: its neighbor is itself
    # (gx = 0), but the clamped BLOCK index points at [X-2, X-1]
    vn1 = jnp.where(i == pl.num_programs(1) - 1, v1, vn_ref[0])
    out0, gxn0 = slice_step(v0, v1, lam_ref[0], prev_gxn_ref[...])
    out1, gxn1 = slice_step(v1, vn1, lam_ref[1], gxn0)
    out_ref[0] = out0
    out_ref[1] = out1
    prev_gxn_ref[...] = gxn1


@partial(jax.jit, static_argnames=("cb",))
def tv_2slice(vol4, lam3, cb=128):
    X, Y, Z, C = vol4.shape
    assert X % 2 == 0
    nc = C // cb
    return pl.pallas_call(
        _tv_kernel2,
        grid=(nc, X // 2),
        in_specs=[
            pl.BlockSpec((2, Y, Z, cb), lambda c, i: (i, 0, 0, c)),
            pl.BlockSpec((2, Y, Z, cb),
                         lambda c, i: (jnp.minimum(i + 1, X // 2 - 1),
                                       0, 0, c)),
            pl.BlockSpec((2, Y, Z), lambda c, i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, Y, Z, cb), lambda c, i: (i, 0, 0, c)),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Y, Z, cb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=TV_VMEM_BUDGET,
            dimension_semantics=("parallel", "arbitrary")),
    )(vol4, vol4, lam3)


def main():
    X, Y, Z, C = 128, 130, 90, 128
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.random((X, Y, Z, C)).astype(np.float32))
    lam = jnp.full((X, Y, Z), 0.004, jnp.float32)
    bts = X * Y * Z * C * 4 * 3

    base = tv_multiplier(v, lam)   # parity errors reduced ON device:
    maxerr = jax.jit(lambda a, b: jnp.abs(a - b).max())
    for name, f in (("production", lambda: tv_multiplier(v, lam)),
                    ("dimsem", lambda: tv_dimsem(v, lam)),
                    ("2slice-cb64", lambda: tv_2slice(v, lam, cb=64))):
        out = f()
        float(out[0, 0, 0, 0])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f()
            float(out[0, 0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        err = float(maxerr(out, base))
        print(f"{name}: {best*1000:.1f} ms ({bts/best/1e9:.0f} GB/s) "
              f"maxerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
