"""Fused vs unfused RUMBA TV iteration at HCP scale, slope-timed.

Measures the FULL _rumba_block iteration (GEMMs + Bessel + TV) with the
fused embed+stencil+unembed Pallas kernel on and off, as the slope of
k-chained iterations in one dispatch (the RTT-free quantity; see
bench_mfu.py).  This is the decision metric for the fused kernel: the
VERDICT-4 target is 84 ms/iter -> <=70 ms at HCP scale.

  python benchmarks/bench_tv_fused.py          # ~2 min warm, on TPU

Prints one JSON line {"metric": "rumba_iter_ms", ...} with both
variants.
"""

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FIBERS_JAX_CACHE", "/tmp/fibers_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

# HCP scale (BASELINE.md config 4)
N = 720896
NDIR = 254
NCOMP = 364
X, Y, Z = 128, 130, 90

K_LO, K_HI = 2, 6


def _mask_idx(rng):
    """Ellipsoid-ish mask of the TV grid with exactly N cells."""
    yz = Y * Z
    x, y, z = np.meshgrid(np.linspace(-1, 1, X), np.linspace(-1, 1, Y),
                          np.linspace(-1, 1, Z), indexing="ij")
    score = x ** 2 / 0.81 + y ** 2 / 0.81 + z ** 2 / 0.92
    order = np.argsort(score.reshape(-1), kind="stable")
    return np.sort(order[:N]).astype(np.int64)


def _time_block(fused: bool, idx_tv, rng):
    from fibers_tpu.models.rumba import _rumba_block
    from fibers_tpu.ops.pallas.tv_fused import build_tables

    cpad = (-NCOMP) % 128 if fused else 0
    cp = NCOMP + cpad
    nxyz = X * Y * Z
    yz = Y * Z

    sig = jnp.asarray(rng.random((N, NDIR), np.float32))
    ker = jnp.asarray(
        np.concatenate([rng.random((NDIR, NCOMP), np.float32) * 1e-2,
                        np.zeros((NDIR, cpad), np.float32)], axis=1))
    fodf = jnp.full((N, cp), 1.0 / NCOMP, jnp.float32)
    if cpad:
        fodf = fodf.at[:, NCOMP:].set(0.0)
    dodf = jnp.dot(fodf, ker.T)
    sig2 = jnp.full((N, 1), (1 / 15) ** 2, jnp.float32)
    dsig = (sig * dodf) / sig2
    lam = jnp.full((nxyz,), (1 / 15) ** 2, jnp.float32)
    idx_j = jnp.asarray(idx_tv)

    tabs = None
    if fused:
        t = build_tables(idx_tv, (X, Y, Z), N)
        tabs = (t.lo, t.starts, t.gl, t.inmask, t.cellidx)

    def run(k):
        # tv_buf is DONATED by _rumba_block — allocate per call
        tv_buf = jnp.ones((N + yz, cp), jnp.float32) if fused else None
        st = _rumba_block(fodf, dodf, dsig, sig2, lam, sig, ker, idx_j,
                          k, 1, 1, True, (X, Y, Z), nxyz, "high", None,
                          False, tv_buf, tabs, False)
        float(st[3][0, 0])                 # barrier by scalar fetch

    best = {}
    for k in (K_LO, K_HI):
        run(k)                             # compile + warm
        b = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            run(k)
            b = min(b, time.perf_counter() - t0)
        best[k] = b
    slope = (best[K_HI] - best[K_LO]) / (K_HI - K_LO)
    if slope <= 0:
        # RTT weather noise exceeded the k_hi-k_lo signal — report
        # nothing rather than a nonsense number (see bench_mfu._slope)
        return None
    return slope


def main():
    rng = np.random.default_rng(0)
    idx_tv = _mask_idx(rng)

    from fibers_tpu.ops.pallas.tv_fused import fused_probe_ok
    if jax.default_backend() != "tpu":
        sys.stderr.write("bench_tv_fused: needs a TPU backend\n")
        sys.exit(1)

    t_unfused = _time_block(False, idx_tv, rng)
    if t_unfused is None:
        sys.stderr.write("bench_tv_fused: non-positive unfused slope "
                         "(RTT weather noise); re-run in a clean window\n")
        sys.exit(1)
    sys.stderr.write(f"unfused iteration: {1000 * t_unfused:.1f} ms\n")

    t_fused = None
    if fused_probe_ok():
        t_fused = _time_block(True, idx_tv, rng)
        if t_fused is None:
            sys.stderr.write("bench_tv_fused: non-positive fused slope "
                             "(weather noise); fused row skipped\n")
        else:
            sys.stderr.write(f"fused   iteration: {1000 * t_fused:.1f} "
                             f"ms ({t_unfused / t_fused:.2f}x)\n")
    else:
        sys.stderr.write("fused kernel unavailable (probe failed)\n")

    print(json.dumps({
        "metric": "rumba_iter_ms",
        "value": round(1000 * (t_fused if t_fused else t_unfused), 2),
        "unit": "ms/iter",
        "detail": {"unfused_ms": round(1000 * t_unfused, 2),
                   "fused_ms": (round(1000 * t_fused, 2)
                                if t_fused else None)},
    }))


if __name__ == "__main__":
    main()
