"""MFU / roofline accounting for the framework's hot kernels.

Times each tagged kernel at HCP scale and reports achieved TFLOP/s (or
GB/s for bandwidth-bound kernels) against TPU v5e peaks, so optimization
effort can be prioritized honestly (compute-bound vs latency/bandwidth-
bound).  Results are recorded in BASELINE.md.

Timing method: every kernel is measured as the SLOPE of k-chained
applications inside one jitted fori_loop, (t(k_hi) - t(k_lo)) /
(k_hi - k_lo).  A single dispatch + scalar fetch on the tunneled
runtime carries a fixed ~20-40 ms round-trip latency that completely
floors single-call timings (measured: a 6 MB and a 1.4 GB elementwise
op both "take" ~38 ms); the slope subtracts it.  The RTT floor itself
is reported as its own row — it is the quantity the e2e pipelines hide
by chaining device work between fetches.

  python benchmarks/bench_mfu.py            # ~3 min warm, on TPU

v5e peaks used: 197 TFLOP/s bf16 MXU, ~819 GB/s HBM.  The R-L GEMMs run
at precision HIGH (3-pass bf16), so their %-of-peak uses 3x the raw
FLOPs (the passes are real MXU work).
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FIBERS_JAX_CACHE", "/tmp/fibers_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0

# HCP-scale shapes (BASELINE.md configs 1/2/4)
N = 720896          # padded voxel batch (715k masked -> bucketed)
NDIR = 254          # RUMBA signal columns
NCOMP = 364         # fODF components (sphere_724 half + 2 iso)
NVOL = 198          # DWI volumes (configs 1-2)
NVERT = 321         # sphere_642 half vertices
NFFT = 16           # DSI grid

K_LO, K_HI = 1, 5


def _time_once(fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])       # barrier by scalar fetch


def _slope(fn, *args, reps=3):
    """(slope_seconds_per_step, rtt_floor_seconds) for a chained kernel
    fn(*args, k) timed at k=K_LO and k=K_HI."""
    best = {}
    for k in (K_LO, K_HI):
        g = partial(fn, k=k)
        _time_once(g, *args)         # compile + warm
        b = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            _time_once(g, *args)
            b = min(b, time.perf_counter() - t0)
        best[k] = b
    slope = (best[K_HI] - best[K_LO]) / (K_HI - K_LO)
    if slope <= 0:
        # RTT swings (20-40 ms) can exceed K_HI-K_LO steps of a
        # latency-bound kernel; a negative slope is weather noise, not
        # a measurement — report it instead of recording nonsense.
        return None, max(best[K_LO], 0.0)
    return slope, max(best[K_LO] - slope * K_LO, 0.0)


def main():
    rows = []
    floors = []

    def record(name, t, rtt, achieved, pct):
        """Append a row unless the slope was weather noise (t None);
        achieved/pct are callables of the per-step time."""
        floors.append(rtt)
        if t is None:
            sys.stderr.write(f"bench_mfu: {name}: non-positive slope "
                             "(RTT noise exceeded signal); row skipped\n")
            return
        rows.append((name, achieved(t), pct(t)))

    hp = jax.lax.Precision.HIGH

    # --- R-L GEMM pair + feedback GEMM (rumba iteration's MXU core) ---
    sig = jnp.ones((N, NDIR), jnp.float32)
    ker = jnp.ones((NDIR, NCOMP), jnp.float32) * 1e-3
    fodf0 = jnp.ones((N, NCOMP), jnp.float32)

    # NB: every GEMM must consume the loop carry, or XLA's while-loop
    # invariant code motion hoists it out of the chain and the slope
    # counts fewer GEMMs than `raw` does (confirmed via optimized HLO:
    # a carry-independent dot is computed once outside the body).
    @partial(jax.jit, static_argnames=("k",))
    def rl(sig, ker, f0, k):
        def body(i, f):
            dodf = jnp.dot(f, ker.T, precision=hp)      # [N, NDIR]
            num = jnp.dot(sig * (1 + dodf * 1e-6), ker,
                          precision=hp)                 # [N, NCOMP]
            den = jnp.dot(dodf, ker, precision=hp)      # [N, NCOMP]
            return f * 0.5 + num * 1e-3 + den * 1e-6
        return jax.lax.fori_loop(0, k, body, f0)

    t, rtt = _slope(rl, sig, ker, fodf0)
    raw = 3 * 2 * N * NDIR * NCOMP                      # 3 GEMMs / step
    record("rumba R-L GEMM (HIGH)", t, rtt,
           lambda t: raw / t / 1e12,
           lambda t: 100 * 3 * raw / t / 1e12 / V5E_BF16_TFLOPS)

    # --- GQI ODF GEMM ---
    sigs = jnp.ones((N, NVOL), jnp.float32)
    A = jnp.ones((NVERT, NVOL), jnp.float32) * 1e-3

    @partial(jax.jit, static_argnames=("k",))
    def gqi(s0, A, k):
        def body(i, s):
            hq = jax.lax.Precision.HIGHEST
            odf = jnp.dot(s, A.T, precision=hq)
            return s * 0.999 + jnp.dot(odf, A, precision=hq) * 1e-6
        return jax.lax.fori_loop(0, k, body, s0)

    t, rtt = _slope(gqi, sigs, A)
    raw = 2 * 2 * N * NVOL * NVERT                      # 2 GEMMs / step
    record("GQI ODF GEMM (HIGHEST)", t, rtt,
           lambda t: raw / t / 1e12,
           lambda t: 100 * 6 * raw / t / 1e12 / V5E_BF16_TFLOPS)

    # --- DTI masked WLS (normal equations + unrolled Cholesky) ---
    from fibers_tpu.models.dti import _design_dti, _masked_wls
    bval = np.concatenate([np.zeros(12), np.full(NVOL - 12, 1500.0)]) \
        .astype(np.float32)
    rng = np.random.default_rng(0)
    bvec = rng.standard_normal((NVOL, 3)).astype(np.float32)
    bvec /= np.linalg.norm(bvec, axis=1, keepdims=True)
    A_dti = jnp.asarray(_design_dti(bval, bvec))
    ib0 = jnp.asarray((bval == 0).astype(np.float32))

    @partial(jax.jit, static_argnames=("k",))
    def wls(s0, A, ib0, k):
        def body(i, s):
            d, valid = _masked_wls(s, A, ib0)
            return s + d[:, :1] * 1e-9
        return jax.lax.fori_loop(0, k, body, s0)

    t, rtt = _slope(wls, sigs, A_dti, ib0)
    # dominant terms per voxel: A^T W A (nvol*7*7 MACs) + A^T W y
    raw = N * (2 * NVOL * 7 * 7 + 2 * NVOL * 7)
    record("DTI masked-WLS solve", t, rtt,
           lambda t: raw / t / 1e12,
           lambda t: 100 * raw / t / 1e12 / V5E_BF16_TFLOPS)

    # --- DSI rfftn (per 4096-voxel chunk) ---
    B = 4096
    grid = jnp.ones((B, NFFT, NFFT, NFFT), jnp.float32)

    @partial(jax.jit, static_argnames=("k",))
    def dfft(g0, k):
        def body(i, g):
            spec = jnp.fft.rfftn(g, axes=(1, 2, 3))
            return g * 0.999 + jnp.real(spec[:, :1, :1, :1]) * 1e-9
        return jax.lax.fori_loop(0, k, body, g0)

    t, rtt = _slope(dfft, grid)
    n3 = NFFT ** 3
    raw = B * 2.5 * n3 * np.log2(n3)       # ~real-FFT flop count
    record("DSI rfftn (4096-voxel chunk)", t, rtt,
           lambda t: raw / t / 1e12,
           lambda t: 100 * raw / t / 1e12 / V5E_BF16_TFLOPS)

    # --- fused Pallas TV stencil: bandwidth-bound, report GB/s ---
    from fibers_tpu.ops.pallas.tv_stencil import tv_available, tv_multiplier
    if tv_available():
        X, Y, Z, C = 128, 130, 90, 128
        v0 = jnp.full((X, Y, Z, C), 0.7, jnp.float32)
        lam = jnp.full((X, Y, Z), 0.004, jnp.float32)

        @partial(jax.jit, static_argnames=("k",))
        def tv(v0, lam, k):
            def body(i, x):
                return tv_multiplier(x * 0.5 + 0.25, lam)
            return jax.lax.fori_loop(0, k, body, v0)

        t, rtt = _slope(tv, v0, lam)
        cells = X * Y * Z * C
        bts = cells * 4 * 3            # center read + x+1 view + write
        record("Pallas TV stencil [GB/s]", t, rtt,
               lambda t: bts / t / 1e9,
               lambda t: 100 * bts / t / 1e9 / V5E_HBM_GBPS)

    # --- TV embed/unembed gathers (the other half of the TV term) ---
    NG = 1_474_560                     # bbox-cropped TV grid cells
    gidx = jnp.asarray(rng.integers(0, N, NG), jnp.int32)
    idxm = jnp.asarray(rng.choice(NG, N, replace=False).astype(np.int64),
                       jnp.int32)

    @partial(jax.jit, static_argnames=("k",))
    def gath(f0, gidx, idxm, k):
        def body(i, f):
            return f[gidx][idxm] * 0.999
        return jax.lax.fori_loop(0, k, body, f0)

    t, rtt = _slope(gath, fodf0, gidx, idxm)
    bts = (N * NCOMP + NG * NCOMP) * 4 * 2
    record("TV embed+unembed gather [GB/s]", t, rtt,
           lambda t: bts / t / 1e9,
           lambda t: 100 * bts / t / 1e9 / V5E_HBM_GBPS)

    # --- fully fused TV (embed+stencil+unembed in one Pallas pass) ---
    from fibers_tpu.ops.pallas.tv_fused import (build_tables,
                                                fused_probe_ok, tv_fused)
    if tv_available() and fused_probe_ok():
        X, Y, Z = 128, 130, 90
        yz = Y * Z
        Cp = ((NCOMP + 127) // 128) * 128
        idx_tv = np.sort(rng.choice(X * yz, N, replace=False))
        tabs = build_tables(idx_tv, (X, Y, Z), N)
        rowsf = jnp.full((N, Cp), 0.7, jnp.float32)
        buf0 = jnp.ones((N + yz, Cp), jnp.float32)
        lam3 = jnp.full((X, Y, Z), 0.004, jnp.float32)

        @partial(jax.jit, static_argnames=("k",))
        def tvf(rowsf, buf, k):
            def body(i, b):
                return tv_fused(rowsf, b, lam3, tabs.lo, tabs.starts,
                                tabs.gl, tabs.inmask, tabs.cellidx,
                                (X, Y, Z))
            return jax.lax.fori_loop(0, k, body, buf)

        t, rtt = _slope(tvf, rowsf, buf0)
        # effective traffic of the WORK REPLACED per step: the unfused
        # path's pad copy + embed gather + stencil views + unembed —
        # reported against actual bytes moved (window DMAs + compacted
        # writes + index blocks) for the % column
        bts = (X * yz * Cp            # input row-window DMAs
               + (N + yz) * Cp        # compacted output writes
               ) * 4 + 3 * X * yz * 4 * (Cp // 128)
        record("fused TV embed+stencil+unembed [GB/s]", t, rtt,
               lambda t: bts / t / 1e9,
               lambda t: 100 * bts / t / 1e9 / V5E_HBM_GBPS)

    rows.append(("dispatch+fetch RTT floor [ms]",
                 1000 * float(np.median(floors)), 0.0))

    sys.stderr.write(f"{'kernel':<34}{'achieved':>10}{'% peak':>8}\n")
    out = {}
    for name, ach, pct in rows:
        unit = ("GB/s" if "GB/s" in name
                else "ms" if "[ms]" in name else "TFLOP/s")
        sys.stderr.write(f"{name:<34}{ach:>10.2f}{pct:>7.1f}%\n")
        key = name.split(" [")[0].replace(" ", "_")
        out[key] = {"achieved": round(ach, 2), "unit": unit,
                    "pct_peak": round(pct, 1)}

    print(json.dumps({"metric": "kernel_mfu", "value": out,
                      "unit": "table"}))


if __name__ == "__main__":
    main()
