"""MFU / roofline accounting for the framework's hot kernels.

Times each tagged kernel warm (compile excluded, one scalar fetch as the
barrier) at HCP scale and reports achieved TFLOP/s (or GB/s for the
bandwidth-bound TV stencil) against TPU v5e peaks, so optimization
effort can be prioritized honestly (compute-bound vs latency/bandwidth-
bound).  Results are recorded in BASELINE.md.

  python benchmarks/bench_mfu.py            # ~2 min warm, on TPU

v5e peaks used: 197 TFLOP/s bf16 MXU, ~819 GB/s HBM.  The R-L GEMMs run
at precision HIGH (3-pass bf16), so their %-of-peak uses 3x the raw
FLOPs (the passes are real MXU work).
"""

import json
import sys
import time

import numpy as np

import os

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


def _timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    # barrier by scalar fetch (block_until_ready is a no-op on the
    # tunneled runtime)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rows = []

    hp = jax.lax.Precision.HIGH

    # --- R-L GEMM pair (rumba iteration's MXU core) ---
    sig = jnp.ones((N, NDIR), jnp.float32)
    ker = jnp.ones((NDIR, NCOMP), jnp.float32)
    fodf = jnp.ones((N, NCOMP), jnp.float32)

    @jax.jit
    def rl(sig, ker, fodf):
        num = jnp.dot(sig, ker, precision=hp)
        den = jnp.dot(fodf, ker.T, precision=hp)
        return num.sum() + den.sum()

    t = _timeit(rl, sig, ker, fodf)
    raw = 2 * 2 * N * NDIR * NCOMP
    rows.append(("rumba R-L GEMM pair (HIGH)", raw / t / 1e12,
                 100 * 3 * raw / t / 1e12 / V5E_BF16_TFLOPS))

    # --- GQI ODF GEMM ---
    sigs = jnp.ones((N, NVOL), jnp.float32)
    A = jnp.ones((NVERT, NVOL), jnp.float32)

    @jax.jit
    def gqi(s, A):
        return jnp.dot(s, A.T,
                       precision=jax.lax.Precision.HIGHEST).sum()

    t = _timeit(gqi, sigs, A)
    raw = 2 * N * NVOL * NVERT
    rows.append(("GQI ODF GEMM (HIGHEST)", raw / t / 1e12,
                 100 * 6 * raw / t / 1e12 / V5E_BF16_TFLOPS))

    # --- DTI masked WLS (normal equations + solve) ---
    from fibers_tpu.models.dti import _design_dti, _masked_wls
    bval = np.concatenate([np.zeros(12), np.full(NVOL - 12, 1500.0)]) \
        .astype(np.float32)
    rng = np.random.default_rng(0)
    bvec = rng.standard_normal((NVOL, 3)).astype(np.float32)
    bvec /= np.linalg.norm(bvec, axis=1, keepdims=True)
    A_dti = jnp.asarray(_design_dti(bval, bvec))
    ib0 = jnp.asarray((bval == 0).astype(np.float32))

    @jax.jit
    def wls(s, A, ib0):
        d, valid = _masked_wls(s, A, ib0)
        return d.sum()

    t = _timeit(wls, sigs, A_dti, ib0)
    # dominant terms per voxel: A^T W A (nvol*7*7 MACs) + A^T W y
    raw = N * (2 * NVOL * 7 * 7 + 2 * NVOL * 7)
    rows.append(("DTI masked-WLS solve", raw / t / 1e12,
                 100 * raw / t / 1e12 / V5E_BF16_TFLOPS))

    # --- DSI rfftn (per 4096-voxel chunk) ---
    B = 4096
    grid = jnp.ones((B, NFFT, NFFT, NFFT), jnp.float32)

    @jax.jit
    def dfft(g):
        return jnp.real(jnp.fft.rfftn(g, axes=(1, 2, 3))).sum()

    t = _timeit(dfft, grid)
    n3 = NFFT ** 3
    raw = B * 2.5 * n3 * np.log2(n3)       # ~real-FFT flop count
    rows.append(("DSI rfftn (4096-voxel chunk)", raw / t / 1e12,
                 100 * raw / t / 1e12 / V5E_BF16_TFLOPS))

    # --- fused Pallas TV stencil: bandwidth-bound, report GB/s ---
    from fibers_tpu.ops.pallas.tv_stencil import tv_available, tv_multiplier
    if tv_available():
        X, Y, Z, C = 128, 130, 90, 128
        v = jnp.ones((X, Y, Z, C), jnp.float32)
        lam = jnp.full((X, Y, Z), 0.004, jnp.float32)

        def tv(v, lam):
            return tv_multiplier(v, lam)

        t = _timeit(tv, v, lam)
        cells = X * Y * Z * C
        bts = cells * 4 * 3            # center read + x+1 view + write
        rows.append(("Pallas TV stencil [GB/s]", bts / t / 1e9,
                     100 * bts / t / 1e9 / V5E_HBM_GBPS))

    sys.stderr.write(f"{'kernel':<32}{'achieved':>10}{'% peak':>8}\n")
    out = {}
    for name, ach, pct in rows:
        unit = "GB/s" if "GB/s" in name else "TFLOP/s"
        sys.stderr.write(f"{name:<32}{ach:>10.2f}{pct:>7.1f}%\n")
        key = name.split(" [")[0].replace(" ", "_")
        out[key] = {"achieved": round(ach, 2), "unit": unit,
                    "pct_peak": round(pct, 1)}

    print(json.dumps({"metric": "kernel_mfu", "value": out,
                      "unit": "table"}))


if __name__ == "__main__":
    main()
