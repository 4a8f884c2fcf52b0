"""North-star benchmark: whole-brain HCP-resolution DTI + GQI fit plus
1M-seed deterministic tractography, end to end (BASELINE.md).

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ...,
"vs_baseline": ...}.  vs_baseline is the 60 s target budget divided by the
measured wall time (>1 means beating the target).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def _preflight():
    """Fail fast on a dead/wedged tunnel BEFORE any jax backend init.

    During a relay outage (observed 2026-08-17, hours-long) backend init
    hangs unkillably — even under JAX_PLATFORMS=cpu, because the axon
    plugin's sitecustomize initializes regardless.  A dead tunnel must be
    a <60 s nonzero exit with a one-line diagnosis, not a silent burn of
    the driver's whole timeout.  Probe order: 3 s TCP connect to the
    relay's forwarded port, then a tiny-matmul liveness check in a
    subprocess with a hard deadline (a wedged-but-listening tunnel hangs
    there instead of here).
    """
    plats = os.environ.get("JAX_PLATFORMS", "")
    axon_on_path = ".axon_site" in os.environ.get("PYTHONPATH", "")
    if "cpu" in plats and not axon_on_path:
        return  # pure-CPU run, no tunnel involved
    if os.environ.get("FIBERS_PREFLIGHT", "") == "skip":
        return  # caller (e.g. the recorder) just proved liveness itself
    import socket
    import subprocess

    s = socket.socket()
    s.settimeout(3)
    try:
        s.connect(("127.0.0.1", 8082))
        s.close()
    except OSError:
        sys.stderr.write("bench.py preflight: tunnel relay DEAD "
                         "(port 8082 refused) — not a framework failure; "
                         "only the external driver can restore the relay\n")
        sys.exit(2)
    # The child enables the persistent compile cache BEFORE the matmul:
    # without it every probe pays a fresh remote compile + staging
    # (15-400 s on this runtime), and a healthy-but-cold tunnel would
    # read as dead at the liveness deadline.
    p = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; "
         "jax.config.update('jax_compilation_cache_dir', "
         f"{os.environ.get('FIBERS_JAX_CACHE', '/tmp/fibers_jax_cache')!r}); "
         "jax.config.update("
         "'jax_persistent_cache_min_compile_time_secs', 0.0); "
         "import jax.numpy as jnp; "
         "float((jnp.ones((64,64)) @ jnp.ones((64,64)))[0,0])"],
        env=dict(os.environ),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)
    try:
        # 600 s: a live tunnel's fresh-process first dispatch measured
        # 47 s, >120 s, and >300 s within one hour on 2026-08-19 (slow,
        # highly variable session init/staging); a truly wedged tunnel
        # hangs for HOURS, so 600 s still fails an order of magnitude
        # faster than the driver timeout it protects.
        ok = p.wait(timeout=600) == 0
    except subprocess.TimeoutExpired:
        # Do NOT wait for the corpse: a tunnel-wedged child can sit in an
        # unkillable uninterruptible-syscall state and block the caller.
        p.kill()
        ok = False
    if not ok:
        sys.stderr.write("bench.py preflight: tunnel relay listening but "
                         "UNRESPONSIVE (600 s tiny-matmul deadline) — "
                         "not a framework failure\n")
        sys.exit(2)


_preflight()

# Persistent compilation cache: compile once per shape bucket across runs
import jax  # noqa: E402  (deliberately after the preflight)

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FIBERS_JAX_CACHE", "/tmp/fibers_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


# bump when make_brain changes so stale phantom caches are not reused
PHANTOM_VERSION = 3


def _wrap_dwi(vol, shape, ndir, bval, bvec):
    import fibers_tpu as ft

    dwi = ft.MRI(vol=vol)
    dwi.vox2ras0 = np.diag([1.5, 1.5, 1.5, 1.0]).astype(np.float32)
    dwi.volsize = np.asarray(shape)
    dwi.width, dwi.height, dwi.depth = shape
    dwi.nframes = ndir
    dwi.set_geometry()
    dwi.bval, dwi.bvec = bval, bvec
    return dwi


def make_brain(shape=(140, 140, 92), ndir=198, seed=0):
    """Synthetic HCP-scale DWI: ellipsoidal brain mask, smooth orientation
    field, two b-shells (matching the tutorial scan's scale)."""
    rng = np.random.default_rng(seed)
    import fibers_tpu as ft

    nx, ny, nz = shape
    x, y, z = np.meshgrid(
        np.linspace(-1, 1, nx), np.linspace(-1, 1, ny),
        np.linspace(-1, 1, nz), indexing="ij")
    mask = (x ** 2 / 0.81 + y ** 2 / 0.81 + z ** 2 / 0.92) < 1.0

    nb0 = 12
    nsh = (ndir - nb0) // 2
    i = np.arange(nsh)
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i
    zz = 1 - 2 * (i + 0.5) / nsh
    r = np.sqrt(1 - zz * zz)
    dirs = np.stack([r * np.cos(phi), r * np.sin(phi), zz], axis=1)
    bval = np.concatenate([np.zeros(nb0), np.full(nsh, 1500.0),
                           np.full(ndir - nb0 - nsh, 3000.0)]).astype(
                               np.float32)
    bvec = np.concatenate([np.zeros((nb0, 3)), dirs,
                           dirs[:ndir - nb0 - nsh]]).astype(np.float32)

    # Smooth orientation field: angles vary slowly across the volume
    th = 0.8 * x + 1.3 * y
    ph = 1.1 * z + 0.5 * x
    ax = np.stack([np.cos(ph) * np.cos(th), np.cos(ph) * np.sin(th),
                   np.sin(ph)], axis=-1).astype(np.float32)

    # Spatially varying anisotropy: white-matter-like core (high FA) to
    # gray-matter-like rim (low FA), so fa_thresh exercises the mask path
    r2 = x ** 2 + y ** 2 + z ** 2
    frac = np.clip(1.3 - 1.45 * r2, 0.01, 1.0).astype(np.float32)
    md = 0.7e-3
    lp = md + 2.0 * md * (2.0 / 3.0) * frac       # axial
    lt = md - md * (2.0 / 3.0) * frac             # radial

    # DWI signal, vectorized; a central slab adds a second crossing fiber
    # (90-degree rotated in-plane) so GQI's multi-peak path runs honestly
    dots = np.einsum("xyzi,vi->xyzv", ax, bvec)
    quad = lt[..., None] + (lp - lt)[..., None] * dots ** 2
    s0 = 100.0
    sig1 = np.exp(-bval[None, None, None, :] * quad)

    cross = (np.abs(y) < 0.25) & (np.abs(z) < 0.4)
    ax2 = np.stack([-ax[..., 1], ax[..., 0], ax[..., 2]], axis=-1)
    dots2 = np.einsum("xyzi,vi->xyzv", ax2, bvec)
    quad2 = lt[..., None] + (lp - lt)[..., None] * dots2 ** 2
    sig2 = np.exp(-bval[None, None, None, :] * quad2)
    w = np.where(cross, 0.5, 0.0).astype(np.float32)[..., None]
    vol = (s0 * ((1.0 - w) * sig1 + w * sig2)).astype(np.float32)

    vol *= mask[..., None]
    noise = rng.standard_normal(vol.shape).astype(np.float32) * 2.0
    vol = np.abs(vol + noise * mask[..., None])

    dwi = _wrap_dwi(vol, shape, ndir, bval, bvec)

    maskm = ft.MRI.like(dwi, 1, np.float32)
    maskm.vol = mask.astype(np.float32)
    return dwi, maskm, ax


def main():
    import fibers_tpu as ft

    small = "--small" in sys.argv
    shape = (48, 48, 32) if small else (140, 140, 92)
    ndir = 34 if small else 198
    target_seeds = 20_000 if small else 1_000_000

    # Overlap jit compilation with the phantom build/load + upload: the
    # warm-up thread waits on compile RPCs (persistent-cache hits are
    # fast; misses are 15-400 s and would otherwise land inside run 1).
    # The shape bucket needs only the mask cardinality, which the
    # ellipsoid formula gives in milliseconds.
    from fibers_tpu.ops.masked import padded_size
    from fibers_tpu.utils.warmup import warm_e2e_async

    xe, ye, ze = np.meshgrid(
        np.linspace(-1, 1, shape[0]), np.linspace(-1, 1, shape[1]),
        np.linspace(-1, 1, shape[2]), indexing="ij")
    n_pad = padded_size(int(
        ((xe ** 2 / 0.81 + ye ** 2 / 0.81 + ze ** 2 / 0.92) < 1.0).sum()))
    del xe, ye, ze
    warm_e2e_async(shape, ndir, n_pad, ft.sphere_642, chunk=1 << 17,
                   nvec=1, wire="i6")

    build_t0 = time.time()
    from benchmarks import _cache
    base = os.path.join(
        os.environ.get("FIBERS_BENCH_CACHE", "/tmp"),
        f"fibers_bench_phantom_v{PHANTOM_VERSION}_"
        f"{shape[0]}x{shape[1]}x{shape[2]}_{ndir}")
    hit = _cache.load(base)
    if hit is not None:
        vol, meta = hit
        dwi = _wrap_dwi(vol, shape, ndir, meta["bval"], meta["bvec"])
        mask = ft.MRI.like(dwi, 1, np.float32)
        mask.vol = meta["mask"]
        sys.stderr.write(f"phantom mapped from cache in "
                         f"{time.time() - build_t0:.1f}s\n")
    else:
        dwi, mask, ax = make_brain(shape=shape, ndir=ndir)
        _cache.save(base, dwi.vol, bval=dwi.bval, bvec=dwi.bvec,
                    mask=mask.vol)
        sys.stderr.write(f"phantom built in {time.time() - build_t0:.1f}s\n")
    nmask = int((mask.vol > 0).sum())
    sys.stderr.write(f"{nmask} masked voxels\n")

    # Seed mask subsampled so nsub=3 jitters give ~target_seeds streams
    seed = ft.MRI.like(mask, 1, np.float32)
    nseed_vox = max(1, target_seeds // 3)
    idx = np.flatnonzero(mask.vol > 0)
    pick = idx[np.linspace(0, len(idx) - 1, min(nseed_vox, len(idx)),
                           dtype=np.int64)]
    sv = np.zeros(mask.vol.size, np.float32)
    sv[pick] = 1
    seed.vol = sv.reshape(mask.vol.shape)

    def pipeline():
        t0 = time.time()
        # u12 wire: 25% fewer upload bytes than the default u16; FA
        # error vs the exact wire ~1e-4 on structured data (tested),
        # far inside the float-tolerance target.  NB an EXPLICIT "u12"
        # quantizes on every backend (only auto modes fall back on
        # CPU), so pick f32 for CPU runs here ourselves.
        wire = "f32" if jax.default_backend() == "cpu" else "u12"
        batch = ft.prepare_batch(dwi, mask, wire=wire)
        dti = ft.dti_fit(dwi, mask, batch=batch)
        gqi = ft.gqi_rec(dwi, mask, ft.sphere_642, batch=batch)
        t_fit = time.time() - t0

        # tractography streams straight to the .trk file: record packing
        # and file writes overlap the device point fetches.  tmpfs when
        # available so the metric reflects the framework, not the VM
        # disk's (highly variable) write-back throughput.
        # device-resident handoff: the GQI peak batch feeds the stream
        # engine with no fetch/host-rebuild/re-upload; restricted to
        # peak 1 with no amplitude threshold = the host peak[0] path
        t1 = time.time()
        pk1 = ft.peaks_to_ovecs(gqi, device=True).first(1)
        outdir = "/dev/shm" if os.path.isdir("/dev/shm") else None
        # wire="i6": packed 6-bit point deltas, 25% fewer bytes on the
        # dominant device->host point fetch; reconstruction error is
        # bounded at 2*step/31 = 0.032 voxel at every point (no drift)
        with tempfile.TemporaryDirectory(dir=outdir) as d:
            tract = ft.stream(pk1, fa=dti.fa, mask=mask, seed=seed,
                              nsub=3, f_thresh=0.0, wire="i6",
                              trk_sink=os.path.join(d, "bench.trk"))
        t_stream = time.time() - t1

        total = time.time() - t0
        sys.stderr.write(
            f"fit={t_fit:.1f}s stream+write={t_stream:.1f}s "
            f"total={total:.1f}s streams={tract.n_count} "
            f"voxfits/s={2 * nmask / max(t_fit, 1e-9):.0f}\n")
        from fibers_tpu.utils.profiling import (prof_enabled, prof_reset,
                                                prof_summary)
        if prof_enabled():
            sys.stderr.write(prof_summary() + "\n")
            prof_reset()
        return total

    # Three runs: the first includes one-time jit compiles (mitigated by
    # the persistent cache); report the MEDIAN so a lucky tunnel-weather
    # window can't flatter the number.  All runs go to stderr.
    totals = [pipeline() for _ in range(3)]
    total = float(np.median(totals))
    sys.stderr.write("runs: " + " ".join(f"{t:.1f}s" for t in totals)
                     + f" -> median {total:.1f}s\n")

    target = 60.0 if not small else 60.0 * (20_000 / 1_000_000)
    print(json.dumps({
        "metric": "hcp_dti_gqi_plus_1Mseed_tractography_e2e",
        "value": round(total, 3),
        "unit": "seconds",
        "vs_baseline": round(target / total, 3),
    }))


if __name__ == "__main__":
    main()
