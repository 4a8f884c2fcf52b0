"""Shared disk cache for benchmark phantom volumes.

One protocol used by bench.py and benchmarks/bench_models.py: the DWI
volume lives as a raw .npy (loaded with mmap_mode='r' — reloading a
~2 GB npz costs ~30 s of a short-lived clean benchmark window) next to
a small _meta.npz of validation arrays.  Loads pre-touch every page so
the disk page-in happens HERE, before any timed region, not inside the
first gather/scan a pipeline stage performs.
"""

import os

import numpy as np


def load(base: str, **expect):
    """Return (vol_memmap, meta dict) for cache `base`, or None.

    `expect`: arrays that must match the stored meta exactly (e.g.
    bval=..., bvec=...).  A mismatch returns None and leaves the files
    in place for the caller's subsequent save() to overwrite; an
    unreadable/corrupt file deletes both files."""
    volp, metap = base + "_vol.npy", base + "_meta.npz"
    if not (os.path.exists(volp) and os.path.exists(metap)):
        return None
    try:
        with np.load(metap) as z:
            meta = {k: z[k] for k in z.files}
        for k, v in expect.items():
            if k not in meta or not np.array_equal(meta[k], v):
                return None
        vol = np.load(volp, mmap_mode="r")
        # Pre-touch every page (4 KB stride over the raw bytes): the
        # memmap defers disk reads to first access, which would
        # otherwise land inside the first timed stage that scans the
        # volume (e.g. the wire-auto max/min pass in prepare_batch).
        float(np.asarray(vol).reshape(-1).view(np.uint8)[::4096].sum())
        return vol, meta
    except Exception:
        for p in (volp, metap):
            if os.path.exists(p):
                os.remove(p)
        return None


def save(base: str, vol: np.ndarray, **meta) -> None:
    """Atomically write cache `base` (vol as raw .npy + meta npz)."""
    volp, metap = base + "_vol.npy", base + "_meta.npz"
    tmp = volp + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:      # np.save(path) would append .npy
        np.save(f, np.asarray(vol))
    os.replace(tmp, volp)
    tmp = metap + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **meta)
    os.replace(tmp, metap)
