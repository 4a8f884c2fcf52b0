"""Streamline tractography as a lockstep masked integrator.

Re-architected from the reference's per-seed data-dependent while loops
(reference: src/stream.jl:625-790) into fixed-trip-count scans advancing all
streams in parallel on device: each step is a batched voxel gather + best-
vector selection + masked state update.  Data-dependent termination becomes
an active mask (monotone decreasing), so saved points form a prefix of the
step axis and host assembly is fully vectorized.

Propagation semantics match the reference exactly in deterministic mode:
nearest-voxel lookup, greedy min-bending-angle vector choice with sign
flip, post-save angle/length stopping rules, EMA direction smoothing
(reference: src/stream.jl:340-374, src/stream.jl:501-541, src/stream.jl:
648-686).  The probabilistic LCM variant samples connection matrices with
explicit PRNG keys (reference: src/stream.jl:380-495), and the microscopy
cone-search variant scans a search window around the tentative next voxel
(reference: src/stream.jl:547-619).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mri import MRI
from ..io.trk import Tract, str_add
from ..utils.profiling import prof

__all__ = ["stream", "StreamConfig", "propagate_chunk"]


@dataclass
class StreamConfig:
    """Tractography parameters; names/defaults mirror the reference's
    `stream` kwargs (reference: src/stream.jl:730)."""

    f_thresh: float = 0.03
    fa_thresh: float = 0.1
    nsub: Optional[int] = 3
    len_min: int = 3
    len_max: Optional[int] = None
    ang_thresh: Optional[float] = 45.0
    step_size: Optional[float] = 0.5
    smooth_coeff: Optional[float] = 0.2
    search_dist: int = 15
    search_ang: float = 10.0
    lcm_thresh: float = 0.099
    verbose: bool = False
    seed_rng: int = 0
    chunk: int = 1 << 17
    # Transfer the propagated points exactly (float32) instead of the
    # default 1/256-voxel fixed-point wire encoding used on accelerators
    exact_points: bool = False


# ------------------------------------------------------------------ #
# Device kernels
# ------------------------------------------------------------------ #

def _flat_index(ipos, shape3):
    nx, ny, nz = shape3
    ix, iy, iz = ipos[..., 0], ipos[..., 1], ipos[..., 2]
    inb = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
           & (iz >= 0) & (iz < nz))
    flat = (ix * ny + iy) * nz + iz
    return jnp.where(inb, flat, 0), inb


def _pick_by_angle(vec_now, vecs):
    """Greedy choice among candidate vectors [S, nvec, 3]: max |cos| to the
    current direction, sign-flipped to align.
    (reference: src/stream.jl:340-374)"""
    cos = jnp.einsum("sj,svj->sv", vec_now, vecs)
    iszero = (vecs == 0).all(axis=2)
    cos = jnp.where(iszero, -jnp.inf, cos)
    cabs = jnp.where(iszero, -jnp.inf, jnp.abs(cos))
    ivec = jnp.argmax(cabs, axis=1)
    c = jnp.take_along_axis(cos, ivec[:, None], axis=1)[:, 0]
    v = jnp.take_along_axis(vecs, ivec[:, None, None], axis=1)[:, 0, :]
    ok = jnp.isfinite(c)
    vnext = jnp.where((c > 0)[:, None], v, -v)
    return vnext, ok, ivec


@partial(jax.jit, static_argnames=("nsteps", "shape3"))
def _propagate(pos0, vec0, npts0, mask_flat, ovecs_flat, nsteps, shape3,
               step_size, cosang_thresh, smooth_coeff, len_max):
    """Lockstep propagation of one direction for S streams.

    Returns (points [nsteps, S, 3], saved [nsteps, S], npts_total [S]).
    `npts0` carries the running per-line point count (forward pass result
    when propagating backward), so the shared length budget matches the
    reference's single npts counter across both directions
    (reference: src/stream.jl:648-686).
    """

    def step(carry, _):
        pos, vec, npts, active = carry

        pos_next = pos + vec * step_size
        ipos = jnp.round(pos_next).astype(jnp.int32)
        flat, inb = _flat_index(ipos, shape3)
        inmask = mask_flat[flat] & inb

        vecs = ovecs_flat[flat]                  # [S, nvec, 3]
        vnext, okvec, _ = _pick_by_angle(vec, vecs)

        ok = active & inb & inmask & okvec

        # Save the CURRENT position (pre-step), as the reference does
        save = ok
        npts = npts + save.astype(jnp.int32)

        # Post-save stopping rules
        cosang = (vec * vnext).sum(axis=1)
        cont = save & (cosang >= cosang_thresh) & (npts <= len_max)

        # EMA smoothing, then advance
        vsm = smooth_coeff * vec + (1.0 - smooth_coeff) * vnext
        vsm = vsm / jnp.maximum(
            jnp.sqrt((vsm * vsm).sum(axis=1, keepdims=True)), 1e-20)
        vsm = jnp.where(smooth_coeff == 0.0, vnext, vsm)

        pos_out = jnp.where(cont[:, None], pos_next, pos)
        vec_out = jnp.where(cont[:, None], vsm, vec)

        return (pos_out, vec_out, npts, cont), (pos, save)

    active0 = jnp.ones(pos0.shape[0], bool)
    (pos, vec, npts, active), (points, saved) = jax.lax.scan(
        step, (pos0, vec0, npts0, active0), None, length=nsteps)
    return points, saved, npts


def propagate_chunk(seeds, subs, mask_flat, ovecs_flat, shape3, nsteps,
                    step_size, cosang_thresh, smooth_coeff, len_max):
    """Run forward+backward propagation for a chunk of seed positions.

    seeds: [S, 3] float voxel positions (seed voxel + subvoxel offset).
    Returns (fwd_pts, fwd_n, bwd_pts, bwd_n) with pts [T, S, 3] and the
    per-stream saved counts.
    """
    pos0 = jnp.asarray(seeds + subs, jnp.float32)
    ivox = jnp.round(pos0).astype(jnp.int32)
    flat, _ = _flat_index(ivox, shape3)
    # Initial vector: first orientation vector at the seed voxel
    # (reference: src/stream.jl:645-650)
    v0 = ovecs_flat[flat][:, 0, :]

    zero = jnp.zeros(pos0.shape[0], jnp.int32)
    fwd_pts, fwd_saved, npts_f = _propagate(
        pos0, v0, zero, mask_flat, ovecs_flat, nsteps, shape3,
        step_size, cosang_thresh, smooth_coeff, len_max)
    bwd_pts, bwd_saved, npts_t = _propagate(
        pos0, -v0, npts_f, mask_flat, ovecs_flat, nsteps, shape3,
        step_size, cosang_thresh, smooth_coeff, len_max)

    fwd_n = fwd_saved.sum(axis=0).astype(jnp.int32)
    bwd_n = bwd_saved.sum(axis=0).astype(jnp.int32)
    return fwd_pts, fwd_n, bwd_pts, bwd_n


# ------------------------------------------------------------------ #
# Device-side compaction + host assembly
# ------------------------------------------------------------------ #

# uint16 fixed-point encoding for the point transfer: 1/256-voxel
# resolution with a +2-voxel offset (supports coords in [-2, 254)).  The
# wire error is <= 1/512 voxel — orders of magnitude below the 0.5-voxel
# integration step — and halves the bytes on the slow device->host link.
_QSCALE = 256.0
_QOFF = 2.0


@partial(jax.jit, static_argnames=("cap", "quantize"))
def _compact(fwd_pts, bwd_pts, fwd_n, bwd_n, keep, line_off, cap,
             quantize=False):
    """Scatter saved points into their final ragged line layout on device.

    Lines are reversed-forward-prefix then backward-prefix (the reference's
    prepend/append order).  Points of dropped/invalid slots scatter out of
    bounds and are dropped, so only `total` real points ever cross the
    device->host link.
    """
    nsteps, s = fwd_pts.shape[:2]
    t_idx = jnp.arange(nsteps, dtype=jnp.int32)[:, None]

    oob = jnp.int32(cap)
    dst_f = jnp.where((t_idx < fwd_n[None, :]) & keep[None, :],
                      line_off[None, :] + fwd_n[None, :] - 1 - t_idx, oob)
    dst_b = jnp.where((t_idx < bwd_n[None, :]) & keep[None, :],
                      line_off[None, :] + fwd_n[None, :] + t_idx, oob)

    out = jnp.zeros((cap, 3), fwd_pts.dtype)
    out = out.at[dst_f.reshape(-1)].set(
        fwd_pts.reshape(-1, 3), mode="drop", unique_indices=True)
    out = out.at[dst_b.reshape(-1)].set(
        bwd_pts.reshape(-1, 3), mode="drop", unique_indices=True)
    if quantize:
        out = jnp.round((out + _QOFF) * _QSCALE).astype(jnp.uint16)
    return out


def _compact_chunk(fwd_pts, bwd_pts, fwd_n, bwd_n, fwd_n_dev, bwd_n_dev,
                   len_min, quantize):
    """Device compaction of one propagated chunk given host-side counts.

    Returns (compacted device buffer [cap, 3], total, npts [nkept]) or
    (None, 0, empty) when nothing survives the length filter."""
    tot = fwd_n + bwd_n
    keep = tot >= len_min
    if not keep.any():
        return None, 0, np.zeros(0, np.int32)

    npts = tot[keep]
    total = int(npts.sum())
    # line offsets for ALL streams (dropped streams get arbitrary offsets
    # but scatter OOB via the keep mask)
    off_all = np.zeros(len(tot), np.int64)
    off_all[keep] = np.concatenate([[0], np.cumsum(npts)[:-1]])

    cap = max(1 << 16, 1 << int(np.ceil(np.log2(max(total, 1)))))
    with prof("stream.compact_dispatch"):
        out = _compact(fwd_pts, bwd_pts, fwd_n_dev, bwd_n_dev,
                       jnp.asarray(keep), jnp.asarray(off_all, jnp.int32),
                       cap, quantize)
    return out, total, npts.astype(np.int32)


def _fetch_points(buf, total, quantize):
    """Fetch a compacted point buffer and decode the fixed-point wire
    format if used."""
    from ..ops.transfer import to_host

    with prof("stream.points_fetch"):
        raw = to_host(buf, n_lead=total)
    if quantize:
        return raw.astype(np.float32) / np.float32(_QSCALE) - \
            np.float32(_QOFF)
    return raw

def _assemble(fwd_pts, fwd_n, bwd_pts, bwd_n, len_min):
    """Vectorized ragged assembly: reversed forward prefix + backward prefix
    per stream (prepend/append order of the reference,
    src/stream.jl:652-660).  Returns (flat_pts [total, 3], npts [nkept])."""
    fwd_n = np.asarray(fwd_n)
    bwd_n = np.asarray(bwd_n)
    tot = fwd_n + bwd_n
    keep = tot >= len_min
    if not keep.any():
        return np.zeros((0, 3), np.float32), np.zeros(0, np.int32)

    from ..ops.transfer import to_host
    fwd_n = fwd_n[keep]
    bwd_n = bwd_n[keep]
    # [T, S, 3] -> [S, T, 3] for kept streams
    fwd_pts = np.ascontiguousarray(to_host(fwd_pts).transpose(1, 0, 2)[keep])
    bwd_pts = np.ascontiguousarray(to_host(bwd_pts).transpose(1, 0, 2)[keep])

    npts = fwd_n + bwd_n
    offsets = np.concatenate([[0], np.cumsum(npts)])
    total = int(offsets[-1])
    out = np.empty((total, 3), np.float32)

    sid = np.repeat(np.arange(len(npts)), npts)
    rank = np.arange(total) - np.repeat(offsets[:-1], npts)

    in_fwd = rank < fwd_n[sid]
    # forward points are written in reverse order (prepend semantics)
    src_step = np.where(in_fwd, fwd_n[sid] - 1 - rank, rank - fwd_n[sid])
    out[in_fwd] = fwd_pts[sid[in_fwd], src_step[in_fwd]]
    out[~in_fwd] = bwd_pts[sid[~in_fwd], src_step[~in_fwd]]
    return out, npts.astype(np.int32)


# ------------------------------------------------------------------ #
# Setup + driver
# ------------------------------------------------------------------ #

def _build_ovec_array(ovecs: List[MRI], fs, f_thresh, mask_array, cfg):
    """[nx,ny,nz,nvec,3] orientation array with per-vector amplitude
    masking; accepts 3D vectors or 2D in-plane angles (deg or rad)
    (reference: src/stream.jl:130-173)."""
    nx, ny, nz = ovecs[0].vol.shape[:3]
    nvec = len(ovecs)
    arr = np.zeros((nx, ny, nz, nvec, 3), np.float32)

    for i, ov in enumerate(ovecs):
        vol = ov.vol if ov.vol.ndim == 4 else ov.vol[..., None]
        if fs is not None:
            fvol = fs[i].vol if fs[i].vol.ndim == 3 else fs[i].vol[..., 0]
            omask = mask_array & (fvol >= f_thresh)
        else:
            omask = mask_array

        if vol.shape[3] == 3:
            arr[..., i, :] = vol * omask[..., None]
        elif vol.shape[3] == 1:
            ang = vol[..., 0]
            thrudim = int(np.argmax(ov.volres))
            strdims = [d for d in range(3) if d != thrudim]
            eps = np.finfo(np.float32).eps
            if (ang.min() >= -np.pi / 2 - eps
                    and ang.max() <= np.pi / 2 + eps):
                c, s = np.cos(ang), np.sin(ang)
            elif ang.min() >= -90 and ang.max() <= 90:
                c = np.cos(np.radians(ang))
                s = np.sin(np.radians(ang))
            else:
                raise ValueError("Input orientations should be 3D vectors "
                                 "or angles in [-90, 90]")
            arr[..., i, strdims[0]] = c * omask
            arr[..., i, strdims[1]] = s * omask
        else:
            raise ValueError("Orientation input must have 1 or 3 frames")
    return arr


def stream(ovec: Union[MRI, List[MRI]], *, f=None, fa: Optional[MRI] = None,
           mask: Optional[MRI] = None, seed: Optional[MRI] = None,
           lcms: Optional[MRI] = None, cfg: Optional[StreamConfig] = None,
           **kwargs) -> Tract:
    """Streamline tractography.  Returns a `Tract`.

    Mirrors the reference's `stream` driver (reference: src/stream.jl:730-
    790): builds masks and the orientation array, seeds nsub jittered
    streams per seed voxel, propagates bidirectionally, and assembles
    surviving lines into a Tract.  Keyword arguments matching
    `StreamConfig` fields override the defaults.
    """
    cfg = cfg or StreamConfig()
    for k, v in kwargs.items():
        if not hasattr(cfg, k):
            raise TypeError(f"Unknown stream option {k}")
        setattr(cfg, k, v)

    ovecs = [ovec] if isinstance(ovec, MRI) else list(ovec)
    fs = None if f is None else ([f] if isinstance(f, MRI) else list(f))

    nx, ny, nz = ovecs[0].vol.shape[:3]
    shape3 = (nx, ny, nz)

    # Microscopy regime switches defaults (reference: src/stream.jl:83-92)
    domicro = float(np.min(ovecs[0].volres)) <= 0.05
    nsub = cfg.nsub if cfg.nsub is not None else (0 if domicro else 3)
    ang_thresh = cfg.ang_thresh if cfg.ang_thresh is not None else \
        (20.0 if domicro else 45.0)
    step_size = cfg.step_size if cfg.step_size is not None else \
        (1.0 if domicro else 0.5)
    smooth_coeff = cfg.smooth_coeff if cfg.smooth_coeff is not None else \
        (0.0 if domicro else 0.2)
    len_max = cfg.len_max if cfg.len_max is not None else max(nx, ny, nz)

    # Brain mask (reference: src/stream.jl:94-117)
    if mask is None:
        mask_array = np.zeros(shape3, bool)
        for ov in ovecs:
            vol = ov.vol if ov.vol.ndim == 4 else ov.vol[..., None]
            mask_array |= (vol != 0).any(axis=3)
    else:
        mvol = mask.vol if mask.vol.ndim == 3 else mask.vol[..., 0]
        mask_array = mvol > 0

    if fa is not None:
        favol = fa.vol if fa.vol.ndim == 3 else fa.vol[..., 0]
        inmask = favol[mask_array]
        fa_min = np.quantile(inmask, 1e-5)
        fa_max = np.quantile(inmask, 0.9)
        if cfg.fa_thresh < fa_min or cfg.fa_thresh > fa_max:
            print(f"WARNING: The value of fa_thresh ({cfg.fa_thresh}) is "
                  f"outside the range of most values in the fa volume "
                  f"({fa_min}, {fa_max})")
        mask_array = mask_array & (favol >= cfg.fa_thresh)

    if fs is not None:
        f0 = fs[0].vol if fs[0].vol.ndim == 3 else fs[0].vol[..., 0]
        inmask = f0[mask_array]
        f_min = np.quantile(inmask, 1e-5)
        f_max = np.quantile(inmask, 0.9)
        if cfg.f_thresh < f_min or cfg.f_thresh > f_max:
            print(f"WARNING: The value of f_thresh ({cfg.f_thresh}) is "
                  f"outside the range of most values in the f volume "
                  f"({f_min}, {f_max})")

    if lcms is not None or domicro:
        from .modes import stream_lcm, stream_micro
        if lcms is not None:
            return stream_lcm(ovecs, fs, mask_array, seed, lcms, cfg,
                              nsub, ang_thresh, step_size, smooth_coeff,
                              len_max)
        return stream_micro(ovecs, fs, mask_array, seed, cfg, nsub,
                            ang_thresh, step_size, smooth_coeff, len_max)

    ovec_arr = _build_ovec_array(ovecs, fs, cfg.f_thresh, mask_array, cfg)

    # Seed voxel list (reference: src/stream.jl:743-754)
    if seed is None:
        seed_idx = np.argwhere(mask_array)
    else:
        svol = seed.vol if seed.vol.ndim == 3 else seed.vol[..., 0]
        if svol.shape != mask_array.shape:
            raise ValueError(
                f"Dimension mismatch between seed mask {svol.shape} and "
                f"brain mask {mask_array.shape}")
        seed_idx = np.argwhere(svol > 0)

    # Subvoxel jitter: nsub offsets shared by all seed voxels, drawn once
    # with an explicit PRNG (reference: src/stream.jl:176-181 uses a global
    # RNG; we make the key explicit for reproducibility)
    if nsub > 0:
        key = jax.random.PRNGKey(cfg.seed_rng)
        subs = np.asarray(jax.random.uniform(
            key, (nsub, 3), minval=-0.5 + 1e-6, maxval=0.5 - 1e-6),
            np.float32)
    else:
        subs = np.zeros((1, 3), np.float32)

    # All (seed, sub) pairs
    S = len(seed_idx)
    seeds_all = np.repeat(seed_idx.astype(np.float32), len(subs), axis=0)
    subs_all = np.tile(subs, (S, 1))

    mask_flat = jnp.asarray(mask_array.reshape(-1))
    ovecs_flat = jnp.asarray(ovec_arr.reshape(-1, len(ovecs), 3))

    nsteps = int(len_max) + 2
    cosang_thresh = float(np.cos(np.radians(ang_thresh)))

    # Phased execution over seed chunks, shaped around the tunnel-slow
    # device link: (1) dispatch ALL propagations (device queue drains at
    # compute speed), (2) fetch the small per-chunk counts as each chunk
    # completes, (3) dispatch all compactions (freeing the big point
    # buffers), (4) fetch the compacted points with the wire to itself —
    # no contention between the big fetches and anything else.
    def launch(lo):
        hi = min(lo + cfg.chunk, len(seeds_all))
        seeds_c, subs_c = seeds_all[lo:hi], subs_all[lo:hi]
        if hi - lo < cfg.chunk and len(seeds_all) > cfg.chunk:
            # pad the last chunk with out-of-bounds seeds (immediately
            # inactive, filtered by len_min) to keep one compiled shape
            padn = cfg.chunk - (hi - lo)
            seeds_c = np.concatenate(
                [seeds_c, np.full((padn, 3), -10.0, np.float32)])
            subs_c = np.concatenate(
                [subs_c, np.zeros((padn, 3), np.float32)])
        with prof("stream.propagate_dispatch"):
            return propagate_chunk(
                seeds_c, subs_c, mask_flat, ovecs_flat,
                shape3, nsteps, float(step_size), cosang_thresh,
                float(smooth_coeff), int(len_max))

    # Wire quantization: exact on CPU (and on volumes too large for the
    # u16 range); 1/256-voxel fixed point on accelerators unless the user
    # opts out via cfg.exact_points.
    quantize = (not cfg.exact_points
                and jax.default_backend() != "cpu"
                and max(shape3) < 250)

    starts = list(range(0, len(seeds_all), cfg.chunk))
    results = [launch(lo) for lo in starts]

    counts = []
    with prof("stream.counts_fetch"):
        for (_, fn, _, bn) in results:
            counts.append((np.asarray(fn), np.asarray(bn)))

    bufs = []
    for i, ((fp, fn_d, bp, bn_d), (fn, bn)) in enumerate(
            zip(results, counts)):
        bufs.append(_compact_chunk(fp, bp, fn, bn, fn_d, bn_d,
                                   cfg.len_min, quantize))
        results[i] = None     # release the raw point buffers

    flat_parts, npts_parts = [], []
    for buf, total, npts_c in bufs:
        if buf is None:
            continue
        flat_parts.append(_fetch_points(buf, total, quantize))
        npts_parts.append(npts_c)

    flat_pts = np.concatenate(flat_parts) if flat_parts else \
        np.zeros((0, 3), np.float32)
    npts = np.concatenate(npts_parts) if npts_parts else \
        np.zeros(0, np.int32)

    # Build the Tract (packed fast path; list view materializes lazily)
    ref = mask if mask is not None else ovecs[0]
    tr = Tract.from_ref(ref)
    tr.set_packed(flat_pts, npts)
    return tr
