"""Probabilistic (LCM) and microscopy (cone-search) tractography modes.

Lockstep counterparts of the reference's `stream_pick_by_lcm!`
(reference: src/stream.jl:380-495) and `stream_micro_new_point!`
(reference: src/stream.jl:547-619).  The LCM mode samples local connection
matrices with explicit JAX PRNG keys (distributional parity — the
reference draws from Julia's global RNG); the micro mode scans a search
cone around the tentative next position.
"""

from __future__ import annotations

import sys

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.trk import Tract

__all__ = ["stream_lcm", "stream_micro"]


# Voxel edges connected by the i-th element of a vectorized LCM
# (reference: src/stream.jl:234-235); 0-based edge ids 0..3
EDGETYPE = np.array([[0, 0, 0, 0, 1, 1, 1, 2, 2, 3],
                     [0, 1, 2, 3, 1, 2, 3, 2, 3, 3]], np.int32)


def _seed_state(seeds, subs, ovecs_flat, shape3):
    from .stream import _flat_index
    pos0 = jnp.asarray(seeds + subs, jnp.float32)
    ivox = jnp.round(pos0).astype(jnp.int32)
    flat, _ = _flat_index(ivox, shape3)
    v0 = ovecs_flat[flat][:, 0, :]
    return pos0, v0


# ------------------------------------------------------------------ #
# LCM probabilistic mode
# ------------------------------------------------------------------ #

@partial(jax.jit,
         static_argnames=("nsteps", "shape3", "emit", "qscale", "dmax"))
def _propagate_lcm(key, pos0, vec0, npts0, mask_flat, ovecs_flat, lcms_flat,
                   dxyz, nsteps, shape3, step_size, smooth_coeff, len_max,
                   emit="points", qscale=254.0, dmax=127):
    """One direction of LCM-guided propagation.

    Carries the previously chosen vector index (the reference continues
    along it while not entering a new voxel, src/stream.jl:399-411).
    Emits (out, saved, isdiff-flags, npts, anchor) per the same wire
    contract as stream._propagate: out is float32 positions or int8
    error-feedback step deltas depending on `emit`.
    """
    from .stream import _flat_index, _pick_by_angle

    edget = jnp.asarray(EDGETYPE)

    def step(carry, k):
        pos, vec, ivec_prev, pos_q, npts, active = carry

        pos_next = pos + vec * step_size
        ipos_next = jnp.round(pos_next).astype(jnp.int32)
        ipos_now = jnp.round(pos).astype(jnp.int32)
        flat, inb = _flat_index(ipos_next, shape3)
        inmask = mask_flat[flat] & inb

        vecs = ovecs_flat[flat]                     # [S, nvec, 3]

        # Conventional angle pick, for the difference indicator
        v_ang, ok_ang, ivec_ang = _pick_by_angle(vec, vecs)

        dvox = ipos_now - ipos_next                 # [S, 3]
        same_vox = (dvox == 0).all(axis=1)

        # --- not entering a new voxel: continue along previous index ---
        v_prev = jnp.take_along_axis(
            vecs, ivec_prev[:, None, None], axis=1)[:, 0, :]
        cos_prev = (vec * v_prev).sum(axis=1)
        v_same = jnp.where((cos_prev > 0)[:, None], v_prev, -v_prev)

        # --- entering a new voxel: sample the LCM ---
        # Resolve diagonal jumps: zero the faster-changing in-plane dim
        # (reference: src/stream.jl:422-437).  dxyz [3, 4] has the in-plane
        # increments; an entry edge matches a column of dxyz.
        d1 = jnp.abs(pos - pos_next)
        # strdims encoded by dxyz: dims with any nonzero increments
        strmask = (dxyz != 0).any(axis=1)           # [3]
        sd = jnp.where(strmask, 1, 0)
        # indexes of the two in-plane dims
        sdims = jnp.nonzero(sd, size=2)[0]
        a, b = sdims[0], sdims[1]
        faster_b = d1[:, a] < d1[:, b]
        is_diag = (dvox[:, a] != 0) & (dvox[:, b] != 0)
        dvox = dvox.at[:, b].set(
            jnp.where(is_diag & faster_b, 0, dvox[:, b]))
        dvox = dvox.at[:, a].set(
            jnp.where(is_diag & ~faster_b, 0, dvox[:, a]))

        edge_match = (dvox[:, :, None] == dxyz[None, :, :]).all(axis=1)
        entry = jnp.argmax(edge_match, axis=1)
        # No matching edge (through-plane or >1-voxel jump): the reference
        # leaves entryedgetype unset, which zeroes every LCM element and
        # terminates the stream (reference: src/stream.jl:414-446, 488-494)
        matched = edge_match.any(axis=1)

        lcm = lcms_flat[flat]                       # [S, 10]
        pair_has_entry = ((edget[0][None, :] == entry[:, None])
                          | (edget[1][None, :] == entry[:, None]))
        lcm = jnp.where(pair_has_entry & matched[:, None], lcm, 0.0)

        total = lcm.sum(axis=1)
        havelcm = total > 0
        logits = jnp.log(jnp.maximum(lcm, 1e-30))
        ilcm = jax.random.categorical(k, logits, axis=1)

        exit_edge = jnp.where(edget[0][ilcm] == entry, edget[1][ilcm],
                              edget[0][ilcm])
        jumpvec = dxyz.T[exit_edge].astype(jnp.float32)   # [S, 3]

        # Vector best aligned with the jump toward the exit edge
        cos_j = jnp.einsum("sj,svj->sv", jumpvec, vecs)
        iszero = (vecs == 0).all(axis=2)
        cabs = jnp.where(iszero, -jnp.inf, jnp.abs(cos_j))
        cos_j = jnp.where(iszero, -jnp.inf, cos_j)
        ivec_new = jnp.argmax(cabs, axis=1)
        cbest = jnp.take_along_axis(cos_j, ivec_new[:, None], axis=1)[:, 0]
        vbest = jnp.take_along_axis(
            vecs, ivec_new[:, None, None], axis=1)[:, 0, :]
        v_new = jnp.where((cbest > 0)[:, None], vbest, -vbest)
        ok_new = jnp.isfinite(cbest) & havelcm

        vnext = jnp.where(same_vox[:, None], v_same, v_new)
        ivec_next = jnp.where(same_vox, ivec_prev, ivec_new)
        okpick = jnp.where(same_vox, True, ok_new)

        ok = active & inb & inmask & okpick & ok_ang

        # Method-difference flag: LCM choice vs conventional angle choice,
        # in BOTH branches (the reference computes it after pick_by_lcm
        # regardless of the same-voxel shortcut, src/stream.jl:530-536)
        isdiff = ivec_next != ivec_ang

        save = ok
        npts = npts + save.astype(jnp.int32)

        if emit == "deltas":
            d = jnp.clip(jnp.round((pos - pos_q) * qscale),
                         -float(dmax), float(dmax))
            d = jnp.where(save[:, None], d, 0.0)
            pos_q = pos_q + d * (1.0 / qscale)
            out = d.astype(jnp.int8)
        else:
            out = pos

        flag = (isdiff & save).astype(jnp.int8)

        # No angle threshold in LCM mode (reference: src/stream.jl:668-671)
        cont = save & (npts <= len_max)

        vsm = smooth_coeff * vec + (1.0 - smooth_coeff) * vnext
        vsm = vsm / jnp.maximum(
            jnp.sqrt((vsm * vsm).sum(axis=1, keepdims=True)), 1e-20)
        vsm = jnp.where(smooth_coeff == 0.0, vnext, vsm)

        pos_out = jnp.where(cont[:, None], pos_next, pos)
        vec_out = jnp.where(cont[:, None], vsm, vec)

        return (pos_out, vec_out, ivec_next, pos_q, npts, cont), \
            (out, save, flag)

    keys = jax.random.split(key, nsteps)
    active0 = jnp.ones(pos0.shape[0], bool)
    ivec0 = jnp.zeros(pos0.shape[0], jnp.int32)
    (_, _, _, pos_q, npts, _), (outs, saved, flags) = jax.lax.scan(
        step, (pos0, vec0, ivec0, pos0, npts0, active0), keys)
    return outs, saved, flags, npts, pos_q


def stream_lcm(ovecs, fs, mask_array, seed, lcms, cfg, nsub, ang_thresh,
               step_size, smooth_coeff, len_max):
    """Driver for probabilistic LCM tractography.
    (reference: src/stream.jl:199-244, src/stream.jl:380-495)"""
    from .stream import _build_ovec_array

    shape3 = mask_array.shape
    lcm_vol = np.asarray(lcms.vol, np.float32)
    lcm_max = lcm_vol.max()
    if cfg.lcm_thresh > lcm_max:
        print(f"WARNING: The value of lcm_thresh ({cfg.lcm_thresh}) is "
              f"greater than the maximum value in the lcms volume "
              f"({lcm_max})", file=sys.stderr)
    lcm_vol = lcm_vol * (lcm_vol >= cfg.lcm_thresh)

    # 2D in-plane setup: the through-plane dim is the all-zero one of the
    # first orientation volume (reference: src/stream.jl:222-231)
    ov0 = ovecs[0].vol if ovecs[0].vol.ndim == 4 else ovecs[0].vol[..., None]
    zero_dims = [d for d in range(min(3, ov0.shape[3]))
                 if not np.any(ov0[..., d])]
    thrudim = zero_dims[0] if zero_dims else 2
    strdims = [d for d in range(3) if d != thrudim]

    dxyz = np.zeros((3, 4), np.int32)
    dxyz[strdims[0], :] = [-1, 0, 1, 0]
    dxyz[strdims[1], :] = [0, -1, 0, 1]

    ovec_arr = _build_ovec_array(ovecs, fs, cfg.f_thresh, mask_array, cfg)

    if seed is None:
        seed_idx = np.argwhere(mask_array)
    else:
        svol = seed.vol if seed.vol.ndim == 3 else seed.vol[..., 0]
        seed_idx = np.argwhere(svol > 0)

    key = jax.random.PRNGKey(cfg.seed_rng)
    if nsub > 0:
        key, sk = jax.random.split(key)
        subs = np.asarray(jax.random.uniform(
            sk, (nsub, 3), minval=-0.5 + 1e-6, maxval=0.5 - 1e-6),
            np.float32)
    else:
        subs = np.zeros((1, 3), np.float32)

    seeds_all = np.repeat(seed_idx.astype(np.float32), len(subs), axis=0)
    subs_all = np.tile(subs, (len(seed_idx), 1))

    mask_flat = jnp.asarray(mask_array.reshape(-1))
    ovecs_flat = jnp.asarray(ovec_arr.reshape(-1, len(ovecs), 3))
    lcms_flat = jnp.asarray(lcm_vol.reshape(-1, lcm_vol.shape[3]))
    dxyz_j = jnp.asarray(dxyz)

    from .stream import _drive_wire, _pack_meta, _wire_mode

    nsteps = int(len_max) + 2
    mode, emit, qscale, dmax = _wire_mode(cfg, step_size)

    starts = list(range(0, len(seeds_all), cfg.chunk))
    # per-chunk PRNG keys, fixed up front so the draw sequence does not
    # depend on dispatch order
    ckeys = jax.random.split(key, 2 * max(len(starts), 1))

    def launch(lo):
        hi = min(lo + cfg.chunk, len(seeds_all))
        pos0, v0 = _seed_state(seeds_all[lo:hi], subs_all[lo:hi],
                               ovecs_flat, shape3)
        i = lo // cfg.chunk
        kf, kb = ckeys[2 * i], ckeys[2 * i + 1]
        zero = jnp.zeros(pos0.shape[0], jnp.int32)
        fpts, fsav, fflag, nf, fq = _propagate_lcm(
            kf, pos0, v0, zero, mask_flat, ovecs_flat, lcms_flat, dxyz_j,
            nsteps, shape3, float(step_size), float(smooth_coeff),
            int(len_max), emit, qscale, dmax)
        bpts, bsav, bflag, _, _bq = _propagate_lcm(
            kb, pos0, -v0, nf, mask_flat, ovecs_flat, lcms_flat, dxyz_j,
            nsteps, shape3, float(step_size), float(smooth_coeff),
            int(len_max), emit, qscale, dmax)
        fwd_n = fsav.sum(axis=0).astype(jnp.int32)
        bwd_n = bsav.sum(axis=0).astype(jnp.int32)
        meta = _pack_meta(fwd_n, bwd_n, fq)
        return fpts, fwd_n, bpts, bwd_n, meta, fflag, bflag

    if len(seeds_all) == 0:
        tr = Tract.from_ref(ovecs[0])
        tr.set_packed(np.zeros((0, 3), np.float32), np.zeros(0, np.int32),
                      scalars=np.zeros(0, np.float32))
        return tr

    return _drive_wire(launch, starts, cfg, mode, qscale,
                       Tract.from_ref(ovecs[0]), has_scalars=True)


# ------------------------------------------------------------------ #
# Microscopy cone-search mode
# ------------------------------------------------------------------ #

def _search_window(search_dist):
    """Window offsets and unit direction vectors for the cone search
    (reference: src/stream.jl:252-277).  Only in-ball offsets are kept."""
    rx, ry, rz = search_dist
    xs = np.arange(-rx, rx + 1)
    ys = np.arange(-ry, ry + 1)
    zs = np.arange(-rz, rz + 1)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    off = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    rho = np.stack([gx / (rx + 0.5) if rx > 0 else gx * 0.0,
                    gy / (ry + 0.5) if ry > 0 else gy * 0.0,
                    gz / (rz + 0.5) if rz > 0 else gz * 0.0],
                   axis=-1).reshape(-1, 3)
    r = np.linalg.norm(rho, axis=1)
    keep = (r < 1) & (r > 0)
    dirs = np.zeros_like(rho)
    dirs[keep] = rho[keep] / r[keep, None]
    return off[keep].astype(np.int32), dirs[keep].astype(np.float32)


@partial(jax.jit,
         static_argnames=("nsteps", "shape3", "emit", "qscale", "dmax"))
def _propagate_micro(pos0, vec0, npts0, mask_flat, ovecs_flat, win_off,
                     win_dir, nsteps, shape3, step_size, cosang_thresh,
                     search_cosang, smooth_coeff, len_max,
                     emit="points", qscale=1.0, dmax=127):
    from .stream import _flat_index

    def step(carry, _):
        pos, vec, pos_q, npts, active = carry

        pos_next = pos + vec * step_size
        ipos = jnp.round(pos_next).astype(jnp.int32)
        flat, inb = _flat_index(ipos, shape3)
        inmask = mask_flat[flat] & inb

        # Search window around the tentative voxel
        wpos = ipos[:, None, :] + win_off[None, :, :]      # [S, W, 3]
        wflat, winb = _flat_index(wpos, shape3)
        wmask = mask_flat[wflat] & winb

        # In the search cone around the current direction?
        conedot = jnp.einsum("sj,wj->sw", vec, win_dir)
        incone = wmask & (conedot > search_cosang)

        wvec = ovecs_flat[wflat][:, :, 0, :]               # [S, W, 3]
        cosang = jnp.einsum("sj,swj->sw", vec, wvec)
        cosang = jnp.where(incone, cosang, -jnp.inf)
        cabs = jnp.abs(cosang)
        cabs = jnp.where(jnp.isfinite(cosang), cabs, -jnp.inf)

        iwin = jnp.argmax(cabs, axis=1)
        cbest = jnp.take_along_axis(cosang, iwin[:, None], axis=1)[:, 0]
        ok = active & inb & inmask & jnp.isfinite(cbest)

        next_vox = jnp.take_along_axis(
            wpos, iwin[:, None, None], axis=1)[:, 0, :]
        vbest = jnp.take_along_axis(
            wvec, iwin[:, None, None], axis=1)[:, 0, :]
        vnext = jnp.where((cbest > 0)[:, None], vbest, -vbest)

        save = ok
        npts = npts + save.astype(jnp.int32)

        if emit == "deltas":
            # micro jumps land on integer voxels: with qscale=1 and
            # integer seeds the deltas are exact (stream_micro enforces
            # this before choosing an integer wire)
            d = jnp.clip(jnp.round((pos - pos_q) * qscale),
                         -float(dmax), float(dmax))
            d = jnp.where(save[:, None], d, 0.0)
            pos_q = pos_q + d * (1.0 / qscale)
            out = d.astype(jnp.int8)
        else:
            out = pos

        cosadv = (vec * vnext).sum(axis=1)
        cont = save & (cosadv >= cosang_thresh) & (npts <= len_max)

        vsm = smooth_coeff * vec + (1.0 - smooth_coeff) * vnext
        vsm = vsm / jnp.maximum(
            jnp.sqrt((vsm * vsm).sum(axis=1, keepdims=True)), 1e-20)
        vsm = jnp.where(smooth_coeff == 0.0, vnext, vsm)

        pos_out = jnp.where(cont[:, None], next_vox.astype(jnp.float32), pos)
        vec_out = jnp.where(cont[:, None], vsm, vec)

        return (pos_out, vec_out, pos_q, npts, cont), (out, save)

    active0 = jnp.ones(pos0.shape[0], bool)
    (_, _, pos_q, npts, _), (outs, saved) = jax.lax.scan(
        step, (pos0, vec0, pos0, npts0, active0), None, length=nsteps)
    return outs, saved, npts, pos_q


def stream_micro(ovecs, fs, mask_array, seed, cfg, nsub, ang_thresh,
                 step_size, smooth_coeff, len_max):
    """Driver for microscopy cone-search tractography.
    (reference: src/stream.jl:547-619)"""
    from .stream import _build_ovec_array

    shape3 = mask_array.shape
    search_dist = [int(cfg.search_dist)] * 3

    ov0 = ovecs[0].vol if ovecs[0].vol.ndim == 4 else ovecs[0].vol[..., None]
    if ov0.shape[3] == 1:
        # 2D angles: zero search distance through-plane
        search_dist[int(np.argmax(ovecs[0].volres))] = 0

    ovec_arr = _build_ovec_array(ovecs, fs, cfg.f_thresh, mask_array, cfg)
    win_off, win_dir = _search_window(search_dist)

    if seed is None:
        seed_idx = np.argwhere(mask_array)
    else:
        svol = seed.vol if seed.vol.ndim == 3 else seed.vol[..., 0]
        seed_idx = np.argwhere(svol > 0)

    if nsub > 0:
        key = jax.random.PRNGKey(cfg.seed_rng)
        subs = np.asarray(jax.random.uniform(
            key, (nsub, 3), minval=-0.5 + 1e-6, maxval=0.5 - 1e-6),
            np.float32)
    else:
        subs = np.zeros((1, 3), np.float32)

    seeds_all = np.repeat(seed_idx.astype(np.float32), len(subs), axis=0)
    subs_all = np.tile(subs, (len(seed_idx), 1))

    mask_flat = jnp.asarray(mask_array.reshape(-1))
    ovecs_flat = jnp.asarray(ovec_arr.reshape(-1, len(ovecs), 3))
    win_off_j = jnp.asarray(win_off)
    win_dir_j = jnp.asarray(win_dir)

    from .stream import _drive_wire, _pack_meta, _wire_mode

    nsteps = int(len_max) + 2
    cosang_thresh = float(np.cos(np.radians(ang_thresh)))
    search_cosang = float(np.cos(np.radians(cfg.search_ang)))

    mode, emit, qscale, dmax = _wire_mode(cfg, step_size)
    if mode in ("i8", "i6"):
        # per-axis jump can reach search_dist + the tentative step
        if (nsub == 0
                and int(cfg.search_dist) + int(np.ceil(step_size)) < dmax):
            # cone-search jumps land on integer voxels and the seeds are
            # integers: unit-quantum deltas are EXACT
            qscale = 1.0
        else:
            # fractional seeds would quantize at 1 voxel; cone-search
            # jumps can also exceed the integer delta range
            if cfg.wire in ("i8", "i6"):
                import warnings
                warnings.warn(
                    f"stream_micro: wire={cfg.wire!r} cannot represent "
                    f"this configuration (nsub={nsub}, "
                    f"search_dist={cfg.search_dist}, "
                    f"step_size={step_size}); using exact f32 points "
                    "instead", RuntimeWarning, stacklevel=2)
            mode, emit = "f32", "points"

    # the windowed gather is W times heavier; shrink the chunk
    chunk = max(256, cfg.chunk // max(1, len(win_off) // 32))

    def launch(lo):
        hi = min(lo + chunk, len(seeds_all))
        pos0, v0 = _seed_state(seeds_all[lo:hi], subs_all[lo:hi],
                               ovecs_flat, shape3)
        zero = jnp.zeros(pos0.shape[0], jnp.int32)
        fpts, fsav, nf, fq = _propagate_micro(
            pos0, v0, zero, mask_flat, ovecs_flat, win_off_j, win_dir_j,
            nsteps, shape3, float(step_size), cosang_thresh, search_cosang,
            float(smooth_coeff), int(len_max), emit, qscale, dmax)
        bpts, bsav, _, _bq = _propagate_micro(
            pos0, -v0, nf, mask_flat, ovecs_flat, win_off_j, win_dir_j,
            nsteps, shape3, float(step_size), cosang_thresh, search_cosang,
            float(smooth_coeff), int(len_max), emit, qscale, dmax)
        fwd_n = fsav.sum(axis=0).astype(jnp.int32)
        bwd_n = bsav.sum(axis=0).astype(jnp.int32)
        meta = _pack_meta(fwd_n, bwd_n, fq)
        return fpts, fwd_n, bpts, bwd_n, meta

    if len(seeds_all) == 0:
        tr = Tract.from_ref(ovecs[0])
        tr.set_packed(np.zeros((0, 3), np.float32), np.zeros(0, np.int32))
        return tr

    starts = list(range(0, len(seeds_all), chunk))
    return _drive_wire(launch, starts, cfg, mode, qscale,
                       Tract.from_ref(ovecs[0]))
