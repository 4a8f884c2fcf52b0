"""Diffusion Spectrum Imaging (DSI) reconstruction.

Re-architected from the reference's per-voxel planned FFT + per-vertex
interpolation loops (reference: src/dsi.jl:59-261) into batched XLA:
signals scatter onto a [B, nfft^3] q-space grid, one batched 3D FFT with
fftshift rolls, then the radial ODF integral collapses into a single
[B, nfft^3] x [nfft^3, nvert] MXU GEMM whose weight matrix pre-bakes the
trilinear interpolation stencils and r^2 dr quadrature of all 21 radii.

Wedeen et al. (2005), Magn Reson Med 54(6):1377-1386.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lazy import LazyVolume
from ..core.mri import MRI
from ..core.odf import ODF, half_sphere
from ..io.dispatch import mri_write_struct
from ..ops.masked import gather_frames, mask_indices, pad_rows
from ..ops.peaks import build_neighbors, peak_mask, top_peaks

__all__ = ["DSI", "dsi_rec", "dsi_write"]

NPEAK = 3


@dataclass
class DSI:
    """Outputs of a DSI reconstruction.  (reference: src/dsi.jl:10-15)

    `_peak_dev` keeps the peak batch device-resident for the zero-fetch
    tractography handoff (core.handoff.DevicePeaks); runtime state,
    never written by `dsi_write`."""

    pdf: MRI
    odf: MRI
    peak: List[MRI]
    qa: List[MRI]
    _peak_dev: object = None


def _dsi_grid(bval: np.ndarray, bvec: np.ndarray, hann_width: int):
    """Map q-space samples onto the zero-padded FFT grid.

    Returns (nfft, iq_flat [nvol] C-order flat indices, hann [nvol]).
    (reference: src/dsi.jl:61-85)
    """
    bval = bval.astype(np.float64)
    q = bvec.astype(np.float64) * np.sqrt(bval)[:, None]
    bmin = bval.min()
    above = bval[bval > bmin]
    if above.size == 0:
        raise ValueError("DSI requires multiple b-values on a q-space grid")
    dq = np.sqrt(above.min())
    iq = np.round(q / dq).astype(np.int64)

    nfft = int(iq.max() - iq.min() + 1)
    nfft = 1 << int(np.ceil(np.log2(nfft)))
    shift = nfft // 2                       # 0-based center index
    iq0 = iq + shift
    iq_flat = (iq0[:, 0] * nfft + iq0[:, 1]) * nfft + iq0[:, 2]

    if hann_width == 0:
        hann = np.ones(len(bval), np.float32)
    else:
        hann = ((1.0 + np.cos(np.sqrt((iq ** 2).sum(axis=1))
                              * (2 * np.pi / hann_width))) * 0.5)
    return nfft, iq_flat.astype(np.int32), hann.astype(np.float32)


def _radial_weight_matrix(nfft: int, odf_dirs: ODF) -> np.ndarray:
    """[nfft^3, nvert] matrix turning a flat PDF into ODF amplitudes.

    Bakes the 21-point radial quadrature (radii 0.3..0.9 of Nyquist,
    reference: src/dsi.jl:104-109) and trilinear interpolation stencils
    (reference: src/dsi.jl:229-242) into one dense GEMM operand.
    """
    nvert = odf_dirs.nvert_half
    verts = odf_dirs.vertices[nvert:].astype(np.float64)   # lower half

    qr = (nfft / 2 - 1) * np.arange(0.3, 0.9 + 1e-9, 0.03)
    dqr = qr[1] - qr[0]
    shift = nfft // 2

    w = np.zeros((nfft ** 3, nvert), np.float64)
    for irad, r in enumerate(qr):
        coords = verts * r + shift                          # [nvert, 3]
        base = np.floor(coords).astype(np.int64)
        frac = coords - base
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    cw = (np.where(dx, frac[:, 0], 1 - frac[:, 0])
                          * np.where(dy, frac[:, 1], 1 - frac[:, 1])
                          * np.where(dz, frac[:, 2], 1 - frac[:, 2]))
                    ix = np.clip(base[:, 0] + dx, 0, nfft - 1)
                    iy = np.clip(base[:, 1] + dy, 0, nfft - 1)
                    iz = np.clip(base[:, 2] + dz, 0, nfft - 1)
                    flat = (ix * nfft + iy) * nfft + iz
                    np.add.at(w, (flat, np.arange(nvert)),
                              cw * r * r * dqr)
    return w.astype(np.float32)


def _half_spectrum_map(nfft: int) -> np.ndarray:
    """[nfft^3] map from fftshift-ed full-spectrum flat indices to
    rfftn half-spectrum flat indices ([nfft, nfft, nfft//2+1] C-order).

    The q-space grid is real, so real(full_spec)[i,j,k] =
    real(half_spec) at the Hermitian mirror — the whole post-FFT
    pipeline (PDF sampling, the radial-quadrature GEMM, the
    normalization sum) can consume the half spectrum directly, halving
    FFT work and spectrum memory vs the complex fftn the reference's
    per-voxel plans take (reference: src/dsi.jl:218-242)."""
    n = nfft
    nh = n // 2 + 1
    s = n // 2
    i, j, k = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                          indexing="ij")
    i2, j2, k2 = (i - s) % n, (j - s) % n, (k - s) % n
    flip = k2 >= nh
    i2 = np.where(flip, (-i2) % n, i2)
    j2 = np.where(flip, (-j2) % n, j2)
    k2 = np.where(flip, n - k2, k2)
    return ((i2 * n + j2) * nh + k2).reshape(-1).astype(np.int32)


@partial(jax.jit, static_argnames=("nfft", "npeak"))
def _dsi_kernel(signals, iq_half, hann, iq_flat, wmat_aug, verts_first,
                nbr, nbr_valid, nfft, npeak=NPEAK):
    """signals [B, nvol] -> pdf [B, nq], odf [B, nvert], peaks, qa terms.

    `wmat_aug` is the half-spectrum radial weight matrix with the
    normalization-count column appended, so the ODF quadrature AND the
    PDF sum come out of ONE MXU GEMM over the real half spectrum."""
    s = jnp.maximum(signals, 0.0)
    valid = s.max(axis=1) > 0

    b = s.shape[0]
    grid = jnp.zeros((b, nfft ** 3), signals.dtype)
    grid = grid.at[:, iq_flat].set(s * hann[None, :])
    grid = grid.reshape(b, nfft, nfft, nfft)

    shift = nfft // 2
    grid = jnp.roll(grid, (shift, shift, shift), axis=(1, 2, 3))
    nh = nfft // 2 + 1
    pr = jnp.real(jnp.fft.rfftn(grid, axes=(1, 2, 3)))
    pr = pr.reshape(b, nfft * nfft * nh)

    aug = jnp.dot(pr, wmat_aug, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    psum = aug[:, -1:]
    odf = aug[:, :-1] / psum

    pdf = pr[:, iq_half] / psum
    odfmin = odf.min(axis=1)

    is_peak = peak_mask(odf, nbr, nbr_valid)
    vals, idx, pvalid = top_peaks(odf, is_peak, npeak)
    pvalid = pvalid & valid[:, None]

    vecs = jnp.where(pvalid[..., None], verts_first[idx], 0.0)
    qa = jnp.where(pvalid, vals - odfmin[:, None], 0.0)

    vz = valid[:, None]
    pdf = jnp.where(vz, pdf, 0.0)
    odf = jnp.where(vz, odf, 0.0)
    odfmean = jnp.where(valid, odf.mean(axis=1), 0.0)
    return pdf, odf, vecs, qa, odfmean, valid


def dsi_rec(dwi: MRI, mask: MRI, odf_dirs: ODF = None,
            hann_width: int = 32, chunk: int = 4096,
            mem_budget: float = 4e9, batch=None, mesh=None,
            wire: str = "auto8") -> DSI:
    """DSI reconstruction of DWIs.  (reference: src/dsi.jl:171-270)

    The per-chunk working set is dominated by the [chunk, nfft^3] q-space
    grid (f32) and its complex spectrum (c64); `chunk` auto-shrinks so
    that stays under `mem_budget` bytes of HBM.

    `batch`: optional prepared `VoxelBatch` (core.batch.prepare_batch) —
    chunks then slice device-resident rows instead of re-gathering and
    re-uploading.  `mesh`: a jax.sharding.Mesh to run each chunk
    data-parallel over the mesh's "data" axis (inferred automatically
    from a mesh-sharded `batch`); the memory budget and chunk size then
    scale by the data-axis size, since the q-space grid is sharded too.
    `wire`: host->device encoding when dsi_rec builds the batch itself —
    default "auto8" (uint8, exact for DSI's normalized outputs up to
    ~1.5e-3 ODF error); pass "f32" for a bit-exact upload, or "u16"/
    "auto" for the 16-bit wire.  Ignored when `batch` is supplied.
    """
    if dwi.bval is None or len(dwi.bval) == 0:
        raise ValueError("Missing b-value table from input DWI structure")
    if dwi.bvec is None or np.asarray(dwi.bvec).size == 0:
        raise ValueError("Missing gradient table from input DWI structure")

    if odf_dirs is None:
        from ..core import odf as _odf
        odf_dirs = _odf.sphere_642

    from ..utils.profiling import prof

    nvert = odf_dirs.nvert_half
    nfft, iq_flat, hann = _dsi_grid(np.asarray(dwi.bval, np.float32),
                                    np.asarray(dwi.bvec, np.float32),
                                    hann_width)
    wmat = _radial_weight_matrix(nfft, odf_dirs)
    _, verts_first, faces0 = half_sphere(odf_dirs)
    nbr, nbr_ok = build_neighbors(faces0, nvert)

    # Fold the Hermitian full->half spectrum mirror into the GEMM
    # operand and the PDF sample indices, and the normalization sum into
    # one extra GEMM column (count of full cells per half cell).
    half_map = _half_spectrum_map(nfft)
    nhalf = nfft * nfft * (nfft // 2 + 1)
    wmat_aug = np.zeros((nhalf, nvert + 1), np.float32)
    np.add.at(wmat_aug[:, :nvert], half_map, wmat)
    wmat_aug[:, nvert] = np.bincount(half_map, minlength=nhalf)
    iq_half = half_map[iq_flat]

    if mesh is None and batch is not None:
        mesh = batch.mesh

    # On accelerator backends, route the signal upload through
    # prepare_batch even when the caller didn't: its chunked, hedged
    # uint8 wire quarters the dominant host->device stage (the raw
    # [Nmask, nvol] gather is ~720 MB float32 at HCP-DSI scale), and DSI
    # is exactly scale-invariant — both the ODF and the PDF are divided
    # by the PDF sum, so the global quantization scale cancels (measured:
    # peak directions unchanged, ODF relative error ~1.5e-3 at 8 bits).
    # `wire` overrides the policy: pass "f32" for an exact upload
    # without constructing a batch manually ("u16"/"auto" also accepted).
    # On CPU the host slices feed chunks directly (no wire to hide).
    if batch is None and jax.default_backend() != "cpu":
        from ..core.batch import prepare_batch
        batch = prepare_batch(dwi, mask, mesh=mesh, wire=wire)
        if mesh is None:
            mesh = batch.mesh

    ndata = int(mesh.shape["data"]) if mesh is not None else 1

    # nfft-aware chunk guard: grid f32 + real half spectrum (c64 over
    # nfft^3/2) + fft scratch ~= 12 bytes per grid cell per voxel (per
    # device when sharded).  A device-resident batch stays live in HBM
    # through every chunk dispatch, so its bytes come out of the budget.
    budget = mem_budget
    if batch is not None:
        budget = max(1e9, mem_budget
                     - batch.signals.size * 4 / max(ndata, 1))
    max_chunk = max(8, int(budget * ndata / (nfft ** 3 * 12)))
    if chunk * ndata > max_chunk:
        chunk = 1 << int(np.floor(np.log2(max_chunk)))
        if chunk % ndata:
            # sharded chunks must split evenly across the data axis
            chunk = max(ndata, (chunk // ndata) * ndata)
    else:
        chunk = chunk * ndata

    if batch is not None:
        idx = batch.idx
        signals = None
    else:
        idx = mask_indices(mask.vol)
        signals = gather_frames(dwi.vol, idx).astype(np.float32)
    n = len(idx)
    nq = len(iq_flat)

    pdf_parts: list = []
    odf_parts: list = []
    vecs_parts: list = []
    qa_parts: list = []
    odfmax_d = jnp.zeros((), jnp.float32)

    args = (jnp.asarray(iq_half), jnp.asarray(hann), jnp.asarray(iq_flat),
            jnp.asarray(wmat_aug), jnp.asarray(verts_first),
            jnp.asarray(nbr), jnp.asarray(nbr_ok))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard_rows = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        args = tuple(jax.device_put(np.asarray(a), repl) for a in args)

    def chunk_rows(lo, hi):
        """[chunk, nvol] device rows for [lo, hi), zero-padded."""
        if batch is not None:
            rows = batch.signals[lo:hi]
            if hi - lo < chunk:
                rows = jnp.pad(rows, ((0, chunk - (hi - lo)), (0, 0)))
        else:
            rows = jnp.asarray(pad_rows(signals[lo:hi], chunk))
        if mesh is not None:
            rows = jax.device_put(rows, shard_rows)
        return rows

    with prof("dsi.chunks"):
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            pdf_c, odf_c, vecs, qa, odfmean, valid = _dsi_kernel(
                chunk_rows(lo, hi), *args, nfft=nfft)
            # Everything stays on device until all chunks are dispatched:
            # a host sync here would serialize dispatch against the wire.
            pdf_parts.append(pdf_c)
            odf_parts.append(odf_c)
            vecs_parts.append(vecs)
            qa_parts.append(qa)
            odfmax_d = jnp.maximum(odfmax_d, odfmean.max())

    # Concatenate the chunked device outputs (padding rows only exist in
    # the final chunk, so order is preserved) and apply the global QA
    # normalization on device (reference: src/dsi.jl:263-267); peaks/qa
    # stay device-resident like the other large outputs.
    with prof("dsi.finalize"):
        if vecs_parts:
            vecs_dev = vecs_parts[0] if len(vecs_parts) == 1 else \
                jnp.concatenate(vecs_parts, axis=0)
            qa_raw = qa_parts[0] if len(qa_parts) == 1 else \
                jnp.concatenate(qa_parts, axis=0)
            qa_dev = jnp.where(odfmax_d > 0, qa_raw / odfmax_d, qa_raw)
        else:
            vecs_dev = jnp.zeros((0, NPEAK, 3), jnp.float32)
            qa_dev = jnp.zeros((0, NPEAK), jnp.float32)

    shape3 = mask.vol.shape[:3]

    # Large per-voxel sheaves (PDF samples, ODF amplitudes) are returned
    # device-resident; MRI.vol materializes them on first host access.
    # Chunks are padded to `chunk` rows, so row i of voxel k is k rounded
    # into its chunk — rebuild the dense [n, .] view by dropping pad rows.
    def lazy_cat(parts, nframes):
        out = MRI.like(mask, nframes, np.float32)
        if len(parts) == 0:        # empty mask
            return out
        if len(parts) == 1:
            vals = parts[0]
        else:
            keep = [p[:chunk] for p in parts]
            # Padding rows only exist in the final chunk (earlier chunks
            # are exactly `chunk` rows), so concatenation preserves order.
            vals = jnp.concatenate(keep, axis=0)
        out.vol = LazyVolume(vals, idx, shape3, nframes)
        return out

    pdf = lazy_cat(pdf_parts, nq)
    odf = lazy_cat(odf_parts, nvert)

    peak, qa = [], []
    for ip in range(NPEAK):
        pm = MRI.like(mask, 3, np.float32)
        pm.vol = LazyVolume(vecs_dev[:, ip, :], idx, shape3, 3)
        peak.append(pm)
        qm = MRI.like(mask, 1, np.float32)
        qm.vol = LazyVolume(qa_dev[:, ip], idx, shape3, 1)
        qa.append(qm)

    from ..core.handoff import DevicePeaks
    return DSI(pdf=pdf, odf=odf, peak=peak, qa=qa,
               _peak_dev=DevicePeaks(vecs=vecs_dev, amp=qa_dev, idx=idx,
                                     ref=mask))


def dsi_write(dsi: DSI, basename: str) -> None:
    """Write DSI volumes as <basename>_<field>[i].nii.gz.
    (reference: src/dsi.jl:279-294)"""
    mri_write_struct(dsi, basename)
