"""DSI reconstruction tests on Cartesian q-space Gaussian phantoms."""

import numpy as np

import fibers_tpu as ft
from fibers_tpu.models.dsi import _dsi_grid, _radial_weight_matrix


def dsi_qspace_tables(radius=2.5, dq2=250.0):
    """Cartesian q-space sampling like a standard DSI acquisition: integer
    grid points with |q| <= radius; bval = |q|^2 * dq2."""
    pts = []
    r = int(np.floor(radius))
    for ix in range(-r, r + 1):
        for iy in range(-r, r + 1):
            for iz in range(-r, r + 1):
                if ix * ix + iy * iy + iz * iz <= radius * radius:
                    pts.append((ix, iy, iz))
    q = np.asarray(pts, np.float64)
    bval = (q ** 2).sum(axis=1) * dq2
    norm = np.sqrt((q ** 2).sum(axis=1))
    bvec = np.zeros_like(q)
    nz = norm > 0
    bvec[nz] = q[nz] / norm[nz, None]
    return bval.astype(np.float32), bvec.astype(np.float32)


def make_dsi_phantom(shape=(5, 5, 5), axis=(1, 0, 0)):
    bval, bvec = dsi_qspace_tables()
    d = np.asarray(axis, np.float64)
    d /= np.linalg.norm(d)
    # Anisotropic Gaussian: fast diffusion along `axis`
    dt = 0.2e-3 * np.eye(3) + 1.5e-3 * np.outer(d, d)
    att = np.exp(-bval * np.einsum("vi,ij,vj->v", bvec, dt, bvec))
    sig = (100.0 * att).astype(np.float32)

    vol = np.broadcast_to(sig, shape + sig.shape).copy()
    dwi = ft.MRI(vol=vol)
    dwi.vox2ras0 = np.eye(4, dtype=np.float32)
    dwi.volsize = np.asarray(shape)
    dwi.width, dwi.height, dwi.depth = shape
    dwi.nframes = len(bval)
    dwi.set_geometry()
    dwi.bval = bval
    dwi.bvec = bvec

    mask = ft.MRI.like(dwi, 1, np.float32)
    mask.vol = np.ones(shape, np.float32)
    return dwi, mask, d


class TestGrid:
    def test_grid_mapping(self):
        bval, bvec = dsi_qspace_tables()
        nfft, iq_flat, hann = _dsi_grid(bval, bvec, 32)
        assert nfft == 8                     # range -2..2 -> 5 -> pow2 = 8
        assert len(np.unique(iq_flat)) == len(iq_flat)
        # center sample (b=0) lands at the grid center
        i0 = int(np.argmin(bval))
        c = nfft // 2
        assert iq_flat[i0] == (c * nfft + c) * nfft + c
        # hanning is 1 at center, decreasing with |q|
        assert hann[i0] == 1.0
        assert hann.min() > 0 and hann.max() <= 1.0

    def test_weight_matrix_columns(self):
        odf_dirs = ft.sphere_362
        w = _radial_weight_matrix(8, odf_dirs)
        assert w.shape == (512, 181)
        # each column integrates r^2 dr over 21 radii; all columns equal sum
        colsums = w.sum(axis=0)
        assert np.allclose(colsums, colsums[0], rtol=1e-5)


class TestDSIRec:
    def test_peak_direction(self):
        dwi, mask, axis = make_dsi_phantom(axis=(1, 0.3, 0.1))
        dsi = ft.dsi_rec(dwi, mask, ft.sphere_642)
        m = mask.vol > 0
        v1 = dsi.peak[0].vol[m]
        norms = np.linalg.norm(v1, axis=1)
        assert (norms > 0).all()
        dots = np.abs((v1 * axis).sum(axis=1)) / norms
        angs = np.degrees(np.arccos(np.clip(dots, 0, 1)))
        # The 8^3 PDF grid + Hanning blur limits oblique-axis angular
        # resolution to ~12 deg (axis-aligned cases are exact; the
        # reference algorithm has the same limit at this grid size)
        assert angs.max() < 15.0

        # pdf frames are the q-grid samples of a real-part PDF normalized
        # over the full grid; off-sample negatives mean the sampled subset
        # can sum above 1 (the reference keeps negatives too)
        pdfsum = dsi.pdf.vol[m].sum(axis=-1)
        assert np.isfinite(pdfsum).all()
        # the center (b=0) sample carries the largest mass
        i0 = int(np.argmin(dwi.bval))
        assert (np.argmax(dsi.pdf.vol[m], axis=-1) == i0).all()

        # qa positive on first peak
        assert (dsi.qa[0].vol[m] > 0).all()

    def test_isotropic_no_preferred_axis(self):
        bval, bvec = dsi_qspace_tables()
        att = np.exp(-bval * 0.7e-3)
        sig = (100.0 * att).astype(np.float32)
        shape = (3, 3, 3)
        vol = np.broadcast_to(sig, shape + sig.shape).copy()
        dwi = ft.MRI(vol=vol)
        dwi.vox2ras0 = np.eye(4, dtype=np.float32)
        dwi.volsize = np.asarray(shape)
        dwi.width, dwi.height, dwi.depth = shape
        dwi.nframes = len(bval)
        dwi.set_geometry()
        dwi.bval, dwi.bvec = bval, bvec
        mask = ft.MRI.like(dwi, 1, np.float32)
        mask.vol = np.ones(shape, np.float32)

        dsi = ft.dsi_rec(dwi, mask, ft.sphere_362)
        odf = dsi.odf.vol[1, 1, 1]
        # isotropic: odf variation across vertices is small (grid
        # anisotropy of the coarse 8^3 FFT leaves ~6% ripple)
        assert odf.std() / odf.mean() < 0.1

    def test_write(self, tmp_path):
        import os
        dwi, mask, _ = make_dsi_phantom(shape=(3, 3, 3))
        dsi = ft.dsi_rec(dwi, mask, ft.sphere_362)
        base = str(tmp_path / "dsifit")
        ft.dsi_write(dsi, base)
        for f in ("pdf", "odf", "peak1", "qa1"):
            assert os.path.isfile(f"{base}_{f}.nii.gz"), f


def test_dsi_nfft32_memory_guard_matches_oracle(rng):
    """A wide q-space grid (nfft=32) with a small memory budget: the
    chunk auto-shrink guard engages and results still match the
    per-voxel oracle (VERDICT r1 item 4)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import oracle

    # sparse sampling of a radius-8 Cartesian grid -> nfft = 32
    rng2 = np.random.default_rng(3)
    pts = [(8, 0, 0), (-8, 0, 0), (0, 8, 0), (0, -8, 0), (0, 0, 8),
           (0, 0, -8), (0, 0, 0)]
    while len(pts) < 40:
        p = tuple(rng2.integers(-8, 9, 3))
        if 0 < np.linalg.norm(p) <= 8 and p not in pts:
            pts.append(p)
    q = np.array(pts, np.float64)
    norm = np.linalg.norm(q, axis=1)
    bvec = np.where(norm[:, None] > 0,
                    q / np.maximum(norm, 1e-30)[:, None], 0.0)
    bval = (norm ** 2) * 125.0     # dq = sqrt(125)

    shape = (2, 2, 1)
    vol = (np.abs(rng.standard_normal((*shape, len(q)))) * 40 + 5).astype(
        np.float32)
    dwi = ft.MRI(vol=vol)
    dwi.vox2ras0 = np.eye(4, dtype=np.float32)
    dwi.volsize = np.asarray(shape)
    dwi.width, dwi.height, dwi.depth = shape
    dwi.nframes = len(q)
    dwi.set_geometry()
    dwi.bval = bval.astype(np.float32)
    dwi.bvec = bvec.astype(np.float32)
    mask = ft.MRI.like(dwi, 1, np.float32)
    mask.vol[:] = 1

    # ~50 MB budget at nfft=32 (32^3 * 20 B = 655 KB/voxel) -> chunk <= 64
    dsi = ft.dsi_rec(dwi, mask, ft.sphere_362, mem_budget=50e6)
    odf_vol = np.asarray(dsi.odf.vol)
    pdf_vol = np.asarray(dsi.pdf.vol)

    for ix in range(2):
        for iy in range(2):
            pdf_ref, odf_ref = oracle.dsi_voxel_oracle(
                vol[ix, iy, 0].astype(np.float64), bval, bvec,
                np.asarray(ft.sphere_362.vertices))
            np.testing.assert_allclose(pdf_vol[ix, iy, 0], pdf_ref,
                                       rtol=5e-4, atol=5e-6)
            np.testing.assert_allclose(odf_vol[ix, iy, 0], odf_ref,
                                       rtol=5e-4, atol=5e-6)
