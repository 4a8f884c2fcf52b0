"""DTI/ADC fit tests against analytic phantoms and the 3x3 eigensolver."""

import numpy as np
import pytest

import fibers_tpu as ft
from fibers_tpu.ops.eig3 import eigh3, eigvalsh3

from phantom import make_phantom, tensor_from_axis


class TestEig3:
    def test_matches_numpy(self, rng):
        u = rng.standard_normal((500, 6)).astype(np.float32)
        evals, evecs = map(np.asarray, eigh3(u))
        for i in range(500):
            m = np.array([[u[i, 0], u[i, 1], u[i, 2]],
                          [u[i, 1], u[i, 3], u[i, 4]],
                          [u[i, 2], u[i, 4], u[i, 5]]])
            ref_vals, ref_vecs = np.linalg.eigh(m)
            assert np.allclose(evals[i], ref_vals[::-1], atol=2e-5), i
            # eigenvectors up to sign
            for k in range(3):
                v = evecs[i, :, k]
                w = ref_vecs[:, 2 - k]
                assert min(np.linalg.norm(v - w),
                           np.linalg.norm(v + w)) < 5e-3, (i, k)

    def test_orthonormal(self, rng):
        u = rng.standard_normal((200, 6)).astype(np.float32)
        _, evecs = map(np.asarray, eigh3(u))
        gram = np.einsum("nik,nil->nkl", evecs, evecs)
        assert np.allclose(gram, np.eye(3), atol=1e-4)

    def test_degenerate(self):
        # isotropic, axially symmetric, and rank-1 cases
        cases = np.array([
            [2.0, 0, 0, 2.0, 0, 2.0],        # isotropic
            [3.0, 0, 0, 1.0, 0, 1.0],        # two equal small
            [2.0, 0, 0, 2.0, 0, 5.0],        # two equal large
            [1.0, 0, 0, 0.0, 0, 0.0],        # rank 1
        ], np.float32)
        evals, evecs = map(np.asarray, eigh3(cases))
        for i, u in enumerate(cases):
            m = np.array([[u[0], u[1], u[2]],
                          [u[1], u[3], u[4]],
                          [u[2], u[4], u[5]]])
            ref = np.linalg.eigvalsh(m)[::-1]
            assert np.allclose(evals[i], ref, atol=1e-5)
            # residual check: M v = lambda v
            for k in range(3):
                r = m @ evecs[i, :, k] - evals[i, k] * evecs[i, :, k]
                assert np.linalg.norm(r) < 1e-4, (i, k)
            gram = evecs[i].T @ evecs[i]
            assert np.allclose(gram, np.eye(3), atol=1e-5)


class TestDTIFit:
    def test_recovers_tensor(self):
        dwi, mask, axes, (lp, lt) = make_phantom(shape=(8, 8, 8), ndir=30)
        dti = ft.dti_fit(dwi, mask)

        m = mask.vol > 0
        # eigenvalues
        assert np.allclose(dti.eigval1.vol[m], lp, rtol=1e-3)
        assert np.allclose(dti.eigval2.vol[m], lt, rtol=2e-2)
        assert np.allclose(dti.eigval3.vol[m], lt, rtol=2e-2)
        # s0
        assert np.allclose(dti.s0.vol[m], 100.0, rtol=1e-3)
        # principal direction matches (up to sign)
        v1 = dti.eigvec1.vol[m]
        ax = axes[m]
        dots = np.abs((v1 * ax).sum(axis=1))
        assert dots.min() > 0.999
        # masked-out voxels are zero
        assert np.all(dti.fa.vol[~m] == 0)

        # FA/MD closed forms
        md_true = (lp + 2 * lt) / 3
        assert np.allclose(dti.md.vol[m], md_true, rtol=1e-3)
        fa_true = np.sqrt(1.5 * ((lp - md_true) ** 2 + 2 * (lt - md_true) ** 2)
                          / (lp ** 2 + 2 * lt ** 2))
        assert np.allclose(dti.fa.vol[m], fa_true, rtol=1e-3)
        assert np.allclose(dti.rd.vol[m], lt, rtol=2e-2)

    def test_nonpositive_signals_subset_path(self):
        """Voxels with some nonpositive signals use the positive subset,
        matching the reference's ragged re-pinv path."""
        dwi, mask, axes, (lp, lt) = make_phantom(shape=(4, 4, 4), ndir=30)
        # Corrupt 3 measurements in one voxel to zero/negative
        dwi.vol[2, 2, 2, 5] = 0.0
        dwi.vol[2, 2, 2, 9] = -1.0
        dwi.vol[2, 2, 2, 12] = 0.0
        dti = ft.dti_fit(dwi, mask)
        # Fit still recovers the tensor from remaining 28 directions
        assert abs(dti.eigval1.vol[2, 2, 2] - lp) / lp < 1e-2
        v1 = dti.eigvec1.vol[2, 2, 2]
        assert abs(np.dot(v1, axes[2, 2, 2])) > 0.99

    def test_too_few_positives_invalid(self):
        dwi, mask, _, _ = make_phantom(shape=(4, 4, 4), ndir=30)
        dwi.vol[1, 1, 1, :] = 0.0
        dwi.vol[1, 1, 1, 0:5] = 100.0  # only 5 positives -> invalid
        dti = ft.dti_fit(dwi, mask)
        assert dti.fa.vol[1, 1, 1] == 0
        assert dti.s0.vol[1, 1, 1] == 0

    def test_no_positive_b0_invalid(self):
        dwi, mask, _, _ = make_phantom(shape=(4, 4, 4), ndir=30)
        dwi.vol[1, 2, 1, 0] = 0.0  # kill the only b=0 -> subset path invalid
        dti = ft.dti_fit(dwi, mask)
        assert dti.fa.vol[1, 2, 1] == 0

    def test_missing_tables_raise(self):
        dwi, mask, _, _ = make_phantom(shape=(4, 4, 4), ndir=6)
        dwi.bval = np.zeros(0, np.float32)
        with pytest.raises(ValueError):
            ft.dti_fit(dwi, mask)


class TestADC:
    def test_recovers_adc(self):
        dwi, mask, _, (lp, lt) = make_phantom(shape=(6, 6, 6), ndir=30)
        adc, s0 = ft.adc_fit(dwi, mask)
        m = mask.vol > 0
        md_true = (lp + 2 * lt) / 3
        # ADC from a tensor phantom: log-linear fit over all directions
        # lands near MD (exact for isotropic; tensor spread ~ few %)
        assert np.allclose(adc.vol[m].mean(), md_true, rtol=0.1)
        assert np.allclose(s0.vol[m], 100.0, rtol=0.05)


class TestWriteRead:
    def test_dti_write_roundtrip(self, tmp_path):
        dwi, mask, _, _ = make_phantom(shape=(4, 4, 4), ndir=12)
        dti = ft.dti_fit(dwi, mask)
        base = str(tmp_path / "dtifit")
        ft.dti_write(dti, base)
        import os
        for f in ("s0", "eigval1", "eigvec1", "fa", "md", "rd"):
            assert os.path.isfile(f"{base}_{f}.nii.gz"), f
        back = ft.mri_read_struct(base, ft.DTI)
        assert np.allclose(back.fa.vol, np.squeeze(dti.fa.vol), atol=1e-6)
        assert np.allclose(back.eigvec1.vol, dti.eigvec1.vol, atol=1e-6)
