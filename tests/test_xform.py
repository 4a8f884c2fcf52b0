"""Registration-transform tests: .lta/.mat readers, composition, apply."""

import numpy as np
import pytest

import fibers_tpu as ft


LTA_VOX = """# transform file
type      = 0 # LINEAR_VOX_TO_VOX
nxforms   = 1
mean      = 0.0 0.0 0.0
sigma     = 1.0
1 4 4
0.9 0.1 0.0 2.0
-0.1 0.9 0.0 -1.0
0.0 0.0 1.0 0.5
0.0 0.0 0.0 1.0
src volume info
valid = 1
filename = src.mgz
volume = 32 32 20
voxelsize = 2.0 2.0 2.5
xras   = -1.0 0.0 0.0
yras   = 0.0 0.0 -1.0
zras   = 0.0 1.0 0.0
cras   = 1.0 2.0 3.0
dst volume info
valid = 1
filename = dst.mgz
volume = 64 64 40
voxelsize = 1.0 1.0 1.25
xras   = -1.0 0.0 0.0
yras   = 0.0 0.0 -1.0
zras   = 0.0 1.0 0.0
cras   = 0.0 0.0 0.0
"""


@pytest.fixture
def lta_file(tmp_path):
    p = tmp_path / "reg.lta"
    p.write_text(LTA_VOX)
    return str(p)


class TestLTA:
    def test_read_vox_to_vox(self, lta_file):
        xfm = ft.xfm_read(lta_file)
        assert list(xfm.insize) == [32, 32, 20]
        assert list(xfm.outsize) == [64, 64, 40]
        assert np.allclose(xfm.inres, [2.0, 2.0, 2.5])
        expect = np.array([[0.9, 0.1, 0, 2], [-0.1, 0.9, 0, -1],
                           [0, 0, 1, 0.5], [0, 0, 0, 1]])
        assert np.allclose(xfm.vox2vox, expect, atol=1e-6)
        # ras2ras consistency: out_v2r * vox2vox * inv(in_v2r)
        recon = (xfm.outvox2ras.astype(np.float64) @ xfm.vox2vox
                 @ np.linalg.inv(xfm.invox2ras.astype(np.float64)))
        assert np.allclose(xfm.ras2ras, recon, atol=1e-4)

    def test_ras_to_ras_roundtrip(self, tmp_path, lta_file):
        """A RAS_TO_RAS .lta with regmat = ras2ras of the VOX file gives
        the same vox2vox."""
        base = ft.xfm_read(lta_file)
        txt = LTA_VOX.replace("type      = 0 # LINEAR_VOX_TO_VOX",
                              "type      = 1 # LINEAR_RAS_TO_RAS")
        rows = []
        for r in np.asarray(base.ras2ras, np.float64):
            rows.append(" ".join(f"{v:.10f}" for v in r))
        old = ("0.9 0.1 0.0 2.0\n-0.1 0.9 0.0 -1.0\n"
               "0.0 0.0 1.0 0.5\n0.0 0.0 0.0 1.0")
        txt = txt.replace(old, "\n".join(rows))
        p = tmp_path / "reg_ras.lta"
        p.write_text(txt)
        xfm = ft.xfm_read(str(p))
        assert np.allclose(xfm.vox2vox, base.vox2vox, atol=1e-4)

    def test_inv_compose_identity(self, lta_file):
        xfm = ft.xfm_read(lta_file)
        ident = ft.xfm_compose(ft.xfm_inv(xfm), xfm)
        assert np.allclose(ident.vox2vox, np.eye(4), atol=1e-5)
        assert np.allclose(ident.ras2ras, np.eye(4), atol=1e-4)

    def test_apply_points(self, lta_file):
        xfm = ft.xfm_read(lta_file)
        pts = np.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]], np.float32)
        out = ft.xfm_apply(xfm, pts)
        m = xfm.vox2vox.astype(np.float64)
        for i in range(2):
            h = m @ np.append(pts[i], 1.0)
            assert np.allclose(out[i], h[:3] / h[3], atol=1e-5)
        # 3xN layout (packed triplets, column-major like the reference)
        out2 = ft.xfm_apply(xfm, pts.T)
        assert np.allclose(out2, out.T, atol=1e-5)

    def test_rotate_preserves_norm(self, lta_file):
        xfm = ft.xfm_read(lta_file)
        v = np.array([1.0, 1.0, 0.0])
        r = ft.xfm_rotate(xfm, v)
        assert np.isclose(np.linalg.norm(r), np.linalg.norm(v), atol=1e-5)
        # rotation part of a near-rotation matrix: orthogonal
        assert np.allclose(xfm.voxrot @ xfm.voxrot.T, np.eye(3), atol=1e-5)

    def test_missing_fields_raise(self, tmp_path):
        p = tmp_path / "bad.lta"
        p.write_text("type = 0\n")
        with pytest.raises(ValueError):
            ft.xfm_read(str(p))


class TestFSLMat:
    def test_read_mat(self, tmp_path, tmp_mri):
        mri, _ = tmp_mri
        mat = np.eye(4)
        mat[0, 3] = 3.0
        p = tmp_path / "reg.mat"
        np.savetxt(str(p), mat)
        xfm = ft.xfm_read_mat(str(p), mri, mri)
        assert xfm.vox2vox.shape == (4, 4)
        # identity rotation component
        assert np.allclose(xfm.voxrot, np.eye(3), atol=1e-5)


class TestStrXform:
    def test_streamline_transform(self, lta_file, rng):
        xfm = ft.xfm_read(lta_file)

        ref = ft.MRI(vol=np.ones((32, 32, 20), np.float32))
        ref.vox2ras0 = xfm.invox2ras.copy()
        ref.volsize = np.array([32, 32, 20])
        ref.width, ref.height, ref.depth = 32, 32, 20
        ref.nframes = 1
        ref.set_geometry()

        tr = ft.Tract.from_ref(ref)
        xyz = [rng.uniform(0, 19, (3, 5)).astype(np.float32)]
        ft.str_add(tr, xyz)

        out = ft.str_xform(xfm, tr)
        assert list(out.dim) == [64, 64, 40]
        assert np.allclose(out.voxel_size, [1.0, 1.0, 1.25])
        assert np.allclose(out.vox_to_ras, xfm.outvox2ras, atol=1e-5)
        m = xfm.vox2vox.astype(np.float64)
        for ipt in range(5):
            h = m @ np.append(xyz[0][:, ipt], 1.0)
            assert np.allclose(out.xyz[0][:, ipt], h[:3] / h[3], atol=1e-4)
