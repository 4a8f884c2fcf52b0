"""I/O round-trip tests: NIfTI, MGH, b-tables, .trk, struct convention.

The reference's write-size checksums (src/mri.jl:2020-2024, src/mri.jl:2153-
2158, src/trk.jl:486-492) define the byte-exact payload sizes; these tests
verify both payload fidelity and header semantics through full round trips.
"""

import gzip
import os

import numpy as np
import pytest

import fibers_tpu as ft


def _geom_matrix():
    return np.array(
        [[-1.5, 0, 0, 12.5], [0, 0, 1.5, -31], [0, -1.5, 0, 7], [0, 0, 0, 1]],
        np.float32)


class TestNifti:
    def test_roundtrip_float32(self, tmp_mri):
        mri, tmp = tmp_mri
        p = str(tmp / "vol.nii.gz")
        assert ft.mri_write(mri, p) is False
        m2 = ft.mri_read(p)
        assert np.array_equal(m2.vol, mri.vol)
        assert np.allclose(m2.vox2ras0, mri.vox2ras0, atol=1e-4)
        assert np.allclose(m2.bval, mri.bval)
        assert np.allclose(m2.bvec, mri.bvec, atol=1e-6)
        assert m2.nframes == 9
        assert tuple(m2.volsize) == (6, 7, 8)
        assert np.allclose(m2.volres, [2, 2, 2.5])

    def test_roundtrip_uncompressed(self, tmp_mri):
        mri, tmp = tmp_mri
        p = str(tmp / "vol.nii")
        ft.mri_write(mri, p)
        m2 = ft.mri_read(p)
        assert np.array_equal(m2.vol, mri.vol)

    @pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32,
                                       np.float32, np.float64, np.int8,
                                       np.uint16, np.uint32])
    def test_dtypes(self, tmp_path, dtype):
        vol = (np.arange(2 * 3 * 4).reshape(2, 3, 4) % 120).astype(dtype)
        mri = ft.MRI(vol=vol)
        mri.vox2ras0 = _geom_matrix()
        p = str(tmp_path / "d.nii.gz")
        ft.mri_write(mri, p)
        m2 = ft.mri_read(p)
        assert m2.vol.dtype == dtype
        assert np.array_equal(m2.vol, vol)

    def test_qform_only(self, tmp_mri):
        """When sform_code is 0, vox2ras comes from the qform quaternion."""
        mri, tmp = tmp_mri
        p = str(tmp / "vol.nii")
        ft.mri_write(mri, p)
        # Zero out the sform code in the written header (byte offset 348-28=
        # field sform_code at offset 344+... easier: rewrite via numpy)
        from fibers_tpu.core.mri import nifti1_dtype
        with open(p, "rb") as f:
            buf = bytearray(f.read())
        rec = np.frombuffer(bytes(buf[:348]), dtype=nifti1_dtype())[0].copy()
        rec["sform_code"] = 0
        buf[:348] = rec.tobytes()
        with open(p, "wb") as f:
            f.write(bytes(buf))
        m2 = ft.mri_read(p)
        # qform is 6-DOF: reproduces the rigid+scale part of vox2ras0
        assert np.allclose(m2.vox2ras0, mri.vox2ras0, atol=1e-3)

    def test_unit_scaling_meters(self, tmp_mri):
        mri, tmp = tmp_mri
        p = str(tmp / "vol.nii")
        ft.mri_write(mri, p)
        from fibers_tpu.core.mri import nifti1_dtype
        with open(p, "rb") as f:
            buf = bytearray(f.read())
        rec = np.frombuffer(bytes(buf[:348]), dtype=nifti1_dtype())[0].copy()
        rec["xyzt_units"] = 1 | 16  # meters, msec
        pixdim = rec["pixdim"].copy()
        pixdim[1:4] /= 1000.0
        rec["pixdim"] = pixdim
        srow = {r: rec[r].copy() / 1000.0 for r in ("srow_x", "srow_y",
                                                    "srow_z")}
        for r, v in srow.items():
            rec[r] = v
        buf[:348] = rec.tobytes()
        with open(p, "wb") as f:
            f.write(bytes(buf))
        m2 = ft.mri_read(p)
        assert np.allclose(m2.volres, [2, 2, 2.5], atol=1e-4)
        assert np.allclose(m2.vox2ras0, mri.vox2ras0, atol=1e-3)

    def test_scl_slope_rescale(self, tmp_path):
        vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        mri = ft.MRI(vol=vol)
        mri.vox2ras0 = _geom_matrix()
        p = str(tmp_path / "s.nii")
        ft.mri_write(mri, p)
        from fibers_tpu.core.mri import nifti1_dtype
        with open(p, "rb") as f:
            buf = bytearray(f.read())
        rec = np.frombuffer(bytes(buf[:348]), dtype=nifti1_dtype())[0].copy()
        rec["scl_slope"] = 2.0
        rec["scl_inter"] = 1.0
        buf[:348] = rec.tobytes()
        with open(p, "wb") as f:
            f.write(bytes(buf))
        m2 = ft.mri_read(p)
        assert np.allclose(m2.vol, vol * 2 + 1)

    def test_big_endian_read(self, tmp_mri):
        """Byte-swapped files (e.g. written on big-endian machines) load."""
        mri, tmp = tmp_mri
        p = str(tmp / "vol.nii")
        ft.mri_write(mri, p)
        from fibers_tpu.core.mri import nifti1_dtype
        with open(p, "rb") as f:
            buf = f.read()
        rec = np.frombuffer(buf[:348], dtype=nifti1_dtype())[0]
        be = np.zeros((), dtype=nifti1_dtype(">"))[()]
        for name in rec.dtype.names:
            be[name] = rec[name]
        data = np.frombuffer(buf[352:], dtype="<f4").astype(">f4")
        p2 = str(tmp / "be.nii")
        with open(p2, "wb") as f:
            f.write(be.tobytes())
            f.write(b"\x00" * 4)
            f.write(data.tobytes())
        m2 = ft.mri_read(p2)
        assert m2.niftihdr.do_bswap
        assert np.array_equal(m2.vol, mri.vol)
        assert np.allclose(m2.vox2ras0, mri.vox2ras0, atol=1e-4)

    def test_header_only(self, tmp_mri):
        mri, tmp = tmp_mri
        p = str(tmp / "vol.nii.gz")
        ft.mri_write(mri, p)
        m2 = ft.mri_read(p, headeronly=True)
        assert tuple(m2.volsize) == (6, 7, 8)
        assert m2.nframes == 9

    def test_permutedata(self, tmp_mri):
        mri, tmp = tmp_mri
        p = str(tmp / "vol.nii.gz")
        ft.mri_write(mri, p)
        m2 = ft.mri_read(p, permutedata=True)
        assert m2.ispermuted
        assert m2.vol.shape == (7, 6, 8, 9)
        assert np.array_equal(m2.vol, np.transpose(mri.vol, (1, 0, 2, 3)))
        # write-out restores on-disk layout
        p2 = str(tmp / "vol2.nii.gz")
        ft.mri_write(m2, p2)
        m3 = ft.mri_read(p2)
        assert np.array_equal(m3.vol, mri.vol)


class TestMGH:
    @pytest.mark.parametrize("ext", ["mgh", "mgz"])
    def test_roundtrip(self, tmp_mri, ext):
        mri, tmp = tmp_mri
        p = str(tmp / f"vol.{ext}")
        assert ft.mri_write(mri, p) is False
        m2 = ft.mri_read(p)
        assert np.array_equal(m2.vol, mri.vol)
        assert np.allclose(m2.vox2ras0, mri.vox2ras0, atol=1e-4)

    def test_mr_parms(self, tmp_mri):
        mri, tmp = tmp_mri
        mri.tr, mri.te, mri.ti, mri.flip_angle = 2000.0, 30.0, 1100.0, 1.2
        p = str(tmp / "vol.mgz")
        ft.mri_write(mri, p)
        m2 = ft.mri_read(p)
        assert (m2.tr, m2.te, m2.ti) == (2000.0, 30.0, 1100.0)
        assert abs(m2.flip_angle - 1.2) < 1e-6

    @pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16,
                                       np.int32, np.float32])
    def test_dtypes(self, tmp_path, dtype):
        vol = (np.arange(2 * 3 * 4).reshape(2, 3, 4) % 100).astype(dtype)
        mri = ft.MRI(vol=vol)
        mri.vox2ras0 = _geom_matrix()
        p = str(tmp_path / "d.mgh")
        ft.mri_write(mri, p)
        m2 = ft.mri_read(p)
        assert m2.vol.dtype == dtype
        assert np.array_equal(np.squeeze(m2.vol), vol)

    def test_subset_slices_frames(self, tmp_mri):
        mri, tmp = tmp_mri
        p = str(tmp / "vol.mgh")
        ft.mri_write(mri, p)
        vol, M, parms, volsz = ft.load_mgh(p, slices=[2, 4], frames=[1, 3, 5])
        assert vol.shape == (6, 7, 2, 3)
        assert np.array_equal(vol[:, :, 0, 0], mri.vol[:, :, 1, 0])
        assert np.array_equal(vol[:, :, 1, 2], mri.vol[:, :, 3, 4])


class TestBTables:
    def test_row_and_column_layouts(self, tmp_path):
        bval = np.array([0, 1000, 2000, 3000], np.float32)
        bvec = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                        np.float32)
        f1 = str(tmp_path / "b.bvals")
        f2 = str(tmp_path / "b.bvecs")
        np.savetxt(f1, bval[None, :])          # row layout
        np.savetxt(f2, bvec.T)                 # 3 x n layout
        b, g = ft.mri_read_bfiles(f1, f2)
        assert np.allclose(b, bval)
        assert np.allclose(g, bvec)
        # order-independent
        b2, g2 = ft.mri_read_bfiles(f2, f1)
        assert np.allclose(b2, bval) and np.allclose(g2, bvec)

    def test_mismatch_raises(self, tmp_path):
        f1 = str(tmp_path / "b.bvals")
        f2 = str(tmp_path / "b.bvecs")
        np.savetxt(f1, np.zeros(3))
        np.savetxt(f2, np.zeros((4, 3)))
        with pytest.raises(ValueError):
            ft.mri_read_bfiles(f1, f2)


class TestTrk:
    def _tract(self, rng):
        ref = ft.MRI(vol=np.ones((10, 12, 14), np.float32))
        ref.vox2ras0 = _geom_matrix()
        ref.volsize = np.array([10, 12, 14])
        ref.width, ref.height, ref.depth = 10, 12, 14
        ref.nframes = 1
        ref.set_geometry()
        tr = ft.Tract.from_ref(ref)
        xyz = [rng.uniform(0, 9, (3, n)).astype(np.float32)
               for n in (5, 8, 3)]
        ft.str_add(tr, xyz)
        return tr, xyz

    def test_roundtrip(self, tmp_path, rng):
        tr, xyz = self._tract(rng)
        p = str(tmp_path / "t.trk")
        assert ft.trk_write(tr, p) is False
        t2 = ft.trk_read(p)
        assert t2.n_count == 3
        assert list(t2.npts) == [5, 8, 3]
        for a, b in zip(t2.xyz, xyz):
            assert np.allclose(a, b, atol=1e-5)
        assert np.array_equal(t2.dim, tr.dim)
        assert np.allclose(t2.voxel_size, tr.voxel_size)
        assert np.allclose(t2.vox_to_ras, tr.vox_to_ras, atol=1e-5)
        assert bytes(t2.voxel_order[:3]).decode() == "LIA"

    def test_scalars_properties(self, tmp_path, rng):
        ref = ft.MRI(vol=np.ones((4, 4, 4), np.float32))
        ref.vox2ras0 = _geom_matrix()
        ref.volsize = np.array([4, 4, 4])
        ref.width = ref.height = ref.depth = 4
        ref.nframes = 1
        ref.set_geometry()
        tr = ft.Tract.from_ref(ref)
        xyz = [rng.uniform(0, 3, (3, n)).astype(np.float32) for n in (4, 6)]
        scal = [rng.standard_normal((2, n)).astype(np.float32)
                for n in (4, 6)]
        props = rng.standard_normal((3, 2)).astype(np.float32)
        ft.str_add(tr, xyz, scal, props)
        p = str(tmp_path / "t.trk")
        assert ft.trk_write(tr, p) is False
        t2 = ft.trk_read(p)
        assert t2.n_scalars == 2 and t2.n_properties == 3
        for a, b in zip(t2.scalars, scal):
            assert np.allclose(a, b, atol=1e-6)
        assert np.allclose(t2.properties, props, atol=1e-6)

    def test_merge(self, rng):
        tr1, _ = self._tract(rng)
        tr2, _ = self._tract(rng)
        tr = ft.str_merge(tr1, tr2)
        assert tr.n_count == 6
        assert len(tr.xyz) == 6


    def test_truncated_file_dedicated_error(self, tmp_path, rng):
        """A .trk cut mid-record (even mid-word) fails with the malformed-
        stream error, not an opaque numpy one."""
        tr, _ = self._tract(rng)
        p = str(tmp_path / "t.trk")
        ft.trk_write(tr, p)
        data = open(p, "rb").read()
        for cut in (len(data) - 5, len(data) - 2):
            pt = str(tmp_path / f"trunc{cut}.trk")
            open(pt, "wb").write(data[:cut])
            with pytest.raises(ValueError, match="Malformed .trk"):
                ft.trk_read(pt)

    def test_sink_append_deltas_bit_exact(self, tmp_path, rng):
        """The fused native delta->trk path writes byte-identical files
        to the unfused decode_delta_lines + append composition."""
        from fibers_tpu import native
        from fibers_tpu.io.trk import TrkSink
        from fibers_tpu.tract.stream import _decode_points

        if native.lib() is None:
            pytest.skip("native helpers unavailable")

        tr, _ = self._tract(rng)
        tr.npts = np.zeros(0, np.int32)
        tr.__dict__["xyz"] = []

        qscale = 127.0 / 0.5
        npts = rng.integers(1, 40, size=37).astype(np.int32)
        total = int(npts.sum())
        # first slot of each line is a zero delta, like the wire
        q = rng.integers(-127, 128, size=(total, 3)).astype(np.int8)
        off = np.concatenate([[0], np.cumsum(npts)[:-1]])
        q[off] = 0
        anchors = rng.uniform(0, 9, (len(npts), 3)).astype(np.float32)

        p_fused = str(tmp_path / "fused.trk")
        with TrkSink(p_fused, tr, len(npts)) as sink:
            assert sink.append_deltas(q.reshape(-1), npts, anchors,
                                      qscale)

        p_ref = str(tmp_path / "unfused.trk")
        pts = _decode_points(q.reshape(-1).view(np.uint8), total, "i8",
                             npts=npts, anchors=anchors, qscale=qscale)
        with TrkSink(p_ref, tr, len(npts)) as sink:
            sink.append(pts, npts)

        a = open(p_fused, "rb").read()
        b = open(p_ref, "rb").read()
        assert a == b

    def test_sink_count_mismatch_raises(self, tmp_path, rng):
        from fibers_tpu.io.trk import TrkSink

        tr, xyz = self._tract(rng)
        p = str(tmp_path / "bad.trk")
        sink = TrkSink(p, tr, 5)    # promise 5 lines
        sink.append(np.concatenate([m.T for m in xyz]),
                    np.array([m.shape[1] for m in xyz]))  # deliver 3
        with pytest.raises(IOError, match="5 streamlines but 3"):
            sink.close()


class TestStructConvention:
    def test_write_read_struct(self, tmp_path, rng):
        from dataclasses import dataclass
        from typing import List

        ref = ft.MRI(vol=rng.standard_normal((4, 5, 6)).astype(np.float32))
        ref.vox2ras0 = _geom_matrix()
        ref.volsize = np.array([4, 5, 6])
        ref.width, ref.height, ref.depth = 4, 5, 6
        ref.nframes = 1
        ref.set_geometry()

        @dataclass
        class Demo:
            a: ft.MRI
            peak: List[ft.MRI]
            snr: float

        peaks = []
        for _ in range(2):
            m = ft.MRI.like(ref, 3, np.float32)
            m.vol = rng.standard_normal(m.vol.shape).astype(np.float32)
            peaks.append(m)
        demo = Demo(a=ref, peak=peaks, snr=12.5)

        base = str(tmp_path / "demo")
        ft.mri_write_struct(demo, base)
        assert os.path.isfile(base + "_a.nii.gz")
        assert os.path.isfile(base + "_peak1.nii.gz")
        assert os.path.isfile(base + "_peak2.nii.gz")
        assert os.path.isfile(base + "_snr.txt")

        back = ft.mri_read_struct(base, Demo)
        assert np.allclose(back.a.vol, ref.vol)
        assert len(back.peak) == 2
        assert np.allclose(back.peak[1].vol, peaks[1].vol)
        assert back.snr == 12.5

        # the reference's exact spelling: the two-arg mri_read dispatch
        # (reference: src/mri.jl:2276-2311, used by the tutorial as
        # mri_read(indir*"/rumba100", RUMBASD))
        back2 = ft.mri_read(base, Demo)
        assert np.allclose(back2.a.vol, ref.vol)
        assert back2.snr == 12.5

        # write-side mirror: mri_write(struct, base) routes to
        # mri_write_struct
        base3 = str(tmp_path / "demo3")
        ft.mri_write(demo, base3)
        back3 = ft.mri_read(base3, Demo)
        assert np.allclose(back3.peak[0].vol, peaks[0].vol)
        assert back3.snr == 12.5

    def test_two_arg_mri_read_rejects_non_type(self, tmp_path):
        with pytest.raises(TypeError, match="result-struct type"):
            ft.mri_read(str(tmp_path / "x"), "nope")
        # ints are NOT silently treated as headeronly (only bool is)
        with pytest.raises(TypeError, match="result-struct type"):
            ft.mri_read(str(tmp_path / "x"), 42)

    def test_two_arg_mri_read_bool_is_headeronly(self, tmp_path, rng):
        """Pre-round-5 positional compatibility: mri_read(path, True)
        is a headeronly read."""
        m = ft.MRI(vol=rng.standard_normal((4, 4, 4)).astype(np.float32))
        m.vox2ras0 = _geom_matrix()
        p = str(tmp_path / "h.nii.gz")
        ft.mri_write(m, p)
        hdr = ft.mri_read(p, True)
        assert hdr.vol.size == 0 and tuple(hdr.volsize[:3]) == (4, 4, 4)

    def test_legacy_positional_shift(self, tmp_path, rng):
        """Pre-round-5 3-positional form mri_read(path, headeronly,
        permutedata) keeps every legacy positional in its old slot —
        permutedata must not be silently dropped."""
        m = ft.MRI(vol=rng.standard_normal((3, 5, 4)).astype(np.float32))
        m.vox2ras0 = _geom_matrix()
        p = str(tmp_path / "l.nii.gz")
        ft.mri_write(m, p)
        got = ft.mri_read(p, False, True)      # headeronly=F, permute=T
        want = ft.mri_read(p, permutedata=True)
        assert got.vol.shape == want.vol.shape == (5, 3, 4)
        assert np.array_equal(got.vol, want.vol)
        # the struct form takes options as keywords only
        with pytest.raises(TypeError, match="keywords"):
            ft.mri_read(p, ft.DTI, True)
        # positionals without the legacy bool are rejected, not misbound
        with pytest.raises(TypeError):
            ft.mri_read(p, None, True)


class TestGeometry:
    def test_vox2ras_0to1(self):
        m0 = _geom_matrix()
        m1 = ft.vox2ras_0to1(m0)
        p0 = m0 @ np.array([3, 4, 5, 1.0])
        p1 = m1 @ np.array([4, 5, 6, 1.0])
        assert np.allclose(p0, p1)

    def test_orient(self):
        assert ft.vox2ras_to_orient(np.eye(4)) == "RAS"
        assert ft.vox2ras_to_orient(_geom_matrix()) == "LIA"

    def test_qform_roundtrip(self):
        m = _geom_matrix()
        b, c, d, x, y, z, qfac = ft.vox2ras_to_qform(m)
        a = np.sqrt(max(0.0, 1 - (b * b + c * c + d * d)))
        r = np.array([
            [a*a+b*b-c*c-d*d, 2*b*c-2*a*d, 2*b*d+2*a*c],
            [2*b*c+2*a*d, a*a+c*c-b*b-d*d, 2*c*d-2*a*b],
            [2*b*d-2*a*c, 2*c*d+2*a*b, a*a+d*d-c*c-b*b]])
        if qfac < 0:
            r[:, 2] *= -1
        voxres = np.sqrt((m[0:3, 0:3] ** 2).sum(axis=0))
        rec = r @ np.diag(voxres)
        assert np.allclose(rec, m[0:3, 0:3], atol=1e-6)
        assert np.allclose([x, y, z], m[0:3, 3])

    def test_filename_resolution(self, tmp_path):
        p = tmp_path / "foo.nii.gz"
        p.write_bytes(b"")
        fname, fstem, fext = ft.mri_filename(str(p))
        assert fext == "nii.gz"
        assert fstem == str(tmp_path / "foo")
        fname2, _, fext2 = ft.mri_filename(str(tmp_path / "foo"))
        assert fname2 == str(p) and fext2 == "nii.gz"
