"""Adversarial I/O corpus: files written the way OTHER tools write them.

Every fixture here is hand-crafted at the byte level (independent of
fibers_tpu's own writers) to mimic third-party conventions the readers
must tolerate in the wild — FSL-style qform-only NIfTIs, sform-only
headers, big-endian files from old scanners, scl-rescaled integer data,
and Bruker trees with the optional keys real datasets omit.
(reference tolerance logic: src/mri.jl:1394-1558)
"""

import gzip
import os

import numpy as np
import pytest

import fibers_tpu as ft
from fibers_tpu.core.mri import nifti1_dtype


def _blank_hdr(bo="<"):
    rec = np.zeros((), dtype=nifti1_dtype(bo))[()]
    rec["sizeof_hdr"] = 348
    rec["regular"] = ord("r")
    rec["magic"] = b"n+1\0"
    rec["vox_offset"] = 352
    return rec


def _write_nii(path, rec, data, bo="<"):
    with open(path, "wb") as f:
        f.write(rec.tobytes())
        f.write(b"\0\0\0\0")                      # extension flag
        # NIfTI stores x fastest: Fortran byte order over (x, y, z)
        f.write(data.astype(bo + data.dtype.str[1:]).tobytes(order="F"))


class TestNIfTIFuzz:
    """Property-based sweep: random dtype x endianness x scl x form
    combinations, each written at the byte level; the reader must
    reproduce the independently computed values and geometry for all
    of them (reference tolerance logic: src/mri.jl:1394-1669)."""

    # (datatype code, numpy dtype)
    DTYPES = [(2, np.uint8), (4, np.int16), (8, np.int32),
              (16, np.float32), (64, np.float64), (512, np.uint16)]

    def test_random_header_roundtrips(self, tmp_path):
        rng = np.random.default_rng(42)
        for case in range(24):
            code, dt = self.DTYPES[case % len(self.DTYPES)]
            bo = "<" if case % 2 == 0 else ">"
            use_scl = case % 3 == 0
            use_sform = case % 4 < 2
            shape = tuple(int(s) for s in rng.integers(3, 9, 3))
            nframes = int(rng.integers(1, 4))
            if np.issubdtype(dt, np.integer):
                raw = rng.integers(0, 200, shape + (nframes,)).astype(dt)
            else:
                raw = (rng.random(shape + (nframes,)) * 100).astype(dt)

            rec = _blank_hdr(bo)
            rec["dim"] = [4, *shape, nframes, 1, 1, 1]
            rec["datatype"] = code
            rec["bitpix"] = raw.dtype.itemsize * 8
            vsz = rng.uniform(0.5, 3.0, 3)
            rec["pixdim"] = [1.0, *vsz, 0, 0, 0, 0]
            slope, inter = (1.0, 0.0)
            if use_scl:
                slope, inter = 2.0, 5.0
                rec["scl_slope"] = slope
                rec["scl_inter"] = inter
            if use_sform:
                rec["sform_code"] = 1
                rec["srow_x"] = [vsz[0], 0, 0, -10.0]
                rec["srow_y"] = [0, vsz[1], 0, 20.0]
                rec["srow_z"] = [0, 0, vsz[2], -5.0]
            else:
                rec["qform_code"] = 1
                rec["quatern_b"] = 0.0      # identity rotation
                rec["quatern_c"] = 0.0
                rec["quatern_d"] = 0.0
                rec["quatern_x"] = -10.0
                rec["quatern_y"] = 20.0
                rec["quatern_z"] = -5.0

            p = str(tmp_path / f"f{case}.nii")
            _write_nii(p, rec, raw, bo=bo)
            mri = ft.mri_read(p)

            got = np.asarray(mri.vol)
            scaled = raw.astype(np.float64) * slope + inter
            if use_scl and np.issubdtype(dt, np.integer):
                # rescale preserves the on-disk numeric class
                want = np.rint(scaled).astype(dt)
                np.testing.assert_array_equal(got, want, err_msg=str(case))
            else:
                np.testing.assert_allclose(got, scaled, rtol=1e-6,
                                           err_msg=str(case))
            assert got.shape == shape + (nframes,), case
            np.testing.assert_allclose(mri.volres, vsz, rtol=1e-5)
            # vox2ras translation column survives either form
            np.testing.assert_allclose(
                mri.vox2ras0[:3, 3], [-10.0, 20.0, -5.0], atol=1e-4)


class TestForeignNIfTI:
    def _vol(self, rng, shape=(7, 6, 5)):
        return (rng.random(shape) * 100).astype(np.float32)

    def test_qform_only_with_negative_qfac(self, tmp_path, rng):
        """FSL-style file: sform_code=0, geometry only in the quaternion,
        qfac=-1 (pixdim[0] < 0) flipping the k column."""
        vol = self._vol(rng)
        rec = _blank_hdr()
        rec["dim"] = [3, *vol.shape, 1, 1, 1, 1]
        rec["datatype"] = 16                      # float32
        rec["bitpix"] = 32
        rec["pixdim"] = [-1.0, 2.0, 2.0, 3.0, 0, 0, 0, 0]
        rec["qform_code"] = 1
        rec["sform_code"] = 0
        # pure 90-degree rotation about x: (a, b, c, d) = (cos45, sin45, 0, 0)
        a = np.cos(np.pi / 4)
        rec["quatern_b"] = np.sin(np.pi / 4)
        rec["quatern_c"] = 0.0
        rec["quatern_d"] = 0.0
        rec["quatern_x"] = 10.0
        rec["quatern_y"] = -20.0
        rec["quatern_z"] = 5.0
        p = str(tmp_path / "qform.nii")
        _write_nii(p, rec, vol)

        mri = ft.mri_read(p)
        np.testing.assert_allclose(np.asarray(mri.vol), vol, rtol=1e-6)
        # independent quaternion expansion (b=sin45 about x), qfac=-1
        b = float(np.sin(np.pi / 4))
        R = np.array([[1.0, 0, 0],
                      [0, 1 - 2 * b * b, -2 * a * b],
                      [0, 2 * a * b, 1 - 2 * b * b]])
        want = R @ np.diag([2.0, 2.0, -3.0])
        np.testing.assert_allclose(mri.vox2ras0[:3, :3], want, atol=1e-5)
        np.testing.assert_allclose(mri.vox2ras0[:3, 3], [10, -20, 5],
                                   atol=1e-5)
        np.testing.assert_allclose(mri.volres, [2, 2, 3], atol=1e-6)

    def test_sform_overrides_qform(self, tmp_path, rng):
        """Both codes set with DIFFERENT geometries: sform wins
        (reference: src/mri.jl:1539-1555)."""
        vol = self._vol(rng)
        rec = _blank_hdr()
        rec["dim"] = [3, *vol.shape, 1, 1, 1, 1]
        rec["datatype"] = 16
        rec["bitpix"] = 32
        rec["pixdim"] = [1.0, 1.0, 1.0, 1.0, 0, 0, 0, 0]
        rec["qform_code"] = 1                     # identity quaternion
        rec["sform_code"] = 2
        rec["srow_x"] = [0.0, -1.5, 0.0, 7.0]
        rec["srow_y"] = [0.0, 0.0, 1.5, -8.0]
        rec["srow_z"] = [-1.5, 0.0, 0.0, 9.0]
        p = str(tmp_path / "sform.nii")
        _write_nii(p, rec, vol)

        mri = ft.mri_read(p)
        want = np.array([[0, -1.5, 0, 7], [0, 0, 1.5, -8],
                         [-1.5, 0, 0, 9], [0, 0, 0, 1]], np.float32)
        np.testing.assert_allclose(mri.vox2ras0, want, atol=1e-5)

    def test_neither_form_warns_and_reads(self, tmp_path, rng, capsys):
        vol = self._vol(rng)
        rec = _blank_hdr()
        rec["dim"] = [3, *vol.shape, 1, 1, 1, 1]
        rec["datatype"] = 16
        rec["bitpix"] = 32
        rec["pixdim"] = [1.0, 2.0, 2.0, 2.0, 0, 0, 0, 0]
        p = str(tmp_path / "noform.nii")
        _write_nii(p, rec, vol)
        mri = ft.mri_read(p)
        assert "neither sform or qform" in capsys.readouterr().err
        np.testing.assert_allclose(np.asarray(mri.vol), vol, rtol=1e-6)

    def test_big_endian_scaled_int16(self, tmp_path, rng):
        """Big-endian int16 file with scl_slope/scl_inter, as old SPM /
        Analyze-lineage tools wrote them."""
        raw = (rng.random((6, 5, 4)) * 1000).astype(np.int16)
        rec = _blank_hdr(">")
        rec["dim"] = [3, *raw.shape, 1, 1, 1, 1]
        rec["datatype"] = 4                        # int16
        rec["bitpix"] = 16
        rec["pixdim"] = [1.0, 1.0, 1.0, 1.0, 0, 0, 0, 0]
        rec["sform_code"] = 1
        rec["srow_x"] = [1.0, 0, 0, 0]
        rec["srow_y"] = [0, 1.0, 0, 0]
        rec["srow_z"] = [0, 0, 1.0, 0]
        rec["scl_slope"] = 2.5
        rec["scl_inter"] = -3.0
        p = str(tmp_path / "be.nii")
        _write_nii(p, rec, raw, bo=">")

        mri = ft.mri_read(p)
        # like the reference (src/mri.jl:1665-1669), rescaling preserves
        # the on-disk numeric class: integers round back to int16
        want = np.rint(raw.astype(np.float64) * 2.5 - 3.0).astype(np.int16)
        np.testing.assert_array_equal(np.asarray(mri.vol), want)

    def test_gzipped_foreign_file(self, tmp_path, rng):
        vol = self._vol(rng)
        rec = _blank_hdr()
        rec["dim"] = [3, *vol.shape, 1, 1, 1, 1]
        rec["datatype"] = 16
        rec["bitpix"] = 32
        rec["pixdim"] = [1.0, 1.0, 1.0, 1.0, 0, 0, 0, 0]
        rec["sform_code"] = 1
        rec["srow_x"] = [1.0, 0, 0, 0]
        rec["srow_y"] = [0, 1.0, 0, 0]
        rec["srow_z"] = [0, 0, 1.0, 0]
        p_nii = str(tmp_path / "f.nii")
        _write_nii(p_nii, rec, vol)
        p_gz = str(tmp_path / "g.nii.gz")
        with open(p_nii, "rb") as src, gzip.open(p_gz, "wb") as dst:
            dst.write(src.read())
        mri = ft.mri_read(p_gz)
        np.testing.assert_allclose(np.asarray(mri.vol), vol, rtol=1e-6)

    def test_truncated_header_raises(self, tmp_path):
        p = str(tmp_path / "trunc.nii")
        with open(p, "wb") as f:
            f.write(b"\x5c\x01\x00\x00" + b"\0" * 100)
        with pytest.raises(Exception):
            ft.mri_read(p)


class TestForeignBruker:
    def _tree(self, tmp_path, *, with_method=True, with_visu=True,
              with_slope=True, nslices=4, matrix=(8, 6)):
        """Minimal ParaVision-shaped study dir, omitting optional pieces
        real exports sometimes lack."""
        study = tmp_path / "1"
        pdata = study / "pdata" / "1"
        os.makedirs(pdata)
        nx, ny = matrix
        if with_method:
            (study / "method").write_text(
                "##$PVM_SpatResol=( 2 )\n0.15 0.15\n"
                f"##$PVM_Matrix=( 2 )\n{nx} {ny}\n"
                "##$PVM_SliceThick=0.5\n"
                f"##$PVM_SPackArrNSlices=( 1 )\n{nslices}\n"
                "##$PVM_RepetitionTime=2500\n")
        (study / "acqp").write_text(
            "##$ACQ_sw_version=<PV 6.0.1>\n"
            "##$RG=101\n")
        reco_lines = [
            "##$RECO_image_type=MAGNITUDE_IMAGE",
            "##$RECO_wordtype=_16BIT_SGN_INT",
            "##$RECO_byte_order=littleEndian",
            "##$RECO_map_offset=( 1 )",
            "0",
        ]
        if with_slope:
            reco_lines += ["##$RECO_map_slope=( 1 )", "2"]
        (pdata / "reco").write_text("\n".join(reco_lines) + "\n")
        if with_visu:
            (pdata / "visu_pars").write_text(
                "##$VisuCoreSize=( 2 )\n"
                f"{nx} {ny}\n"
                "##$VisuCoreExtent=( 2 )\n1.2 0.9\n"
                "##$VisuCoreOrientation=( 1, 9 )\n"
                "1 0 0 0 1 0 0 0 1\n"
                "##$VisuCorePosition=( 1, 3 )\n0 0 0\n")
        data = (np.arange(nx * ny * nslices) % 251).astype("<i2")
        (pdata / "2dseq").write_bytes(data.tobytes())
        return str(study), data, (nx, ny, nslices)

    def test_minimal_tree_reads(self, tmp_path):
        study, data, (nx, ny, ns) = self._tree(tmp_path)
        mri = ft.mri_read(study)
        assert mri.vol.shape[:3] == (nx, ny, ns)
        # slope applied
        got = np.asarray(mri.vol).reshape(-1, order="F")
        assert np.isfinite(got).all()

    def test_missing_visu_pars(self, tmp_path):
        """Exports without visu_pars must still read (geometry defaults
        from method), not crash."""
        study, data, dims = self._tree(tmp_path, with_visu=False)
        mri = ft.mri_read(study)
        assert mri.vol.shape[:3] == dims

    def test_missing_reco_slope(self, tmp_path):
        """RECO_map_slope omitted -> unit slope."""
        study, data, dims = self._tree(tmp_path, with_slope=False)
        mri = ft.mri_read(study)
        assert np.isfinite(np.asarray(mri.vol)).all()


class TestMGHFuzz:
    """Byte-level .mgh/.mgz sweep: random dtype x compression x geometry
    x mr_parms combinations, each file hand-written big-endian
    independently of save_mgh; the reader must reproduce values,
    vox2ras, mr_parms, and random slice/frame subsets for all of them
    (reference layout: src/mri.jl:1217-1372)."""

    # (MGH type code, numpy dtype)
    TYPES = [(0, np.uint8), (1, np.int32), (3, np.float32),
             (4, np.int16), (10, np.uint16)]

    @staticmethod
    def _write_mgh(path, vol, mdc, delta, pxyz_c, mr_parms=None):
        import io as _io
        import struct

        n1, n2, n3, nf = vol.shape
        code = {np.dtype(np.uint8): 0, np.dtype(np.int32): 1,
                np.dtype(np.float32): 3, np.dtype(np.int16): 4,
                np.dtype(np.uint16): 10}[vol.dtype]
        buf = _io.BytesIO()
        buf.write(struct.pack(">7i", 1, n1, n2, n3, nf, code, 0))
        buf.write(struct.pack(">h", 1))                    # ras_good
        buf.write(np.asarray(delta, ">f4").tobytes())
        buf.write(np.asarray(mdc, ">f4").tobytes(order="F"))
        buf.write(np.asarray(pxyz_c, ">f4").tobytes())
        buf.write(b"\x00" * (256 - 2 - 60))                # unused tail
        buf.write(vol.astype(vol.dtype.newbyteorder(">")).tobytes(order="F"))
        if mr_parms is not None:
            buf.write(np.asarray(mr_parms, ">f4").tobytes())
        payload = buf.getvalue()
        if path.endswith("gz"):
            with gzip.open(path, "wb") as f:
                f.write(payload)
        else:
            with open(path, "wb") as f:
                f.write(payload)

    def test_random_mgh_files(self, tmp_path):
        rng = np.random.default_rng(1234)
        for case in range(20):
            code, dt = self.TYPES[case % len(self.TYPES)]
            gz = case % 2 == 1
            with_parms = case % 3 != 0
            shape = tuple(int(s) for s in rng.integers(3, 9, 3))
            nf = int(rng.integers(1, 5))
            if np.issubdtype(dt, np.integer):
                vol = rng.integers(0, 200, shape + (nf,)).astype(dt)
            else:
                vol = (rng.random(shape + (nf,)) * 50 - 10).astype(dt)

            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            mdc = (q * np.sign(np.linalg.det(q))).astype(np.float64)
            delta = rng.uniform(0.5, 3.0, 3)
            pxyz_c = rng.uniform(-40, 40, 3)
            parms = rng.uniform(0, 100, 4).astype(np.float32) \
                if with_parms else None

            p = str(tmp_path / f"f{case}.{'mgz' if gz else 'mgh'}")
            self._write_mgh(p, vol, mdc, delta, pxyz_c, parms)

            got, M, mr_parms, volsz = ft.load_mgh(p)
            np.testing.assert_array_equal(got, vol, err_msg=str(case))
            assert tuple(volsz) == shape + (nf,)
            # M = [mdc @ diag(delta) | pxyz_c - mdc @ d @ dims/2]
            want_lin = mdc @ np.diag(delta)
            np.testing.assert_allclose(M[:3, :3], want_lin, atol=2e-4)
            want_t = pxyz_c - want_lin @ (np.asarray(shape) / 2)
            np.testing.assert_allclose(M[:3, 3], want_t, atol=2e-3)
            if with_parms:
                np.testing.assert_allclose(mr_parms, parms, rtol=1e-6)
            else:
                assert mr_parms.size == 0

            # random 1-based subset read == slicing the full volume
            sl = sorted(rng.choice(np.arange(1, shape[2] + 1),
                                   size=2, replace=False).tolist())
            fr = sorted(rng.choice(np.arange(1, nf + 1),
                                   size=min(2, nf), replace=False).tolist())
            sub, _, _, _ = ft.load_mgh(p, slices=sl, frames=fr)
            want = vol[:, :, [s - 1 for s in sl]][..., [f - 1 for f in fr]]
            np.testing.assert_array_equal(sub, want, err_msg=str(case))

            # the full mri_read path derives the same geometry
            mri = ft.mri_read(p)
            np.testing.assert_allclose(mri.vox2ras0, M, atol=1e-4)


class TestTrkFuzz:
    """Byte-level .trk v2 sweep: random streamline counts/lengths x
    scalars x properties x voxel size, each file hand-written
    little-endian independently of trk_write; exercises both the packed
    fast path (no scalars/properties) and the ragged path
    (reference layout: src/trk.jl:358-423, ±0.5-voxel mm convention
    src/trk.jl:410-412)."""

    @staticmethod
    def _write_trk(path, dim, vsz, lines, scalars, props):
        import struct

        ns = scalars[0].shape[0] if scalars else 0
        npr = props[0].shape[0] if props else 0
        hdr = bytearray(1000)
        hdr[0:6] = b"TRACK\x00"
        struct.pack_into("<3h", hdr, 6, *[int(d) for d in dim])
        struct.pack_into("<3f", hdr, 12, *[float(v) for v in vsz])
        struct.pack_into("<h", hdr, 36, ns)
        struct.pack_into("<h", hdr, 238, npr)
        eye = np.eye(4, dtype="<f4")
        eye[0, 0], eye[1, 1], eye[2, 2] = vsz
        hdr[440:504] = eye.tobytes()
        hdr[948:952] = b"LPS\x00"
        struct.pack_into("<i", hdr, 988, len(lines))
        struct.pack_into("<i", hdr, 992, 2)
        struct.pack_into("<i", hdr, 996, 1000)

        with open(path, "wb") as f:
            f.write(bytes(hdr))
            for i, vox in enumerate(lines):
                n = vox.shape[1]
                f.write(struct.pack("<i", n))
                mm = (vox.astype(np.float64) + 0.5) * np.asarray(
                    vsz, np.float64)[:, None]
                rec = np.empty((n, 3 + ns), "<f4")
                rec[:, 0:3] = mm.T
                if ns:
                    rec[:, 3:] = scalars[i].T
                f.write(rec.tobytes())
                if npr:
                    f.write(props[i].astype("<f4").tobytes())

    def test_random_trk_files(self, tmp_path):
        rng = np.random.default_rng(77)
        for case in range(16):
            ns = [0, 0, 1, 3][case % 4]       # half the cases: fast path
            npr = [0, 0, 2, 1][case % 4]
            ncount = int(rng.integers(1, 6))
            dim = rng.integers(8, 30, 3)
            vsz = rng.uniform(0.4, 3.0, 3).astype(np.float32)
            lines = [rng.uniform(0, dim.min() - 1,
                                 (3, int(rng.integers(1, 13)))
                                 ).astype(np.float32)
                     for _ in range(ncount)]
            scalars = [rng.random((ns, li.shape[1])).astype(np.float32)
                       for li in lines] if ns else []
            props = [rng.random(npr).reshape(npr).astype(np.float32)
                     for _ in lines] if npr else []

            p = str(tmp_path / f"t{case}.trk")
            self._write_trk(p, dim, vsz, lines, scalars, props)

            tr = ft.trk_read(p)
            assert tr.n_count == ncount, case
            assert tr.n_scalars == ns and tr.n_properties == npr
            assert [int(n) for n in tr.npts] == \
                [li.shape[1] for li in lines]
            np.testing.assert_allclose(tr.voxel_size, vsz, rtol=1e-6)
            for got, want in zip(tr.xyz, lines):
                # mm -> voxel back-conversion in f32: bounded rounding
                np.testing.assert_allclose(got, want, atol=2e-4,
                                           err_msg=str(case))
            if ns:
                for got, want in zip(tr.scalars, scalars):
                    np.testing.assert_allclose(got, want, rtol=1e-6)
            if npr:
                np.testing.assert_allclose(
                    tr.properties, np.stack(props, axis=1), rtol=1e-6)

            # write it back out: the byte count must match the
            # reference's checksum formula (src/trk.jl:486-492)
            p2 = str(tmp_path / f"t{case}_out.trk")
            assert ft.trk_write(tr, p2) is False
            want_bytes = 1000 + sum(
                4 + 4 * (3 + ns) * li.shape[1] + 4 * npr for li in lines)
            assert os.path.getsize(p2) == want_bytes, case
            # and re-reading reproduces the points
            t3 = ft.trk_read(p2)
            for got, want in zip(t3.xyz, lines):
                np.testing.assert_allclose(got, want, atol=4e-4)
