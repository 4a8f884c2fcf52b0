"""Byte-golden I/O tests.

tests/fixtures/ holds frozen writer outputs (decompressed payloads for the
gzip formats).  Three layers of checking:

1. spec anchors: key offsets of the frozen bytes unpacked independently
   with struct/numpy and compared against the NIfTI-1 / MGH / TrackVis
   specs (sizes per reference write checksums, src/mri.jl:2020-2024,
   src/trk.jl:486-492);
2. writer equality: today's writers must reproduce the frozen bytes
   exactly;
3. reader equality: today's readers must decode the frozen bytes into the
   expected values/geometry.

A symmetric writer+reader drift cannot pass (1); any writer drift fails
(2)."""

import gzip
import os
import struct
import sys

import numpy as np
import pytest

import fibers_tpu as ft

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_golden_fixtures import fixture_mri, fixture_tract  # noqa: E402

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _read(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


# ------------------------------------------------------------------ #
# Spec anchors
# ------------------------------------------------------------------ #

def test_nifti_fixture_spec_anchors():
    b = _read("golden.nii")
    assert struct.unpack("<i", b[0:4])[0] == 348          # sizeof_hdr
    dim = struct.unpack("<8h", b[40:56])
    assert dim == (4, 4, 3, 2, 2, 1, 1, 1)
    assert struct.unpack("<h", b[70:72])[0] == 16         # DT_FLOAT32
    assert struct.unpack("<h", b[72:74])[0] == 32         # bitpix
    pixdim = struct.unpack("<8f", b[76:108])
    assert pixdim[1:4] == (2.0, 2.0, 2.5)
    assert struct.unpack("<f", b[108:112])[0] == 352.0    # vox_offset
    assert b[344:348] == b"n+1\x00"                       # magic
    # sform rows = vox2ras rows (offsets 280/296/312)
    srow_x = struct.unpack("<4f", b[280:296])
    srow_y = struct.unpack("<4f", b[296:312])
    srow_z = struct.unpack("<4f", b[312:328])
    assert srow_x == (-2.0, 0.0, 0.0, 10.0)
    assert srow_y == (0.0, 0.0, 2.5, -20.0)
    assert srow_z == (0.0, -2.0, 0.0, 30.0)
    # payload: x-fastest float32, 4*3*2*2 = 48 values
    assert len(b) == 352 + 48 * 4
    data = np.frombuffer(b[352:], "<f4")
    vals = fixture_mri().vol
    np.testing.assert_array_equal(
        data, vals.reshape(-1, order="F").astype("<f4"))


def test_mgh_fixture_spec_anchors():
    b = _read("golden.mgh")
    # big-endian header (FreeSurfer mgh v1)
    assert struct.unpack(">i", b[0:4])[0] == 1            # version
    assert struct.unpack(">4i", b[4:20]) == (4, 3, 2, 2)  # dims + nframes
    assert struct.unpack(">i", b[20:24])[0] == 3          # MRI_FLOAT
    assert struct.unpack(">h", b[28:30])[0] == 1          # goodRAS
    spacing = struct.unpack(">3f", b[30:42])
    assert spacing == (2.0, 2.0, 2.5)
    # direction cosines x_{r,a,s} y_{r,a,s} z_{r,a,s} = unit columns of
    # vox2ras[:3,:3]
    mdc = np.frombuffer(b[42:78], ">f4")
    np.testing.assert_allclose(
        mdc, [-1, 0, 0, 0, 0, -1, 0, 1, 0], atol=1e-6)
    # c_ras = vox2ras @ [w/2, h/2, d/2, 1]
    c_ras = np.frombuffer(b[78:90], ">f4")
    v2r = fixture_mri().vox2ras0
    np.testing.assert_allclose(
        c_ras, (v2r @ [2, 1.5, 1, 1])[:3], atol=1e-5)
    # data at 284, big-endian float32, x fastest
    data = np.frombuffer(b[284:284 + 48 * 4], ">f4")
    vals = fixture_mri().vol
    np.testing.assert_array_equal(
        data.astype(np.float32), vals.reshape(-1, order="F"))
    # footer: mr_parms [tr, flip, te, ti] (reference: src/mri.jl:2016)
    tr = struct.unpack(">f", b[284 + 48 * 4:284 + 48 * 4 + 4])[0]
    assert tr == 2500.0
    assert len(b) == 284 + 48 * 4 + 4 * 4


def test_trk_fixture_spec_anchors():
    b = _read("golden.trk")
    assert b[0:6] == b"TRACK\x00"
    assert struct.unpack("<3h", b[6:12]) == (4, 3, 2)     # dim
    assert struct.unpack("<3f", b[12:24]) == (2.0, 2.0, 2.5)
    n_count, version, hdr_size = struct.unpack("<3i", b[988:1000])
    assert (n_count, version, hdr_size) == (2, 2, 1000)
    # payload: [npts, xyz f32 mm...] per line; voxel->mm is (v+0.5)*size
    # (reference: src/trk.jl:476)
    off = 1000
    n1 = struct.unpack("<i", b[off:off + 4])[0]
    assert n1 == 3
    p = np.frombuffer(b[off + 4:off + 4 + 36], "<f4").reshape(3, 3)
    lines = [np.array([[0.5, 1.0, 1.5], [0.25, 0.5, 0.75], [1, 1, 1]],
                      np.float32),
             np.array([[2.0, 2.25], [1.0, 1.25], [0.0, 0.5]], np.float32)]
    vsz = np.array([2.0, 2.0, 2.5], np.float32)
    np.testing.assert_allclose(p, ((lines[0] + 0.5) * vsz[:, None]).T)
    off2 = off + 4 + 36
    n2 = struct.unpack("<i", b[off2:off2 + 4])[0]
    assert n2 == 2
    q = np.frombuffer(b[off2 + 4:off2 + 4 + 24], "<f4").reshape(2, 3)
    np.testing.assert_allclose(q, ((lines[1] + 0.5) * vsz[:, None]).T)
    assert len(b) == 1000 + (4 + 36) + (4 + 24)


# ------------------------------------------------------------------ #
# Writer reproduces frozen bytes exactly
# ------------------------------------------------------------------ #

def test_nifti_writer_matches_golden(tmp_path):
    p = str(tmp_path / "w.nii.gz")
    ft.mri_write(fixture_mri(), p)
    assert gzip.open(p, "rb").read() == _read("golden.nii")


def test_mgh_writer_matches_golden(tmp_path):
    p = str(tmp_path / "w.mgz")
    ft.mri_write(fixture_mri(), p)
    assert gzip.open(p, "rb").read() == _read("golden.mgh")


def test_trk_writer_matches_golden(tmp_path):
    p = str(tmp_path / "w.trk")
    ft.trk_write(fixture_tract(), p)
    assert open(p, "rb").read() == _read("golden.trk")


# ------------------------------------------------------------------ #
# Reader decodes frozen bytes
# ------------------------------------------------------------------ #

def test_readers_decode_golden(tmp_path):
    ref = fixture_mri()

    p = str(tmp_path / "golden.nii")
    open(p, "wb").write(_read("golden.nii"))
    m = ft.mri_read(p)
    np.testing.assert_array_equal(m.vol, ref.vol)
    np.testing.assert_allclose(m.vox2ras0, ref.vox2ras0, atol=1e-5)

    p = str(tmp_path / "golden.mgh")
    open(p, "wb").write(_read("golden.mgh"))
    m = ft.mri_read(p)
    np.testing.assert_array_equal(m.vol, ref.vol)
    np.testing.assert_allclose(m.vox2ras0, ref.vox2ras0, atol=1e-4)
    assert m.tr == 2500.0

    p = str(tmp_path / "golden.trk")
    open(p, "wb").write(_read("golden.trk"))
    tr = ft.trk_read(p)
    assert tr.n_count == 2
    np.testing.assert_allclose(
        np.asarray(tr.xyz[0]),
        np.array([[0.5, 1.0, 1.5], [0.25, 0.5, 0.75], [1, 1, 1]]),
        atol=1e-6)
