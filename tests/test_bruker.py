"""Bruker scan-directory reader test on a synthetic ParaVision layout."""

import os

import numpy as np

import fibers_tpu as ft


def write_bruker_dir(root, shape=(8, 6, 4), nframes=3, gain=128.0):
    os.makedirs(os.path.join(root, "pdata", "1"), exist_ok=True)

    nx, ny, nz = shape
    with open(os.path.join(root, "method"), "w") as f:
        f.write("##$PVM_SpatResol=( 3 )\n0.1 0.1 0.2\n")
        f.write(f"##$PVM_Matrix=( 3 )\n{nx} {ny} {nz}\n")
        f.write("##$EchoTime=25.0\n")
        f.write("##$PVM_RepetitionTime=500.0\n")
        f.write("##$PVM_DwAoImages=1\n")
        f.write("##$PVM_DwDir=( 2, 3 )\n1 0 0 0 1 0\n")
        f.write("##$PVM_DwEffBval=( 3 )\n5 1000 1000\n")

    with open(os.path.join(root, "acqp"), "w") as f:
        f.write(f"##$RG={gain}\n")

    slopes = [2.0, 4.0, 8.0]
    offsets = [0.0, 1.0, 2.0]
    with open(os.path.join(root, "pdata", "1", "reco"), "w") as f:
        f.write("##$RECO_image_type=MAGNITUDE_IMAGE\n")
        f.write("##$RECO_wordtype=_16BIT_SGN_INT\n")
        f.write("##$RECO_map_offset=( 3 )\n"
                + " ".join(str(v) for v in offsets) + "\n")
        f.write("##$RECO_map_slope=( 3 )\n"
                + " ".join(str(v) for v in slopes) + "\n")
        f.write("##$RECO_byte_order=littleEndian\n")

    rng = np.random.default_rng(0)
    raw = rng.integers(1, 1000, size=shape + (nframes,)).astype(np.int16)
    raw.tofile(os.path.join(root, "pdata", "1", "2dseq"))
    # Julia/NumPy disagree on tofile order; write Fortran explicitly
    with open(os.path.join(root, "pdata", "1", "2dseq"), "wb") as f:
        f.write(raw.astype("<i2").tobytes(order="F"))

    expect = np.empty(shape + (nframes,), np.float32)
    for i in range(nframes):
        expect[..., i] = raw[..., i] / slopes[i] + offsets[i]
    expect /= gain / 64.0
    return raw, expect


class TestBruker:
    def test_basic_3d_read(self, tmp_path):
        root = str(tmp_path / "scan")
        raw, expect = write_bruker_dir(root)
        mri = ft.mri_read(root)
        assert mri.vol.shape == (8, 6, 4, 3)
        assert np.allclose(mri.vol, expect, rtol=1e-5)
        assert mri.te == 25.0 and mri.tr == 500.0
        assert np.allclose(mri.volres, [0.1, 0.1, 0.2], atol=1e-6)
        # b=0 volume prepended to the gradient table
        assert mri.bvec.shape == (3, 3)
        assert np.allclose(mri.bvec[0], 0)
        assert np.allclose(mri.bval, [5, 1000, 1000])

    def test_headeronly(self, tmp_path):
        root = str(tmp_path / "scan")
        write_bruker_dir(root)
        mri = ft.mri_read(root, headeronly=True)
        assert tuple(mri.volsize) == (8, 6, 4)
        assert mri.vol.size == 0

    def test_missing_files_raise(self, tmp_path):
        root = str(tmp_path / "scan2")
        os.makedirs(root)
        import pytest
        with pytest.raises(FileNotFoundError):
            ft.mri_read(root)
