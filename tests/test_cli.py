"""CLI tests: `python -m fibers_tpu` subcommands drive the same public
surface as the library (the reference is library-only; the CLI is the
deployment wrapper around it — option names mirror the library kwargs,
which mirror the reference's, SURVEY.md §5.6)."""

import os

import numpy as np
import pytest

import fibers_tpu as ft
from fibers_tpu.__main__ import main
from phantom import make_phantom


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    dwi, mask, _, _ = make_phantom(shape=(8, 8, 8), ndir=30)
    dp = str(tmp / "dwi.nii.gz")
    mp = str(tmp / "mask.nii.gz")
    ft.mri_write(dwi, dp)
    ft.mri_write(mask, mp)
    return tmp, dp, mp


class TestCLI:
    def test_info_headeronly_and_full(self, data, capsys):
        _, dp, _ = data
        assert main(["info", dp]) == 0
        out = capsys.readouterr().out
        assert "Volume dimensions: [8, 8, 8, 31]" in out
        assert "b-values" in out
        assert "Intensity range" not in out        # headeronly default
        assert main(["info", dp, "--full"]) == 0
        assert "Intensity range" in capsys.readouterr().out

    def test_dti_matches_library(self, data):
        tmp, dp, mp = data
        base = str(tmp / "dti")
        assert main(["dti", dp, mp, base]) == 0
        dwi, mask = ft.mri_read(dp), ft.mri_read(mp)
        want = ft.dti_fit(dwi, mask)
        got = ft.mri_read(base + "_fa.nii.gz")
        np.testing.assert_allclose(np.squeeze(got.vol),
                                   np.squeeze(want.fa.vol), atol=1e-5)

    def test_gqi_then_stream_from_struct(self, data):
        tmp, dp, mp = data
        gbase = str(tmp / "gqi")
        assert main(["gqi", dp, mp, gbase]) == 0
        trk = str(tmp / "t.trk")
        assert main(["stream", gbase, "GQI", "--mask", mp,
                     "-o", trk, "--f-thresh", "0.0"]) == 0
        t = ft.trk_read(trk)
        assert t.n_count > 0

    def test_rumba_with_checkpoint(self, data):
        tmp, dp, mp = data
        base = str(tmp / "rumba")
        ck = str(tmp / "r.ckpt.npz")
        assert main(["rumba", dp, mp, base, "--niter", "4",
                     "--checkpoint", ck, "--checkpoint-every", "2"]) == 0
        assert os.path.isfile(base + "_gfa.nii.gz")
        assert os.path.isfile(ck)

    def test_adc_and_structens(self, data):
        tmp, dp, mp = data
        assert main(["adc", dp, mp, str(tmp / "a")]) == 0
        assert os.path.isfile(str(tmp / "a_adc.nii.gz"))
        assert main(["structens", str(tmp / "a_s0.nii.gz"),
                     str(tmp / "st"), "--sigma", "1.0", "--rho",
                     "1.0"]) == 0
        ev = ft.mri_read(str(tmp / "st_eigval.nii.gz"))
        assert np.isfinite(np.asarray(ev.vol)).all()

    def test_pipeline_sharded(self, data):
        """The end-to-end flow, data-parallel over the 8-device mesh."""
        tmp, dp, mp = data
        outdir = str(tmp / "pipe8")
        assert main(["pipeline", dp, mp, outdir, "--mesh", "8"]) == 0
        t = ft.trk_read(os.path.join(outdir, "tracts.trk"))
        assert t.n_count > 0
        assert os.path.isfile(os.path.join(outdir, "dti_fa.nii.gz"))

    def test_dsi(self, tmp_path):
        from test_dsi import make_dsi_phantom

        dwi, mask, _ = make_dsi_phantom(shape=(4, 4, 4))
        dp, mp = str(tmp_path / "q.nii.gz"), str(tmp_path / "m.nii.gz")
        ft.mri_write(dwi, dp)
        ft.mri_write(mask, mp)
        base = str(tmp_path / "dsi")
        assert main(["dsi", dp, mp, base]) == 0
        qa = ft.mri_read(base + "_qa1.nii.gz")
        assert np.isfinite(np.asarray(qa.vol)).all()

    def test_unknown_sphere_rejected(self, data):
        tmp, dp, mp = data
        with pytest.raises(SystemExit):
            main(["gqi", dp, mp, str(tmp / "x"), "--sphere", "999"])
