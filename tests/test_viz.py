"""Visualization-layer tests: LUT, vol_to_rgb heuristics, view_axes, disp."""

import io
from contextlib import redirect_stdout

import numpy as np
import pytest

import fibers_tpu as ft
from fibers_tpu.viz.show import color_lut, view_axes, vol_to_rgb


class TestLUT:
    def test_default_lut_loaded(self):
        assert len(color_lut.id) > 1000
        assert (np.diff(color_lut.id) > 0).all()      # sorted unique
        assert color_lut.rgb.min() >= 0 and color_lut.rgb.max() <= 1
        # id 0 is Unknown/black
        i0 = int(np.searchsorted(color_lut.id, 0))
        assert color_lut.id[i0] == 0
        assert np.allclose(color_lut.rgb[i0], 0)

    def test_lut_from_file(self, tmp_path):
        p = tmp_path / "lut.txt"
        p.write_text("# comment\n1 Left-Thing 255 0 0 0\n"
                     "5 Right-Thing 0 128 255 0\n")
        lut = ft.LUT.from_file(str(p))
        assert list(lut.id) == [1, 5]
        assert lut.name == ["Left-Thing", "Right-Thing"]
        assert np.allclose(lut.rgb[1], [0, 128 / 255, 1])


class TestVolToRGB:
    def test_segmentation_detection(self):
        vol = np.array([[0, 2], [41, 2]])      # all valid FS label ids
        rgb, kind = vol_to_rgb(vol)
        assert kind == "segmentation"
        assert rgb.shape == (2, 2, 3)

    def test_vector_detection(self):
        # non-integer components so the LUT check (which runs first, as in
        # the reference) cannot claim it
        v = np.zeros((4, 4, 3))
        v[..., 0] = v[..., 1] = np.sqrt(0.5)
        rgb, kind = vol_to_rgb(v)
        assert kind == "vector"
        assert np.allclose(rgb[..., 0], np.sqrt(0.5))

    def test_gray_fallback(self):
        vol = np.linspace(0, 7.7, 16).reshape(4, 4)
        rgb, kind = vol_to_rgb(vol)
        assert kind == "gray"
        assert rgb.max() <= 1.0


class TestViewAxes:
    def test_ras_axial(self):
        ax = view_axes(np.eye(4), "a")
        # RAS: axial plane is A->P (axis 2 flipped since +y is A) and
        # R->L (axis 1 flipped since +x is R)
        assert ax == [-2, -1]

    def test_lia(self):
        m = np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0],
                      [0, 0, 0, 1]], np.float64)
        assert view_axes(m, "a") == [-3, 1]
        assert view_axes(m, "s") == [2, 3]
        assert view_axes(m, "c") == [2, 1]

    def test_invalid_plane(self):
        with pytest.raises(ValueError):
            view_axes(np.eye(4), "x")


class TestInfoDisp:
    def test_info_prints(self, tmp_mri):
        mri, _ = tmp_mri
        buf = io.StringIO()
        with redirect_stdout(buf):
            ft.info(mri)
        out = buf.getvalue()
        assert "Volume dimensions" in out
        assert "b-values" in out

    def test_disp_runs(self, tmp_mri):
        mri, _ = tmp_mri
        mri.vol = np.abs(mri.vol)
        buf = io.StringIO()
        with redirect_stdout(buf):
            ft.disp(mri)
        assert "Volume dimensions" in buf.getvalue()

    def test_show_slice(self, tmp_mri):
        pytest.importorskip("matplotlib")
        mri, _ = tmp_mri
        fig = ft.show_slice(mri, plane="a")
        assert fig is not None
        import matplotlib.pyplot as plt
        plt.close(fig)


class TestView:
    def test_view_builds_figure(self, tmp_mri):
        pytest.importorskip("matplotlib")
        import matplotlib
        matplotlib.use("Agg", force=True)
        mri, _ = tmp_mri
        mri.vol = np.abs(mri.vol)
        fig = ft.view(mri, plane="a")
        assert fig is not None
        import matplotlib.pyplot as plt
        plt.close(fig)


class TestDispModulation:
    def test_disp_modulation_parity(self, monkeypatch, capsys):
        """disp(mri, mrimod): alpha-transparent zeros + intensity
        modulation must reproduce the reference compositing
        (src/show.jl:174-208): rgb = (slice / slice_allframe_max) *
        (mod_slice / global_mod_max), alpha from pre-modulation zeros."""
        from fibers_tpu.viz import show as vshow

        cap = {}
        monkeypatch.setattr(
            vshow, "_ansi_show",
            lambda rgb, alpha=None: cap.update(rgb=rgb, alpha=alpha))

        rng = np.random.default_rng(3)
        vol = np.zeros((8, 7, 5, 2), np.float32)
        # nonzero block at known location: x 2..5, y 1..4, all z
        block = (rng.random((4, 4, 5, 2)) * 50 + 1).astype(np.float32)
        vol[2:6, 1:5, :, :] = block
        vol[3, 2, 2, 0] = 0.0                     # a transparent hole
        mri = ft.MRI(vol=vol)
        mri.vox2ras0 = np.eye(4, dtype=np.float32)
        mri.volsize = np.asarray(vol.shape[:3])
        mri.width, mri.height, mri.depth = vol.shape[:3]
        mri.nframes = 2
        mri.set_geometry()

        modv = (rng.random(vol.shape[:3]) * 3).astype(np.float32)
        modm = ft.MRI.like(mri, 1, np.float32)
        modm.vol = modv

        ft.disp(mri, modm)

        iz = 2                                    # middle of 5 slices
        sl = vol[2:6, 1:5, iz, :]                 # known crop
        want_gray = sl[..., 0] / sl.max()         # all-frame slice max
        want = want_gray[..., None] * np.ones(3)
        want = want * (modv[2:6, 1:5, iz]
                       / modv.max())[..., None]
        np.testing.assert_allclose(cap["rgb"], np.clip(want, 0, 1),
                                   atol=1e-6)
        np.testing.assert_array_equal(cap["alpha"], sl[..., 0] != 0)

    def test_disp_modulation_dim_mismatch(self):
        vol = np.ones((4, 4, 3), np.float32)
        mri = ft.MRI(vol=vol)
        mri.vox2ras0 = np.eye(4, dtype=np.float32)
        mri.volsize = np.asarray(vol.shape)
        mri.width, mri.height, mri.depth = vol.shape
        mri.nframes = 1
        mri.set_geometry()
        bad = ft.MRI(vol=np.ones((5, 4, 3), np.float32))
        with pytest.raises(ValueError, match="Dimension mismatch"):
            ft.disp(mri, bad)
