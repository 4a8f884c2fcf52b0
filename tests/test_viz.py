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
