"""Generate the byte-golden I/O fixtures committed under tests/fixtures/.

Each fixture is a tiny deterministic volume/tractogram written once by the
(round-trip- and spec-validated) writers, then frozen: tests assert that
today's writers reproduce the committed bytes exactly and that the frozen
bytes honor the file-format specs at key offsets (NIfTI-1 348-byte header,
MGH big-endian layout, TrackVis 1000-byte header).  A symmetric bug
introduced later into both a writer and its reader cannot pass these tests.

Run from the repo root: python tools/make_golden_fixtures.py
Compressed formats are stored DECOMPRESSED (.nii / .mgh payload bytes) so
gzip metadata (mtime, OS byte) can't cause spurious diffs.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fibers_tpu as ft  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def fixture_mri():
    """Deterministic 4x3x2x2 float32 volume with a non-trivial vox2ras."""
    vals = (np.arange(48, dtype=np.float32).reshape(4, 3, 2, 2)
            * np.float32(0.5) - np.float32(3.25))
    mri = ft.MRI(vol=vals)
    mri.vox2ras0 = np.array(
        [[-2.0, 0.0, 0.0, 10.0],
         [0.0, 0.0, 2.5, -20.0],
         [0.0, -2.0, 0.0, 30.0],
         [0.0, 0.0, 0.0, 1.0]], np.float32)
    mri.volsize = np.array([4, 3, 2])
    mri.width, mri.height, mri.depth = 4, 3, 2
    mri.nframes = 2
    mri.tr = 2500.0
    mri.set_geometry()
    return mri


def fixture_tract():
    ref = fixture_mri()
    tr = ft.Tract.from_ref(ref)
    lines = [
        np.array([[0.5, 1.0, 1.5], [0.25, 0.5, 0.75], [1.0, 1.0, 1.0]],
                 np.float32),
        np.array([[2.0, 2.25], [1.0, 1.25], [0.0, 0.5]], np.float32),
    ]
    ft.str_add(tr, lines)
    return tr


def main():
    os.makedirs(OUT, exist_ok=True)
    import gzip
    import tempfile

    mri = fixture_mri()

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.nii.gz")
        ft.mri_write(mri, p)
        raw = gzip.open(p, "rb").read()
        open(os.path.join(OUT, "golden.nii"), "wb").write(raw)

        p = os.path.join(d, "g.mgz")
        ft.mri_write(mri, p)
        raw = gzip.open(p, "rb").read()
        open(os.path.join(OUT, "golden.mgh"), "wb").write(raw)

        p = os.path.join(d, "g.trk")
        tr = fixture_tract()
        ft.trk_write(tr, p)
        open(os.path.join(OUT, "golden.trk"), "wb").write(
            open(p, "rb").read())

    for f in sorted(os.listdir(OUT)):
        fp = os.path.join(OUT, f)
        print(f, os.path.getsize(fp), "bytes")


if __name__ == "__main__":
    main()
