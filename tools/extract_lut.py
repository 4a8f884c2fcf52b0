"""Extract the FreeSurfer color look-up table into a compact .npz.

The reference ships FreeSurferColorLUT.txt (a public FreeSurfer data table)
and parses it at module load (reference: src/show.jl:16-50).  We parse it once
here and package ids/names/rgb as arrays.

Run once:  python tools/extract_lut.py
"""

import os

import numpy as np

REF = "/root/reference/src/FreeSurferColorLUT.txt"
OUT = os.path.join(os.path.dirname(__file__), "..", "fibers_tpu", "data")


def extract():
    ids, names, rgb = [], [], []
    with open(REF) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split()
            if len(parts) < 6:
                continue
            ids.append(int(parts[0]))
            names.append(parts[1])
            rgb.append([int(parts[2]), int(parts[3]), int(parts[4])])

    ids = np.asarray(ids, dtype=np.int64)
    names = np.asarray(names)
    rgb = np.asarray(rgb, dtype=np.uint8)
    print(f"LUT entries: {len(ids)}")
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "fs_lut.npz"), id=ids, name=names, rgb=rgb)


if __name__ == "__main__":
    extract()
