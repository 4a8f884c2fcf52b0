"""Extract the three ODF sphere tessellations from the reference's data tables.

The reference embeds the DTK/DSIstudio sphere tessellations (362/642/724
vertices) as numeric literals in src/odf.jl (reference: src/odf.jl:14,
src/odf.jl:1104, src/odf.jl:3034).  These are standard public tessellation
data, not code; we package them as .npz for fast loading.

Run once:  python tools/extract_sphere_data.py
"""

import os
import re

import numpy as np

REF = "/root/reference/src/odf.jl"
OUT = os.path.join(os.path.dirname(__file__), "..", "fibers_tpu", "data")


def extract():
    with open(REF) as f:
        text = f.read()

    pat = re.compile(
        r"const global (sphere_\d+) = ODF\(\s*Float32\.\(\[(.*?)\]\),\s*\[(.*?)\]\)",
        re.S,
    )
    found = {}
    for m in pat.finditer(text):
        name, verts_txt, faces_txt = m.groups()
        verts = np.fromstring(verts_txt.replace("\n", " "), sep=" ", dtype=np.float64)
        verts = verts.reshape(-1, 3).astype(np.float32)
        faces = np.fromstring(faces_txt.replace("\n", " "), sep=" ", dtype=np.float64)
        faces = faces.reshape(-1, 3).astype(np.int32)
        found[name] = (verts, faces)
        print(f"{name}: vertices {verts.shape}, faces {faces.shape}")

    assert set(found) == {"sphere_362", "sphere_642", "sphere_724"}
    os.makedirs(OUT, exist_ok=True)
    for name, (verts, faces) in found.items():
        np.savez_compressed(
            os.path.join(OUT, f"{name}.npz"), vertices=verts, faces=faces
        )

    # Sanity: antipodal symmetry used throughout the reference
    # (vertices[i + n/2] == -vertices[i], see src/gqi.jl:48,69)
    for name, (verts, _) in found.items():
        n = verts.shape[0] // 2
        assert np.allclose(verts[:n], -verts[n:]), name


if __name__ == "__main__":
    extract()
