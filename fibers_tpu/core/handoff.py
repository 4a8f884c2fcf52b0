"""Device-resident fit->tract handoff.

A reconstruction's peak field can feed tractography without ever leaving
the device: fits stash their [N, npeak, 3] peak batch as a
`DevicePeaks`, and `stream` builds the masked [nxyz, nvec, 3]
orientation array from it with one on-device scatter — replacing the
fetch -> host rebuild -> re-upload round trip (~150 MB of wire at HCP
scale; reference counterpart: the host orientation assembly at
src/stream.jl:94-173).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DevicePeaks", "split_unit_amp"]


@dataclass
class DevicePeaks:
    """Peak orientations of a fit, kept on device.

    vecs: [N, npeak, 3] device unit directions (zero rows = no peak).
    amp:  [N, npeak] device per-peak amplitudes (GQI/DSI qa, RUMBA
          volume fractions) — `stream` thresholds these at f_thresh.
    idx:  flat voxel indices (C order) of the N batch rows.
    ref:  an MRI carrying the geometry (shape, volres, vox2ras).
    """

    vecs: object
    amp: object
    idx: np.ndarray
    ref: object

    @property
    def shape3(self):
        return tuple(int(s) for s in self.ref.vol.shape[:3])

    @property
    def volres(self):
        return np.asarray(self.ref.volres)

    @property
    def nvec(self) -> int:
        return int(self.vecs.shape[1])

    def first(self, k: int = 1) -> "DevicePeaks":
        """Restrict to the k strongest peaks (device-side slice) — e.g.
        single-peak deterministic tractography from peak 1 only."""
        return DevicePeaks(vecs=self.vecs[:, :k], amp=self.amp[:, :k],
                           idx=self.idx, ref=self.ref)


@jax.jit
def split_unit_amp(vecs):
    """[N, npeak, 3] vectors with amplitude-scaled magnitude (RUMBA
    convention, reference src/rusd.jl:602-633) -> (unit vectors,
    amplitudes)."""
    a = jnp.sqrt((vecs * vecs).sum(axis=-1))
    u = jnp.where(a[..., None] > 0, vecs / jnp.maximum(a[..., None],
                                                       1e-30), 0.0)
    return u, a
