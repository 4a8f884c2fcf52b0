"""Prepared voxel batches: gather once, fit many.

A `VoxelBatch` holds the masked [N, nvol] signal batch already padded and
resident on device, so successive fits (DTI, then GQI, then RUMBA) reuse
one host gather and one host->device upload instead of repeating them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.masked import gather_frames, mask_indices, pad_rows, padded_size

__all__ = ["VoxelBatch", "prepare_batch"]


@dataclass
class VoxelBatch:
    idx: np.ndarray          # flat indices of masked voxels
    signals: "jnp.ndarray"   # [n_pad, nvol] on device, zero-padded rows
    n: int                   # number of real voxels

    @property
    def n_pad(self) -> int:
        return self.signals.shape[0]

    @property
    def mesh(self):
        """The multi-device mesh this batch is sharded over, or None.
        Fits use it to run data-parallel without a separate mesh arg."""
        from jax.sharding import NamedSharding
        shd = getattr(self.signals, "sharding", None)
        if (isinstance(shd, NamedSharding)
                and "data" in shd.mesh.axis_names
                and shd.mesh.devices.size > 1):
            return shd.mesh
        return None


def prepare_batch(dwi, mask, mesh=None) -> VoxelBatch:
    """Gather the masked voxel signals and place them on device once.

    With `mesh` (a jax.sharding.Mesh, e.g. from parallel.mesh.make_mesh),
    the batch is sharded over the mesh's "data" axis — every fit that
    consumes it then runs data-parallel across chips, with XLA GSPMD
    inserting the few global-reduction collectives (SURVEY.md §5.8).
    """
    from ..utils.profiling import prof

    import jax

    idx = mask_indices(mask.vol)
    n_pad = padded_size(len(idx))
    if mesh is not None:
        from ..parallel.mesh import pad_to_multiple
        n_pad = pad_to_multiple(n_pad, mesh.shape["data"])

    if mesh is not None:
        with prof("batch.gather"):
            signals = gather_frames(dwi.vol, idx).astype(np.float32)
            signals = pad_rows(signals, n_pad)
        with prof("batch.upload"):
            from ..parallel.mesh import batch_sharding
            from ..ops.transfer import sync
            dev = jax.device_put(signals, batch_sharding(mesh))
            sync(dev)
        return VoxelBatch(idx=idx, signals=dev, n=len(idx))

    # Single-device: pipeline the host-side mask gather with chunked
    # uploads — each slab is gathered and put on device from a pool
    # thread, so gather CPU time hides under upload wire time.
    with prof("batch.gather_upload"):
        from ..ops.transfer import to_device_rows

        vol = np.asarray(dwi.vol)
        if vol.ndim == 3:
            vol = vol[..., None]
        flat = vol.reshape(-1, vol.shape[3])
        nvol = flat.shape[1]

        def produce(lo, hi):
            take = idx[lo:min(hi, len(idx))]
            part = flat[take].astype(np.float32)
            if hi > len(idx):
                part = pad_rows(part, hi - lo)
            return part

        dev = to_device_rows(produce, n_pad, nvol * 4)
        from ..ops.transfer import sync
        sync(dev)
    return VoxelBatch(idx=idx, signals=dev, n=len(idx))
