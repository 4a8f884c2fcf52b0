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


def prepare_batch(dwi, mask, mesh=None) -> VoxelBatch:
    """Gather the masked voxel signals and place them on device once.

    With `mesh` (a jax.sharding.Mesh, e.g. from parallel.mesh.make_mesh),
    the batch is sharded over the mesh's "data" axis — every fit that
    consumes it then runs data-parallel across chips, with XLA GSPMD
    inserting the few global-reduction collectives (SURVEY.md §5.8).
    """
    from ..utils.profiling import prof

    with prof("batch.gather"):
        idx = mask_indices(mask.vol)
        signals = gather_frames(dwi.vol, idx).astype(np.float32)
        n_pad = padded_size(len(idx))
        if mesh is not None:
            from ..parallel.mesh import pad_to_multiple
            n_pad = pad_to_multiple(n_pad, mesh.shape["data"])
        signals = pad_rows(signals, n_pad)
    with prof("batch.upload"):
        import jax
        if mesh is not None:
            from ..parallel.mesh import batch_sharding
            dev = jax.device_put(signals, batch_sharding(mesh))
        else:
            from ..ops.transfer import to_device
            dev = to_device(signals)
        jax.block_until_ready(dev)
    return VoxelBatch(idx=idx, signals=dev, n=len(idx))
