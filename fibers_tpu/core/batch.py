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


def prepare_batch(dwi, mask) -> VoxelBatch:
    """Gather the masked voxel signals and place them on device once."""
    from ..utils.profiling import prof

    with prof("batch.gather"):
        idx = mask_indices(mask.vol)
        signals = gather_frames(dwi.vol, idx).astype(np.float32)
        signals = pad_rows(signals, padded_size(len(idx)))
    with prof("batch.upload"):
        from ..ops.transfer import to_device
        dev = to_device(signals)
        import jax
        jax.block_until_ready(dev)
    return VoxelBatch(idx=idx, signals=dev, n=len(idx))
