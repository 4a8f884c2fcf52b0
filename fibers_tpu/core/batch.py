"""Prepared voxel batches: gather once, fit many.

A `VoxelBatch` holds the masked [N, nvol] signal batch already padded and
resident on device, so successive fits (DTI, then GQI, then RUMBA) reuse
one host gather and one host->device upload instead of repeating them.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.masked import mask_indices, pad_rows, padded_size

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


def _resolve_wire(flat: np.ndarray, wire: str, idx: np.ndarray = None):
    """Pick the host->device wire encoding for a gathered signal matrix.

    Returns (quantize: str | None, scale: float) with quantize one of
    None (exact float32 wire), "u16", or "u8".  "u16"/"u8" force that
    quantization (negative inputs clip to 0); "f32" forces the exact
    wire; "auto" picks uint16 on accelerator backends when the data is
    non-negative and finite — DWI magnitudes are (scanners record int16
    DICOM), and the device<->host wire is the e2e bottleneck there
    (BASELINE.md: the 566 MB float32 upload dominates the fit stage).
    "auto8" is "auto" with the uint8 wire — half the bytes again, for
    scale-invariant consumers only (DSI).

    With `idx` (the masked flat row indices) the quantization range is
    computed over the MASKED rows only: a bright artifact outside the
    mask (skull, coil flare) must not inflate the scale and spend wire
    precision on voxels no fit ever reads.
    """
    import jax

    from ..ops.transfer import (quant_u12_scale, quant_u16_scale,
                                quant_u8_scale)

    if wire not in ("auto", "auto8", "u16", "u12", "u8", "f32"):
        raise ValueError(f"Unknown batch wire {wire!r} "
                         "(expected auto/auto8/u16/u12/u8/f32)")
    if wire == "f32" or flat.size == 0:
        return None, 0.0
    if wire in ("auto", "auto8") and jax.default_backend() == "cpu":
        return None, 0.0
    # host scan chunked over the mask indices so no [Nmask, nvol]
    # temporary materializes.  Chunks gather into ONE pooled buffer
    # (np.take out=) sized under malloc's 32 MB munmap threshold:
    # per-chunk fresh allocations would first-touch-fault at ~0.1 GB/s
    # on the bench VM (utils.hostbuf), multi-second at HCP scale.
    if idx is not None and len(idx):
        from ..utils.hostbuf import scratch

        nvol = flat.shape[1] if flat.ndim == 2 else 1
        itemsize = flat.dtype.itemsize
        rows = max(1, (24 << 20) // max(1, nvol * itemsize))
        buf = scratch("wire-range-scan", rows * nvol, flat.dtype)
        buf = buf.reshape(rows, nvol) if flat.ndim == 2 else buf
        vmax, vmin = -np.inf, np.inf
        for lo in range(0, len(idx), rows):
            ii = idx[lo:lo + rows]
            part = np.take(flat, ii, axis=0, out=buf[:len(ii)])
            vmax = max(vmax, float(part.max()))
            vmin = min(vmin, float(part.min()))
    else:
        vmax = float(flat.max())
        vmin = float(flat.min())
    if wire in ("u16", "u12", "u8"):
        scale_fn = {"u16": quant_u16_scale, "u12": quant_u12_scale,
                    "u8": quant_u8_scale}[wire]
        scale = scale_fn(vmax, 0.0)          # negatives clip to 0
        if scale == 0.0:
            raise ValueError(
                f"wire={wire!r} needs a finite positive signal maximum "
                f"(got max={vmax})")
        return wire, scale
    mode = "u8" if wire == "auto8" else "u16"
    scale_fn = quant_u8_scale if mode == "u8" else quant_u16_scale
    scale = scale_fn(vmax, vmin)
    return (mode if scale > 0.0 else None), scale


def _quantize_rows(part: np.ndarray, scale: float,
                   quantize: str) -> np.ndarray:
    """round(v/scale) as uint16/uint8, or the packed 12-bit wire bytes
    (clipping negatives/overflow)."""
    if quantize == "u12":
        return _quantize_pack_u12(part, scale)
    hi, dt = ((65535.0, np.uint16) if quantize == "u16"
              else (255.0, np.uint8))
    q = part * np.float32(1.0 / scale)
    np.clip(q, 0.0, hi, out=q)
    return (q + 0.5).astype(dt)             # round-half-up, cheaper


def u12_row_bytes(nvol: int) -> int:
    """Packed bytes per row of the 12-bit wire (2 values / 3 bytes; an
    odd nvol pads one zero field per row)."""
    return ((nvol + 1) // 2) * 3


def _quantize_pack_u12(part: np.ndarray, scale: float) -> np.ndarray:
    """numpy fallback of the native gather+quantize+pack: [n, nvol] f32
    -> [n, u12_row_bytes(nvol)] uint8 (little-endian pair packing:
    b0 = v0 & 0xFF, b1 = (v0 >> 8) | ((v1 & 0xF) << 4), b2 = v1 >> 4)."""
    n, nvol = part.shape
    q = part * np.float32(1.0 / scale)
    np.clip(q, 0.0, 4095.0, out=q)
    q = (q + 0.5).astype(np.uint16)
    if nvol % 2:
        q = np.concatenate([q, np.zeros((n, 1), np.uint16)], axis=1)
    v0 = q[:, 0::2].astype(np.uint32)
    v1 = q[:, 1::2].astype(np.uint32)
    out = np.empty((n, u12_row_bytes(nvol)), np.uint8)
    out[:, 0::3] = v0 & 0xFF
    out[:, 1::3] = (v0 >> 8) | ((v1 & 0xF) << 4)
    out[:, 2::3] = v1 >> 4
    return out


def _gather_rows(flat: np.ndarray, take: np.ndarray, quantize,
                 scale: float, out: np.ndarray = None) -> np.ndarray:
    """flat[take] as quantized (u16/u8) or float32 rows, in ONE pass via
    the native kernel when available.  The numpy expression spends ~5
    full-size passes (fancy-index copy, astype, multiply, clip, astype);
    on 1-2 core hosts those sit on the critical path ahead of every
    upload, ~5-10 s at HCP scale.  `out`: optional preallocated [n, nvol]
    destination (pooled slabs — a fresh allocation per slab pays the
    ~0.1 GB/s first-touch fault cost, see utils.hostbuf)."""
    from ..native import (as_f32_ptr, as_i64_ptr, as_u8_ptr, as_u16_ptr,
                          lib)

    l = lib()
    n, nvol = len(take), flat.shape[1]
    dt = {"u16": np.uint16, "u12": np.uint8,
          "u8": np.uint8}.get(quantize, np.float32)
    ncol = u12_row_bytes(nvol) if quantize == "u12" else nvol
    if out is not None and (out.shape != (n, ncol) or out.dtype != dt):
        out = None
    if (l is not None and flat.dtype == np.float32
            and flat.flags["C_CONTIGUOUS"] and flat.ndim == 2):
        take = np.ascontiguousarray(take, np.int64)
        if out is None:
            out = np.empty((n, ncol), dt)
        if quantize == "u16":
            l.gather_quant_u16(as_f32_ptr(flat), as_i64_ptr(take),
                               n, nvol, np.float32(1.0 / scale),
                               as_u16_ptr(out))
        elif quantize == "u12":
            l.gather_quant_u12(as_f32_ptr(flat), as_i64_ptr(take),
                               n, nvol, np.float32(1.0 / scale),
                               as_u8_ptr(out))
        elif quantize == "u8":
            l.gather_quant_u8(as_f32_ptr(flat), as_i64_ptr(take),
                              n, nvol, np.float32(1.0 / scale),
                              as_u8_ptr(out))
        else:
            l.gather_rows_f32(as_f32_ptr(flat), as_i64_ptr(take),
                              n, nvol, as_f32_ptr(out))
        return out
    part = flat[take].astype(np.float32, copy=False)
    res = _quantize_rows(part, scale, quantize) if quantize else \
        np.ascontiguousarray(part)
    if out is not None:
        out[...] = res
        return out
    return res


def _dq_kernel(x, scale):
    return x.astype(jnp.float32) * scale


_dq_jit = None


def _dequant(dev, scale: float):
    """Device-side dequantization to the float32 batch fits consume.
    One fused elementwise pass at HBM bandwidth; preserves sharding.
    The scale rides as a traced scalar so every (shape, dtype) compiles
    exactly once."""
    import jax

    global _dq_jit
    if _dq_jit is None:
        _dq_jit = jax.jit(_dq_kernel)
    return _dq_jit(dev, jnp.float32(scale))


def _dq12_kernel(x, scale, nvol):
    """Unpack the 12-bit wire on device: [n, rowb] u8 -> [n, nvol] f32.
    Pure elementwise/strided ops — XLA fuses the whole thing into one
    HBM pass; the inverse of _quantize_pack_u12 / gather_quant_u12."""
    b = x.astype(jnp.int32)
    b0, b1, b2 = b[:, 0::3], b[:, 1::3], b[:, 2::3]
    v0 = b0 | ((b1 & 0xF) << 8)
    v1 = (b1 >> 4) | (b2 << 4)
    pairs = jnp.stack([v0, v1], axis=-1).reshape(x.shape[0], -1)
    return pairs[:, :nvol].astype(jnp.float32) * scale


_dq12_jit = None


def _dequant12(dev, scale: float, nvol: int):
    import jax

    global _dq12_jit
    if _dq12_jit is None:
        _dq12_jit = jax.jit(_dq12_kernel, static_argnames=("nvol",))
    return _dq12_jit(dev, jnp.float32(scale), nvol=nvol)


def prepare_batch(dwi, mask, mesh=None, wire: str = "auto") -> VoxelBatch:
    """Gather the masked voxel signals and place them on device once.

    With `mesh` (a jax.sharding.Mesh, e.g. from parallel.mesh.make_mesh),
    the batch is sharded over the mesh's "data" axis — every fit that
    consumes it then runs data-parallel across chips, with XLA GSPMD
    inserting the few global-reduction collectives (SURVEY.md §5.8).

    `wire` controls the host->device encoding: "auto" (default) uploads
    uint16-quantized rows on accelerator backends (halving the dominant
    wire stage; error <= max/131070, below fit noise — see
    ops.transfer.quant_u16_scale) and exact float32 on CPU; "auto8" is
    the same policy with a uint8 wire (half the bytes again, for
    scale-invariant consumers like DSI); "u16"/"u12"/"u8"/"f32" force
    one encoding — "u12" packs 2 values per 3 bytes (25% fewer bytes
    than u16 at error <= max/8190, still far below fit noise).  The
    device-resident batch is always float32 — dequantization happens
    once on device.
    """
    from ..utils.profiling import prof

    import jax

    idx = mask_indices(mask.vol)
    n_pad = padded_size(len(idx))
    if mesh is not None:
        from ..parallel.mesh import pad_to_multiple
        n_pad = pad_to_multiple(n_pad, mesh.shape["data"])

    vol = np.asarray(dwi.vol)
    if vol.ndim == 3:
        vol = vol[..., None]
    flat = vol.reshape(-1, vol.shape[3])
    nvol = flat.shape[1]
    quantize, scale = _resolve_wire(flat, wire, idx)

    if mesh is not None:
        with prof("batch.gather"):
            signals = pad_rows(_gather_rows(flat, idx, quantize, scale),
                               n_pad)
        with prof("batch.upload"):
            from ..ops.transfer import sync
            from ..parallel.mesh import batch_sharding
            dev = jax.device_put(signals, batch_sharding(mesh))
            if quantize == "u12":
                dev = _dequant12(dev, scale, nvol)
            elif quantize:
                dev = _dequant(dev, scale)
            sync(dev)
        return VoxelBatch(idx=idx, signals=dev, n=len(idx))

    # Single-device: pipeline the host-side mask gather (and optional
    # quantization) with chunked uploads — each slab is produced and put
    # on device from a pool thread, so host CPU work hides under upload
    # wire time.
    with prof("batch.gather_upload"):
        from ..ops.transfer import sync, to_device_rows
        from ..utils.hostbuf import pool_upload_slabs, scratch

        slab_dt = {"u16": np.uint16, "u12": np.uint8,
                   "u8": np.uint8}.get(quantize, np.float32)
        ncol = u12_row_bytes(nvol) if quantize == "u12" else nvol
        # pool only when the native gather fills the slab in place —
        # the numpy fallback computes fresh arrays and would pay the
        # faults anyway PLUS a copy into the pooled slab
        from ..native import lib as _nlib
        pool_ok = (pool_upload_slabs() and _nlib() is not None
                   and flat.dtype == np.float32
                   and flat.flags["C_CONTIGUOUS"])

        def produce(lo, hi):
            n = max(0, min(hi, len(idx)) - lo)
            out = scratch(f"upload.batch.{lo}", n * ncol,
                          slab_dt).reshape(n, ncol) if pool_ok else None
            part = _gather_rows(flat, idx[lo:min(hi, len(idx))],
                                quantize, scale, out=out)
            if hi > len(idx):
                part = pad_rows(part, hi - lo)
            return part

        dev = to_device_rows(
            produce, n_pad,
            ncol * {"u16": 2, "u12": 1, "u8": 1}.get(quantize, 4))
        if quantize == "u12":
            dev = _dequant12(dev, scale, nvol)
        elif quantize:
            dev = _dequant(dev, scale)
        sync(dev)
    return VoxelBatch(idx=idx, signals=dev, n=len(idx))
