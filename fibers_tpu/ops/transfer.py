"""Device->host transfer tuned for high-latency device links.

Large monolithic device->host copies collapse to ~1 MB/s on tunneled TPU
runtimes (measured: 256 MB monolithic = 206 s, the same data in 16 MB
chunks = 8.6 s).  `to_host` slices the leading axis into ~24 MB chunks and
fetches a few in parallel, which restores ~30-40 MB/s.  Host->device is
unaffected (~1 GB/s) and uses plain device_put.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

__all__ = ["to_host"]

_CHUNK_BYTES = 24 << 20
_THREADS = 4
_pool = None


def _get_pool():
    global _pool
    if _pool is None:
        _pool = ThreadPoolExecutor(_THREADS)
    return _pool


def to_host(x) -> np.ndarray:
    """Fetch a device array to host, chunked along the leading axis."""
    nbytes = x.size * x.dtype.itemsize
    if nbytes <= _CHUNK_BYTES or x.ndim == 0 or x.shape[0] <= 1:
        return np.asarray(x)

    row_bytes = max(1, nbytes // x.shape[0])
    rows = max(1, _CHUNK_BYTES // row_bytes)
    n = x.shape[0]
    chunks = [x[i:min(i + rows, n)] for i in range(0, n, rows)]
    if len(chunks) == 1:
        return np.asarray(x)

    parts = list(_get_pool().map(np.asarray, chunks))
    return np.concatenate(parts, axis=0)
