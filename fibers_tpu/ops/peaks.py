"""ODF local-peak detection on sphere tessellations.

Vectorized equivalent of the reference's face-column comparisons
(reference: src/gqi.jl:180-201): a vertex survives iff its amplitude is
strictly greater than every vertex it shares a face with.  Implemented as a
padded neighbor-gather + max, which runs as one fused gather/compare over
the whole [N, nvert] batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["build_neighbors", "peak_mask", "top_peaks"]


def build_neighbors(faces0: np.ndarray, nvert: int):
    """Padded face-neighbor table from 0-based folded faces [m, 3].

    Returns (nbr [nvert, maxdeg] int32, nbr_valid [nvert, maxdeg] bool).
    Padding entries point at vertex 0 with valid=False.
    """
    neigh = [set() for _ in range(nvert)]
    for a, b, c in faces0:
        neigh[a].update((b, c))
        neigh[b].update((a, c))
        neigh[c].update((a, b))
    maxdeg = max(len(s) for s in neigh)
    nbr = np.zeros((nvert, maxdeg), np.int32)
    ok = np.zeros((nvert, maxdeg), bool)
    for v, s in enumerate(neigh):
        idx = sorted(s)
        nbr[v, :len(idx)] = idx
        ok[v, :len(idx)] = True
    return nbr, ok


def peak_mask(o, nbr, nbr_valid):
    """[..., nvert] amplitudes -> boolean mask of strict local maxima.

    Matches the reference's rule: a vertex is zeroed if ANY co-face vertex
    has amplitude >= its own (reference: src/gqi.jl:185-196).
    """
    gathered = o[..., nbr]                       # [..., nvert, maxdeg]
    neg_inf = jnp.asarray(-jnp.inf, o.dtype)
    gathered = jnp.where(nbr_valid, gathered, neg_inf)
    nbr_max = gathered.max(axis=-1)
    return o > nbr_max


def top_peaks(o, is_peak, k):
    """Top-k peak amplitudes and vertex indices, sorted descending.

    Non-peak vertices contribute 0 (as in the reference, which zeroes them
    then sorts); a slot is valid iff its amplitude is > 0
    (reference: src/gqi.jl:198-200, nvalid = count(odf_peak > 0)).

    Returns (vals [..., k], idx [..., k], valid [..., k]).
    """
    import jax.lax as lax

    masked = jnp.where(is_peak, o, 0.0)
    vals, idx = lax.top_k(masked, k)
    return vals, idx, vals > 0
