"""Synthetic DWI phantoms with analytically known ground truth.

Signals follow the same forward model the reference uses for its RUMBA
kernel (reference: src/rusd.jl:141-153): s(b, g) = s0 * exp(-b g' D g).
"""

import numpy as np

import fibers_tpu as ft


def fibonacci_dirs(n, antipodal_b0=1):
    """n roughly uniform unit directions (plus leading b=0 rows)."""
    i = np.arange(n)
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i
    z = 1 - 2 * (i + 0.5) / n
    r = np.sqrt(1 - z * z)
    dirs = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)
    return dirs.astype(np.float32)


def tensor_from_axis(axis, lam_para=1.7e-3, lam_perp=0.2e-3):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    d = lam_perp * np.eye(3) + (lam_para - lam_perp) * np.outer(axis, axis)
    return d


def dwi_signal(D, bval, bvec, s0=100.0):
    """[nvol] signal for a single tensor."""
    q = np.einsum("vi,ij,vj->v", bvec, D, bvec)
    return (s0 * np.exp(-bval * q)).astype(np.float32)


def make_phantom(shape=(12, 12, 12), ndir=30, bmax=1000.0, s0=100.0,
                 seed=0, two_shell=False):
    """A DWI volume whose every masked voxel contains a tensor with known
    orientation and eigenvalues.

    Returns (dwi MRI, mask MRI, axes [nx,ny,nz,3], lam (para, perp)).
    """
    rng = np.random.default_rng(seed)
    dirs = fibonacci_dirs(ndir)
    if two_shell:
        bval = np.concatenate([[0.0], np.full(ndir, bmax / 2),
                               np.full(ndir, bmax)]).astype(np.float32)
        bvec = np.concatenate([np.zeros((1, 3), np.float32), dirs, dirs])
    else:
        bval = np.concatenate([[0.0], np.full(ndir, bmax)]).astype(np.float32)
        bvec = np.concatenate([np.zeros((1, 3), np.float32), dirs])

    lam = (1.7e-3, 0.2e-3)
    axes = rng.standard_normal(shape + (3,))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)

    vol = np.zeros(shape + (len(bval),), np.float32)
    for ix in range(shape[0]):
        for iy in range(shape[1]):
            for iz in range(shape[2]):
                d = tensor_from_axis(axes[ix, iy, iz], *lam)
                vol[ix, iy, iz] = dwi_signal(d, bval, bvec, s0)

    dwi = ft.MRI(vol=vol)
    dwi.vox2ras0 = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    dwi.volsize = np.asarray(shape)
    dwi.width, dwi.height, dwi.depth = shape
    dwi.nframes = len(bval)
    dwi.set_geometry()
    dwi.bval = bval
    dwi.bvec = bvec

    mask = ft.MRI.like(dwi, 1, np.float32)
    mask.vol = np.ones(shape, np.float32)
    # carve out some empty voxels to exercise masking
    mask.vol[0, 0, :] = 0

    return dwi, mask, axes, lam
