"""Spatially-varying spherical-harmonics lighting estimation.

Re-design of ``nv::LightingSVSH`` (``libintrinsic3d/src/lighting/lighting_svsh.cpp``).
The reference builds a Ceres problem with one `albedo·(H(n)·l) − lum` residual per
thin-shell voxel plus `l_i − l_j` pair regularizers and runs 50 CGNR iterations.
The residuals are **linear** in the 9 coefficients per subvolume, so the whole
estimate is one block-sparse linear least-squares problem. Here the normal
equations are assembled on device with `segment_sum` by subvolume id — data term
weights normalized by 1/Σw, regularizer by λ/P exactly as the reference
(``lighting_svsh.cpp:296-318``) — and solved exactly by dense Cholesky (the 9·S
system is tiny: S is tens to hundreds of subvolumes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.color import intensity
from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid, NORMAL_OFFSETS
from intrinsic3d_tpu.grid import ops as gops
from intrinsic3d_tpu.lighting.sh import NUM_SH, sh_basis
from intrinsic3d_tpu.lighting.subvolumes import Subvolumes
from intrinsic3d_tpu.mathutil import sdf_to_weight


import functools


@functools.partial(jax.jit, static_argnames=("num_subvolumes",))
def _assemble_and_solve(
    H,  # [M, 9] SH basis of voxel normals
    albedo,  # [M]
    lum,  # [M] luminance in [0,1]
    w,  # [M] per-voxel data weights (0 = drop)
    subvol,  # [M] int32 subvolume id (valid)
    pairs,  # [P, 2] int32 directed neighbor pairs
    num_subvolumes,  # static via shape of output? passed as concrete below
    lambda_reg,
):
    S = num_subvolumes
    wsum = jnp.sum(w)
    data_w = jnp.where(wsum > 0, 1.0 / wsum, 1.0) * w  # [M]

    # block-diagonal data term: A_s += w̃ a² H Hᵀ, b_s += w̃ a lum H
    aH = H * albedo[:, None]  # [M, 9]
    outer = aH[:, :, None] * aH[:, None, :] * data_w[:, None, None]  # [M, 9, 9]
    A_blocks = jax.ops.segment_sum(outer, subvol, num_segments=S)  # [S, 9, 9]
    b_blocks = jax.ops.segment_sum(
        aH * (data_w * lum)[:, None], subvol, num_segments=S
    )  # [S, 9]

    # assemble dense system
    A = jnp.zeros((S * 9, S * 9))
    idx = jnp.arange(S) * 9

    def place_block(A, s):
        return jax.lax.dynamic_update_slice(A, A_blocks[s], (idx[s], idx[s]))

    A = jax.lax.fori_loop(0, S, lambda s, A: place_block(A, s), A)

    # graph-Laplacian regularizer over directed pairs, weight λ/P per residual
    P = pairs.shape[0]
    reg_w = jnp.where(P > 0, lambda_reg / jnp.maximum(P, 1), 0.0)
    eye9 = jnp.eye(9) * reg_w
    i, j = pairs[:, 0], pairs[:, 1]

    def add_reg(p, A):
        ii, jj = i[p] * 9, j[p] * 9
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (ii, ii), (9, 9)) + eye9, (ii, ii)
        )
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (jj, jj), (9, 9)) + eye9, (jj, jj)
        )
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (ii, jj), (9, 9)) - eye9, (ii, jj)
        )
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (jj, ii), (9, 9)) - eye9, (jj, ii)
        )
        return A

    A = jax.lax.fori_loop(0, P, add_reg, A)
    b = b_blocks.reshape(-1)

    # tiny Tikhonov jitter for unobserved/rank-deficient subvolumes
    A = A + jnp.eye(S * 9) * 1e-10
    x = jax.scipy.linalg.solve(A, b, assume_a="pos")
    return x.reshape(S, 9)


@dataclasses.dataclass
class SVSHResult:
    subvolumes: Subvolumes
    coeffs: np.ndarray  # [S, 9]


def estimate_svsh(
    grid: VoxelGrid,
    subvolume_size: float,
    lambda_reg: float,
    thres_shell: float,
    weighted: bool = True,
    normals: Optional[np.ndarray] = None,
    normal_valid: Optional[np.ndarray] = None,
) -> Optional[SVSHResult]:
    """Estimate per-subvolume SH coefficients (``lighting_svsh.cpp:166-346``)."""
    if grid.num_voxels == 0 or thres_shell <= 0.0:
        return None
    pts = grid.voxel_to_world()
    sub = Subvolumes.compute(pts, subvolume_size)
    if sub.count == 0:
        return None

    if normals is None:
        nbr4 = grid.neighbor_table(NORMAL_OFFSETS)
        normals_j, nvalid_j = gops.surface_normals(
            jnp.asarray(grid.sdf_refined), jnp.asarray(nbr4), jnp.asarray(grid.valid_mask())
        )
        normals = np.asarray(normals_j)
        normal_valid = np.asarray(nvalid_j)

    subvol = sub.point_to_subvolume(pts)
    albedo = grid.albedo
    lum = np.asarray(intensity(jnp.asarray(grid.color))) / 255.0

    valid = (
        grid.valid_mask()
        & (np.abs(grid.sdf_refined) <= thres_shell)
        & normal_valid
        & (albedo != 0.0)
        & ~np.isnan(albedo)
        & (subvol >= 0)
    )
    if not np.any(valid):
        return None

    w = np.ones(grid.num_voxels, np.float32)
    if weighted:
        w = np.asarray(sdf_to_weight(jnp.asarray(grid.sdf_refined), grid.truncation))
    w = np.where(valid, w, 0.0).astype(np.float32)

    m = np.flatnonzero(valid)
    H = np.asarray(sh_basis(jnp.asarray(normals[m])))
    coeffs = _assemble_and_solve(
        jnp.asarray(H),
        jnp.asarray(albedo[m], jnp.float32),
        jnp.asarray(lum[m], jnp.float32),
        jnp.asarray(w[m]),
        jnp.asarray(subvol[m].astype(np.int32)),
        jnp.asarray(sub.neighbor_pairs()),
        sub.count,
        lambda_reg,
    )
    return SVSHResult(subvolumes=sub, coeffs=np.asarray(coeffs))


def voxel_sh_coeffs(
    result: SVSHResult, grid: VoxelGrid, thres_shell: float
) -> np.ndarray:
    """Per-voxel trilinearly interpolated SH coefficients; zero outside the
    thin shell (``lighting_svsh.cpp:93-110``)."""
    pts = grid.voxel_to_world()
    coeffs = result.subvolumes.interpolate_values(result.coeffs, pts)
    inside = grid.valid_mask() & (np.abs(grid.sdf_refined) <= thres_shell)
    return np.where(inside[:, None], coeffs, 0.0).astype(np.float32)
