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
    num_subvolumes,  # static
    lambda_reg,
):
    """Block-sparse normal-equations solve.

    The system is block-diagonal data blocks (9×9 per subvolume) + a graph
    Laplacian ⊗ I₉ over the neighbor pairs; it is never densified. PCG with a
    block-Jacobi (batched Cholesky) preconditioner — matching the structure
    the reference's CGNR exploits (``lighting_svsh.cpp:321-342``) while
    scaling to thousands of subvolumes with O(S·81) memory.
    """
    S = num_subvolumes
    wsum = jnp.sum(w)
    data_w = jnp.where(wsum > 0, 1.0 / wsum, 1.0) * w  # [M]

    # block-diagonal data term: A_s += w̃ a² H Hᵀ, b_s += w̃ a lum H.
    # The outer product is built FLAT [M, 81] instead of [M, 9, 9]: a big
    # array with two small minor dims tile-pads both of them on TPU —
    # measured 8.2 GB of scatter temps at M=1e6 for the [M, 9, 9] form vs
    # 1.3 GB flat (the [M, >2.2e6, 9, 9] form crashed the remote compile
    # helper outright; CLAUDE.md "small minor dims are poison").
    aH = H * albedo[:, None]  # [M, 9]
    ii, jj = jnp.divmod(jnp.arange(81, dtype=jnp.int32), 9)
    outer = aH[:, ii] * aH[:, jj] * data_w[:, None]  # [M, 81]
    A_blocks = jax.ops.segment_sum(outer, subvol, num_segments=S).reshape(S, 9, 9)
    b = jax.ops.segment_sum(
        aH * (data_w * lum)[:, None], subvol, num_segments=S
    )  # [S, 9]
    return solve_block_system(A_blocks, b, pairs, S, lambda_reg)


def solve_block_system(A_blocks, b, pairs, num_subvolumes, lambda_reg):
    """PCG solve of (data blocks + graph Laplacian ⊗ I₉) x = b — the solver
    half of `_assemble_and_solve`, shared verbatim by the single-device path
    and the SPMD path (parallel/spmd_stages.py assembles `A_blocks`/`b` as
    psum'd per-device partial segment sums, then every device runs this same
    deterministic replicated solve)."""
    S = num_subvolumes
    # graph-Laplacian regularizer over directed pairs, weight λ/P per residual
    P = pairs.shape[0]
    reg_w = jnp.where(P > 0, lambda_reg / jnp.maximum(P, 1), 0.0)
    i, j = pairs[:, 0], pairs[:, 1]
    ones = jnp.ones(P, dtype=b.dtype)
    deg = jax.ops.segment_sum(ones, i, num_segments=S) + jax.ops.segment_sum(
        ones, j, num_segments=S
    )  # [S]

    jitter = 1e-10  # keeps unobserved/isolated subvolumes invertible

    def matvec(x):  # x [S, 9]
        y = jnp.einsum("sab,sb->sa", A_blocks, x)
        diff = reg_w * (x[i] - x[j])  # [P, 9]
        y = y + jax.ops.segment_sum(diff, i, num_segments=S)
        y = y - jax.ops.segment_sum(diff, j, num_segments=S)
        return y + jitter * x

    # block-Jacobi preconditioner: per-subvolume Cholesky of the diagonal block
    M_blocks = A_blocks + (reg_w * deg + jitter)[:, None, None] * jnp.eye(9)
    chol = jnp.linalg.cholesky(M_blocks)  # [S, 9, 9]

    def precond(r):
        z = jax.scipy.linalg.solve_triangular(chol, r[..., None], lower=True)
        z = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(chol, -1, -2), z, lower=False
        )
        return z[..., 0]

    x, _ = jax.scipy.sparse.linalg.cg(
        matvec, b, M=precond, tol=1e-8, maxiter=max(9 * S, 100)
    )
    return x


@functools.partial(jax.jit, static_argnames=("num_subvolumes", "weighted"))
def _estimate_full(
    sdfr,  # [N]
    validm,  # [N] bool fusion-valid
    nbr4,  # [N, 4] normal-stencil neighbor table
    albedo,  # [N]
    color,  # [N, 3] 0..255
    subvol,  # [N] int32 (−1 = outside partition)
    pairs,  # [P, 2] int32 directed neighbor pairs
    pts,  # [N, 3] world positions (per-voxel SH interpolation)
    cell_tab,  # dense subvolume-cell id lookup
    cell_origin,  # [3]
    sub_size,
    num_subvolumes,  # static
    weighted,  # static
    lambda_reg,
    thres_shell,
    truncation,
):
    """Whole SVSH estimate as ONE program over the full voxel table.

    Normals, the SH basis, luminance, gating and the block-sparse solve fuse
    into a single jit keyed only on (N, S, P) — stable across a grid level's
    pyramid levels, unlike the earlier compact-to-M staging whose
    data-dependent M forced a recompile + remote program load on EVERY call
    (BENCH_NOTES "Per-level program-load latency"). Invalid rows carry
    weight 0 and a clamped subvolume id: identical normal equations.

    Returns (coeffs [S, 9], number of contributing voxels)."""
    normals, nvalid = gops.surface_normals(sdfr, nbr4, validm)
    H = sh_basis(normals)
    lum = intensity(color) / 255.0
    valid = (
        validm
        & (jnp.abs(sdfr) <= thres_shell)
        & nvalid
        & (albedo != 0.0)
        & ~jnp.isnan(albedo)
        & (subvol >= 0)
    )
    w = sdf_to_weight(sdfr, truncation) if weighted else jnp.ones_like(sdfr)
    w = jnp.where(valid, w, 0.0).astype(jnp.float32)
    coeffs = _assemble_and_solve(
        H,
        albedo.astype(jnp.float32),
        lum.astype(jnp.float32),
        w,
        jnp.maximum(subvol, 0).astype(jnp.int32),
        pairs,
        num_subvolumes,
        lambda_reg,
    )
    # per-voxel trilinear SH interpolation ON DEVICE, in the same program:
    # the host-numpy `voxel_sh_coeffs` costs ~6.5 s at the 1.05M-voxel
    # finest pipeline level (measured round 4), while the device gather adds
    # ~nothing to a program that is already loaded for the estimate
    cvox = trilerp_subvolumes(coeffs, pts, cell_tab, cell_origin, sub_size)
    inside = validm & (jnp.abs(sdfr) <= thres_shell)
    vox_sh = jnp.where(inside[:, None], cvox, 0.0)
    return coeffs, jnp.sum(valid), vox_sh


def trilerp_subvolumes(coeffs, pts, cell_tab, cell_origin, sub_size):
    """Device twin of `Subvolumes.interpolation` + `interpolate_values`:
    −0.5 center offset, missing-neighbor weight zeroing, renormalization
    (``subvolumes.cpp:164-208``). `pts [M, 3]` world positions, `cell_tab`
    a dense cell-id lookup from `Subvolumes.cell_lookup`. Returns `[M, 9]`.

    Laid out to keep M on the MINOR axis of every big intermediate: the
    corner loop runs as 8 unrolled steps over 1-D `[M]` columns with a
    `[9, M]` accumulator (the naive `[M, 8, 3]`/`[M, 8, 9]` forms tile-pad
    their small minor dims ~14-42× — part of what crashed the remote
    compile at >2.2M voxels)."""
    inv = 1.0 / sub_size
    px = pts[:, 0] * inv - 0.5
    py = pts[:, 1] * inv - 0.5
    pz = pts[:, 2] * inv - 0.5
    bx, by, bz = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    fx, fy, fz = px - bx, py - by, pz - bz
    ox = jnp.asarray(cell_origin, jnp.int32)
    dims = cell_tab.shape
    bxi = bx.astype(jnp.int32) - ox[0]
    byi = by.astype(jnp.int32) - ox[1]
    bzi = bz.astype(jnp.int32) - ox[2]
    coeffs_t = coeffs.T  # [9, S]
    m = pts.shape[0]
    acc = jnp.zeros((NUM_SH, m), coeffs.dtype)
    wsum = jnp.zeros((m,), coeffs.dtype)
    tab_flat = cell_tab.reshape(-1)
    for dx in (0, 1):
        wx = fx if dx else 1.0 - fx
        ix = bxi + dx
        for dy in (0, 1):
            wy = fy if dy else 1.0 - fy
            iy = byi + dy
            for dz in (0, 1):
                wz = fz if dz else 1.0 - fz
                iz = bzi + dz
                inb = (
                    (ix >= 0) & (ix < dims[0])
                    & (iy >= 0) & (iy < dims[1])
                    & (iz >= 0) & (iz < dims[2])
                )
                flat = (
                    jnp.clip(ix, 0, dims[0] - 1) * dims[1]
                    + jnp.clip(iy, 0, dims[1] - 1)
                ) * dims[2] + jnp.clip(iz, 0, dims[2] - 1)
                ids = jnp.where(inb, tab_flat[flat], -1)  # [M]
                w = jnp.where(ids >= 0, wx * wy * wz, 0.0)
                acc = acc + coeffs_t[:, jnp.maximum(ids, 0)] * w[None, :]
                wsum = wsum + w
    out = jnp.where(
        wsum[None, :] > 0.0, acc / jnp.where(wsum == 0.0, 1.0, wsum)[None, :], 0.0
    )
    return out.T  # [M, 9]


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
    with_voxel_sh: bool = False,
    nbr4: Optional[np.ndarray] = None,
) -> Optional[SVSHResult]:
    """Estimate per-subvolume SH coefficients (``lighting_svsh.cpp:166-346``).

    `with_voxel_sh=True` additionally returns the per-voxel trilinearly
    interpolated coefficients `[N, 9]` computed ON DEVICE inside the same
    program (the production pipeline path; `voxel_sh_coeffs` remains the
    host-numpy equivalent for tests/visualization) — the return becomes
    `(SVSHResult | None, vox_sh | None)`. `nbr4` may supply the level's
    `[N, 4]` normal-stencil table (`LevelTopology.nbr4_idx`) to skip
    rebuilding it here."""
    if grid.num_voxels == 0 or thres_shell <= 0.0:
        return (None, None) if with_voxel_sh else None
    import time

    from intrinsic3d_tpu.timer import record_phase

    t_host = time.perf_counter()
    pts = grid.voxel_to_world()
    sub = Subvolumes.compute(pts, subvolume_size)
    if sub.count == 0:
        return (None, None) if with_voxel_sh else None

    subvol = sub.point_to_subvolume(pts)

    if normals is not None:
        assert not with_voxel_sh  # legacy staged path (tests/visualization)
        # caller-supplied normals (tests / visualization): legacy staged path
        lum = np.asarray(intensity(jnp.asarray(grid.color))) / 255.0
        albedo = grid.albedo
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

    if nbr4 is None:
        nbr4 = grid.neighbor_table(NORMAL_OFFSETS)
    tab, origin = sub.cell_lookup()
    # host/device split telemetry: the host half is subvolume discovery +
    # neighbor tables (numpy/native); the device half is the ONE
    # (N, S, P)-keyed program incl. its transfer + (first call) program load
    record_phase(f"svsh_host[v{grid.num_voxels}]", time.perf_counter() - t_host)
    t_dev = time.perf_counter()
    coeffs, nvalid, vox_sh = _estimate_full(
        jnp.asarray(grid.sdf_refined),
        jnp.asarray(grid.valid_mask()),
        jnp.asarray(nbr4),
        jnp.asarray(grid.albedo, jnp.float32),
        jnp.asarray(grid.color, jnp.float32),
        jnp.asarray(subvol.astype(np.int32)),
        jnp.asarray(sub.neighbor_pairs()),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(tab),
        jnp.asarray(origin, jnp.int32),
        jnp.float32(sub.size),
        sub.count,
        weighted,
        jnp.float32(lambda_reg),
        jnp.float32(thres_shell),
        jnp.float32(grid.truncation),
    )
    nvalid = int(nvalid)
    record_phase(f"svsh_device[v{grid.num_voxels}]", time.perf_counter() - t_dev)
    if nvalid == 0:
        return (None, None) if with_voxel_sh else None
    res = SVSHResult(subvolumes=sub, coeffs=np.asarray(coeffs))
    if with_voxel_sh:
        return res, np.asarray(vox_sh)
    return res


def voxel_sh_coeffs(
    result: SVSHResult, grid: VoxelGrid, thres_shell: float
) -> np.ndarray:
    """Per-voxel trilinearly interpolated SH coefficients; zero outside the
    thin shell (``lighting_svsh.cpp:93-110``)."""
    pts = grid.voxel_to_world()
    coeffs = result.subvolumes.interpolate_values(result.coeffs, pts)
    inside = grid.valid_mask() & (np.abs(grid.sdf_refined) <= thres_shell)
    return np.where(inside[:, None], coeffs, 0.0).astype(np.float32)
