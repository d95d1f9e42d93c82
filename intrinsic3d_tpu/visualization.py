"""SDF debug visualization: voxel color modes → mesh PLY export.

Re-design of ``nv::SDFVisualization`` (``libintrinsic3d/src/sdf/visualization.cpp``):
swap the grid's colors for a chosen scalar/vector field, extract the surface,
optionally keep only the largest component, and write a PLY per mode. All modes
are vectorized over the voxel table.

Modes (``visualization.cpp:72-89``): "" (voxel colors), normals, lap, lum,
lum_grad, albedo, shading_sv, shading_sv_const, chroma, subvol, subvol_interp.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.config import RefinementConfig
from intrinsic3d_tpu.color import intensity
from intrinsic3d_tpu.grid import ops as gops
from intrinsic3d_tpu.grid.voxel_grid import NORMAL_OFFSETS, RING6_OFFSETS, VoxelGrid
from intrinsic3d_tpu.io.ply import save_ply
from intrinsic3d_tpu.lighting.sh import compute_shading
from intrinsic3d_tpu.mesh import extract_surface, remove_loose_components

log = logging.getLogger("intrinsic3d")


def output_modes(cfg: RefinementConfig, add_voxel_colors: bool = True) -> List[str]:
    """Enabled color modes from the stage config (``visualization.cpp:72-89``)."""
    modes = [""] if add_voxel_colors else []
    flags = [
        (cfg.output_mesh_normals, "normals"),
        (cfg.output_mesh_laplacian, "lap"),
        (cfg.output_mesh_intensity, "lum"),
        (cfg.output_mesh_intensity_grad, "lum_grad"),
        (cfg.output_mesh_albedo, "albedo"),
        (cfg.output_mesh_shading_sv, "shading_sv"),
        (cfg.output_mesh_shading_sv_const, "shading_sv_const"),
        (cfg.output_mesh_chromacity, "chroma"),
        (cfg.output_mesh_subvolumes, "subvol"),
        (cfg.output_mesh_subvolumes_interpolated, "subvol_interp"),
    ]
    modes += [name for on, name in flags if on]
    return modes


def _scalar_to_color(val, scale):
    """Grayscale mapping (``color_util.cpp:70-80``)."""
    c = np.clip(np.asarray(val) * scale, 0.0, 255.0)
    return np.stack([c, c, c], axis=-1)


def _normals(grid: VoxelGrid):
    nbr4 = grid.neighbor_table(NORMAL_OFFSETS)
    n, ok = gops.surface_normals(
        jnp.asarray(grid.sdf_refined if grid.is_sbr else grid.sdf),
        jnp.asarray(nbr4),
        jnp.asarray(grid.valid_mask()),
    )
    return np.asarray(n), np.asarray(ok)


def _ring_valid(grid: VoxelGrid):
    ring = grid.neighbor_table(RING6_OFFSETS)
    ok = np.all((ring >= 0) & grid.valid_mask()[np.maximum(ring, 0)], axis=-1)
    return ring, ok


def colorize(
    grid: VoxelGrid,
    mode: str,
    lighting=None,  # SVSHResult for shading/subvol modes
) -> np.ndarray:
    """Colors [N, 3] 0..255 for one visualization mode."""
    sdfr = grid.sdf_refined if grid.is_sbr else grid.sdf
    if mode == "":
        return grid.color.copy()
    if mode == "normals":
        n, ok = _normals(grid)
        c = np.where(ok[:, None], 0.5 * n + 0.5, 0.0)
        return c * 255.0
    if mode == "lap":
        ring, ok = _ring_valid(grid)
        lap = np.asarray(
            gops.laplacian(jnp.asarray(sdfr), jnp.asarray(ring))
        ) / grid.truncation
        lap = np.where(ok, 0.5 * lap + 0.5, 0.0)
        return _scalar_to_color(lap, 255.0)
    if mode == "lum":
        lum = np.asarray(intensity(jnp.asarray(grid.color)))
        return _scalar_to_color(lum, 1.0)
    if mode == "lum_grad":
        ring, ok = _ring_valid(grid)
        lum = np.asarray(intensity(jnp.asarray(grid.color)))
        # forward x-difference of luma (``visualization.cpp:318-341``)
        grad_x = lum[np.maximum(ring[:, 0], 0)] - lum
        grad_x = np.where(ok, grad_x, 0.0)
        return np.clip(grad_x[:, None] * 0.5 + 127.0, 0, 255) * np.ones((1, 3))
    if mode == "albedo":
        return _scalar_to_color(grid.albedo, 255.0)
    if mode in ("shading_sv", "shading_sv_const"):
        if lighting is None:
            raise ValueError(f"mode {mode} needs an SVSH lighting result")
        n, ok = _normals(grid)
        pts = grid.voxel_to_world()
        sh = lighting.subvolumes.interpolate_values(lighting.coeffs, pts)
        albedo = np.full_like(grid.albedo, 0.7) if mode.endswith("const") else grid.albedo
        shading = np.asarray(
            compute_shading(jnp.asarray(sh, jnp.float32), jnp.asarray(n), jnp.asarray(albedo))
        )
        shading = np.where(ok, shading, 0.0) * 255.0
        return _scalar_to_color(shading, 1.0)
    if mode == "chroma":
        lum = np.asarray(intensity(jnp.asarray(grid.color)))
        chrom = grid.color / np.where(lum == 0.0, 1e-12, lum)[:, None]
        return np.clip(chrom * 255.0 * 0.5, 0, 255)
    if mode in ("subvol", "subvol_interp"):
        if lighting is None:
            raise ValueError(f"mode {mode} needs an SVSH lighting result")
        sub = lighting.subvolumes
        rng = np.random.default_rng(0)
        sub_colors = rng.integers(0, 256, size=(sub.count, 3)).astype(np.float32)
        pts = grid.voxel_to_world()
        if mode == "subvol":
            ids = sub.point_to_subvolume(pts)
            return np.where(ids[:, None] >= 0, sub_colors[np.maximum(ids, 0)], grid.color)
        return np.clip(sub.interpolate_values(sub_colors, pts), 0, 255)
    raise ValueError(f"unknown visualization mode: {mode}")


def export_mesh(
    grid: VoxelGrid,
    prefix: str,
    mode: str = "",
    lighting=None,
    largest_comp_only: bool = True,
    suffix: str = "",
) -> Optional[str]:
    """Colorize + marching extraction + PLY (``visualization.cpp:180-222``).

    The mesh filename is `{prefix}{suffix}[_{mode}].ply` matching the
    reference's naming. Uses sdf_refined for geometry when present."""
    colors = colorize(grid, mode, lighting)
    sdf = grid.sdf_refined if grid.is_sbr else grid.sdf
    verts, faces, vcols = extract_surface(grid, sdf=sdf, colors=colors)
    if largest_comp_only and len(faces):
        verts, faces, vcols = remove_loose_components(verts, faces, vcols)
    name = prefix + suffix + (f"_{mode}" if mode else "") + ".ply"
    save_ply(name, verts, faces, vcols)
    log.info("exported %s (%d verts, %d faces)", name, len(verts), len(faces))
    return name
