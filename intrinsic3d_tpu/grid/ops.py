"""Differential operators over the flat voxel table.

Device-side equivalents of ``nv::SDFOperators``
(``libintrinsic3d/src/sdf/operators.cpp``): forward-difference surface normals,
discrete Laplacian, voxel→iso-surface projection. All take precomputed gather
index tables (−1 = absent) and validity masks instead of per-voxel hash probes,
so one call covers the whole grid.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_field(field, idx, fill=0.0):
    """Gather `field[idx]` with −1 → `fill`."""
    safe = jnp.maximum(idx, 0)
    out = field[safe]
    mask = idx >= 0
    if out.ndim > mask.ndim:
        mask = mask[..., None]
    return jnp.where(mask, out, fill)


def surface_normals(sdf, nbr4_idx, valid):
    """Forward-difference normals for all voxels.

    nbr4_idx `[N, 4]` indexes the {center, +x, +y, +z} stencil; `valid [N]` is
    the weight>0 mask. A voxel needs itself and all three forward neighbors
    valid, otherwise its normal is zero (``operators.cpp:58-77``).
    Returns (normals `[N, 3]`, normal_valid `[N]`).
    """
    nb_valid = jnp.all((nbr4_idx >= 0) & valid[jnp.maximum(nbr4_idx, 0)], axis=-1)
    s = gather_field(sdf, nbr4_idx)  # [N, 4]
    n = jnp.stack([s[:, 1] - s[:, 0], s[:, 2] - s[:, 0], s[:, 3] - s[:, 0]], axis=-1)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    nonzero = norm[:, 0] > 0.0
    n = jnp.where(nonzero[:, None], n / jnp.where(norm == 0.0, 1.0, norm), 0.0)
    ok = nb_valid & nonzero
    return jnp.where(ok[:, None], n, 0.0), ok


def compute_normal_from_sdf4(sdf4, eps=0.0):
    """Differentiable normal from an `[..., 4]` stencil of SDF values
    {center, +x, +y, +z} (``operators.h:70-86``). Normalization is guarded so
    jvp/vjp stay finite when the gradient vanishes."""
    n = jnp.stack(
        [
            sdf4[..., 1] - sdf4[..., 0],
            sdf4[..., 2] - sdf4[..., 0],
            sdf4[..., 3] - sdf4[..., 0],
        ],
        axis=-1,
    )
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-24)
    return n / norm


def laplacian(sdf, ring6_idx, center_valid=None):
    """Discrete volumetric Laplacian over the 6-ring (un-normalized, as in the
    residual form ``operators.h:88-109``). ring6_idx `[N, 6]` ordered
    (+x, −x, +y, −y, +z, −z); absent neighbors contribute the center value
    (zero curvature contribution)."""
    s6 = gather_field(sdf, ring6_idx, 0.0)
    present = ring6_idx >= 0
    s6 = jnp.where(present, s6, sdf[:, None])
    return jnp.sum(s6, axis=-1) - 6.0 * sdf


def voxel_to_world(coords, voxel_size):
    return coords.astype(jnp.float32) * voxel_size


def voxel_center_to_iso(world_pts, normals, sdf):
    """Project voxel centers onto the iso-surface: `p − n·sdf`
    (``operators.cpp:46-56``)."""
    return world_pts - normals * sdf[..., None]
