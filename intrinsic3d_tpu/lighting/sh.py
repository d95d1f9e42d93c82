"""Second-order spherical-harmonics shading model.

The 9-term unnormalized real SH basis and Lambertian shading of the reference
(``libintrinsic3d/include/nv/shading.h:53-148``): basis
`{1, ny, nz, nx, nx·ny, ny·nz, −nx²−ny²+2nz², nx·nz, nx²−ny²}`, shading
`albedo · Σ l_k H_k(n)`, and the E_g gradient-difference residual
`‖∇(shading) − ∇(lum)‖` over forward differences to the +x/+y/+z neighbors.
Everything is batched jnp — one call evaluates all voxels at once.
"""

from __future__ import annotations

import jax.numpy as jnp

NUM_SH = 9


def sh_basis(n):
    """SH basis functions of normals `n [..., 3]` → `[..., 9]`
    (``shading.h:53-67``)."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    one = jnp.ones_like(nx)
    return jnp.stack(
        [
            one,
            ny,
            nz,
            nx,
            nx * ny,
            ny * nz,
            -nx * nx - ny * ny + 2.0 * nz * nz,
            nx * nz,
            nx * nx - ny * ny,
        ],
        axis=-1,
    )


def compute_shading(sh_coeffs, normal, albedo):
    """`albedo · Σ l_k H_k(n)` (``shading.h:73-112``).

    sh_coeffs `[..., 9]`, normal `[..., 3]`, albedo `[...]` → shading `[...]`.
    """
    return albedo * jnp.sum(sh_basis(normal) * sh_coeffs, axis=-1)


def shading_gradient_difference(lum4, shading4, eps=1e-12):
    """E_g residual: norm of (∇shading − ∇lum) over forward differences.

    lum4/shading4 `[..., 4]` are the values at {center, +x, +y, +z}
    (``shading.h:128-148``). The sqrt is guarded with a tiny eps so the residual
    remains differentiable at exact zero (Ceres evaluates the same sqrt; its
    autodiff never hits exactly 0 in practice).
    """
    d_shading = shading4[..., 1:] - shading4[..., :1]
    d_lum = lum4[..., 1:] - lum4[..., :1]
    diff = d_shading - d_lum
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + eps)
