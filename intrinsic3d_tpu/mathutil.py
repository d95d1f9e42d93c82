"""Math helpers: robust kernel, pose parameterizations, interpolation weights.

JAX equivalents of the reference's math utilities
(``libintrinsic3d/src/math.cpp:43-179``). Pose rotations use the angle-axis
parameterization exactly as the reference does for its Ceres parameter blocks
(``math.cpp:151-179`` and ``ceres::AngleAxisRotatePoint`` in
``include/nv/refinement/cost.h:80-89``) — the Rodrigues rotation here is written
to be smooth at θ→0 so JAX derivatives are well-defined.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def robust_kernel(val, thres=2.0):
    """`1 / (1 + t·x)^3` influence kernel (``math.cpp:43-47``)."""
    div = 1.0 + thres * val
    return 1.0 / (div * div * div)


def sdf_to_weight(sdf, truncation):
    """Closeness-to-isosurface weight in [0.01, 1]
    (``libintrinsic3d/src/sdf/operators.cpp:142-147``)."""
    a = jnp.minimum(jnp.abs(sdf), truncation) / truncation
    return jnp.clip(1.0 - a, 0.01, 1.0)


def compute_varying_lambda(iteration, num_iterations, lambda0, lambda1):
    """Linear schedule between lambda0 and lambda1
    (``include/nv/refinement/cost.h:130-143``)."""
    if num_iterations <= 1:
        return lambda0
    step = (lambda1 - lambda0) / float(num_iterations - 1)
    return lambda0 + step * float(iteration)


def pyramid_level_to_scale(lvl: int) -> float:
    """`2^-lvl` (``include/nv/refinement/cost.h:146-150``)."""
    return 1.0 / (2.0 ** lvl)


# ---------------------------------------------------------------------------
# Angle-axis rotations (smooth at the origin, autodiff-safe)
# ---------------------------------------------------------------------------


def rotate_angle_axis(aa, pts):
    """Rotate points `[..., 3]` by angle-axis vector `aa [3]` (Rodrigues).

    Uses the Taylor expansion of sin/cos factors near θ=0 so that jvp/vjp are
    finite everywhere (the equivalent of ceres::AngleAxisRotatePoint's small-angle
    branch, but written branchlessly for XLA).
    """
    theta2 = jnp.sum(aa * aa)
    theta = jnp.sqrt(theta2 + 1e-32)
    # sin(θ)/θ and (1-cos(θ))/θ² with series fallback for tiny θ
    small = theta2 < 1e-12
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, sin_t / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - cos_t) / theta2)
    # R p = p cosθ + (k × p) sinθ + k (k·p)(1-cosθ), with k = aa/θ
    cross = jnp.cross(jnp.broadcast_to(aa, pts.shape), pts)
    dot = jnp.sum(pts * aa, axis=-1, keepdims=True)
    return pts * jnp.where(small, 1.0 - theta2 * b, cos_t) + cross * a + aa * dot * b


def transform_points(pose6, pts):
    """Apply a 6-vector pose (angle-axis rotation + translation) to `[..., 3]`
    points (``cost.h:80-89``)."""
    return rotate_angle_axis(pose6[:3], pts) + pose6[3:]


def pose_vec_to_matrix(pose6) -> np.ndarray:
    """Angle-axis+translation 6-vector → 4x4 matrix (``math.cpp:151-165``)."""
    pose6 = np.asarray(pose6, dtype=np.float64)
    aa = pose6[:3]
    theta = np.linalg.norm(aa)
    R = np.eye(3)
    if theta > 1e-12:
        k = aa / theta
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(theta) * K + (1.0 - np.cos(theta)) * (K @ K)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = pose6[3:]
    return T


def pose_matrix_to_vec(T) -> np.ndarray:
    """4x4 matrix → angle-axis+translation 6-vector (``math.cpp:168-179``)."""
    T = np.asarray(T, dtype=np.float64)
    R = T[:3, :3]
    cos_theta = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = np.arccos(cos_theta)
    if theta < 1e-12:
        aa = np.zeros(3)
    elif abs(np.pi - theta) < 1e-6:
        # θ≈π: extract axis from the symmetric part
        A = (R + np.eye(3)) * 0.5
        axis = np.sqrt(np.clip(np.diag(A), 0.0, None))
        # fix signs using off-diagonals
        i = int(np.argmax(axis))
        if axis[i] > 0:
            for j in range(3):
                if j != i and A[i, j] < 0:
                    axis[j] = -axis[j]
        axis = axis / (np.linalg.norm(axis) + 1e-32)
        aa = axis * theta
    else:
        v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        aa = v / (2.0 * np.sin(theta)) * theta
    out = np.zeros(6)
    out[:3] = aa
    out[3:] = T[:3, 3]
    return out


def invert_pose(T) -> np.ndarray:
    """Rigid-transform inverse."""
    T = np.asarray(T, dtype=np.float64)
    R = T[:3, :3]
    t = T[:3, 3]
    out = np.eye(4)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ t
    return out


# ---------------------------------------------------------------------------
# Trilinear interpolation weights
# ---------------------------------------------------------------------------

# offsets in the reference's corner ordering (``math.cpp:103-128``)
TRILINEAR_OFFSETS = np.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [0, 1, 0],
        [0, 0, 1],
        [1, 1, 0],
        [0, 1, 1],
        [1, 0, 1],
        [1, 1, 1],
    ],
    dtype=np.int32,
)


def interpolation_weights(pos):
    """8-corner trilinear weights for continuous grid position `pos [..., 3]`.

    Returns `(corners [..., 8, 3] int32, weights [..., 8] f32)` in the reference's
    corner order (``math.cpp:103-128``).
    """
    pos = jnp.asarray(pos)
    v0 = jnp.floor(pos)
    frac = pos - v0
    offs = jnp.asarray(TRILINEAR_OFFSETS)
    corners = v0[..., None, :].astype(jnp.int32) + offs
    w = jnp.where(offs[..., :] == 1, frac[..., None, :], 1.0 - frac[..., None, :])
    weights = jnp.prod(w, axis=-1)
    return corners, weights


def within_bounds(bounds, pos):
    """AABB check for `bounds = (x0, x1, y0, y1, z0, z1)` (``math.cpp:50-71``)."""
    return (
        (pos[..., 0] >= bounds[0])
        & (pos[..., 0] <= bounds[1])
        & (pos[..., 1] >= bounds[2])
        & (pos[..., 1] <= bounds[3])
        & (pos[..., 2] >= bounds[4])
        & (pos[..., 2] <= bounds[5])
    )
