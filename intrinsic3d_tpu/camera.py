"""Pinhole camera model with 5-coefficient lens distortion.

JAX re-design of the reference camera (``libintrinsic3d/src/camera.cpp:124-199``,
``libintrinsic3d/include/nv/camera.h:92-126``): all projection/unprojection paths are
pure jnp functions over batched point arrays so they vmap/jit across voxels and
frames; the distorted projection is written once and reused by both the host pipeline
and the differentiable shading cost (no templated autodiff duplicate needed — JAX
derives the Jacobians).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Camera:
    """Intrinsics `fx, fy, cx, cy`, image size `(width, height)`, distortion [5].

    Distortion layout follows the reference: `[k1, k2, k3, p1, p2]` — three radial
    then two tangential coefficients (``camera.cpp:136-143``).
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int
    height: int
    dist: jnp.ndarray  # [5]

    # -- pytree plumbing (width/height are static aux data) ---------------

    def tree_flatten(self):
        return (self.fx, self.fy, self.cx, self.cy, self.dist), (self.width, self.height)

    @classmethod
    def tree_unflatten(cls, aux, children):
        fx, fy, cx, cy, dist = children
        width, height = aux
        return cls(fx, fy, cx, cy, width, height, dist)

    # -- constructors ------------------------------------------------------

    @classmethod
    def create(cls, fx, fy, cx, cy, width, height, dist=None) -> "Camera":
        """Host-side constructor: leaves are numpy (no device traffic until the
        camera enters a jit as a pytree argument). Traced cameras are built by
        the pytree machinery directly."""
        if dist is None:
            dist = np.zeros(5, dtype=np.float32)

        def h(v):
            # keep tracers as-is; concretize everything else on host
            return v if isinstance(v, jax.core.Tracer) else np.float32(v)

        dist = dist if isinstance(dist, jax.core.Tracer) else np.asarray(dist, np.float32)
        return cls(h(fx), h(fy), h(cx), h(cy), int(width), int(height), dist)

    @classmethod
    def from_matrix(cls, K, width, height, dist=None) -> "Camera":
        K = np.asarray(K)
        return cls.create(K[0, 0], K[1, 1], K[0, 2], K[1, 2], width, height, dist)

    @classmethod
    def default(cls, width: int = 640, height: int = 480) -> "Camera":
        """Kinect-like default intrinsics (reference ``camera.cpp`` defaults)."""
        return cls.create(525.0, 525.0, 319.5, 239.5, width, height)

    def matrix(self) -> np.ndarray:
        return np.array(
            [
                [float(self.fx), 0.0, float(self.cx)],
                [0.0, float(self.fy), float(self.cy)],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float32,
        )

    def intrinsics_vec(self) -> jnp.ndarray:
        """`[fx, fy, cx, cy]` — the optimizable intrinsics parameter block."""
        return jnp.stack([self.fx, self.fy, self.cx, self.cy])

    def with_intrinsics_vec(self, vec, dist=None) -> "Camera":
        dist = self.dist if dist is None else jnp.asarray(dist, jnp.float32)
        return Camera(vec[0], vec[1], vec[2], vec[3], self.width, self.height, dist)

    def scaled(self, scale: float) -> "Camera":
        """Camera for a pyramid level: intrinsics scaled, size divided."""
        return Camera(
            self.fx * scale,
            self.fy * scale,
            self.cx * scale,
            self.cy * scale,
            int(round(self.width * scale)),
            int(round(self.height * scale)),
            self.dist,
        )

    # -- file I/O (reference-compatible text format) -----------------------

    @classmethod
    def load(cls, filename: str, width: int = 640, height: int = 480) -> "Camera":
        """Load `w h / K(3x3) / dist(5)` text format (``camera.cpp:200-240``)."""
        vals = _read_floats(filename)
        w, h = int(vals[0]), int(vals[1])
        K = np.array(vals[2:11]).reshape(3, 3)
        dist = np.array(vals[11:16], dtype=np.float32)
        return cls.from_matrix(K, w, h, dist)

    def save(self, filename: str) -> None:
        """Write `w h / K rows / dist` text (``camera.cpp:242-274``)."""
        with open(filename, "w") as f:
            f.write(f"{self.width} {self.height}\n")
            f.write(f"{float(self.fx)} 0 {float(self.cx)}\n")
            f.write(f"0 {float(self.fy)} {float(self.cy)}\n")
            f.write("0 0 1\n")
            d = np.asarray(self.dist)
            f.write(" ".join(str(float(x)) for x in d) + "\n")


def _read_floats(filename: str):
    with open(filename) as f:
        return [float(t) for t in f.read().split()]


def load_intrinsics_matrix(filename: str) -> np.ndarray:
    """Parse the dataset's 4x4 intrinsics text file, returning the 3x3 K
    (``libintrinsic3d/src/rgbd/sensor_i3d.cpp:147-181``)."""
    vals = _read_floats(filename)
    M = np.array(vals[:16]).reshape(4, 4)
    return M[:3, :3].astype(np.float32)


# ---------------------------------------------------------------------------
# Projection math (pure functions; batched over leading axes)
# ---------------------------------------------------------------------------


def distort(dist: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Apply 3-radial + 2-tangential distortion to normalized image coords
    (``camera.cpp:136-143``)."""
    k1, k2, k3, p1, p2 = dist[0], dist[1], dist[2], dist[3], dist[4]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
    return xd, yd


def project(cam: Camera, pts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distorted projection of camera-frame points `[..., 3]` → pixel coords
    `[..., 2]` plus validity mask (in-bounds and z>0). Mirrors
    ``Camera::project`` / ``CameraT::project`` (``camera.cpp:124-154``,
    ``camera.h:96-116``)."""
    z = pts[..., 2]
    zsafe = jnp.where(z == 0.0, 1e-12, z)
    x = pts[..., 0] / zsafe
    y = pts[..., 1] / zsafe
    xd, yd = distort(cam.dist, x, y)
    u = cam.fx * xd + cam.cx
    v = cam.fy * yd + cam.cy
    uv = jnp.stack([u, v], axis=-1)
    valid = (
        (z > 0.0)
        & (u >= 0.0)
        & (u <= cam.width - 1)
        & (v >= 0.0)
        & (v <= cam.height - 1)
    )
    return uv, valid


def project_simple(cam: Camera, pts: jnp.ndarray) -> jnp.ndarray:
    """Undistorted projection (``Camera::project2``, ``camera.cpp:157-162``):
    returns `[..., 3]` = (u, v, z)."""
    z = pts[..., 2]
    zsafe = jnp.where(z == 0.0, 1e-12, z)
    u = pts[..., 0] * cam.fx / zsafe + cam.cx
    v = pts[..., 1] * cam.fy / zsafe + cam.cy
    return jnp.stack([u, v, z], axis=-1)


def unproject(cam: Camera, u: jnp.ndarray, v: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Back-project pixels at given depth (``Camera::unproject2``,
    ``camera.cpp:192-199``). Zero depth yields the zero point."""
    x = (u - cam.cx) / cam.fx
    y = (v - cam.cy) / cam.fy
    pts = jnp.stack([x * depth, y * depth, depth], axis=-1)
    return jnp.where(depth[..., None] > 0.0, pts, 0.0)
