"""Synthetic RGB-D scenes for tests: analytic sphere renderer."""

from __future__ import annotations

import numpy as np

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.mathutil import invert_pose


def render_sphere_depth(
    cam: Camera, pose_cam_to_world: np.ndarray, center, radius: float
) -> np.ndarray:
    """Render a depth map `[H, W]` (z-depth, meters) of a sphere. Pixels that
    miss the sphere get depth 0."""
    h, w = cam.height, cam.width
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    dirs = np.stack(
        [
            (xs - float(cam.cx)) / float(cam.fx),
            (ys - float(cam.cy)) / float(cam.fy),
            np.ones_like(xs),
        ],
        axis=-1,
    )
    T = invert_pose(pose_cam_to_world)  # world → camera
    # sphere center in camera frame
    c = T[:3, :3] @ np.asarray(center, np.float64) + T[:3, 3]
    # ray: p = t * dir; |p - c|^2 = r^2
    a = np.sum(dirs * dirs, axis=-1)
    b = -2.0 * np.sum(dirs * c, axis=-1)
    cc = np.dot(c, c) - radius * radius
    disc = b * b - 4 * a * cc
    hit = disc >= 0.0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), 0.0)
    depth = np.where(hit & (t > 0), t, 0.0)  # z-depth: dir_z == 1 → depth = t
    return depth.astype(np.float32)


def sphere_sdf(points: np.ndarray, center, radius: float) -> np.ndarray:
    """Analytic signed distance (positive outside)."""
    return np.linalg.norm(np.asarray(points) - np.asarray(center), axis=-1) - radius


def look_at_pose(eye, target, up=(0.0, -1.0, 0.0)) -> np.ndarray:
    """Camera-to-world pose with +z looking from eye toward target.

    Default up is -y so that the camera frame matches the usual RGB-D
    convention (x right, y down, z forward).
    """
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(up, fwd)
    if np.linalg.norm(right) < 1e-9:
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    T = np.eye(4)
    T[:3, 0] = right
    T[:3, 1] = down
    T[:3, 2] = fwd
    T[:3, 3] = eye
    return T
