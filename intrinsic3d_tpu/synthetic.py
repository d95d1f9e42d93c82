"""Synthetic scenes: analytic sphere rendering + ready-made refinement problems.

Used by the test-suite, the benchmark harness (bench.py), and the multi-chip
dry-run — a fully self-contained way to build realistic instances of the joint
refinement problem at any scale without a dataset.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.config import RefinementConfig
from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid
from intrinsic3d_tpu.mathutil import invert_pose, pose_matrix_to_vec
from intrinsic3d_tpu.refine.assembly import LevelTopology, build_assembly
from intrinsic3d_tpu.refine.residuals import Params


def np_sh_basis(n: np.ndarray) -> np.ndarray:
    """Numpy SH basis (host-side twin of lighting.sh.sh_basis)."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    return np.stack(
        [
            np.ones_like(nx), ny, nz, nx,
            nx * ny, ny * nz, -nx * nx - ny * ny + 2.0 * nz * nz,
            nx * nz, nx * nx - ny * ny,
        ],
        axis=-1,
    )

DEFAULT_CENTER = np.array([0.0, 0.0, 0.6])
DEFAULT_RADIUS = 0.15
DEFAULT_LIGHT = np.array([0.7, 0.1, 0.3, -0.1, 0.0, 0.05, 0.02, 0.0, -0.03], np.float32)


def sphere_sdf(points: np.ndarray, center, radius: float) -> np.ndarray:
    return np.linalg.norm(np.asarray(points) - np.asarray(center), axis=-1) - radius


def look_at_pose(eye, target, up=(0.0, -1.0, 0.0)) -> np.ndarray:
    """Camera-to-world pose, +z forward, y down (RGB-D convention)."""
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


def _pixel_ray_dirs(cam: Camera, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Camera-frame ray directions through pixel centers, honoring the
    camera's 5-coefficient distortion: the normalized pixel coordinates are
    the DISTORTED coords, so nonzero `cam.dist` requires inverting
    ``camera.distort`` (fixed-point iteration, the standard OpenCV
    `undistortPoints` scheme — converges fast for physical coefficients).
    With zero distortion this is the plain pinhole ray."""
    x = (xs - float(cam.cx)) / float(cam.fx)
    y = (ys - float(cam.cy)) / float(cam.fy)
    d = np.asarray(cam.dist, np.float64)
    if np.any(d != 0.0):
        k1, k2, k3, p1, p2 = d  # reference layout (camera.py::distort)
        xd, yd = x, y
        x, y = xd.copy(), yd.copy()
        for _ in range(12):
            r2 = x * x + y * y
            radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
            dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            dy = 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
            x = (xd - dx) / radial
            y = (yd - dy) / radial
    return np.stack([x, y, np.ones_like(x)], axis=-1)


def render_sphere_depth(cam: Camera, pose_cam_to_world, center, radius) -> np.ndarray:
    h, w = cam.height, cam.width
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    dirs = _pixel_ray_dirs(cam, xs, ys)
    T = invert_pose(pose_cam_to_world)
    c = T[:3, :3] @ np.asarray(center, np.float64) + T[:3, 3]
    a = np.sum(dirs * dirs, axis=-1)
    b = -2.0 * np.sum(dirs * c, axis=-1)
    cc = np.dot(c, c) - radius * radius
    disc = b * b - 4 * a * cc
    hit = disc >= 0.0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), 0.0)
    return np.where(hit & (t > 0), t, 0.0).astype(np.float32)


def default_albedo(pts) -> np.ndarray:
    return (
        0.55
        + 0.25
        * np.sin(25.0 * np.asarray(pts)[..., 0])
        * np.cos(18.0 * np.asarray(pts)[..., 1])
    )


def render_shading_image(
    cam: Camera, pose_c2w, center, radius, light, flat_albedo: Optional[float] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Intensity image consistent with the Lambertian SH image-formation model."""
    depth = render_sphere_depth(cam, pose_c2w, center, radius)
    h, w = depth.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    dirs = _pixel_ray_dirs(cam, xs, ys)
    T = np.asarray(pose_c2w)
    pts_w = (dirs * depth[..., None]) @ T[:3, :3].T + T[:3, 3]
    n = (pts_w - center) / radius
    alb = default_albedo(pts_w) if flat_albedo is None else flat_albedo
    shading = alb * (np_sh_basis(n) @ np.asarray(light, np.float64))
    return np.where(depth > 0, shading, 0.0).astype(np.float32), depth


@dataclasses.dataclass
class SphereProblem:
    """A complete joint-refinement problem instance."""

    cfg: RefinementConfig
    cam: Camera
    grid: VoxelGrid
    topo: LevelTopology
    params: Params
    depths: jnp.ndarray  # [K, H, W]
    images: jnp.ndarray  # [K, H, W]
    voxel_sh: np.ndarray
    thres_shell: float

    def assemble(self, lambda_r: float = 10.0, lambda_s: float = 10.0):
        return build_assembly(
            self.grid,
            self.topo,
            self.params,
            self.cam,
            self.depths,
            self.images,
            self.voxel_sh,
            self.thres_shell,
            self.cfg.occlusion_distance,
            self.cfg.num_observations,
            self.cfg.lambda_g,
            lambda_r,
            lambda_s,
            self.cfg.lambda_a,
            1.0,
            self.cfg.fix_poses,
            self.cfg.fix_intrinsics,
            self.cfg.fix_distortion,
        )


def build_sphere_problem(
    voxel_size: float = 0.01,
    image_size: Tuple[int, int] = (100, 80),
    num_frames: int = 3,
    num_observations: int = 3,
    center=DEFAULT_CENTER,
    radius: float = DEFAULT_RADIUS,
    light=DEFAULT_LIGHT,
    cfg: Optional[RefinementConfig] = None,
    seed: int = 0,
    perturb_sdf: float = 0.0,
    perturb_albedo: float = 0.0,
    dist=None,
    eyes=None,
) -> SphereProblem:
    """Build a shell grid around an analytic sphere, render consistent shading
    images from orbiting cameras, and package the refinement problem.

    `dist` (5-vector, reference layout k1 k2 k3 p1 p2) renders the capture
    through a distorted lens and sets `params.dist` to the true coefficients —
    the end-to-end distortion-recovery scenario (``camera.h:92-126``)."""
    cfg = cfg or RefinementConfig(
        num_observations=num_observations, occlusion_distance=0.02
    )
    w, h = image_size
    cam = Camera.create(1.1 * w, 1.1 * w, w / 2 - 0.5, h / 2 - 0.5, w, h, dist=dist)
    rng = np.random.default_rng(seed)
    if eyes is None:
        eyes = [[0.0, 0.0, 0.0]]
        for i in range(1, num_frames):
            ang = 2.0 * np.pi * i / max(num_frames, 2)
            eyes.append(
                [0.45 * np.sin(ang), 0.2 * np.sin(2 * ang), 0.6 - 0.45 * np.cos(ang)]
            )
    else:
        eyes = [list(e) for e in eyes]
        assert len(eyes) == num_frames
    poses_c2w = [look_at_pose(e, center) for e in eyes]
    imgs, depths = [], []
    for T in poses_c2w:
        img, depth = render_shading_image(cam, T, center, radius, light)
        imgs.append(img)
        depths.append(depth)
    poses6 = np.stack([pose_matrix_to_vec(invert_pose(T)) for T in poses_c2w]).astype(
        np.float32
    )

    r = int((radius + 4 * voxel_size) / voxel_size) + 1
    cc = np.stack(
        np.meshgrid(*([np.arange(-r, r + 1)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    cc = cc + np.round(np.asarray(center) / voxel_size).astype(np.int64)
    grid = VoxelGrid.from_coords(voxel_size, cc, sbr=True)
    pts = grid.voxel_to_world()
    sdf = sphere_sdf(pts, center, radius).astype(np.float32)
    grid = grid.select(np.abs(sdf) < grid.truncation * 0.8)
    pts = grid.voxel_to_world()
    grid.sdf = sphere_sdf(pts, center, radius).astype(np.float32)
    grid.sdf_refined = grid.sdf.copy()
    grid.weight[:] = 1.0
    grid.albedo = default_albedo(pts).astype(np.float32)
    nrm = (pts - center) / np.linalg.norm(pts - center, axis=-1, keepdims=True)
    shading = grid.albedo * (np_sh_basis(nrm) @ np.asarray(light, np.float64))
    grid.color = np.stack([np.clip(shading, 0, 1) * 255] * 3, axis=-1).astype(np.float32)

    sdf0 = grid.sdf_refined
    alb0 = grid.albedo
    if perturb_sdf > 0:
        sdf0 = sdf0 + rng.normal(0, perturb_sdf, grid.num_voxels).astype(np.float32)
    if perturb_albedo > 0:
        alb0 = np.clip(
            alb0 + rng.normal(0, perturb_albedo, grid.num_voxels), 0.05, 1.0
        ).astype(np.float32)

    params = Params(
        sdf=jnp.asarray(sdf0),
        albedo=jnp.asarray(alb0),
        poses=jnp.asarray(poses6),
        intr=jnp.asarray(
            [float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)], jnp.float32
        ),
        dist=jnp.asarray(np.asarray(cam.dist, np.float32)),
    )
    return SphereProblem(
        cfg=cfg,
        cam=cam,
        grid=grid,
        topo=LevelTopology.build(grid),
        params=params,
        depths=jnp.asarray(np.stack(depths)),
        images=jnp.asarray(np.stack(imgs)),
        voxel_sh=np.broadcast_to(light, (grid.num_voxels, 9)).copy(),
        thres_shell=2.0 * voxel_size,
    )
