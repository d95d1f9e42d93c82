"""Full-pipeline scale run on the attached TPU: synthetic dataset → fusion →
double coarse-to-fine joint refinement. Records phase wall times."""
import logging, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
logging.basicConfig(level=logging.INFO, format="%(message)s")

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.config import RefinementConfig
from intrinsic3d_tpu.grid import algorithms as alg
from intrinsic3d_tpu.grid.fusion import FusionVolume, compute_scene_voxel_bounds
from intrinsic3d_tpu.image.processing import compute_normals
from intrinsic3d_tpu.io.memory_sensor import MemorySensor
from intrinsic3d_tpu.refine.intrinsic3d import Intrinsic3D
from intrinsic3d_tpu.synthetic import (
    DEFAULT_CENTER, DEFAULT_LIGHT, look_at_pose, render_shading_image, sphere_sdf,
)
from intrinsic3d_tpu.timer import PhaseTimer

RADIUS = 0.2
VOXEL = 0.004
T = PhaseTimer()

cam = Camera.create(350.0, 350.0, 159.5, 119.5, 320, 240)
K = 24
eyes = []
for i in range(K):
    ang = 2 * np.pi * i / K
    eyes.append([0.5 * np.sin(ang), 0.25 * np.sin(2 * ang + 0.5), 0.6 - 0.5 * np.cos(ang)])

with T.phase("render dataset"):
    poses, colors, depths = [], [], []
    for e in eyes:
        Tc = look_at_pose(e, DEFAULT_CENTER)
        img, depth = render_shading_image(cam, Tc, DEFAULT_CENTER, RADIUS, DEFAULT_LIGHT)
        poses.append(Tc)
        colors.append(np.stack([np.clip(img, 0, 1)] * 3, -1).astype(np.float32))
        depths.append(depth)
sensor = MemorySensor(cam, cam, colors, depths, poses, 0.1, 2.0)

with T.phase("fusion: allocate"):
    vlo, vhi = compute_scene_voxel_bounds(cam, poses, 0.1, 2.0, VOXEL)
    vol = FusionVolume(cam, cam, VOXEL, vlo, vhi, 0.1, 2.0)
    for d, Tc in zip(depths, poses):
        vol.allocate(d, Tc)
    grid = vol.build_grid()
print(f"allocated {grid.num_voxels} voxels, dims {vol.dims}", flush=True)

with T.phase("fusion: integrate"):
    for d, Tc, c in zip(depths, poses, colors):
        n = np.asarray(compute_normals(cam, jnp.asarray(d)))
        vol.integrate(d, n, c, Tc)
    grid = vol.finalize()

with T.phase("fusion: correct_sdf (pallas dense)"):
    grid = alg.correct_sdf(grid)
with T.phase("fusion: cleanup"):
    grid = alg.clear_invalid_voxels(grid)
print(f"fused {grid.num_voxels} voxels", flush=True)

pts = grid.voxel_to_world()
err = np.abs(grid.sdf - sphere_sdf(pts, DEFAULT_CENTER, RADIUS))
shell = np.abs(sphere_sdf(pts, DEFAULT_CENTER, RADIUS)) < 0.5 * grid.truncation
print(f"fusion sdf median err (shell): {np.median(err[shell])*1000:.3f} mm", flush=True)

cfg = RefinementConfig(
    num_grid_levels=2,
    num_rgbd_levels=2,
    iterations=5,
    lm_steps=8,
    num_observations=5,
    occlusion_distance=0.02,
    subvolume_size_sh=0.2,
    lambda_r0=40.0, lambda_r1=10.0, lambda_s0=40.0, lambda_s1=10.0,
)
with T.phase("refinement (2x2 levels, 5 iters)"):
    engine = Intrinsic3D(cfg, sensor, list(range(K)), cg_iters=12)
    refined = engine.refine(grid)
print(f"refined to {refined.num_voxels} voxels at {refined.voxel_size:.4f}", flush=True)

pts = refined.voxel_to_world()
true = sphere_sdf(pts, DEFAULT_CENTER, RADIUS)
shell = refined.valid_mask() & (np.abs(refined.sdf_refined) < refined.voxel_size)
e_ref = np.abs(refined.sdf_refined - true)[shell]
e_init = np.abs(refined.sdf - true)[shell]
print(f"refined sdf median err: {np.median(e_ref)*1000:.3f} mm (initial {np.median(e_init)*1000:.3f} mm) over {shell.sum()} shell voxels", flush=True)

with T.phase("mesh extraction"):
    from intrinsic3d_tpu.mesh import extract_surface
    g2 = refined.clone()
    g2.sdf = g2.sdf_refined.copy()
    verts, faces, cols = extract_surface(g2)
r = np.linalg.norm(verts - DEFAULT_CENTER, axis=-1)
print(f"mesh: {len(verts)} verts, {len(faces)} faces, median radius err {abs(np.median(r)-RADIUS)*1000:.3f} mm", flush=True)
print("PHASES:", T.report(), flush=True)
