"""Mesh-path end-state quality pin (VERDICT r4 item 5).

Runs the golden sphere pipeline with the REFINEMENT stage routed through
`Intrinsic3D(mesh=...)` — the production multi-chip orchestration
(`refine/mesh_pipeline.py::MeshLevelRunner`, state brick-sharded across
pyramid levels, Schur default, prefetch+warm) on the virtual 8-device CPU
mesh — and asserts the SAME physical mesh-error bounds as the single-device
golden test (tests/test_golden.py::test_refined_mesh_error_vs_analytic)
plus the orbit pose-sanity bound. This closes the loop the loosened
rtol=2e-2 trajectory tolerances of tests/test_multichip.py cannot: a real
sharding regression must now show up as measurable geometry damage.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.e2e  # full-pipeline runs; fast lane: -m "not e2e"

from intrinsic3d_tpu.io.ply import load_ply
from intrinsic3d_tpu.mesh.metrics import mesh_error_vs_analytic


@pytest.fixture(scope="module")
def mesh_pipeline_run(tmp_path_factory):
    import jax

    from intrinsic3d_tpu.apps import app_fusion, app_keyframes
    from intrinsic3d_tpu.apps.common import load_sensor
    from intrinsic3d_tpu.config import RefinementConfig, Settings
    from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid
    from intrinsic3d_tpu.io.golden_dataset import GoldenSceneSpec, export_sphere_dataset
    from intrinsic3d_tpu.keyframes import KeyframeSelection
    from intrinsic3d_tpu.mesh import extract_surface
    from intrinsic3d_tpu.parallel.sharding import make_mesh
    from intrinsic3d_tpu.refine.intrinsic3d import Intrinsic3D

    spec = GoldenSceneSpec()
    root = str(tmp_path_factory.mktemp("mesh_golden"))
    sensor_yml = export_sphere_dataset(root, spec)
    cwd = os.getcwd()
    try:
        for app, cfgf in [(app_keyframes, "keyframes.yml"), (app_fusion, "fusion.yml")]:
            assert app.main(["-s", sensor_yml, "-c", os.path.join(root, cfgf)]) == 0
            os.chdir(cwd)
        os.chdir(root)
        sensor = load_sensor("sensor.yml")
        cfg = RefinementConfig.from_settings(Settings.load("intrinsic3d.yml"))
        kf_ids = KeyframeSelection.load(cfg.keyframes).keyframe_ids()
        grid = VoxelGrid.load(cfg.input_sdf, sensor.depth_min, sensor.depth_max)
        fused_verts, fused_faces, _ = extract_surface(grid)
        engine = Intrinsic3D(
            cfg, sensor, kf_ids, mesh=make_mesh(min(8, len(jax.devices())))
        )
        refined = engine.refine(grid)
        verts, faces, _ = extract_surface(
            refined, sdf=refined.sdf_refined, colors=refined.color
        )
    finally:
        os.chdir(cwd)
    return spec, engine, sensor, (verts, faces), (fused_verts, fused_faces)


def test_mesh_path_refined_mesh_error_vs_analytic(mesh_pipeline_run):
    """Same bounds as the single-device golden quality gate."""
    spec, _, _, (verts, faces), (fv, ff) = mesh_pipeline_run
    center = np.asarray(spec.center)
    err = mesh_error_vs_analytic(
        verts, faces, lambda p: np.linalg.norm(p - center, axis=-1) - spec.radius,
        num_samples=20000,
    )
    err_fused = mesh_error_vs_analytic(
        fv, ff, lambda p: np.linalg.norm(p - center, axis=-1) - spec.radius,
        num_samples=20000,
    )
    assert err["rms"] < 0.5 * spec.voxel_size
    assert err["rms"] < max(err_fused["rms"] * 3.0, 0.1 * spec.voxel_size)
    assert np.isfinite(verts).all()


def test_mesh_path_poses_within_orbit_bound(mesh_pipeline_run):
    """Refined poses from the sharded path stay on the analytic orbit (the
    same golden-time sanity the single-device pipeline carries)."""
    from intrinsic3d_tpu.io.golden_dataset import GoldenSceneSpec, render_orbit_frame

    spec, engine, sensor, _, _ = mesh_pipeline_run
    from intrinsic3d_tpu.camera import Camera

    f = 0.92 * max(spec.width, spec.height)
    cam = Camera.create(
        f, f, (spec.width - 1) / 2.0, (spec.height - 1) / 2.0, spec.width, spec.height
    )
    rng = np.random.default_rng(spec.seed)
    errs = []
    for i in range(spec.num_frames):
        _, _, T_gt = render_orbit_frame(cam, spec, i, rng)
        T = np.asarray(sensor.pose(i))
        errs.append(float(np.linalg.norm(T[:3, 3] - T_gt[:3, 3])))
    assert max(errs) < 0.2, np.round(errs, 4)


def test_mesh_path_placements_sharded(mesh_pipeline_run):
    """Every recorded per-voxel device array of the level loops stayed
    brick-sharded (max shard well below the replicated fraction)."""
    _, engine, _, _, _ = mesh_pipeline_run
    assert engine.mesh_placements
    n = engine.mesh.devices.size
    for level_records in engine.mesh_placements:
        for name, total, max_shard in level_records:
            assert max_shard <= total / n * 2.0 + 4096, (
                f"{name}: {max_shard}/{total} not sharded"
            )
