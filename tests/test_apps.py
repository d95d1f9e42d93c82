"""App-level tests: run the three CLIs on a synthetic on-disk dataset in the
reference's frame-%06d format."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.e2e  # full-pipeline runs; fast lane: -m "not e2e"
from PIL import Image

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.io.ply import load_ply
from tests.synthetic import look_at_pose, render_sphere_depth
from tests.test_refine import CENTER, RADIUS, TRUE_L, render_shading_image


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("lion_like")
    rgbd = root / "rgbd"
    rgbd.mkdir()
    cam = Camera.create(90.0, 90.0, 47.5, 35.5, 96, 72)

    eyes = [
        [0.0, 0.0, 0.0],
        [0.2, 0.02, 0.1],
        [0.4, 0.05, 0.2],
        [-0.2, -0.05, 0.12],
        [-0.35, -0.1, 0.25],
        [0.05, 0.2, 0.08],
        [0.1, 0.4, 0.15],
        [-0.05, -0.2, 0.1],
        [-0.1, -0.4, 0.2],
    ]
    rng = np.random.default_rng(0)
    for i, e in enumerate(eyes):
        T = look_at_pose(e, CENTER)
        img, depth = render_shading_image(cam, T, CENTER, RADIUS, TRUE_L)
        # add mild blur to some frames so keyframe selection has signal
        if i % 3 != 0:
            for _ in range(3):
                img = (np.roll(img, 1, 0) + img + np.roll(img, -1, 0)) / 3.0
                img = (np.roll(img, 1, 1) + img + np.roll(img, -1, 1)) / 3.0
        rgb = (np.clip(np.stack([img] * 3, -1), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(rgbd / f"frame-{i:06d}.color.png")
        d16 = (depth * 1000.0).astype(np.uint16)
        Image.fromarray(d16).save(rgbd / f"frame-{i:06d}.depth.png")
        with open(rgbd / f"frame-{i:06d}.pose.txt", "w") as f:
            for row in T:
                f.write(" ".join(f"{v:.9f}" for v in row) + "\n")

    K = cam.matrix()
    ktxt = (
        f"{K[0,0]} 0 {K[0,2]} 0\n0 {K[1,1]} {K[1,2]} 0\n0 0 1 0\n0 0 0 1\n"
    )
    (rgbd / "colorIntrinsics.txt").write_text(ktxt)
    (rgbd / "depthIntrinsics.txt").write_text(ktxt)

    (root / "sensor.yml").write_text(
        '%YAML:1.0\ndataset: "./rgbd/"\nmax_frames: "0"\nmin_depth: "0.1"\nmax_depth: "2.0"\n'
    )
    (root / "keyframes.yml").write_text(
        '%YAML:1.0\nwindow_size: "3"\nfilename: "./fusion/keyframes.txt"\n'
    )
    (root / "fusion.yml").write_text(
        "%YAML:1.0\n"
        'keyframes: ""\n'
        'voxel_size: "0.02"\n'
        'discont_window_size: "2"\n'
        'clip_x0: "-0.4"\nclip_x1: "0.4"\nclip_y0: "-0.4"\nclip_y1: "0.4"\n'
        'clip_z0: "0.2"\nclip_z1: "1.0"\n'
        'output_mesh: "./fusion/mesh.ply"\n'
        'output_sdf: "./fusion/volume.tsdf"\n'
    )
    (root / "intrinsic3d.yml").write_text(
        "%YAML:1.0\n"
        'keyframes: "./fusion/keyframes.txt"\n'
        'input_sdf: "./fusion/volume.tsdf"\n'
        'num_grid_levels: "1"\nnum_rgbd_levels: "1"\n'
        'thin_shell_factor: "2.0"\nthin_shell_factor_final: "1.0"\n'
        'subvolume_size_sh: "0.3"\nsubvolume_sh_lamda_reg: "10.0"\n'
        'clear_distant_voxels: "1"\nocclusion_distance: "0.04"\n'
        'num_observations: "3"\n'
        'lambda_g: "0.2"\nlambda_r0: "20.0"\nlambda_r1: "10.0"\n'
        'lambda_s0: "20.0"\nlambda_s1: "10.0"\nlambda_a: "0.1"\n'
        'iterations: "2"\nlm_steps: "6"\n'
        'fix_poses: "1"\nfix_intrinsics: "1"\nfix_distortion: "1"\n'
        'output_mesh_prefix: "./intrinsic3d/mesh"\n'
        'output_mesh_albedo: "1"\noutput_mesh_normals: "1"\n'
        'output_mesh_largest_comp_only: "1"\n'
        'output_poses_prefix: "./intrinsic3d/poses"\n'
        'output_intrinsics_prefix: "./intrinsic3d/intrinsics"\n'
    )
    return root


@pytest.fixture(scope="module")
def ran_pipeline(dataset):
    from intrinsic3d_tpu.apps import app_keyframes, app_fusion, app_intrinsic3d

    cwd = os.getcwd()
    try:
        assert app_keyframes.main(["-s", str(dataset / "sensor.yml"), "-c", str(dataset / "keyframes.yml")]) == 0
        os.chdir(cwd)
        assert app_fusion.main(["-s", str(dataset / "sensor.yml"), "-c", str(dataset / "fusion.yml")]) == 0
        os.chdir(cwd)
        assert app_intrinsic3d.main(["-s", str(dataset / "sensor.yml"), "-c", str(dataset / "intrinsic3d.yml")]) == 0
    finally:
        os.chdir(cwd)
    return dataset


def test_dataset_reader(dataset):
    from intrinsic3d_tpu.config import SensorConfig
    from intrinsic3d_tpu.io.dataset import SensorI3D

    s = SensorI3D(str(dataset / "rgbd"), SensorConfig(max_depth=2.0))
    assert s.num_frames == 9
    d = s.depth(0)
    assert d.shape == (72, 96)
    assert d.max() <= 2.0
    c = s.color(1)
    assert c.shape == (72, 96, 3)
    assert 0.0 <= c.min() and c.max() <= 1.0
    T = s.pose(2)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-9)
    assert float(s.color_cam.fx) == pytest.approx(90.0)


def test_keyframes_app(ran_pipeline):
    kf = (ran_pipeline / "fusion" / "keyframes.txt").read_text().splitlines()
    assert kf[0] == "3"
    flags = [int(line.split()[1]) for line in kf[1:]]
    assert sum(flags) == 3  # 9 frames / window 3
    # sharp frames (0, 3, 6) are the unblurred ones
    assert flags[0] and flags[3] and flags[6]


def test_fusion_app_outputs(ran_pipeline):
    from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid

    vol = ran_pipeline / "fusion" / "volume.tsdf"
    assert vol.exists()
    g = VoxelGrid.load(str(vol))
    assert g.num_voxels > 500
    verts, faces, cols = load_ply(str(ran_pipeline / "fusion" / "mesh.ply"))
    assert len(verts) > 100
    r = np.linalg.norm(verts - CENTER, axis=-1)
    assert abs(np.median(r) - RADIUS) < 0.02 * 2


def test_intrinsic3d_app_outputs(ran_pipeline):
    out = ran_pipeline / "intrinsic3d"
    assert (out / "mesh_g0_p0.ply").exists()
    assert (out / "mesh_g0_p0_albedo.ply").exists()
    assert (out / "mesh_g0_p0_normals.ply").exists()
    assert (out / "poses_g0_p0.txt").exists()
    assert (out / "intrinsics_g0_p0.txt").exists()
    verts, faces, cols = load_ply(str(out / "mesh_g0_p0.ply"))
    assert len(verts) > 100
    # poses file is valid TUM
    from intrinsic3d_tpu.io.trajectory import load_poses

    poses, ts = load_poses(str(out / "poses_g0_p0.txt"))
    assert len(poses) == 9


def test_show_keyframes_export(dataset):
    """`show_keyframes: 1` exports score-annotated keyframe PNGs (the
    headless equivalent of the reference's cv::imshow viewer)."""
    import os

    from intrinsic3d_tpu.apps import app_keyframes

    (dataset / "keyframes_show.yml").write_text(
        '%YAML:1.0\nwindow_size: "3"\nfilename: "./fusion/keyframes.txt"\n'
        'show_keyframes: "1"\n'
    )
    cwd = os.getcwd()
    try:
        rc = app_keyframes.main(
            ["-s", str(dataset / "sensor.yml"), "-c", str(dataset / "keyframes_show.yml")]
        )
    finally:
        os.chdir(cwd)
    assert rc == 0
    from intrinsic3d_tpu.keyframes import KeyframeSelection

    sel = KeyframeSelection.load(str(dataset / "fusion/keyframes.txt"))
    exported = sorted((dataset / "fusion").glob("keyframe_*.png"))
    assert len(exported) == sel.count() > 0
    from PIL import Image

    im = np.asarray(Image.open(exported[0]))
    assert im.ndim == 3 and im.shape[2] == 3
