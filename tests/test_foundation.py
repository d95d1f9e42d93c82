"""Foundation tests: config, camera, math, SH, color."""

import numpy as np
import jax.numpy as jnp
import pytest

from intrinsic3d_tpu.config import (
    FusionConfig,
    RefinementConfig,
    SensorConfig,
    Settings,
)
from intrinsic3d_tpu import mathutil
from intrinsic3d_tpu.camera import Camera, project, project_simple, unproject
from intrinsic3d_tpu.color import intensity
from intrinsic3d_tpu.lighting import sh_basis, compute_shading, shading_gradient_difference


OPENCV_YAML = """%YAML:1.0

# comment
voxel_size: "0.004"
clip_x0: "-0.09"
keyframes: ""
output_mesh: "./fusion/mesh_0.004.ply"
flag: "1"
"""


def test_settings_parse_opencv_yaml():
    s = Settings.parse(OPENCV_YAML)
    assert s.get_float("voxel_size") == pytest.approx(0.004)
    assert s.get_float("clip_x0") == pytest.approx(-0.09)
    assert s.get_str("keyframes") == ""
    assert s.get_str("output_mesh") == "./fusion/mesh_0.004.ply"
    assert s.get_bool("flag") is True
    assert s.get_int("missing", 7) == 7


def test_settings_roundtrip(tmp_path):
    s = Settings.parse(OPENCV_YAML)
    p = tmp_path / "cfg.yml"
    s.save(str(p))
    s2 = Settings.load(str(p))
    assert s2.get_float("voxel_size") == pytest.approx(0.004)


def test_stage_configs_defaults():
    s = Settings()
    assert SensorConfig.from_settings(s).max_depth == pytest.approx(2.0)
    f = FusionConfig.from_settings(s)
    assert f.voxel_size == pytest.approx(0.004)
    assert not f.has_clip_bounds
    r = RefinementConfig.from_settings(s)
    assert r.lambda_r0 == pytest.approx(80.0)
    assert r.num_observations == 5


def test_refinement_config_lamda_typo_key():
    s = Settings.parse('%YAML:1.0\nsubvolume_sh_lamda_reg: "3.5"\n')
    assert RefinementConfig.from_settings(s).subvolume_sh_lambda_reg == pytest.approx(3.5)


# -- camera ----------------------------------------------------------------


def test_camera_project_unproject_roundtrip():
    cam = Camera.create(520.0, 521.0, 320.5, 240.5, 640, 480)
    u = jnp.array([100.0, 300.0, 12.0])
    v = jnp.array([50.0, 400.0, 470.0])
    d = jnp.array([1.0, 2.0, 0.8])
    pts = unproject(cam, u, v, d)
    uvz = project_simple(cam, pts)
    np.testing.assert_allclose(np.asarray(uvz[:, 0]), np.asarray(u), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(uvz[:, 1]), np.asarray(v), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(uvz[:, 2]), np.asarray(d), rtol=1e-6)


def test_camera_distorted_project_matches_reference_formula():
    dist = np.array([0.04, -0.02, 0.001, 0.003, -0.002], np.float32)
    cam = Camera.create(520.0, 521.0, 320.5, 240.5, 640, 480, dist)
    pt = np.array([0.2, -0.1, 1.5], np.float32)
    uv, valid = project(cam, jnp.asarray(pt))
    # hand-rolled reference math (camera.cpp:124-154)
    x, y = pt[0] / pt[2], pt[1] / pt[2]
    r2 = x * x + y * y
    radial = 1 + dist[0] * r2 + dist[1] * r2**2 + dist[2] * r2**3
    xd = x * radial + 2 * dist[3] * x * y + dist[4] * (r2 + 2 * x * x)
    yd = y * radial + 2 * dist[4] * x * y + dist[3] * (r2 + 2 * y * y)
    np.testing.assert_allclose(float(uv[0]), 520.0 * xd + 320.5, rtol=1e-5)
    np.testing.assert_allclose(float(uv[1]), 521.0 * yd + 240.5, rtol=1e-5)
    assert bool(valid)


def test_camera_project_bounds():
    cam = Camera.create(500.0, 500.0, 320.0, 240.0, 640, 480)
    _, valid = project(cam, jnp.array([[0.0, 0.0, 1.0], [10.0, 0.0, 1.0], [0.0, 0.0, -1.0]]))
    assert bool(valid[0])
    assert not bool(valid[1])
    assert not bool(valid[2])


def test_camera_save_load(tmp_path):
    cam = Camera.create(520.0, 521.0, 320.5, 240.5, 640, 480, np.arange(5, dtype=np.float32) / 10)
    p = tmp_path / "intr.txt"
    cam.save(str(p))
    cam2 = Camera.load(str(p))
    assert cam2.width == 640
    np.testing.assert_allclose(float(cam2.fx), 520.0)
    np.testing.assert_allclose(np.asarray(cam2.dist), np.arange(5) / 10, rtol=1e-6)


# -- math ------------------------------------------------------------------


def test_robust_kernel():
    assert float(mathutil.robust_kernel(0.0)) == pytest.approx(1.0)
    assert float(mathutil.robust_kernel(0.5, 2.0)) == pytest.approx(1.0 / 8.0)


def test_sdf_to_weight():
    assert float(mathutil.sdf_to_weight(0.0, 0.02)) == pytest.approx(1.0)
    assert float(mathutil.sdf_to_weight(0.02, 0.02)) == pytest.approx(0.01)
    assert float(mathutil.sdf_to_weight(-0.01, 0.02)) == pytest.approx(0.5)


def test_varying_lambda():
    assert mathutil.compute_varying_lambda(0, 10, 80.0, 10.0) == pytest.approx(80.0)
    assert mathutil.compute_varying_lambda(9, 10, 80.0, 10.0) == pytest.approx(10.0)
    assert mathutil.compute_varying_lambda(3, 1, 5.0, 9.0) == pytest.approx(5.0)


def test_pose_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        aa = rng.normal(size=3)
        t = rng.normal(size=3)
        pose6 = np.concatenate([aa, t])
        T = mathutil.pose_vec_to_matrix(pose6)
        # rotation matrix orthonormal
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-10)
        pose6b = mathutil.pose_matrix_to_vec(T)
        Tb = mathutil.pose_vec_to_matrix(pose6b)
        np.testing.assert_allclose(T, Tb, atol=1e-8)


def test_rotate_angle_axis_matches_matrix():
    rng = np.random.default_rng(1)
    aa = rng.normal(size=3)
    pts = rng.normal(size=(5, 3)).astype(np.float32)
    R = mathutil.pose_vec_to_matrix(np.concatenate([aa, np.zeros(3)]))[:3, :3]
    got = np.asarray(mathutil.rotate_angle_axis(jnp.asarray(aa, jnp.float32), jnp.asarray(pts)))
    np.testing.assert_allclose(got, pts @ R.T, rtol=1e-4, atol=1e-5)


def test_rotate_angle_axis_small_angle():
    pts = jnp.array([[1.0, 2.0, 3.0]])
    got = mathutil.rotate_angle_axis(jnp.zeros(3), pts)
    np.testing.assert_allclose(np.asarray(got), [[1.0, 2.0, 3.0]], atol=1e-7)
    # differentiable at zero
    import jax

    g = jax.jacfwd(lambda a: mathutil.rotate_angle_axis(a, pts).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_transform_points_roundtrip():
    pose6 = np.array([0.1, -0.2, 0.3, 0.5, 0.6, -0.7])
    T = mathutil.pose_vec_to_matrix(pose6)
    Tinv = mathutil.invert_pose(T)
    np.testing.assert_allclose(T @ Tinv, np.eye(4), atol=1e-12)
    pts = np.array([[0.3, 0.1, 1.2]], np.float32)
    out = np.asarray(mathutil.transform_points(jnp.asarray(pose6, jnp.float32), jnp.asarray(pts)))
    expected = (T[:3, :3] @ pts[0] + T[:3, 3]).astype(np.float32)
    np.testing.assert_allclose(out[0], expected, rtol=1e-5, atol=1e-6)


def test_interpolation_weights():
    corners, weights = mathutil.interpolation_weights(jnp.array([1.25, 2.5, 3.75]))
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(float(jnp.sum(weights)), 1.0, rtol=1e-6)
    # corner (1,2,3) weight = 0.75*0.5*0.25
    np.testing.assert_allclose(float(weights[0]), 0.75 * 0.5 * 0.25, rtol=1e-6)
    # corner (2,3,4) weight = 0.25*0.5*0.75
    np.testing.assert_allclose(float(weights[7]), 0.25 * 0.5 * 0.75, rtol=1e-6)


# -- SH shading ------------------------------------------------------------


def test_sh_basis_matches_reference_formula():
    n = jnp.array([0.3, -0.5, 0.8])
    b = np.asarray(sh_basis(n))
    nx, ny, nz = 0.3, -0.5, 0.8
    expected = [
        1.0,
        ny,
        nz,
        nx,
        nx * ny,
        ny * nz,
        -nx * nx - ny * ny + 2 * nz * nz,
        nx * nz,
        nx * nx - ny * ny,
    ]
    np.testing.assert_allclose(b, expected, rtol=1e-6)


def test_compute_shading_constant_light():
    # coeffs = [c, 0, ...]: shading = albedo * c for any normal
    coeffs = jnp.zeros(9).at[0].set(2.0)
    s = compute_shading(coeffs, jnp.array([0.0, 0.0, 1.0]), jnp.array(0.5))
    assert float(s) == pytest.approx(1.0)


def test_shading_gradient_difference_zero():
    lum = jnp.array([0.1, 0.2, 0.3, 0.4])
    r = shading_gradient_difference(lum, lum)
    assert float(r) == pytest.approx(0.0, abs=1e-5)


def test_intensity_luma():
    assert float(intensity(jnp.array([1.0, 1.0, 1.0]))) == pytest.approx(1.0)
    assert float(intensity(jnp.array([1.0, 0.0, 0.0]))) == pytest.approx(0.299)
