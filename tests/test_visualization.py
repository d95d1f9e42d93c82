"""Visualization color-mode tests + config templates."""

import numpy as np
import pytest

from intrinsic3d_tpu import visualization as vis
from intrinsic3d_tpu.config import RefinementConfig, Settings
from intrinsic3d_tpu.lighting.svsh import estimate_svsh
from tests.test_observations_lighting import sphere_grid, VOXEL


@pytest.fixture(scope="module")
def lit_grid():
    g = sphere_grid(sbr=True)
    res = estimate_svsh(g, subvolume_size=0.2, lambda_reg=10.0, thres_shell=2 * VOXEL)
    assert res is not None
    return g, res


ALL_MODES = [
    "",
    "normals",
    "lap",
    "lum",
    "lum_grad",
    "albedo",
    "shading_sv",
    "shading_sv_const",
    "chroma",
    "subvol",
    "subvol_interp",
]


@pytest.mark.parametrize("mode", ALL_MODES)
def test_colorize_modes(lit_grid, mode):
    g, res = lit_grid
    c = vis.colorize(g, mode, lighting=res)
    assert c.shape == (g.num_voxels, 3)
    assert np.all(np.isfinite(c))
    assert c.min() >= 0.0 and c.max() <= 255.0


def test_albedo_mode_values(lit_grid):
    g, res = lit_grid
    c = vis.colorize(g, "albedo")
    np.testing.assert_allclose(c[:, 0], np.clip(g.albedo * 255.0, 0, 255), atol=0.5)


def test_normals_mode_unit_range(lit_grid):
    g, res = lit_grid
    c = vis.colorize(g, "normals")
    # normals map to 0.5n+0.5 in [0,1] scaled by 255
    assert (c <= 255.0).all() and (c >= 0.0).all()


def test_export_mesh_writes_ply(lit_grid, tmp_path):
    g, res = lit_grid
    name = vis.export_mesh(g, str(tmp_path / "m"), "albedo", lighting=res, suffix="_g0_p0")
    assert name.endswith("m_g0_p0_albedo.ply")
    from intrinsic3d_tpu.io.ply import load_ply

    verts, faces, cols = load_ply(name)
    assert len(verts) > 100
    assert cols is not None


def test_output_modes_from_config():
    cfg = RefinementConfig(
        output_mesh_albedo=True, output_mesh_normals=True, output_mesh_chromacity=True
    )
    modes = vis.output_modes(cfg)
    assert modes[0] == ""
    assert set(modes) == {"", "normals", "albedo", "chroma"}


def test_repo_config_templates_load():
    for path, key, expected in [
        ("data/sensor.yml", None, None),
        ("data/fusion.yml", None, None),
        ("data/intrinsic3d.yml", None, None),
    ]:
        s = Settings.load(path)
        assert not s.empty()
    cfg = RefinementConfig.from_settings(Settings.load("data/intrinsic3d.yml"))
    assert cfg.num_grid_levels == 3
    assert cfg.lambda_s0 == pytest.approx(120.0)
    assert cfg.subvolume_sh_lambda_reg == pytest.approx(10.0)
