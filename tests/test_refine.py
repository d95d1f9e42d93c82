"""Refinement solver tests: residual correctness, Jacobians, GN convergence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.config import RefinementConfig
from intrinsic3d_tpu.grid.voxel_grid import NORMAL_OFFSETS, VoxelGrid
from intrinsic3d_tpu.grid import ops as gops
from intrinsic3d_tpu.lighting.sh import compute_shading, sh_basis
from intrinsic3d_tpu.mathutil import invert_pose, pose_matrix_to_vec
from intrinsic3d_tpu.refine.assembly import LevelTopology, build_assembly
from intrinsic3d_tpu.refine.residuals import Params, all_residuals, total_cost
from intrinsic3d_tpu.refine.solver import Masks, gn_iteration, jtj_diag
from intrinsic3d_tpu.refine.optimizer import optimize_level
from tests.synthetic import look_at_pose, render_sphere_depth, sphere_sdf

CENTER = np.array([0.0, 0.0, 0.6])
RADIUS = 0.15
VOXEL = 0.01
TRUE_L = np.array([0.7, 0.1, 0.3, -0.1, 0.0, 0.05, 0.02, 0.0, -0.03], np.float32)


def true_albedo(pts):
    return 0.55 + 0.25 * np.sin(25.0 * np.asarray(pts)[..., 0]) * np.cos(
        18.0 * np.asarray(pts)[..., 1]
    )


def render_shading_image(cam, pose_c2w, center, radius, light, flat_albedo=None):
    """Intensity image consistent with the SH shading model on the sphere."""
    depth = render_sphere_depth(cam, pose_c2w, center, radius)
    h, w = depth.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    dirs = np.stack(
        [
            (xs - float(cam.cx)) / float(cam.fx),
            (ys - float(cam.cy)) / float(cam.fy),
            np.ones_like(xs),
        ],
        axis=-1,
    )
    pts_cam = dirs * depth[..., None]
    T = np.asarray(pose_c2w)
    pts_w = pts_cam @ T[:3, :3].T + T[:3, 3]
    n = (pts_w - center) / radius
    alb = true_albedo(pts_w) if flat_albedo is None else flat_albedo
    shading = np.asarray(
        compute_shading(jnp.asarray(light), jnp.asarray(n, jnp.float32), jnp.asarray(alb, jnp.float32))
    )
    img = np.where(depth > 0, shading, 0.0).astype(np.float32)
    return img, depth


def build_scene(num_frames=3, imgsize=(100, 80), flat_albedo=None):
    cam = Camera.create(110.0, 110.0, imgsize[0] / 2 - 0.5, imgsize[1] / 2 - 0.5,
                        imgsize[0], imgsize[1])
    eyes = [[0.0, 0.0, 0.0], [0.45, 0.05, 0.25], [-0.4, -0.1, 0.3], [0.1, 0.45, 0.2]][:num_frames]
    poses_c2w = [look_at_pose(e, CENTER) for e in eyes]
    imgs, depths = [], []
    for T in poses_c2w:
        img, depth = render_shading_image(cam, T, CENTER, RADIUS, TRUE_L, flat_albedo)
        imgs.append(img)
        depths.append(depth)
    poses6 = np.stack([pose_matrix_to_vec(invert_pose(T)) for T in poses_c2w]).astype(np.float32)
    return cam, poses6, np.stack(imgs), np.stack(depths)


def build_sphere_grid(flat_albedo=None):
    r = int((RADIUS + 4 * VOXEL) / VOXEL) + 1
    cc = np.stack(np.meshgrid(*([np.arange(-r, r + 1)] * 3), indexing="ij"), axis=-1).reshape(-1, 3)
    cc = cc + np.round(CENTER / VOXEL).astype(np.int64)
    g = VoxelGrid.from_coords(VOXEL, cc, sbr=True)
    pts = g.voxel_to_world()
    sdf = sphere_sdf(pts, CENTER, RADIUS).astype(np.float32)
    g = g.select(np.abs(sdf) < g.truncation * 0.8)
    pts = g.voxel_to_world()
    g.sdf = sphere_sdf(pts, CENTER, RADIUS).astype(np.float32)
    g.sdf_refined = g.sdf.copy()
    g.weight[:] = 1.0
    alb = true_albedo(pts) if flat_albedo is None else np.full(len(pts), flat_albedo)
    g.albedo = alb.astype(np.float32)
    # colors = shading (for chroma weights / svsh)
    nrm = (pts - CENTER) / np.linalg.norm(pts - CENTER, axis=-1, keepdims=True)
    shading = np.asarray(
        compute_shading(jnp.asarray(TRUE_L), jnp.asarray(nrm, jnp.float32), jnp.asarray(g.albedo))
    )
    g.color = np.stack([np.clip(shading, 0, 1) * 255] * 3, axis=-1).astype(np.float32)
    return g


def make_problem(cfg=None, flat_albedo=None, thres_factor=2.0):
    cfg = cfg or RefinementConfig(num_observations=3, occlusion_distance=0.02)
    cam, poses6, imgs, depths = build_scene(flat_albedo=flat_albedo)
    grid = build_sphere_grid(flat_albedo=flat_albedo)
    topo = LevelTopology.build(grid)
    # per-voxel SH coeffs = uniform truth
    voxel_sh = np.broadcast_to(TRUE_L, (grid.num_voxels, 9)).copy()
    params = Params(
        sdf=jnp.asarray(grid.sdf_refined),
        albedo=jnp.asarray(grid.albedo),
        poses=jnp.asarray(poses6),
        intr=jnp.asarray([float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)], jnp.float32),
        dist=jnp.zeros(5, jnp.float32),
    )
    thres = thres_factor * VOXEL
    return cfg, cam, grid, topo, params, jnp.asarray(depths), jnp.asarray(imgs), voxel_sh, thres


def assemble(cfg, cam, grid, topo, params, depths, imgs, voxel_sh, thres,
             lambda_r=10.0, lambda_s=10.0):
    return build_assembly(
        grid, topo, params, cam, depths, imgs, voxel_sh, thres,
        cfg.occlusion_distance, cfg.num_observations,
        cfg.lambda_g, lambda_r, lambda_s, cfg.lambda_a, 1.0,
    )


def test_eg_residual_small_at_ground_truth():
    prob = make_problem()
    cfg, cam, grid, topo, params, depths, imgs, voxel_sh, thres = prob
    asm, masks = assemble(*prob)
    from intrinsic3d_tpu.refine.residuals import eg_residuals

    r = np.asarray(eg_residuals(params, asm))
    w = np.asarray(asm.eg_w)
    active = w > 0
    assert active.sum() > 1000
    # residuals at ground truth are discretization-level (forward-difference
    # normals on a 0.01-voxel sphere): small but not zero
    raw = r[active] / np.sqrt(w[active] * float(asm.lam[0]))
    assert np.median(np.abs(raw)) < 0.05


def _np_catmull_rom(img, x, y):
    h, w = img.shape

    def wts(t):
        return np.array(
            [
                -0.5 * t + t * t - 0.5 * t**3,
                1.0 - 2.5 * t * t + 1.5 * t**3,
                0.5 * t + 2.0 * t * t - 1.5 * t**3,
                -0.5 * t * t + 0.5 * t**3,
            ]
        )

    x = np.clip(x, 1.0, w - 2.001)
    y = np.clip(y, 1.0, h - 2.001)
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    wx = wts(x - x0)
    wy = wts(y - y0)
    acc = 0.0
    for j in range(4):
        yy = np.clip(y0 + j - 1, 0, h - 1)
        for i in range(4):
            xx = np.clip(x0 + i - 1, 0, w - 1)
            acc += img[yy, xx] * wx[i] * wy[j]
    return acc


def test_eg_residual_matches_independent_numpy_transcription():
    """Transcribe the Ceres functor math independently in numpy and compare
    element-by-element (``shading_cost.h:132-197``)."""
    prob = make_problem()
    cfg, cam, grid, topo, params, depths, imgs, voxel_sh, thres = prob
    asm, masks = assemble(*prob)
    from intrinsic3d_tpu.refine.residuals import eg_residuals

    r = np.asarray(eg_residuals(params, asm))
    w = np.asarray(asm.eg_w)
    lam0 = float(asm.lam[0])
    sdf = np.asarray(params.sdf)
    alb = np.asarray(params.albedo)
    poses = np.asarray(params.poses, np.float64)
    intr = np.asarray(params.intr, np.float64)
    imgs_np = np.asarray(imgs)
    sdf10_idx = np.asarray(asm.eg_sdf10_idx)
    alb4_idx = np.asarray(asm.eg_alb4_idx)
    vpos = np.asarray(asm.eg_vpos)
    frames = np.asarray(asm.eg_frame)
    sh = np.asarray(asm.eg_sh, np.float64)

    from intrinsic3d_tpu.mathutil import pose_vec_to_matrix

    N4 = ((0, 6, 1, 4), (6, 9, 7, 8), (1, 7, 2, 3), (4, 8, 3, 5))
    OFFS = ((0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1))

    rng = np.random.default_rng(7)
    checked = 0
    for e in rng.permutation(np.flatnonzero(w > 0))[:20]:
        s10 = sdf[sdf10_idx[e]].astype(np.float64)
        a4 = alb[alb4_idx[e]].astype(np.float64)
        T = pose_vec_to_matrix(poses[frames[e]])
        img = imgs_np[frames[e]]
        lum = np.zeros(4)
        shading = np.zeros(4)
        ok = True
        for k in range(4):
            s4 = s10[list(N4[k])]
            n = np.array([s4[1] - s4[0], s4[2] - s4[0], s4[3] - s4[0]])
            nn = np.linalg.norm(n)
            if nn > 0:
                n = n / nn
            p = (vpos[e] + np.array(OFFS[k])) * VOXEL - n * s4[0]
            pc = T[:3, :3] @ p + T[:3, 3]
            u = intr[0] * (pc[0] / pc[2]) + intr[2]
            v = intr[1] * (pc[1] / pc[2]) + intr[3]
            if not (1 <= u < img.shape[1] - 2 and 1 <= v < img.shape[0] - 2 and pc[2] > 0):
                ok = False
                break
            lum[k] = _np_catmull_rom(img, u, v)
            basis = np.array(
                [1, n[1], n[2], n[0], n[0] * n[1], n[1] * n[2],
                 -n[0] ** 2 - n[1] ** 2 + 2 * n[2] ** 2, n[0] * n[2],
                 n[0] ** 2 - n[1] ** 2]
            )
            shading[k] = a4[k] * np.dot(sh[e], basis)
        if not ok:
            continue
        d = (shading[1:] - shading[0]) - (lum[1:] - lum[0])
        expected = np.sqrt(np.sum(d * d)) * np.sqrt(w[e] * lam0)
        np.testing.assert_allclose(r[e], expected, rtol=2e-2, atol=1e-4)
        checked += 1
    assert checked >= 10


def test_cost_increases_when_albedo_perturbed():
    prob = make_problem()
    cfg, cam, grid, topo, params, depths, imgs, voxel_sh, thres = prob
    asm, masks = assemble(*prob)
    c0 = float(total_cost(params, asm))
    rng = np.random.default_rng(0)
    bad = params._replace(
        albedo=params.albedo + jnp.asarray(rng.normal(0, 0.1, grid.num_voxels), jnp.float32)
    )
    c1 = float(total_cost(bad, asm))
    assert c1 > c0 * 3


def test_jtj_diag_matches_autodiff():
    prob = make_problem()
    cfg, cam, grid, topo, params, depths, imgs, voxel_sh, thres = prob
    asm, masks = assemble(*prob)
    diag = jtj_diag(params, asm)

    # reference: diag via J^T J e_i for a handful of basis vectors
    def rfun(p):
        return all_residuals(p, asm)

    _, jlin = jax.linearize(rfun, params)
    rng = np.random.default_rng(1)
    # a few random sdf/albedo entries + all pose/intr entries
    for idx in rng.integers(0, grid.num_voxels, 5):
        e = Params(
            sdf=jnp.zeros_like(params.sdf).at[idx].set(1.0),
            albedo=jnp.zeros_like(params.albedo),
            poses=jnp.zeros_like(params.poses),
            intr=jnp.zeros_like(params.intr),
            dist=jnp.zeros_like(params.dist),
        )
        col = jlin(e)
        expected = float(jnp.sum(col * col))
        got = float(diag.sdf[idx])
        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=1e-10)
    # pose entry
    e = Params(
        sdf=jnp.zeros_like(params.sdf),
        albedo=jnp.zeros_like(params.albedo),
        poses=jnp.zeros_like(params.poses).at[0, 3].set(1.0),
        intr=jnp.zeros_like(params.intr),
        dist=jnp.zeros_like(params.dist),
    )
    col = jlin(e)
    np.testing.assert_allclose(
        float(diag.poses[0, 3]), float(jnp.sum(col * col)), rtol=2e-3
    )


def test_gn_iteration_recovers_albedo():
    cfg = RefinementConfig(
        num_observations=3,
        occlusion_distance=0.02,
        lambda_a=0.1,
        fix_poses=True,
        fix_intrinsics=True,
        fix_distortion=True,
        iterations=4,
        lm_steps=10,
    )
    prob = make_problem(cfg)
    cfg, cam, grid, topo, params, depths, imgs, voxel_sh, thres = prob
    true_alb = np.asarray(params.albedo).copy()
    rng = np.random.default_rng(2)
    params = params._replace(
        albedo=jnp.asarray(
            np.clip(true_alb + rng.normal(0, 0.08, grid.num_voxels), 0.05, 1.0), jnp.float32
        )
    )
    # keep sdf fixed too: only albedo free
    asm, masks = assemble(cfg, cam, grid, topo, params, depths, imgs, voxel_sh, thres)
    masks = masks._replace(sdf=jnp.zeros_like(masks.sdf))
    err0 = np.abs(np.asarray(params.albedo) - true_alb)

    mu = jnp.float32(1e-4)
    for _ in range(4):
        asm, m2 = assemble(cfg, cam, grid, topo, params, depths, imgs, voxel_sh, thres)
        m2 = m2._replace(sdf=jnp.zeros_like(masks.sdf))
        params, c0, c1, mu, tries = gn_iteration(params, asm, m2, mu, 10, 12)
        assert float(c1) <= float(c0)

    free = np.asarray(m2.albedo) > 0
    err1 = np.abs(np.asarray(params.albedo) - true_alb)
    # optimized albedos should be much closer to truth
    assert np.median(err1[free]) < 0.3 * np.median(err0[free])


def test_optimize_level_reduces_cost_joint():
    cfg = RefinementConfig(
        num_observations=3,
        occlusion_distance=0.02,
        iterations=3,
        lm_steps=8,
        lambda_r0=20.0,
        lambda_r1=10.0,
        lambda_s0=20.0,
        lambda_s1=10.0,
    )
    prob = make_problem(cfg)
    cfg, cam, grid, topo, params, depths, imgs, voxel_sh, thres = prob
    rng = np.random.default_rng(3)
    # perturb geometry and albedo
    params = params._replace(
        sdf=params.sdf + jnp.asarray(rng.normal(0, 0.0015, grid.num_voxels), jnp.float32),
        albedo=jnp.asarray(
            np.clip(np.asarray(params.albedo) + rng.normal(0, 0.05, grid.num_voxels), 0.05, 1.0),
            jnp.float32,
        ),
    )
    new_params, mu, stats = optimize_level(
        grid, topo, params, cfg, cam, depths, imgs, voxel_sh, thres, rgbd_level=0
    )
    assert stats.costs_after[-1] < stats.costs_before[0]
    # geometry error should shrink
    pts = grid.voxel_to_world()
    true_sdf = sphere_sdf(pts, CENTER, RADIUS)
    free = np.asarray(jnp.abs(params.sdf)) < thres
    e0 = np.abs(np.asarray(params.sdf) - true_sdf)[free].mean()
    e1 = np.abs(np.asarray(new_params.sdf) - true_sdf)[free].mean()
    assert e1 < e0
