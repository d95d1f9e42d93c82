"""Observation machinery and SVSH lighting tests on analytic spheres."""

import numpy as np
import jax.numpy as jnp
import pytest

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.grid.voxel_grid import NORMAL_OFFSETS, VoxelGrid
from intrinsic3d_tpu.grid import ops as gops
from intrinsic3d_tpu.lighting.sh import sh_basis, compute_shading
from intrinsic3d_tpu.lighting.subvolumes import Subvolumes
from intrinsic3d_tpu.lighting.svsh import estimate_svsh, voxel_sh_coeffs
from intrinsic3d_tpu.mathutil import invert_pose, pose_matrix_to_vec
from intrinsic3d_tpu.observations import collect_observations, recolor
from tests.synthetic import look_at_pose, render_sphere_depth, sphere_sdf


CENTER = np.array([0.0, 0.0, 0.6])
RADIUS = 0.15
VOXEL = 0.01


def sphere_grid(sbr=True):
    r = int((RADIUS + 6 * VOXEL) / VOXEL) + 1
    cc = np.stack(np.meshgrid(*([np.arange(-r, r + 1)] * 3), indexing="ij"), axis=-1).reshape(
        -1, 3
    )
    cc = cc + np.round(CENTER / VOXEL).astype(np.int64)
    g = VoxelGrid.from_coords(VOXEL, cc, sbr=sbr)
    pts = g.voxel_to_world()
    sdf = sphere_sdf(pts, CENTER, RADIUS).astype(np.float32)
    keep = np.abs(sdf) < g.truncation
    g = g.select(keep)
    pts = g.voxel_to_world()
    g.sdf = sphere_sdf(pts, CENTER, RADIUS).astype(np.float32)
    g.weight[:] = 1.0
    if sbr:
        g.sdf_refined = g.sdf.copy()
        g.albedo[:] = 0.6
    return g


def grid_normals(g):
    nbr4 = g.neighbor_table(NORMAL_OFFSETS)
    n, ok = gops.surface_normals(
        jnp.asarray(g.sdf_refined if g.is_sbr else g.sdf),
        jnp.asarray(nbr4),
        jnp.asarray(g.valid_mask()),
    )
    return np.asarray(n), np.asarray(ok)


def test_surface_normals_match_analytic():
    g = sphere_grid()
    n, ok = grid_normals(g)
    pts = g.voxel_to_world()
    true_n = (pts - CENTER) / np.linalg.norm(pts - CENTER, axis=-1, keepdims=True)
    sel = ok & (np.abs(g.sdf) < 2 * VOXEL)
    dots = np.sum(n[sel] * true_n[sel], axis=-1)
    assert np.median(dots) > 0.97


def test_collect_observations_visibility():
    g = sphere_grid()
    n, ok = grid_normals(g)
    pts = g.voxel_to_world()
    iso = gops.voxel_center_to_iso(jnp.asarray(pts), jnp.asarray(n), jnp.asarray(g.sdf))

    cam = Camera.create(80.0, 80.0, 39.5, 29.5, 80, 60)
    T = look_at_pose([0.0, 0.0, 0.0], CENTER)
    depth = render_sphere_depth(cam, T, CENTER, RADIUS)
    pose_w2c = pose_matrix_to_vec(invert_pose(T))

    w, f = collect_observations(
        cam,
        jnp.asarray(pose_w2c, jnp.float32)[None],
        jnp.asarray(depth)[None],
        jnp.asarray(iso),
        jnp.asarray(n),
        0.02,
        num_best=5,
    )
    w = np.asarray(w)
    shell = np.abs(g.sdf) < VOXEL
    # front hemisphere (z < center z) well observed; back occluded
    front = shell & ok & (pts[:, 2] < CENTER[2] - 0.02)
    back = shell & (pts[:, 2] > CENTER[2] + 0.02)
    assert (w[front, 0] > 0).mean() > 0.7
    assert (w[back, 0] > 0).mean() < 0.05


def test_recolor_constant_color():
    g = sphere_grid()
    n, ok = grid_normals(g)
    pts = g.voxel_to_world()
    iso = gops.voxel_center_to_iso(jnp.asarray(pts), jnp.asarray(n), jnp.asarray(g.sdf))

    cam = Camera.create(80.0, 80.0, 39.5, 29.5, 80, 60)
    poses, depths = [], []
    for eye in ([0, 0, 0], [0.6, 0, 0.3], [-0.6, 0.05, 0.4]):
        T = look_at_pose(eye, CENTER)
        poses.append(pose_matrix_to_vec(invert_pose(T)))
        depths.append(render_sphere_depth(cam, T, CENTER, RADIUS))
    poses = jnp.asarray(np.stack(poses), jnp.float32)
    depths = jnp.asarray(np.stack(depths))
    colors = jnp.full((3, 60, 80, 3), 200.0, jnp.float32)

    w, f = collect_observations(cam, poses, depths, jnp.asarray(iso), jnp.asarray(n), 0.02)
    cols, has = recolor(cam, poses, depths, colors, jnp.asarray(iso), jnp.asarray(n), w, f, 0.02)
    cols = np.asarray(cols)
    has = np.asarray(has)
    assert has.mean() > 0.5
    np.testing.assert_allclose(cols[has], 200.0, atol=0.5)


# -- subvolumes & SVSH ------------------------------------------------------


def test_subvolumes_partition():
    pts = np.array([[0.05, 0.05, 0.05], [0.25, 0.0, 0.0], [-0.01, 0.0, 0.0]])
    sub = Subvolumes.compute(pts, 0.2)
    assert sub.count == 3
    ids = sub.point_to_subvolume(pts)
    assert len(set(ids.tolist())) == 3
    assert np.all(ids >= 0)
    # a far-away point maps to no cell
    assert sub.point_to_subvolume(np.array([[5.0, 5.0, 5.0]]))[0] == -1


def test_subvolume_neighbor_pairs_directed():
    pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.1, 0.1]])  # two adjacent cells in x
    sub = Subvolumes.compute(pts, 0.2)
    pairs = sub.neighbor_pairs()
    assert len(pairs) == 2  # both directions
    assert {tuple(p) for p in pairs.tolist()} == {(0, 1), (1, 0)}


def test_subvolume_interpolation_constant():
    pts = np.random.default_rng(0).uniform(0, 0.6, size=(50, 3))
    sub = Subvolumes.compute(pts, 0.2)
    values = np.full((sub.count, 9), 3.0)
    out = sub.interpolate_values(values, pts)
    np.testing.assert_allclose(out, 3.0, rtol=1e-5)


def test_svsh_recovers_uniform_lighting():
    g = sphere_grid()
    n, ok = grid_normals(g)
    true_l = np.array([0.7, 0.1, 0.3, -0.1, 0.0, 0.05, 0.02, 0.0, -0.03])
    shading = np.asarray(
        compute_shading(jnp.asarray(true_l), jnp.asarray(n), jnp.asarray(g.albedo))
    )
    lum255 = np.clip(shading, 0.0, 1.0) * 255.0
    g.color = np.stack([lum255] * 3, axis=-1).astype(np.float32)

    res = estimate_svsh(g, subvolume_size=0.2, lambda_reg=1.0, thres_shell=2 * VOXEL)
    assert res is not None
    # every subvolume should recover ≈ the true lighting
    for s in range(res.subvolumes.count):
        np.testing.assert_allclose(res.coeffs[s], true_l, atol=0.05)

    vox_coeffs = voxel_sh_coeffs(res, g, 2 * VOXEL)
    shell = g.valid_mask() & (np.abs(g.sdf_refined) <= 2 * VOXEL)
    np.testing.assert_allclose(
        vox_coeffs[shell], np.broadcast_to(true_l, vox_coeffs[shell].shape), atol=0.05
    )
    # outside shell → zero
    assert np.all(vox_coeffs[~shell] == 0.0)


def test_svsh_regularizer_smooths_empty_subvolume():
    # lighting varies; a subvolume with very few voxels still gets coeffs
    g = sphere_grid()
    n, ok = grid_normals(g)
    shading = np.asarray(
        compute_shading(jnp.zeros(9).at[0].set(0.8), jnp.asarray(n), jnp.asarray(g.albedo))
    )
    g.color = np.stack([np.clip(shading, 0, 1) * 255] * 3, axis=-1).astype(np.float32)
    res = estimate_svsh(g, subvolume_size=0.1, lambda_reg=10.0, thres_shell=2 * VOXEL)
    assert res is not None
    assert np.all(np.isfinite(res.coeffs))


def test_svsh_block_sparse_matches_dense_reference():
    """The block-sparse PCG solve must reproduce the dense normal-equations
    solution (the round-1 implementation densified [9S,9S]; now the system is
    never materialized — this pins the two against each other)."""
    from intrinsic3d_tpu.lighting.svsh import _assemble_and_solve

    rng = np.random.default_rng(3)
    M, S = 600, 12
    n = rng.normal(size=(M, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    from intrinsic3d_tpu.lighting.sh import sh_basis

    H = np.asarray(sh_basis(jnp.asarray(n, jnp.float32)), np.float64)
    albedo = rng.uniform(0.3, 0.9, M)
    lum = rng.uniform(0.1, 0.9, M)
    w = rng.uniform(0.5, 1.0, M)
    subvol = rng.integers(0, S, M)
    # ring topology, both directions (as Subvolumes.neighbor_pairs emits)
    pairs = np.array(
        [(s, (s + 1) % S) for s in range(S)] + [((s + 1) % S, s) for s in range(S)],
        np.int32,
    )
    lambda_reg = 5.0

    got = np.asarray(
        _assemble_and_solve(
            jnp.asarray(H, jnp.float32),
            jnp.asarray(albedo, jnp.float32),
            jnp.asarray(lum, jnp.float32),
            jnp.asarray(w, jnp.float32),
            jnp.asarray(subvol, jnp.int32),
            jnp.asarray(pairs),
            S,
            lambda_reg,
        )
    )

    # dense f64 reference
    data_w = w / w.sum()
    aH = H * albedo[:, None]
    A = np.zeros((S * 9, S * 9))
    b = np.zeros(S * 9)
    for m in range(M):
        s = subvol[m]
        A[s * 9 : s * 9 + 9, s * 9 : s * 9 + 9] += data_w[m] * np.outer(aH[m], aH[m])
        b[s * 9 : s * 9 + 9] += data_w[m] * lum[m] * aH[m]
    reg_w = lambda_reg / len(pairs)
    eye9 = np.eye(9) * reg_w
    for i, j in pairs:
        A[i * 9 : i * 9 + 9, i * 9 : i * 9 + 9] += eye9
        A[j * 9 : j * 9 + 9, j * 9 : j * 9 + 9] += eye9
        A[i * 9 : i * 9 + 9, j * 9 : j * 9 + 9] -= eye9
        A[j * 9 : j * 9 + 9, i * 9 : i * 9 + 9] -= eye9
    ref = np.linalg.solve(A + np.eye(S * 9) * 1e-10, b).reshape(S, 9)

    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_svsh_block_sparse_scales_to_thousands_of_subvolumes():
    """Tomb-scale subvolume counts (S in the thousands) must solve without a
    dense S² array: S=2000 would need a 2.6 GB dense matrix, the block-sparse
    path needs ~1.3 MB of blocks."""
    from intrinsic3d_tpu.lighting.svsh import _assemble_and_solve

    rng = np.random.default_rng(4)
    S = 2000
    M = 20000
    n = rng.normal(size=(M, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    from intrinsic3d_tpu.lighting.sh import sh_basis

    H = sh_basis(jnp.asarray(n, jnp.float32))
    # 3D-grid topology so the graph is connected
    side = int(round(S ** (1 / 3))) + 1
    ids = np.arange(S)
    x, y, z = ids % side, (ids // side) % side, ids // (side * side)
    pair_list = []
    for dx, dy, dz in [(1, 0, 0), (0, 1, 0), (0, 0, 1)]:
        nbr = (x + dx) + (y + dy) * side + (z + dz) * side * side
        okm = nbr < S
        pair_list.append(np.stack([ids[okm], nbr[okm]], -1))
        pair_list.append(np.stack([nbr[okm], ids[okm]], -1))
    pairs = np.concatenate(pair_list).astype(np.int32)

    coeffs = np.asarray(
        _assemble_and_solve(
            H,
            jnp.asarray(rng.uniform(0.3, 0.9, M), jnp.float32),
            jnp.asarray(rng.uniform(0.1, 0.9, M), jnp.float32),
            jnp.asarray(rng.uniform(0.5, 1.0, M), jnp.float32),
            jnp.asarray(rng.integers(0, S, M), jnp.int32),
            jnp.asarray(pairs),
            S,
            10.0,
        )
    )
    assert coeffs.shape == (S, 9)
    assert np.all(np.isfinite(coeffs))


def test_estimate_svsh_device_interp_matches_host():
    """`estimate_svsh(with_voxel_sh=True)` interpolates per-voxel SH on
    device inside the estimation program; it must match the host-numpy
    `voxel_sh_coeffs` (f32 position math vs the host's f64 — boundary-cell
    weight flips are possible in principle but the field is continuous
    there, so values agree tightly)."""
    import dataclasses

    from intrinsic3d_tpu.lighting.svsh import estimate_svsh, voxel_sh_coeffs
    from intrinsic3d_tpu.synthetic import build_sphere_problem

    prob = build_sphere_problem(
        voxel_size=0.015, image_size=(64, 48), num_frames=2, num_observations=2,
        perturb_sdf=0.002, perturb_albedo=0.05,
    )
    grid = prob.grid
    grid.sdf_refined = np.asarray(prob.params.sdf).astype(np.float32)
    grid.albedo = np.asarray(prob.params.albedo).astype(np.float32)
    thres = prob.thres_shell

    res, vox_dev = estimate_svsh(grid, 0.12, 10.0, thres, with_voxel_sh=True)
    assert res is not None and vox_dev is not None
    res2 = estimate_svsh(grid, 0.12, 10.0, thres)
    np.testing.assert_array_equal(res.coeffs, res2.coeffs)

    vox_host = voxel_sh_coeffs(res, grid, thres)
    np.testing.assert_allclose(vox_dev, vox_host, rtol=1e-4, atol=1e-5)
