"""Voxel grid, fusion, SDF algorithms, and mesh extraction tests."""

import numpy as np
import pytest

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.grid.voxel_grid import (
    RING6_OFFSETS,
    VoxelGrid,
    find_indices,
    full_neighborhood_offsets,
    pack_coords,
    unpack_keys,
)
from intrinsic3d_tpu.grid import algorithms as alg
from intrinsic3d_tpu.grid.fusion import FusionVolume, compute_scene_voxel_bounds
from intrinsic3d_tpu.mesh import extract_surface, remove_loose_components
from tests.synthetic import look_at_pose, render_sphere_depth, sphere_sdf


def make_grid(coords, voxel_size=0.01, sbr=False):
    return VoxelGrid.from_coords(voxel_size, np.asarray(coords, np.int64), sbr=sbr)


# -- voxel table ------------------------------------------------------------


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    c = rng.integers(-1000, 1000, size=(100, 3))
    np.testing.assert_array_equal(unpack_keys(pack_coords(c)), c)


def test_pack_monotone_in_lex_order():
    c = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 0], [1, -1, -5]])
    k = pack_coords(c)
    assert k[0] < k[1] < k[2] < k[3]


def test_find_indices():
    g = make_grid([[0, 0, 0], [1, 2, 3], [-5, 0, 2]])
    q = np.array([[1, 2, 3], [9, 9, 9], [0, 0, 0]])
    idx = find_indices(g.keys, q)
    assert idx[1] == -1
    np.testing.assert_array_equal(g.coords[idx[0]], [1, 2, 3])
    np.testing.assert_array_equal(g.coords[idx[2]], [0, 0, 0])


def test_neighbor_table():
    g = make_grid([[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    nbr = g.neighbor_table(RING6_OFFSETS)
    i0 = int(g.lookup(np.array([[0, 0, 0]]))[0])
    # +x neighbor of (0,0,0) is (1,0,0)
    assert np.array_equal(g.coords[nbr[i0, 0]], [1, 0, 0])
    # -x neighbor absent
    assert nbr[i0, 1] == -1


def test_full_neighborhood_counts():
    assert full_neighborhood_offsets(1).shape == (26, 3)
    assert full_neighborhood_offsets(2).shape == (124, 3)


def test_grid_select_and_sbr():
    g = make_grid([[0, 0, 0], [1, 0, 0], [2, 0, 0]])
    g.weight[:] = [1.0, 0.0, 2.0]
    g.sdf[:] = [0.1, 0.2, 0.3]
    sbr = g.to_sbr()
    assert sbr.num_voxels == 2
    assert sbr.is_sbr
    np.testing.assert_allclose(sbr.albedo, 0.6)
    np.testing.assert_allclose(sbr.sdf_refined, sbr.sdf)


def test_grid_tsdf_roundtrip(tmp_path):
    g = make_grid([[3, -2, 7], [0, 0, 0]], voxel_size=0.004)
    g.sdf[:] = [0.01, -0.02]
    g.weight[:] = [5.0, 7.0]
    g.color[:] = [[10, 20, 30], [200, 100, 50]]
    p = tmp_path / "vol.tsdf"
    g.save(str(p))
    g2 = VoxelGrid.load(str(p))
    assert g2.voxel_size == pytest.approx(0.004)
    assert g2.truncation == pytest.approx(0.02)
    np.testing.assert_array_equal(g2.coords, g.coords)
    np.testing.assert_allclose(g2.sdf, g.sdf, rtol=1e-6)
    np.testing.assert_allclose(g2.color, g.color)
    assert not g2.is_sbr

    sbr = g.to_sbr()
    p2 = tmp_path / "vol_sbr.tsdf"
    sbr.save(str(p2))
    g3 = VoxelGrid.load(str(p2))
    assert g3.is_sbr
    np.testing.assert_allclose(g3.albedo, 0.6)


def test_tsdf_record_layout(tmp_path):
    """The binary record must match the reference's C struct layout."""
    g = make_grid([[1, 2, 3]], voxel_size=0.004)
    g.sdf[:] = 0.5
    g.weight[:] = 2.0
    g.color[:] = [[1, 2, 3]]
    p = tmp_path / "t.tsdf"
    g.save(str(p))
    raw = open(p, "rb").read()
    # header: 3 f32 + u64 + f32 = 24 bytes; record: 12 (coords) + 12 (Voxel)
    assert len(raw) == 24 + 24
    import struct

    vs, tr, iw = struct.unpack("<fff", raw[:12])
    assert vs == pytest.approx(0.004)
    assert tr == pytest.approx(0.02)
    (n,) = struct.unpack("<Q", raw[12:20])
    assert n == 1
    x, y, z = struct.unpack("<iii", raw[24:36])
    assert (x, y, z) == (1, 2, 3)
    sdf, w = struct.unpack("<ff", raw[36:44])
    assert sdf == pytest.approx(0.5)
    assert w == pytest.approx(2.0)
    assert raw[44:47] == bytes([1, 2, 3])


# -- fusion -----------------------------------------------------------------


@pytest.fixture(scope="module")
def sphere_fusion():
    cam = Camera.create(60.0, 60.0, 31.5, 23.5, 64, 48)
    center = np.array([0.0, 0.0, 0.6])
    radius = 0.2
    voxel_size = 0.01
    poses = [
        look_at_pose([0.0, 0.0, 0.0], center),
        look_at_pose([0.55, 0.0, 0.55], center),
        look_at_pose([-0.5, 0.1, 0.5], center),
        look_at_pose([0.0, 0.5, 0.35], center),
    ]
    depths = [render_sphere_depth(cam, T, center, radius) for T in poses]
    vlo, vhi = compute_scene_voxel_bounds(cam, poses, 0.1, 2.0, voxel_size)
    vol = FusionVolume(cam, cam, voxel_size, vlo, vhi, 0.1, 2.0)
    for d, T in zip(depths, poses):
        vol.allocate(d, T)
    grid = vol.build_grid()
    from intrinsic3d_tpu.image.processing import compute_normals
    import jax.numpy as jnp

    for d, T in zip(depths, poses):
        normals = np.asarray(compute_normals(cam, jnp.asarray(d)))
        color = np.full((48, 64, 3), 0.5, np.float32)
        vol.integrate(d, normals, color, T)
    grid = vol.finalize()
    return grid, center, radius, voxel_size


def test_fusion_allocates_near_surface(sphere_fusion):
    grid, center, radius, voxel_size = sphere_fusion
    assert grid.num_voxels > 1000
    # every observed voxel should be within truncation+2 voxels of the surface
    pts = grid.voxel_to_world()
    d = np.abs(sphere_sdf(pts, center, radius))
    seen = grid.weight > 0
    assert np.all(d[seen] <= grid.truncation + 3 * voxel_size)


def test_fusion_sdf_accuracy(sphere_fusion):
    grid, center, radius, voxel_size = sphere_fusion
    pts = grid.voxel_to_world()
    true_sdf = sphere_sdf(pts, center, radius)
    seen = grid.weight > 0
    near = seen & (np.abs(true_sdf) < grid.truncation * 0.5)
    assert near.sum() > 500
    err = np.abs(grid.sdf[near] - true_sdf[near])
    # projective TSDF error is bounded by a couple voxels near the surface
    assert np.median(err) < voxel_size
    assert np.percentile(err, 90) < 2.5 * voxel_size


def test_fusion_color(sphere_fusion):
    grid, center, radius, _ = sphere_fusion
    seen = grid.weight > 0
    # constant gray 0.5 → 127.5
    np.testing.assert_allclose(grid.color[seen], 127.5, atol=1.0)


def test_fusion_mesh_on_sphere(sphere_fusion):
    grid, center, radius, voxel_size = sphere_fusion
    g = alg.clear_invalid_voxels(grid.clone())
    verts, faces, cols = extract_surface(g)
    assert len(verts) > 300
    assert len(faces) > 300
    r = np.linalg.norm(verts - center, axis=-1)
    assert abs(np.median(r) - radius) < voxel_size
    assert np.percentile(np.abs(r - radius), 90) < 2 * voxel_size


# -- algorithms -------------------------------------------------------------


def test_correct_sdf_pulls_toward_neighbor():
    # line of voxels: center has correct small sdf, neighbor has inflated sdf
    g = make_grid([[0, 0, 0], [1, 0, 0]], voxel_size=0.01)
    g.weight[:] = 1.0
    g.sdf[:] = [0.001, 0.5]  # neighbor should become ~0.001 + 0.01
    alg.correct_sdf(g, num_iter=5)
    assert g.sdf[int(g.lookup(np.array([[1, 0, 0]]))[0])] == pytest.approx(0.011, abs=1e-5)


def test_correct_sdf_respects_sign():
    g = make_grid([[0, 0, 0], [1, 0, 0]], voxel_size=0.01)
    g.weight[:] = 1.0
    # opposite signs: no update across the zero crossing
    i0 = int(g.lookup(np.array([[0, 0, 0]]))[0])
    i1 = int(g.lookup(np.array([[1, 0, 0]]))[0])
    g.sdf[i0] = -0.004
    g.sdf[i1] = 0.5
    alg.correct_sdf(g, num_iter=3)
    assert g.sdf[i1] == pytest.approx(0.5)


def test_clear_invalid():
    g = make_grid([[0, 0, 0], [1, 0, 0]])
    g.weight[:] = [0.0, 1.0]
    g2 = alg.clear_invalid_voxels(g)
    assert g2.num_voxels == 1
    np.testing.assert_array_equal(g2.coords[0], [1, 0, 0])


def test_thin_shell_keeps_surface_and_support():
    # voxels along x with sdf growing away from zero-crossing at x=0
    coords = [[x, 0, 0] for x in range(-6, 7)]
    g = make_grid(coords, voxel_size=0.01, sbr=True)
    g.weight[:] = 1.0
    for i, c in enumerate(g.coords):
        g.sdf_refined[i] = c[0] * 0.01
        g.sdf[i] = c[0] * 0.01
    thres = 0.02  # keep |x| <= 2
    g2 = alg.clear_voxels_outside_thin_shell(g, thres)
    xs = set(g2.coords[:, 0].tolist())
    # core: |x|<=2; support adds +1/+2 neighbors (x up to 4), and -x ring (−3)
    assert {-2, -1, 0, 1, 2}.issubset(xs)
    assert 4 in xs  # (+2,0,0) support of x=2
    # far negative side has no crossing in 5³ → dropped
    assert -6 not in xs


def test_thin_shell_device_path_matches_host():
    """The block-structured device evaluation of the thin-shell keep
    predicate (used automatically for large grids) selects EXACTLY the same
    voxel set as the host neighbor-table path — on an irregular shell with
    invalid voxels, sign changes, and block-boundary-straddling support."""
    rng = np.random.default_rng(11)
    r = np.arange(-10, 11)
    X, Y, Z = np.meshgrid(r, r, r, indexing="ij")
    coords = np.stack([X, Y, Z], -1).reshape(-1, 3)
    d = np.linalg.norm(coords, axis=1) - 7.0
    sel = np.abs(d) < 3.5
    coords = coords[sel]
    g = make_grid(coords.tolist(), voxel_size=0.01, sbr=True)
    g.weight[:] = (rng.random(g.num_voxels) > 0.1).astype(np.float32)
    g.sdf_refined[:] = (np.linalg.norm(g.coords, axis=1) - 7.0) * 0.01 + rng.normal(
        0, 0.002, g.num_voxels
    )
    g.sdf[:] = g.sdf_refined

    host = alg.clear_voxels_outside_thin_shell(g, 0.015, use_device=False)
    dev = alg.clear_voxels_outside_thin_shell(g, 0.015, use_device=True)
    key = lambda c: (c[:, 0].astype(np.int64) << 42) + (c[:, 1].astype(np.int64) << 21) + c[:, 2]
    np.testing.assert_array_equal(np.sort(key(host.coords)), np.sort(key(dev.coords)))


def test_upsample_constant_field():
    coords = [[x, y, z] for x in range(3) for y in range(3) for z in range(3)]
    g = make_grid(coords, voxel_size=0.02, sbr=True)
    g.weight[:] = 2.0
    g.sdf[:] = 0.05
    g.sdf_refined[:] = 0.05
    g.albedo[:] = 0.7
    g.color[:] = 100.0
    up = alg.upsample(g)
    assert up.voxel_size == pytest.approx(0.01)
    assert up.num_voxels == g.num_voxels * 8
    # interior children (all corners valid) keep the constant values
    interior = up.weight > 0
    assert interior.sum() > 0
    np.testing.assert_allclose(up.sdf[interior], 0.05, rtol=1e-5)
    np.testing.assert_allclose(up.albedo[interior], 0.7, rtol=1e-5)


def test_upsample_matches_general_interpolation_bitwise():
    # `upsample` uses the shared-corner fast path (_upsample_fields: one
    # 8-neighbor lookup per parent + fixed [8,8] weight table); it must stay
    # BITWISE-equal to the general `interpolate_fields` at the child
    # positions, including invalid-corner renormalization and the cnt>4
    # weight gate.
    rng = np.random.default_rng(7)
    coords = np.unique(rng.integers(-5, 5, size=(300, 3)).astype(np.int32), axis=0)
    g = make_grid(coords.tolist(), voxel_size=0.01, sbr=True)
    n = g.num_voxels
    g.sdf = rng.normal(size=n).astype(np.float32)
    g.weight = np.where(
        rng.random(n) < 0.75, rng.random(n).astype(np.float32) * 5, 0.0
    ).astype(np.float32)
    g.color = rng.random((n, 3)).astype(np.float32)
    g.albedo = rng.random(n).astype(np.float32)
    g.sdf_refined = rng.normal(size=n).astype(np.float32)

    parent = g.coords.astype(np.int64)
    child_pos = (parent[:, None, :] + alg._CORNER_OFFS[None, :, :] * 0.5).reshape(-1, 3)
    ref = alg.interpolate_fields(g, child_pos)
    fast = alg._upsample_fields(g)
    for key in fast:
        np.testing.assert_array_equal(fast[key], ref[key], err_msg=key)


def test_upsample_linear_sdf():
    coords = [[x, y, z] for x in range(4) for y in range(4) for z in range(4)]
    g = make_grid(coords, voxel_size=0.02)
    g.weight[:] = 1.0
    g.sdf[:] = g.coords[:, 0] * 0.02  # sdf = world x
    up = alg.upsample(g)
    pts = up.voxel_to_world()
    valid = up.weight > 0
    np.testing.assert_allclose(up.sdf[valid], pts[valid, 0], atol=1e-6)


# -- mesh -------------------------------------------------------------------


def test_extract_surface_analytic_sphere():
    center = np.array([0.0, 0.0, 0.0])
    radius = 0.1
    voxel_size = 0.01
    r = int(radius / voxel_size) + 6
    coords = np.stack(
        np.meshgrid(*([np.arange(-r, r + 1)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    g = make_grid(coords, voxel_size)
    pts = g.voxel_to_world()
    g.sdf = sphere_sdf(pts, center, radius).astype(np.float32)
    g.weight[:] = 1.0
    verts, faces, _ = extract_surface(g)
    assert len(verts) > 500
    rr = np.linalg.norm(verts - center, axis=-1)
    assert np.max(np.abs(rr - radius)) < voxel_size  # linear interp on exact sdf
    # orientation: face normals point outward
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    n = np.cross(e1, e2)
    c = verts[faces].mean(axis=1) - center
    outward = np.sum(n * c, axis=-1) > 0
    assert outward.mean() > 0.99


def test_extract_surface_watertight_edges():
    # on a closed surface every edge should be shared by exactly 2 faces
    center = np.zeros(3)
    radius = 0.05
    voxel_size = 0.01
    r = 12
    coords = np.stack(
        np.meshgrid(*([np.arange(-r, r + 1)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    g = make_grid(coords, voxel_size)
    pts = g.voxel_to_world()
    g.sdf = sphere_sdf(pts, center, radius).astype(np.float32)
    g.weight[:] = 1.0
    verts, faces, _ = extract_surface(g)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)


def test_remove_loose_components():
    # two spheres, one smaller → only larger survives
    voxel_size = 0.01
    r = 16
    coords = np.stack(
        np.meshgrid(*([np.arange(-r, r + 1)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    g = make_grid(coords, voxel_size)
    pts = g.voxel_to_world()
    s1 = sphere_sdf(pts, [-0.07, 0, 0], 0.05)
    s2 = sphere_sdf(pts, [0.08, 0, 0], 0.025)
    g.sdf = np.minimum(s1, s2).astype(np.float32)
    g.weight[:] = 1.0
    verts, faces, cols = extract_surface(g)
    v2, f2, _ = remove_loose_components(verts, faces, cols)
    assert len(v2) < len(verts)
    # all remaining vertices belong to the big sphere
    d1 = np.abs(np.linalg.norm(v2 - np.array([-0.07, 0, 0]), axis=-1) - 0.05)
    assert np.max(d1) < 2 * voxel_size


def test_upsample_prep_bitwise_and_prebuilt_sparsify_layout():
    """`alg.UpsamplePrep` (the coords-only boundary precompute overlapped
    with the solve) must be invisible: upsample results bitwise-equal with
    and without the prep, and `clear_voxels_outside_thin_shell` with the
    prep's prebuilt child BlockLayout keeps the exact same voxel set."""
    rng = np.random.default_rng(13)
    coords = np.unique(rng.integers(-6, 6, size=(500, 3)).astype(np.int64), axis=0)
    g = make_grid(coords.tolist(), voxel_size=0.01, sbr=True)
    n = g.num_voxels
    g.sdf = rng.normal(size=n).astype(np.float32) * 0.01
    g.weight = np.where(rng.random(n) < 0.8, rng.random(n) * 5, 0.0).astype(np.float32)
    g.color = rng.random((n, 3)).astype(np.float32)
    g.albedo = rng.random(n).astype(np.float32)
    g.sdf_refined = (rng.normal(size=n) * 0.01).astype(np.float32)

    prep = alg.UpsamplePrep(g)
    up_ref = alg.upsample(g)
    up_pre = alg.upsample(g, prep=prep)
    np.testing.assert_array_equal(up_pre.coords, up_ref.coords)
    for f in ("sdf", "weight", "color", "albedo", "sdf_refined"):
        np.testing.assert_array_equal(getattr(up_pre, f), getattr(up_ref, f), err_msg=f)

    # prebuilt sparsify layout (identity-checked) → identical voxel set
    assert prep.layout_for(up_ref) is None  # wrong grid object → refused
    lay = prep.layout_for(up_pre)
    assert lay is not None
    a = alg.clear_voxels_outside_thin_shell(up_pre, 0.008, layout=lay)
    b = alg.clear_voxels_outside_thin_shell(up_ref, 0.008, use_device=True)
    np.testing.assert_array_equal(a.coords, b.coords)
    np.testing.assert_array_equal(a.sdf_refined, b.sdf_refined)

    # a prep for a DIFFERENT grid object is ignored by upsample
    g2 = make_grid(coords.tolist(), voxel_size=0.01, sbr=True)
    g2.sdf_refined = g.sdf_refined.copy()
    g2.weight = g.weight.copy()
    up2 = alg.upsample(g2, prep=prep)
    np.testing.assert_array_equal(up2.coords, up_ref.coords)
