"""Table-driven marching cubes: table invariants, watertightness/orientation,
accuracy against an analytic sphere, parity with the tet extractor, and the
mesh-metrics tooling itself."""

import numpy as np
import pytest

from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid
from intrinsic3d_tpu.mesh.extract import extract_surface, extract_surface_tet
from intrinsic3d_tpu.mesh.marching_cubes import (
    CUBE_EDGES,
    EDGE_TABLE,
    TRI_TABLE,
    extract_surface_mc,
)
from intrinsic3d_tpu.mesh.metrics import (
    chamfer_distance,
    mesh_error_vs_analytic,
    point_to_mesh_distance,
    sample_surface,
)


def make_sphere_grid(voxel_size=0.01, radius=0.12, shell=5.0):
    rng = np.arange(-20, 21)
    X, Y, Z = np.meshgrid(rng, rng, rng, indexing="ij")
    coords = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.int32)
    sdf = np.linalg.norm(coords * voxel_size, axis=1) - radius
    keep = np.abs(sdf) < shell * voxel_size
    grid = VoxelGrid.from_coords(voxel_size, coords[keep])
    gp = grid.coords * voxel_size
    grid.sdf[:] = (np.linalg.norm(gp, axis=1) - radius).astype(np.float32)
    grid.weight[:] = 1.0
    grid.color[:] = np.abs(gp) * 800.0
    return grid, radius


def mesh_edges(faces):
    return np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])


class TestTables:
    def test_shape_and_empty_cases(self):
        # classic MC: at most 5 triangles per cube
        assert TRI_TABLE.shape == (256, 5, 3)
        assert (TRI_TABLE[0] == -1).all() and (TRI_TABLE[255] == -1).all()

    def test_complement_symmetry_edge_sets(self):
        # a case and its complement cut the same edges
        for case in range(256):
            assert EDGE_TABLE[case] == EDGE_TABLE[255 - case]

    def test_crossing_edges_match_sign_changes(self):
        for case in range(256):
            inside = [(case >> i) & 1 for i in range(8)]
            for e, (a, b) in enumerate(CUBE_EDGES):
                crossing = inside[a] != inside[b]
                used = bool(EDGE_TABLE[case] & (1 << e))
                assert used == crossing, (case, e)

    def test_tri_edges_are_crossing_edges(self):
        for case in range(256):
            tris = TRI_TABLE[case]
            for tri in tris:
                for e in tri:
                    if e >= 0:
                        assert EDGE_TABLE[case] & (1 << e)

    def test_per_cube_loops_closed(self):
        # within one cube the triangle fan's boundary is exactly the loop:
        # every internal directed edge appears once with its reverse also once,
        # making each case's patch orientable and boundary = crossing loop
        for case in range(1, 255):
            tris = TRI_TABLE[case]
            tris = tris[tris[:, 0] >= 0]
            de = {}
            for tri in tris:
                for k in range(3):
                    key = (tri[k], tri[(k + 1) % 3])
                    de[key] = de.get(key, 0) + 1
            # no directed edge repeats within a cube's patch
            assert max(de.values()) == 1, case


class TestExtraction:
    @pytest.fixture(scope="class")
    def sphere(self):
        grid, radius = make_sphere_grid()
        v, f, c = extract_surface_mc(grid)
        return grid, radius, v, f, c

    def test_watertight_and_oriented(self, sphere):
        _, _, v, f, _ = sphere
        assert len(f) > 1000
        e = mesh_edges(f)
        _, cnt = np.unique(np.sort(e, axis=1), axis=0, return_counts=True)
        assert (cnt == 2).all()  # closed surface, no cracks
        _, cnt_d = np.unique(e, axis=0, return_counts=True)
        assert cnt_d.max() == 1  # consistent winding

    def test_outward_normals_and_accuracy(self, sphere):
        _, radius, v, f, _ = sphere
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        ctr = v[f].mean(axis=1)
        assert ((n * ctr).sum(1) > 0).all()
        err = np.abs(np.linalg.norm(v, axis=1) - radius)
        assert err.max() < 1e-4  # linear interp of an exact SDF

    def test_colors_interpolated(self, sphere):
        grid, _, v, f, c = sphere
        expect = np.abs(v) * 800.0
        assert np.abs(c.astype(np.float64) - expect).max() < 16.0

    def test_random_sdf_watertight(self):
        # random signs hit every ambiguous-face configuration; watertightness
        # must hold by construction (where all cubes are active)
        rng = np.arange(0, 10)
        X, Y, Z = np.meshgrid(rng, rng, rng, indexing="ij")
        coords = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.int32)
        grid = VoxelGrid.from_coords(0.01, coords)
        r = np.random.default_rng(7)
        grid.sdf[:] = r.normal(0, 1, grid.num_voxels).astype(np.float32)
        grid.weight[:] = 1.0
        v, f, _ = extract_surface_mc(grid)
        e = mesh_edges(f)
        _, cnt = np.unique(np.sort(e, axis=1), axis=0, return_counts=True)
        # interior edges shared twice; edges on the open boundary of the
        # active region appear once
        interior = v[e].mean(axis=1)
        lo, hi = 0.01 * 0.5, 0.01 * 8.5
        core = np.all((interior > lo) & (interior < hi), axis=-1)
        e_core = np.sort(e[core], axis=1)
        _, cnt = np.unique(e_core, axis=0, return_counts=True)
        assert (cnt <= 2).all()
        _, cnt_d = np.unique(e[core], axis=0, return_counts=True)
        assert cnt_d.max() == 1

    def test_parity_with_tets(self, sphere):
        grid, radius, v, f, _ = sphere
        vt, ft, _ = extract_surface_tet(grid)
        res = chamfer_distance(v, f, vt, ft, num_samples=4000, seed=0)
        # both extractors linearly interpolate the same SDF: surfaces agree
        # to well under a voxel
        assert res["symmetric_mean"] < 0.2 * grid.voxel_size
        assert res["a_to_b"]["max"] < grid.voxel_size

    def test_default_method_is_mc(self, sphere):
        grid, _, v, f, _ = sphere
        v2, f2, _ = extract_surface(grid)
        assert len(v2) == len(v) and len(f2) == len(f)


class TestMetrics:
    def test_point_to_mesh_exact_on_cube(self):
        # unit cube surface out of 12 triangles
        v = np.array(
            [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)], float
        )
        quads = [
            (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
            (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
        ]
        f = []
        for a, b, c, d in quads:
            f += [(a, b, c), (a, c, d)]
        f = np.array(f)
        pts = np.array([
            [0.5, 0.5, 0.5],   # center: 0.5 from faces
            [0.5, 0.5, 2.0],   # above top: 1.0
            [2.0, 2.0, 0.5],   # outside an edge: sqrt(2)
            [2.0, 2.0, 2.0],   # outside a corner: sqrt(3)
        ])
        d = point_to_mesh_distance(pts, v, f, k=12)
        np.testing.assert_allclose(
            d, [0.5, 1.0, np.sqrt(2.0), np.sqrt(3.0)], atol=1e-12
        )

    def test_sample_surface_on_mesh(self):
        grid, radius = make_sphere_grid()
        v, f, _ = extract_surface_mc(grid)
        pts = sample_surface(v, f, 2000, seed=1)
        d = point_to_mesh_distance(pts, v, f)
        # samples lie on the mesh; the k-candidate search is approximate, so
        # demand exactness for the bulk and near-voxel accuracy for the tail
        assert np.percentile(d, 99) < 1e-9
        assert d.max() < 0.1 * grid.voxel_size

    def test_mesh_error_vs_analytic(self):
        grid, radius = make_sphere_grid()
        v, f, _ = extract_surface_mc(grid)
        res = mesh_error_vs_analytic(
            v, f, lambda p: np.linalg.norm(p, axis=-1) - radius, num_samples=5000
        )
        assert res["rms"] < 0.05 * grid.voxel_size
