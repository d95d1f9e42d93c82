"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid
from intrinsic3d_tpu.grid.algorithms import correct_sdf, _correct_sdf_via_dense
from intrinsic3d_tpu.ops.pallas.distance_transform import correct_sdf_dense


def _random_grid(shape, density=0.6, seed=0):
    rng = np.random.default_rng(seed)
    sdf = rng.normal(0, 0.05, shape).astype(np.float32)
    w = (rng.uniform(size=shape) < density).astype(np.float32)
    return sdf, w


def _table_reference(dense_sdf, dense_w, voxel_size, iters):
    shape = dense_sdf.shape
    cc = np.argwhere(np.ones(shape, bool))
    g = VoxelGrid.from_coords(voxel_size, cc)
    g.sdf = dense_sdf[cc[:, 0], cc[:, 1], cc[:, 2]].astype(np.float32)
    g.weight = dense_w[cc[:, 0], cc[:, 1], cc[:, 2]].astype(np.float32)
    correct_sdf(g, num_iter=iters, dense=False)
    out = np.zeros(shape, np.float32)
    out[g.coords[:, 0], g.coords[:, 1], g.coords[:, 2]] = g.sdf
    wout = np.zeros(shape, np.float32)
    wout[g.coords[:, 0], g.coords[:, 1], g.coords[:, 2]] = g.weight
    return out, wout


def test_pallas_distance_transform_matches_table():
    sdf, w = _random_grid((20, 20, 20))
    ref_s, ref_w = _table_reference(sdf, w, 0.01, 10)
    out_s, out_w = correct_sdf_dense(
        jnp.asarray(sdf), jnp.asarray(w), 0.01, tile=8, iters=10, interpret=True
    )
    seen = w > 0
    np.testing.assert_allclose(np.asarray(out_s)[seen], ref_s[seen], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_w)[seen], ref_w[seen])


def test_pallas_distance_transform_slab_path():
    # Z > 128 exercises the overlapping-slab stitching
    sdf, w = _random_grid((8, 8, 140), density=0.5, seed=1)
    ref_s, _ = _table_reference(sdf, w, 0.01, 4)
    out_s, _ = correct_sdf_dense(
        jnp.asarray(sdf), jnp.asarray(w), 0.01, tile=8, iters=4, interpret=True
    )
    seen = w > 0
    np.testing.assert_allclose(np.asarray(out_s)[seen], ref_s[seen], atol=1e-6)


def test_correct_sdf_dense_wrapper_on_sparse_grid():
    rng = np.random.default_rng(2)
    cc = np.unique(rng.integers(0, 14, size=(600, 3)), axis=0)
    g = VoxelGrid.from_coords(0.01, cc)
    g.sdf = rng.normal(0, 0.05, g.num_voxels).astype(np.float32)
    g.weight = (rng.uniform(size=g.num_voxels) < 0.7).astype(np.float32)
    g2 = g.clone()
    correct_sdf(g, num_iter=6, dense=False)
    _correct_sdf_via_dense(g2, num_iter=6, interpret=True)
    np.testing.assert_allclose(g2.sdf, g.sdf, atol=1e-6)
    np.testing.assert_array_equal(g2.weight, g.weight)
