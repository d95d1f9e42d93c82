"""Block-dense layout tests: transport roundtrip, halo correctness, and
stencil equivalence with the gather-table operators."""

import numpy as np
import jax.numpy as jnp

from intrinsic3d_tpu.grid.blocks import BlockLayout, block_laplacian
from intrinsic3d_tpu.grid import ops as gops
from intrinsic3d_tpu.grid.voxel_grid import RING6_OFFSETS, VoxelGrid


def random_grid(n=4000, span=40, seed=0):
    rng = np.random.default_rng(seed)
    cc = np.unique(rng.integers(-span, span, size=(n, 3)), axis=0)
    g = VoxelGrid.from_coords(0.01, cc)
    g.sdf = rng.normal(0, 0.05, g.num_voxels).astype(np.float32)
    g.weight[:] = 1.0
    return g


def test_transport_roundtrip():
    g = random_grid()
    layout = BlockLayout.build(g, block=8)
    d = layout.to_dense(jnp.asarray(g.sdf))
    back = np.asarray(layout.from_dense(d))
    np.testing.assert_array_equal(back, g.sdf)
    # empty slots hold zeros
    occ = np.asarray(layout.occupancy_dense()).reshape(-1)
    dflat = np.asarray(d).reshape(-1)
    assert np.all(dflat[~occ] == 0.0)


def test_halo_matches_neighbor_lookup():
    g = random_grid(seed=1)
    layout = BlockLayout.build(g, block=8, lo=1, hi=2)
    d = layout.to_dense(jnp.asarray(g.sdf))
    h = layout.halo(d, fill=np.nan)
    # for a set of offsets, shifted slices must equal the table gather
    for off in [(1, 0, 0), (-1, 0, 0), (0, 2, 0), (0, 0, -1), (2, 0, 0), (1, 1, 1)]:
        idx = g.neighbor_table(np.asarray([off], np.int32))[:, 0]
        expected = np.where(idx >= 0, g.sdf[np.maximum(idx, 0)], 0.0)
        got = np.asarray(layout.from_dense(layout.shifted(h, off)))
        # shifted halo gives 0/nan for absent-block cells and 0 for
        # present-but-empty slots; compare where the table has the neighbor
        present = idx >= 0
        np.testing.assert_allclose(got[present], expected[present], atol=0)
        # where the neighbor voxel doesn't exist, the slot must not hold data
        absent_vals = got[~present]
        assert np.all(np.isnan(absent_vals) | (absent_vals == 0.0))


def test_block_laplacian_matches_table():
    g = random_grid(seed=2)
    layout = BlockLayout.build(g, block=8)
    ring = g.neighbor_table(RING6_OFFSETS)
    ref = np.asarray(gops.laplacian(jnp.asarray(g.sdf), jnp.asarray(ring)))
    got = np.asarray(block_laplacian(layout, jnp.asarray(g.sdf)))
    np.testing.assert_allclose(got, ref, atol=1e-6)
