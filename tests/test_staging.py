"""Process-local staging (parallel/staging.py) — VERDICT r4 item 2.

Single-process pins: the staged arrays must carry exactly the sharding and
values the old `device_put(full_global_array, NamedSharding)` staging
produced, while being assembled from per-device local construction (the
multi-host-valid pattern). The real 2-process `jax.distributed` dryrun
(tools/dryrun_multiprocess.py) is opt-in via I3D_MP_DRYRUN=1 (it spawns
subprocesses and re-initializes jax backends; measured ~3 min on the CPU
container) and recorded in BENCH_NOTES.
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from intrinsic3d_tpu.parallel.sharding import make_mesh
from intrinsic3d_tpu.parallel.staging import (
    stage_replicated,
    stage_rows,
    stage_sliced,
    stage_table_rows,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(min(8, len(jax.devices())))


def test_stage_sliced_matches_device_put(mesh):
    n = mesh.devices.size
    x = np.arange(n * 4 * 6, dtype=np.float32).reshape(n * 4, 6)
    got = stage_sliced(mesh, P("data", None), x)
    want = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    assert got.sharding == want.sharding
    np.testing.assert_array_equal(np.asarray(got), x)
    # per-device shards are the contiguous row bricks
    for sh in got.addressable_shards:
        np.testing.assert_array_equal(np.asarray(sh.data), x[sh.index])


def test_stage_rows_builds_only_local_ranges(mesh):
    n = mesh.devices.size
    calls = []

    def build(lo, hi):
        calls.append((lo, hi))
        return np.full((hi - lo, 3), lo, np.float32)

    got = stage_rows(mesh, P("data", None), (n * 2, 3), np.float32, build)
    # one distinct range per device, covering the array exactly once
    assert sorted(calls) == [(2 * i, 2 * i + 2) for i in range(n)]
    vals = np.asarray(got)
    np.testing.assert_array_equal(vals[:, 0], np.repeat(np.arange(0, 2 * n, 2), 2))


def test_stage_rows_middle_dim(mesh):
    n = mesh.devices.size
    x = np.arange(3 * n * 2 * 5, dtype=np.int32).reshape(3, n * 2, 5)
    got = stage_sliced(mesh, P(None, "data", None), x, shard_dim=1)
    assert got.sharding == NamedSharding(mesh, P(None, "data", None))
    np.testing.assert_array_equal(np.asarray(got), x)


def test_stage_replicated(mesh):
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    got = stage_replicated(mesh, x)
    assert got.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(got), x)
    assert len(got.addressable_shards) == mesh.devices.size


def test_stage_table_rows_matches_densify(mesh):
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid

    rng = np.random.default_rng(3)
    coords = np.unique(rng.integers(0, 12, (400, 3)), axis=0)
    grid = VoxelGrid.from_coords(0.01, coords.astype(np.int64), 0.1, 2.0)
    layout = BlockLayout.build(grid, blocks_multiple=mesh.devices.size)
    vals = rng.normal(size=grid.num_voxels).astype(np.float32)

    got = stage_table_rows(mesh, P("data", None), layout, vals)
    nb, s = layout.num_blocks, layout.block**3
    want = np.zeros(nb * s, np.float32)
    want[layout.vox_slot] = vals
    np.testing.assert_array_equal(np.asarray(got), want.reshape(nb, s))

    # trailing channel dims ([N, 3] colors)
    vals3 = rng.normal(size=(grid.num_voxels, 3)).astype(np.float32)
    got3 = stage_table_rows(
        mesh, P("data", None, None), layout, vals3, trailing=(3,)
    )
    want3 = np.zeros((nb * s, 3), np.float32)
    want3[layout.vox_slot] = vals3
    np.testing.assert_array_equal(np.asarray(got3), want3.reshape(nb, s, 3))


@pytest.mark.skipif(
    os.environ.get("I3D_MP_DRYRUN", "") != "1",
    reason="opt-in: spawns 3 subprocesses with their own jax runtimes (~3 min)",
)
def test_two_process_dryrun():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "dryrun_multiprocess.py")],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1700,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "OK: 2-process" in out.stdout
