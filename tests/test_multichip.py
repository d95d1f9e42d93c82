"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsic3d_tpu.config import RefinementConfig
from intrinsic3d_tpu.parallel.sharding import make_mesh, shard_problem
from intrinsic3d_tpu.refine.solver import gn_iteration
from intrinsic3d_tpu.synthetic import build_sphere_problem


@pytest.fixture(scope="module")
def problem():
    cfg = RefinementConfig(num_observations=2, occlusion_distance=0.04)
    prob = build_sphere_problem(
        voxel_size=0.015,
        image_size=(64, 48),
        num_frames=2,
        num_observations=2,
        cfg=cfg,
        perturb_sdf=0.002,
        perturb_albedo=0.05,
    )
    asm, masks = prob.assemble()
    return prob, asm, masks


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_gn_step_matches_single_device(problem):
    prob, asm, masks = problem
    mu = jnp.float32(1e-4)

    ref = gn_iteration(prob.params, asm, masks, mu, 3, 4)
    ref_params, ref_c0, ref_c1 = ref[0], float(ref[1]), float(ref[2])
    assert ref_c1 < ref_c0

    mesh = make_mesh(8)
    with mesh:
        params_s, asm_s, masks_s = shard_problem(prob.params, asm, masks, mesh)
        out = gn_iteration(params_s, asm_s, masks_s, mu, 3, 4)
        jax.block_until_ready(out)
    c0, c1 = float(out[1]), float(out[2])

    # padded no-op rows must not change the cost
    np.testing.assert_allclose(c0, ref_c0, rtol=1e-5)
    # the solve is iterative/floating point — costs agree loosely, both
    # accepted. These rtol=2e-2 trajectory tolerances are deliberately loose
    # (the Schur default's Gram→Cholesky→PCG chain amplifies reduction-order
    # noise across relinearizations); the PHYSICAL end-state regression gate
    # that a 2% cost drift cannot fool is tests/test_mesh_golden.py (the full
    # sharded pipeline must meet the same mesh-error/pose bounds as the
    # single-device golden run).
    assert c1 < c0
    np.testing.assert_allclose(c1, ref_c1, rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out[0].sdf), np.asarray(ref_params.sdf), atol=5e-4
    )


def test_sharded_assembly_element_axes_divisible(problem):
    prob, asm, masks = problem
    mesh = make_mesh(8)
    _, asm_s, _ = shard_problem(prob.params, asm, masks, mesh)
    for name in ("eg_w", "er_w", "es_w", "ea_w"):
        assert getattr(asm_s, name).shape[0] % 8 == 0


def test_sharded_block_gn_step_matches_single_device(problem):
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.parallel.sharding import shard_block_problem
    from intrinsic3d_tpu.refine.blockform import to_block_problem

    prob, asm, masks = problem
    mu = jnp.float32(1e-4)
    layout = BlockLayout.build(prob.grid)
    bp, basm, bm = to_block_problem(
        layout, prob.topo.coords, asm, masks, prob.params, num_obs=2
    )

    ref = gn_iteration(bp, basm, bm, mu, 3, 4)
    ref_params, ref_c0, ref_c1 = ref[0], float(ref[1]), float(ref[2])
    assert ref_c1 < ref_c0

    mesh = make_mesh(8)
    with mesh:
        bp_s, basm_s, bm_s = shard_block_problem(bp, basm, bm, mesh)
        out = gn_iteration(bp_s, basm_s, bm_s, mu, 3, 4)
        jax.block_until_ready(out)
    c0, c1 = float(out[1]), float(out[2])
    np.testing.assert_allclose(c0, ref_c0, rtol=1e-5)
    assert c1 < c0
    np.testing.assert_allclose(c1, ref_c1, rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out[0].sdf), np.asarray(ref_params.sdf), atol=5e-4
    )


def test_windowed_sampler_under_shard_map():
    """The frame-windowed Pallas sampler runs PER-SHARD under shard_map with
    elements sharded along the slot axis and images replicated — the wrapper
    pattern real multi-chip SPMD needs (ARCHITECTURE.md 'Known limitation');
    values and gradients must match the unsharded call."""
    import jax
    from functools import partial
    from jax.sharding import Mesh, PartitionSpec as P

    from intrinsic3d_tpu.ops.pallas.bicubic import CHUNK
    from intrinsic3d_tpu.parallel.sharding import make_mesh
    from intrinsic3d_tpu.refine.residuals import catrom_sample_frames

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    k, h, w = 2, 40, 48
    d = 8 * 2 * CHUNK  # per-shard slot count stays CHUNK-aligned
    images = jnp.asarray(rng.random((k, h, w), dtype=np.float32))
    x = jnp.asarray(rng.uniform(0.0, w, (k, d)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.0, h, (k, d)).astype(np.float32))
    fid = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[:, None], (k, d))
    act = jnp.asarray((rng.random((k, d)) < 0.4).astype(np.float32))

    def sample(images, fid, x, y, act):
        return catrom_sample_frames(images, fid, x, y, active=act, frame_major=True)

    sharded = jax.jit(
        jax.shard_map(
            sample,
            mesh=mesh,
            in_specs=(P(), P(None, "data"), P(None, "data"), P(None, "data"), P(None, "data")),
            out_specs=P(None, "data"),
            # pallas_call out_shapes carry no varying-mesh-axes annotation
            check_vma=False,
        )
    )
    got = np.asarray(sharded(images, fid, x, y, act))
    want = np.asarray(sample(images, fid, x, y, act))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # gradients flow through the per-shard custom_vjp identically
    def loss(f):
        return lambda xy: jnp.sum(jnp.sin(f(images, fid, xy[0], xy[1], act)) * act)

    gs = jax.grad(loss(lambda *a: sharded(*a)))((x, y))
    gu = jax.grad(loss(sample))((x, y))
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gu[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gu[1]), atol=1e-5)


def test_halo_plan_round_trip():
    """Exchange tables: every remote row a device's stencil needs is shipped
    by some ppermute shift and lands at its remapped ext index."""
    from intrinsic3d_tpu.parallel.halo import build_halo_plan

    rng = np.random.default_rng(0)
    nb, n = 32, 4
    m = nb // n
    # random neighbor table incl. the pad row nb
    t = rng.integers(0, nb + 1, (5, nb)).astype(np.int64)
    hp = build_halo_plan(nb, n, [t])
    field = rng.normal(size=(nb + 1, 3))
    field[nb] = 0.0  # pad row

    # emulate the per-shift ppermute exchange on each device p
    for p in range(n):
        local = field[p * m : (p + 1) * m]
        pools = []
        for shift, tbl in zip(hp.shifts, hp.send):
            q = (p - shift) % n  # source whose shipment lands on p
            src = tbl[q]
            srcg = np.where(src == m, nb, src + q * m)
            pools.append(field[srcg])
        ext = np.concatenate([local] + pools + [field[nb : nb + 1]])
        want = field[t[:, p * m : (p + 1) * m]]
        got = ext[hp.nbr_local[0][p]]
        np.testing.assert_array_equal(got, want)


def test_spmd_spatial_sharding_matches_single_device(problem):
    """The manual-SPMD spatially-sharded GN iteration (bricked parameters,
    halo exchange, per-shard Pallas sampler, psum'd globals) reproduces the
    single-device block solve."""
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.parallel.spmd import spmd_gn_iteration
    from intrinsic3d_tpu.refine.blockform import to_block_problem

    prob, asm, masks = problem
    mu = jnp.float32(1e-4)
    layout = BlockLayout.build(prob.grid, blocks_multiple=8)
    bp, basm, bm = to_block_problem(
        layout, prob.topo.coords, asm, masks, prob.params, num_obs=2
    )

    ref = gn_iteration(bp, basm, bm, mu, 3, 4)
    ref_params, ref_c0, ref_c1 = ref[0], float(ref[1]), float(ref[2])

    mesh = make_mesh(8)
    out = spmd_gn_iteration(bp, basm, bm, mu, layout, mesh, lm_steps=3, cg_iters=4)
    c0, c1 = float(out[1]), float(out[2])
    np.testing.assert_allclose(c0, ref_c0, rtol=1e-5)
    assert c1 < c0
    np.testing.assert_allclose(c1, ref_c1, rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out[0].sdf), np.asarray(ref_params.sdf), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out[0].albedo), np.asarray(ref_params.albedo), atol=5e-4
    )


def test_optimize_level_spmd_matches_single_device(problem):
    """The PRODUCTION outer loop under a mesh (`optimize_level(mesh=...)`):
    per-iteration device assembly + damped GN both run inside the sharded
    region (parallel/spmd.py::SpmdLevel, plans/jit built once per level);
    per-iteration costs and final parameters match the single-device path
    for both the dense and the frame-bucketed element layouts."""
    import dataclasses

    from intrinsic3d_tpu.refine.optimizer import optimize_level

    prob, _, _ = problem
    mesh = make_mesh(8)
    for mode in ("never", "always"):
        # joint solver here: this test pins the SHARDING machinery tightly;
        # the Schur default's SPMD equivalence (looser — its Gram/Cholesky
        # chain amplifies psum reduction-order noise across
        # relinearizations) is pinned by tests/test_schur.py
        cfg = dataclasses.replace(
            prob.cfg, iterations=2, lm_steps=6, frame_bucketing=mode,
            lambda_r0=20.0, lambda_r1=20.0, lambda_s0=20.0, lambda_s1=20.0,
            schur_globals=False,
        )
        args = (
            prob.grid, prob.topo, prob.params, cfg, prob.cam,
            prob.depths, prob.images, prob.voxel_sh, prob.thres_shell,
        )
        p_ref, _, st_ref = optimize_level(*args, rgbd_level=0)
        p_spmd, _, st_spmd = optimize_level(*args, rgbd_level=0, mesh=mesh)
        np.testing.assert_allclose(
            st_spmd.costs_before, st_ref.costs_before, rtol=1e-4, err_msg=mode
        )
        np.testing.assert_allclose(
            st_spmd.costs_after, st_ref.costs_after, rtol=1e-3, err_msg=mode
        )
        np.testing.assert_allclose(
            np.asarray(p_spmd.sdf), np.asarray(p_ref.sdf), atol=5e-4, err_msg=mode
        )
        np.testing.assert_allclose(
            np.asarray(p_spmd.albedo), np.asarray(p_ref.albedo), atol=5e-4, err_msg=mode
        )


def test_spmd_placed_parameter_memory_is_brick(problem):
    """Measured (not plan-arithmetic) per-device bytes of the placed SPMD
    problem: every voxel-shaped parameter and element array holds 1/n of the
    global bytes per device — spatial sharding actually divides memory."""
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.refine.blockform import to_block_problem
    from intrinsic3d_tpu.refine.device_assembly import build_level_static
    from intrinsic3d_tpu.parallel.spmd import SpmdLevel

    prob, asm, masks = problem
    layout = BlockLayout.build(prob.grid, blocks_multiple=8)
    bp, basm, bm = to_block_problem(
        layout, prob.topo.coords, asm, masks, prob.params, num_obs=2
    )
    mesh = make_mesh(8)
    st = build_level_static(layout, prob.grid, prob.topo, prob.voxel_sh)
    cfgp = prob.cfg
    level = SpmdLevel(
        mesh, layout, st, prob.depths, prob.images,
        num_obs=2, width=int(prob.images.shape[2]), height=int(prob.images.shape[1]),
        pyr_scale=1.0, voxel_size=prob.grid.voxel_size,
        truncation=prob.grid.truncation, thres_shell=prob.thres_shell,
        occlusion_distance=cfgp.occlusion_distance,
        fix_poses=False, fix_intrinsics=False, fix_distortion=False,
        use_albedo=True, lm_steps=3, cg_iters=4,
    )
    bp_s = level.begin(bp)

    def shard_bytes(x):
        shards = x.addressable_shards
        per = [s.data.size * s.data.dtype.itemsize for s in shards]
        return max(per), x.size * x.dtype.itemsize

    for arr in (bp_s.sdf, bp_s.albedo, *level._stat[:2], level._stat[3]):
        per, total = shard_bytes(arr)
        assert per * 8 <= total * 1.01, (per, total)
    """Per-device parameter memory under spatial sharding at realistic
    scale: a brick plus a halo surface — far below replication (the VERDICT
    §4 done-bound replicated/4 at n=8). Plan-only (host numpy): a spherical
    shell of ~2.4k blocks, the shape of a real fused scene."""
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid
    from intrinsic3d_tpu.parallel.spmd import make_sharded_plans
    from intrinsic3d_tpu.refine.blockform import layout_plans

    # shell of 8³ blocks on a sphere surface: block coords at radius ~14
    r = np.arange(-16, 17)
    X, Y, Z = np.meshgrid(r, r, r, indexing="ij")
    bc = np.stack([X, Y, Z], -1).reshape(-1, 3)
    keep = np.abs(np.linalg.norm(bc, axis=1) - 14.0) < 1.3
    bc = bc[keep]
    # one voxel per block is enough to activate the block
    coords = (bc * 8).astype(np.int32)
    grid = VoxelGrid.from_coords(0.004, coords)
    layout = BlockLayout.build(grid, blocks_multiple=8)
    sdf_plan, alb_plan = layout_plans(layout)
    hp, _ = make_sharded_plans(layout, (sdf_plan, alb_plan), 8)
    nb = layout.num_blocks
    per_device_rows = hp.m + hp.pool_rows  # brick + actual halo pools
    assert nb > 2000
    assert per_device_rows < nb / 4, (per_device_rows, nb, hp.shifts, hp.hs)
