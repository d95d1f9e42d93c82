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
    # the solve is iterative/floating point — costs agree loosely, both accepted
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
