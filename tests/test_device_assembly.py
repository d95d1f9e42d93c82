"""Device-resident assembly ≡ host assembly + table→block conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intrinsic3d_tpu.grid.blocks import BlockLayout
from intrinsic3d_tpu.refine import blockform
from intrinsic3d_tpu.refine.device_assembly import build_level_static, device_assembly
from intrinsic3d_tpu.refine.solver import gn_iteration
from intrinsic3d_tpu.synthetic import build_sphere_problem


@pytest.fixture(scope="module")
def prob():
    return build_sphere_problem(
        voxel_size=0.02,
        image_size=(64, 48),
        num_frames=2,
        num_observations=2,
        perturb_sdf=0.002,
        perturb_albedo=0.05,
    )


def test_device_assembly_matches_host(prob):
    asm_t, masks_t = prob.assemble()
    layout = BlockLayout.build(prob.grid)
    bp, basm_h, bm_h = blockform.to_block_problem(
        layout, prob.topo.coords, asm_t, masks_t, prob.params, num_obs=2
    )

    st = build_level_static(layout, prob.grid, prob.topo, prob.voxel_sh)
    sdf_plan, alb_plan = blockform.layout_plans(layout)
    cfg = prob.cfg
    basm_d, bm_d = device_assembly(
        st,
        sdf_plan,
        alb_plan,
        bp,
        prob.depths,
        prob.images,
        jnp.float32(1.0),
        jnp.float32(prob.grid.voxel_size),
        jnp.float32(prob.grid.truncation),
        jnp.float32(prob.thres_shell),
        jnp.float32(cfg.occlusion_distance),
        jnp.asarray([cfg.lambda_g, 10.0, 10.0, cfg.lambda_a], jnp.float32),
        num_obs=2,
        width=prob.images.shape[2],
        height=prob.images.shape[1],
    )

    np.testing.assert_allclose(np.asarray(basm_d.lam), np.asarray(basm_h.lam), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(basm_d.er_w), np.asarray(basm_h.er_w))
    np.testing.assert_allclose(np.asarray(basm_d.es_w), np.asarray(basm_h.es_w))
    np.testing.assert_allclose(np.asarray(basm_d.es_ref), np.asarray(basm_h.es_ref))
    np.testing.assert_allclose(np.asarray(basm_d.ea_w), np.asarray(basm_h.ea_w), rtol=1e-6)
    # E_g weights: same per-slot multiset (obs ranking order may permute ties)
    np.testing.assert_allclose(
        np.sort(np.asarray(basm_d.eg_w), axis=0),
        np.sort(np.asarray(basm_h.eg_w), axis=0),
        rtol=1e-5,
        atol=1e-7,
    )
    np.testing.assert_allclose(np.asarray(bm_d.sdf), np.asarray(bm_h.sdf))
    np.testing.assert_allclose(np.asarray(bm_d.albedo), np.asarray(bm_h.albedo))

    # identical energy at the linearization point and equivalent GN step
    c_h, _ = blockform.linearize_block(bp, basm_h)
    c_d, _ = blockform.linearize_block(bp, basm_d)
    np.testing.assert_allclose(float(c_d), float(c_h), rtol=1e-5)

    out_h = gn_iteration(bp, basm_h, bm_h, jnp.float32(1e-4), lm_steps=3, cg_iters=6)
    out_d = gn_iteration(bp, basm_d, bm_d, jnp.float32(1e-4), lm_steps=3, cg_iters=6)
    np.testing.assert_allclose(float(out_d[2]), float(out_h[2]), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out_d[0].sdf), np.asarray(out_h[0].sdf), rtol=5e-3, atol=5e-6
    )


def test_device_assembly_frozen_albedo(prob):
    """lambda_a < 0 fixes albedo (``optimizer.cpp:330-334``): the GN step
    must leave albedo bit-identical while still reducing the cost."""
    layout = BlockLayout.build(prob.grid)
    st = build_level_static(layout, prob.grid, prob.topo, prob.voxel_sh)
    sdf_plan, alb_plan = blockform.layout_plans(layout)
    bp = prob.params._replace(
        sdf=blockform.table_to_dense(layout, prob.params.sdf),
        albedo=blockform.table_to_dense(layout, prob.params.albedo),
    )
    cfg = prob.cfg
    basm, bm = device_assembly(
        st,
        sdf_plan,
        alb_plan,
        bp,
        prob.depths,
        prob.images,
        jnp.float32(1.0),
        jnp.float32(prob.grid.voxel_size),
        jnp.float32(prob.grid.truncation),
        jnp.float32(prob.thres_shell),
        jnp.float32(cfg.occlusion_distance),
        jnp.asarray([cfg.lambda_g, 10.0, 10.0, -1.0], jnp.float32),
        num_obs=2,
        width=prob.images.shape[2],
        height=prob.images.shape[1],
        use_albedo=False,
    )
    assert float(jnp.sum(jnp.abs(bm.albedo))) == 0.0  # albedo mask all-fixed
    assert float(basm.lam[3]) == 0.0  # negative lambda_a contributes no E_a
    out = gn_iteration(bp, basm, bm, jnp.float32(1e-4), lm_steps=3, cg_iters=6)
    p1, c0, c1, _, _ = out
    assert float(c1) < float(c0)
    np.testing.assert_array_equal(np.asarray(p1.albedo), np.asarray(bp.albedo))
