"""Block-dense problem form ≡ flat-table form (refine/blockform.py).

The block layout is a pure re-layout of the same energy: total cost, gradient,
exact Jacobi diagonal, and full GN iterations must match the table path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intrinsic3d_tpu.grid.blocks import BlockLayout
from intrinsic3d_tpu.refine import blockform
from intrinsic3d_tpu.refine.residuals import all_residuals
from intrinsic3d_tpu.refine.solver import gn_iteration, jtj_diag
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


@pytest.fixture(scope="module")
def block_problem(prob):
    asm, masks = prob.assemble()
    layout = BlockLayout.build(prob.grid, block=4)
    bparams, basm, bmasks = blockform.to_block_problem(
        layout, prob.topo.coords, asm, masks, prob.params
    )
    return layout, asm, masks, bparams, basm, bmasks


def test_roundtrip_params(prob, block_problem):
    layout, _, _, bparams, _, _ = block_problem
    back = blockform.params_from_block(layout, bparams)
    np.testing.assert_array_equal(np.asarray(back.sdf), np.asarray(prob.params.sdf))
    np.testing.assert_array_equal(
        np.asarray(back.albedo), np.asarray(prob.params.albedo)
    )


def test_cost_and_grad_match(prob, block_problem):
    layout, asm, _, bparams, basm, _ = block_problem

    def cost_t(p):
        r = all_residuals(p, asm)
        return 0.5 * jnp.sum(r * r)

    def cost_b(p):
        r = blockform.block_all_residuals(p, basm, masked=False)
        return 0.5 * jnp.sum(r * r)

    c_t, g_t = jax.value_and_grad(cost_t)(prob.params)
    c_b, g_b = jax.value_and_grad(cost_b)(bparams)
    assert np.isfinite(float(c_t)) and float(c_t) > 0.0
    np.testing.assert_allclose(float(c_b), float(c_t), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(blockform.dense_to_table(layout, g_b.sdf)),
        np.asarray(g_t.sdf),
        rtol=2e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(blockform.dense_to_table(layout, g_b.albedo)),
        np.asarray(g_t.albedo),
        rtol=2e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(g_b.poses), np.asarray(g_t.poses), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_b.intr), np.asarray(g_t.intr), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g_b.dist), np.asarray(g_t.dist), rtol=2e-4, atol=1e-6)


def test_jacobi_diag_matches(prob, block_problem):
    layout, asm, _, bparams, basm, _ = block_problem
    # block Jacobians sample through the Pallas bf16x3 kernel, the table
    # oracle in f32 — the diagonal (a preconditioner) tolerates the few-percent
    # quantization on near-zero entries
    d_t = jtj_diag(prob.params, asm)
    _, lin = blockform.linearize_block(bparams, basm)
    d_b = blockform.diag_from_lin(lin, basm)
    np.testing.assert_allclose(
        np.asarray(blockform.dense_to_table(layout, d_b.sdf)),
        np.asarray(d_t.sdf),
        rtol=5e-2,
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(blockform.dense_to_table(layout, d_b.albedo)),
        np.asarray(d_t.albedo),
        rtol=5e-2,
        atol=2e-3,
    )
    np.testing.assert_allclose(np.asarray(d_b.poses), np.asarray(d_t.poses), rtol=5e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d_b.intr), np.asarray(d_t.intr), rtol=5e-2)
    np.testing.assert_allclose(np.asarray(d_b.dist), np.asarray(d_t.dist), rtol=5e-2, atol=2e-3)
    # pad block slots carry zero diagonal (they are auto-fixed by the solver)
    assert float(jnp.sum(jnp.abs(d_b.sdf[-1]))) == 0.0


def test_gn_iteration_equivalent(prob, block_problem):
    layout, asm, masks, bparams, basm, bmasks = block_problem
    out_t = gn_iteration(prob.params, asm, masks, jnp.float32(1e-4), lm_steps=3, cg_iters=6)
    # exact-arithmetic equivalence oracle: disable the bf16 matvec default
    # (bf16-vs-f32 tracking is covered by test_bf16_matvec_convergence)
    out_b = gn_iteration(
        bparams, basm, bmasks, jnp.float32(1e-4), lm_steps=3, cg_iters=6,
        cg_coeff_dtype="float32",
    )
    p_t, c0_t, c1_t, _, tries_t = out_t
    p_b, c0_b, c1_b, _, tries_b = out_b
    np.testing.assert_allclose(float(c0_b), float(c0_t), rtol=1e-5)
    np.testing.assert_allclose(float(c1_b), float(c1_t), rtol=1e-3)
    assert float(c1_b) < float(c0_b)
    np.testing.assert_allclose(
        np.asarray(blockform.dense_to_table(layout, p_b.sdf)),
        np.asarray(p_t.sdf),
        rtol=5e-3,
        atol=5e-6,
    )
    np.testing.assert_allclose(
        np.asarray(p_b.poses), np.asarray(p_t.poses), rtol=5e-3, atol=5e-6
    )


def test_bf16_matvec_convergence(prob, block_problem):
    """The bf16 coefficient-field matvec (`cast_lin`, the gn_iteration
    default) must track the exact-f32 PCG over a multi-iteration GN
    trajectory: same accepts, matching costs, matching parameters. The
    gradient/diagonal stay f32 in both, so only the CG directions are
    perturbed (~2⁻⁸ relative on J's entries)."""
    _, _, _, bparams, basm, bmasks = block_problem

    def run(dtype):
        p, mu = bparams, jnp.float32(1e-4)
        costs = []
        for _ in range(3):
            p, c0, c1, mu, _ = gn_iteration(
                p, basm, bmasks, mu, lm_steps=3, cg_iters=6, cg_coeff_dtype=dtype
            )
            costs.append((float(c0), float(c1)))
        return p, costs

    p16, costs16 = run("bfloat16")
    p32, costs32 = run("float32")
    # the perturbed CG directions make the two LM TRAJECTORIES drift apart
    # over iterations (both legal descent paths; bf16 has measured slightly
    # LOWER final cost) — assert comparable convergence, not bit-tracking
    for (a0, a1), (b0, b1) in zip(costs16, costs32):
        np.testing.assert_allclose(a0, b0, rtol=1e-2)
        np.testing.assert_allclose(a1, b1, rtol=1e-2)
        assert a1 < a0
    np.testing.assert_allclose(
        np.asarray(p16.sdf), np.asarray(p32.sdf), rtol=5e-2, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(p16.poses), np.asarray(p32.poses), rtol=5e-2, atol=1e-4
    )
    # tight invariant that survives trajectory drift: where the paths END
    # must match — bf16 must reach a final cost within 0.1% of (or below)
    # the f32 final cost, so a real precision regression cannot hide inside
    # the loose parameter tolerances above
    assert costs16[-1][1] <= costs32[-1][1] * (1.0 + 1e-3), (costs16, costs32)


def test_handrolled_linearization(prob, block_problem):
    """jv/jtv must be an exact adjoint pair and match jax.linearize of the
    block residual stack; diag_from_lin must equal the autodiff Jacobi diag."""
    layout, asm, masks, bparams, basm, bmasks = block_problem
    cost0, lin = blockform.linearize_block(bparams, basm)

    # cost at the linearization point == forward stack norm
    r_stack = blockform.block_all_residuals(bparams, basm)
    np.testing.assert_allclose(
        float(cost0), float(0.5 * jnp.sum(r_stack * r_stack)), rtol=1e-5
    )

    rng = np.random.default_rng(0)
    v = bparams._replace(
        sdf=jnp.asarray(rng.normal(size=bparams.sdf.shape).astype(np.float32)),
        albedo=jnp.asarray(rng.normal(size=bparams.albedo.shape).astype(np.float32)),
        poses=jnp.asarray(rng.normal(size=bparams.poses.shape).astype(np.float32)),
        intr=jnp.asarray(rng.normal(size=(4,)).astype(np.float32)),
        dist=jnp.asarray(rng.normal(size=(5,)).astype(np.float32)),
    )
    y = blockform.jv_block(lin, basm, v)
    cot = tuple(jnp.asarray(rng.normal(size=t.shape).astype(np.float32)) for t in y)
    g = blockform.jtv_block(lin, basm, cot)
    lhs = sum(float(jnp.vdot(a, b)) for a, b in zip(y, cot))
    rhs = sum(float(jnp.vdot(a, b)) for a, b in zip(v, g))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3)

    # against autodiff of the block residual stack (E_g segment is dense
    # (obs, slot)-ordered, same as y_g)
    _, jlin = jax.linearize(
        lambda p: blockform.block_all_residuals(p, basm, masked=False), bparams
    )
    r_t = np.asarray(jlin(v))
    y_g, y_r, y_s, y_a = y
    m = int(np.prod(basm.eg_w.shape))
    act = np.asarray(basm.eg_w).reshape(-1) > 0
    got_eg = np.where(act, np.asarray(y_g).reshape(-1), 0.0)
    want_eg = np.where(act, r_t[:m], 0.0)
    # the production tangent samples through the Pallas bf16x3 kernel while
    # the oracle stack (masked=False) samples in f32 — allow the quantization
    np.testing.assert_allclose(got_eg, want_eg, rtol=2e-2, atol=8e-3)


def test_tall_images_multipass_window():
    """Images taller than one sampler window (H > 252 ⇒ 2 windowed passes)
    through the full masked block residual stack: must match the f32 XLA
    oracle within the bf16x3 sampler quantization."""
    tall = build_sphere_problem(
        voxel_size=0.02,
        image_size=(96, 320),
        num_frames=2,
        num_observations=2,
        perturb_sdf=0.002,
        perturb_albedo=0.05,
    )
    asm, masks = tall.assemble()
    layout = BlockLayout.build(tall.grid, block=4)
    bparams, basm, bmasks = blockform.to_block_problem(
        layout, tall.topo.coords, asm, masks, tall.params
    )
    r_pallas = np.asarray(blockform.block_all_residuals(bparams, basm, masked=True))
    r_oracle = np.asarray(blockform.block_all_residuals(bparams, basm, masked=False))
    np.testing.assert_allclose(r_pallas, r_oracle, atol=6e-3)

    # and a full GN step converges identically through the windowed vjp
    out_b = gn_iteration(bparams, basm, bmasks, jnp.float32(1e-4), lm_steps=3, cg_iters=6)
    out_t = gn_iteration(tall.params, asm, masks, jnp.float32(1e-4), lm_steps=3, cg_iters=6)
    np.testing.assert_allclose(float(out_b[2]), float(out_t[2]), rtol=1e-3)
