"""A/B harness: joint Jacobi-PCG vs Schur-complement-reduced global block.

SURVEY §7.1/§5.8 prescribe eliminating the small dense global block
{poses 6K, intrinsics 4, distortion 5} from the PCG (the reference's Ceres
runs joint CGNR instead, ``nls_solver.cpp:305-307``); round 3's roofline
named "fewer CG steps" the top remaining lever. This measures, at a chosen
problem scale and keyframe count:

1. per-CG-step TRUE COST of the candidate step each formulation has built so
   far (reduced candidates include the back-substituted globals) — the
   honest apples-to-apples convergence metric, since the two systems'
   residual norms live in different spaces;
2. the relative-residual history of each system in its own norm (the
   η=0.1 / η=0.01 exit steps);
3. production wall-clock: full `gn_iteration` outer iterations at the
   production budget (cg=12, bf16 coefficients), joint vs
   `schur_globals=True`.

Usage:
    python tools/bench_schur_ab.py [--frames 8] [--voxel 0.004]
        [--size 320x240] [--steps 16] [--cpu] [--mu 1e-4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--voxel", type=float, default=0.004)
    ap.add_argument("--size", default="320x240")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--mu", type=float, default=1e-4)
    ap.add_argument("--iters", type=int, default=3, help="wall-clock outer iterations")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from intrinsic3d_tpu.config import RefinementConfig
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.refine import blockform
    from intrinsic3d_tpu.refine.blockform import to_block_problem
    from intrinsic3d_tpu.refine.solver import Params, gn_iteration, residual_stack
    from intrinsic3d_tpu.synthetic import build_sphere_problem

    cfg = RefinementConfig(
        num_observations=5,
        occlusion_distance=0.02,
        fix_poses=False,
        fix_intrinsics=False,
        fix_distortion=False,
    )
    prob = build_sphere_problem(
        voxel_size=args.voxel,
        image_size=(w, h),
        num_frames=args.frames,
        num_observations=5,
        cfg=cfg,
        perturb_sdf=0.001,
        perturb_albedo=0.03,
    )
    layout = BlockLayout.build(prob.grid)
    asm_t, masks_t = prob.assemble()
    bp, basm, bm = to_block_problem(
        layout, prob.topo.coords, asm_t, masks_t, prob.params, num_obs=5
    )
    k = args.frames
    mu = float(args.mu)
    print(
        f"problem: {prob.grid.num_voxels} voxels, K={k}, "
        f"{layout.num_blocks} blocks, mu={mu}",
        file=sys.stderr,
    )

    # --- convergence probe (f32 coefficients, explicit CG loops) ------------
    @jax.jit
    def _linearize(bp):
        cost0, lin = blockform.linearize_block(bp, basm)
        grad = blockform.jtv_block(lin, basm, (lin.r0_g, lin.r0_r, lin.r0_s, lin.r0_a))
        diag = blockform.diag_from_lin(lin, basm)
        return cost0, lin, grad, diag

    cost0, lin, grad, diag = _linearize(bp)
    masks = Params(*(m * (d > 0.0) for m, d in zip(bm, diag)))
    b = Params(*(mi * -gi for mi, gi in zip(masks, grad)))

    zerog = (
        jnp.zeros_like(bp.poses),
        jnp.zeros_like(bp.intr),
        jnp.zeros_like(bp.dist),
    )

    def joint_matvec(v):
        vm = Params(*(mi * vi for mi, vi in zip(masks, v)))
        y = blockform.jv_block(lin, basm, vm)
        jj = blockform.jtv_block(lin, basm, y)
        return Params(
            *(
                mi * (h_ + mu * d * vi) + (1.0 - mi) * vo
                for h_, d, vi, mi, vo in zip(jj, diag, vm, masks, v)
            )
        )

    def tdot(a, bb):
        return sum(jnp.vdot(x, y) for x, y in zip(a, bb))

    C = blockform.global_gram(lin)
    mg = blockform.flatten_globals(masks.poses, masks.intr, masks.dist)
    dg = blockform.flatten_globals(diag.poses, diag.intr, diag.dist)
    bg = blockform.flatten_globals(b.poses, b.intr, b.dist)
    Ct = mg[:, None] * (C + mu * jnp.diag(dg)) * mg[None, :]
    Ct = Ct + jnp.diag(jnp.where(mg > 0.0, 1e-12, 1.0))
    chol_g = jnp.linalg.cholesky(Ct)

    def csolve(z):
        import jax.scipy.linalg as jsl

        u = jsl.solve_triangular(chol_g, (mg * z)[:, None], lower=True)
        u = jsl.solve_triangular(chol_g.T, u, lower=False)
        return mg * u[:, 0]

    def reduced_matvec(v2):
        vs = masks.sdf * v2[0]
        va = masks.albedo * v2[1]
        y_g, y_r, y_s, y_a = blockform.jv_block(lin, basm, Params(vs, va, *zerog), include_globals=False)
        z = blockform.flatten_globals(*blockform.jgt_apply(lin, y_g))
        up, ui, ud = blockform.unflatten_globals(csolve(z), k)
        y_g2 = y_g - blockform.jg_apply(lin, up, ui, ud)
        out = blockform.jtv_block(lin, basm, (y_g2, y_r, y_s, y_a), include_globals=False)
        return (
            masks.sdf * (out.sdf + mu * diag.sdf * vs) + (1.0 - masks.sdf) * v2[0],
            masks.albedo * (out.albedo + mu * diag.albedo * va)
            + (1.0 - masks.albedo) * v2[1],
        )

    y0 = blockform.jg_apply(lin, *blockform.unflatten_globals(csolve(bg), k))
    corr = blockform.jtv_block(
        lin,
        basm,
        (y0, jnp.zeros_like(lin.r0_r), jnp.zeros_like(lin.r0_s), jnp.zeros_like(lin.r0_a)),
        include_globals=False,
    )
    b2 = (masks.sdf * (b.sdf - corr.sdf), masks.albedo * (b.albedo - corr.albedo))

    @jax.jit
    def true_cost(cand):
        r = residual_stack(cand, basm)
        return 0.5 * jnp.sum(r * r)

    def jacobi(keys):
        def p(r):
            out = []
            for ri, di, mi in zip(r, [getattr(diag, kk) for kk in keys], [getattr(masks, kk) for kk in keys]):
                out.append(mi * ri / (di * (1.0 + mu) + 1e-12) + (1.0 - mi) * ri)
            return tuple(out)

        return p

    def run_cg(matvec, precond, rhs, steps, cand_of):
        x = tuple(jnp.zeros_like(v) for v in rhs)
        r = rhs
        z = precond(r)
        p = z
        rz = tdot(r, z)
        rr0 = tdot(rhs, rhs)
        hist = []
        for _ in range(steps):
            ap_ = matvec(p)
            alpha = rz / jnp.maximum(tdot(p, ap_), 1e-30)
            x = tuple(xi + alpha * pi for xi, pi in zip(x, p))
            r = tuple(ri - alpha * api for ri, api in zip(r, ap_))
            z = precond(r)
            rz_new = tdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = tuple(zi + beta * pi for zi, pi in zip(z, p))
            rz = rz_new
            rel = float(jnp.sqrt(tdot(r, r) / rr0))
            hist.append((rel, float(true_cost(cand_of(x)))))
        return hist

    def joint_cand(x):
        d = Params(*(mi * xi for mi, xi in zip(masks, x)))
        return Params(*(pi + di for pi, di in zip(bp, d)))

    def reduced_cand(x2):
        ds = masks.sdf * x2[0]
        da = masks.albedo * x2[1]
        yv = blockform.jv_block(lin, basm, Params(ds, da, *zerog), include_globals=False)[0]
        zv = blockform.flatten_globals(*blockform.jgt_apply(lin, yv))
        dp, di_, dd = blockform.unflatten_globals(csolve(bg - zv), k)
        return Params(bp.sdf + ds, bp.albedo + da, bp.poses + dp, bp.intr + di_, bp.dist + dd)

    keys5 = ("sdf", "albedo", "poses", "intr", "dist")
    hist_joint = run_cg(joint_matvec, jacobi(keys5), tuple(b), args.steps, joint_cand)
    hist_red = run_cg(
        reduced_matvec, jacobi(("sdf", "albedo")), b2, args.steps, reduced_cand
    )

    c0 = float(cost0)
    print(f"cost0 = {c0:.6f}", file=sys.stderr)
    print("step   joint rel | cost      reduced rel | cost", file=sys.stderr)
    for i, ((rj, cj), (rr, cr)) in enumerate(zip(hist_joint, hist_red)):
        print(
            f"{i + 1:4d}   {rj:.4f} | {cj:.6f}    {rr:.4f} | {cr:.6f}",
            file=sys.stderr,
        )

    def exit_step(hist, eta):
        for i, (rel, _) in enumerate(hist):
            if rel <= eta:
                return i + 1
        return None

    # --- production wall-clock (bf16, cg=12, full outer iterations) ---------
    def wall(schur):
        mu_ = jnp.float32(args.mu)
        p_ = bp
        out = gn_iteration(p_, basm, bm, mu_, 8, 12, schur_globals=schur)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        p_, _, c1, mu_, _ = out
        for _ in range(args.iters):
            p_, _, c1, mu_, _ = gn_iteration(p_, basm, bm, mu_, 8, 12, schur_globals=schur)
        c1 = float(c1)
        return (time.perf_counter() - t0) / args.iters, c1

    wall_joint, cost_joint = wall(False)
    wall_red, cost_red = wall(True)

    result = {
        "frames": k,
        "voxels": int(prob.grid.num_voxels),
        "mu": mu,
        "cost0": c0,
        "joint": {
            "exit_eta0.1": exit_step(hist_joint, 0.1),
            "exit_eta0.01": exit_step(hist_joint, 0.01),
            "cost_at_steps": {str(i + 1): h[1] for i, h in enumerate(hist_joint)},
            "gn_iteration_s": round(wall_joint, 4),
            "gn_cost_after": cost_joint,
        },
        "reduced": {
            "exit_eta0.1": exit_step(hist_red, 0.1),
            "exit_eta0.01": exit_step(hist_red, 0.01),
            "cost_at_steps": {str(i + 1): h[1] for i, h in enumerate(hist_red)},
            "gn_iteration_s": round(wall_red, 4),
            "gn_cost_after": cost_red,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
