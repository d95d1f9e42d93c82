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

Each probe is ONE jitted `lax.scan` program (an eager CG loop would pay a
tunnel round trip per op, BENCH_NOTES "Measurement gotcha").

Usage:
    python tools/bench_schur_ab.py [--frames 8] [--voxel 0.004]
        [--size 320x240] [--steps 16] [--cpu] [--mu 1e-4]
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--fix-camera", action="store_true",
                    help="fix intrinsics+distortion (the pipeline configuration: only poses free)")
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
        fix_intrinsics=args.fix_camera,
        fix_distortion=args.fix_camera,
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

    def cg_scan(matvec, precond, rhs, steps, cand_cost, tdot):
        """Fixed-step PCG recording (rel residual, true cost) per step."""
        x0 = jax.tree_util.tree_map(jnp.zeros_like, rhs)
        z0 = precond(rhs)
        rr0 = tdot(rhs, rhs)

        def step(carry, _):
            x, r, p, rz = carry
            ap_ = matvec(p)
            alpha = rz / jnp.maximum(tdot(p, ap_), 1e-30)
            x = jax.tree_util.tree_map(lambda xi, pi: xi + alpha * pi, x, p)
            r = jax.tree_util.tree_map(lambda ri, api: ri - alpha * api, r, ap_)
            z = precond(r)
            rz_new = tdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = jax.tree_util.tree_map(lambda zi, pi: zi + beta * pi, z, p)
            rel = jnp.sqrt(tdot(r, r) / jnp.maximum(rr0, 1e-30))
            return (x, r, p, rz_new), (rel, cand_cost(x))

        (_, _, _, _), hist = jax.lax.scan(
            step, (x0, rhs, z0, tdot(rhs, z0)), None, length=steps
        )
        return hist  # (rel [steps], cost [steps])

    @functools.partial(jax.jit, static_argnames=("steps",))
    def joint_probe(bp, basm, bm, steps):
        cost0, lin = blockform.linearize_block(bp, basm)
        grad = blockform.jtv_block(lin, basm, (lin.r0_g, lin.r0_r, lin.r0_s, lin.r0_a))
        diag = blockform.diag_from_lin(lin, basm)
        masks = Params(*(m * (d > 0.0) for m, d in zip(bm, diag)))
        b = Params(*(mi * -gi for mi, gi in zip(masks, grad)))

        def tdot(a, bb):
            return sum(jnp.vdot(x, y) for x, y in zip(a, bb))

        def matvec(v):
            vm = Params(*(mi * vi for mi, vi in zip(masks, v)))
            jj = blockform.jtv_block(lin, basm, blockform.jv_block(lin, basm, vm))
            return Params(
                *(
                    mi * (h_ + mu * d * vi) + (1.0 - mi) * vo
                    for h_, d, vi, mi, vo in zip(jj, diag, vm, masks, v)
                )
            )

        def precond(r):
            return Params(
                *(
                    mi * ri / (di * (1.0 + mu) + 1e-12) + (1.0 - mi) * ri
                    for ri, di, mi in zip(r, diag, masks)
                )
            )

        def cand_cost(x):
            d = Params(*(mi * xi for mi, xi in zip(masks, x)))
            cand = Params(*(pi + di for pi, di in zip(bp, d)))
            r = residual_stack(cand, basm)
            return 0.5 * jnp.sum(r * r)

        rel, cost = cg_scan(matvec, precond, b, steps, cand_cost, tdot)
        return cost0, rel, cost

    @functools.partial(jax.jit, static_argnames=("steps",))
    def reduced_probe(bp, basm, bm, steps):
        import jax.scipy.linalg as jsl

        cost0, lin = blockform.linearize_block(bp, basm)
        grad = blockform.jtv_block(lin, basm, (lin.r0_g, lin.r0_r, lin.r0_s, lin.r0_a))
        diag = blockform.diag_from_lin(lin, basm)
        masks = Params(*(m * (d > 0.0) for m, d in zip(bm, diag)))
        b = Params(*(mi * -gi for mi, gi in zip(masks, grad)))
        zerog = (
            jnp.zeros_like(bp.poses),
            jnp.zeros_like(bp.intr),
            jnp.zeros_like(bp.dist),
        )

        C = blockform.global_gram(lin)
        mg = blockform.flatten_globals(masks.poses, masks.intr, masks.dist)
        dg = blockform.flatten_globals(diag.poses, diag.intr, diag.dist)
        bg = blockform.flatten_globals(b.poses, b.intr, b.dist)
        Ct = mg[:, None] * (C + mu * jnp.diag(dg)) * mg[None, :]
        Ct = Ct + jnp.diag(jnp.where(mg > 0.0, 1e-12, 1.0))
        chol_g = jnp.linalg.cholesky(Ct)

        def csolve(z):
            u = jsl.solve_triangular(chol_g, (mg * z)[:, None], lower=True)
            u = jsl.solve_triangular(chol_g.T, u, lower=False)
            return mg * u[:, 0]

        def tdot(a, bb):
            return sum(jnp.vdot(x, y) for x, y in zip(a, bb))

        def matvec(v2):
            vs = masks.sdf * v2[0]
            va = masks.albedo * v2[1]
            y_g, y_r, y_s, y_a = blockform.jv_block(
                lin, basm, Params(vs, va, *zerog), include_globals=False
            )
            z = blockform.flatten_globals(*blockform.jgt_apply(lin, y_g))
            up, ui, ud = blockform.unflatten_globals(csolve(z), k)
            y_g2 = y_g - blockform.jg_apply(lin, up, ui, ud)
            out = blockform.jtv_block(
                lin, basm, (y_g2, y_r, y_s, y_a), include_globals=False
            )
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

        def precond(r2):
            return tuple(
                mi * ri / (di * (1.0 + mu) + 1e-12) + (1.0 - mi) * ri
                for ri, di, mi in zip(
                    r2, (diag.sdf, diag.albedo), (masks.sdf, masks.albedo)
                )
            )

        def cand_cost(x2):
            ds = masks.sdf * x2[0]
            da = masks.albedo * x2[1]
            yv = blockform.jv_block(
                lin, basm, Params(ds, da, *zerog), include_globals=False
            )[0]
            zv = blockform.flatten_globals(*blockform.jgt_apply(lin, yv))
            dp, di_, dd = blockform.unflatten_globals(csolve(bg - zv), k)
            cand = Params(
                bp.sdf + ds, bp.albedo + da, bp.poses + dp, bp.intr + di_, bp.dist + dd
            )
            r = residual_stack(cand, basm)
            return 0.5 * jnp.sum(r * r)

        rel, cost = cg_scan(matvec, precond, b2, steps, cand_cost, tdot)
        return cost0, rel, cost

    t0 = time.perf_counter()
    c0j, rel_j, cost_j = jax.block_until_ready(joint_probe(bp, basm, bm, args.steps))
    t_joint_probe = time.perf_counter() - t0
    t0 = time.perf_counter()
    c0r, rel_r, cost_r = jax.block_until_ready(reduced_probe(bp, basm, bm, args.steps))
    t_red_probe = time.perf_counter() - t0
    rel_j, cost_j = np.asarray(rel_j), np.asarray(cost_j)
    rel_r, cost_r = np.asarray(rel_r), np.asarray(cost_r)

    c0 = float(c0j)
    print(f"cost0 = {c0:.6f}", file=sys.stderr)
    print("step   joint rel | cost      reduced rel | cost", file=sys.stderr)
    for i in range(args.steps):
        print(
            f"{i + 1:4d}   {rel_j[i]:.4f} | {cost_j[i]:.6f}    "
            f"{rel_r[i]:.4f} | {cost_r[i]:.6f}",
            file=sys.stderr,
        )

    def exit_step(rel, eta):
        hit = np.flatnonzero(rel <= eta)
        return int(hit[0] + 1) if len(hit) else None

    # --- production wall-clock (bf16, cg=12, full outer iterations) ---------
    def wall(schur):
        mu_ = jnp.float32(args.mu)
        p_ = bp
        out = gn_iteration(p_, basm, bm, mu_, 8, 12, schur_globals=schur)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        costs = []
        for _ in range(args.iters):
            p_, _, c1, mu_, _ = gn_iteration(
                p_, basm, bm, mu_, 8, 12, schur_globals=schur
            )
            costs.append(c1)
        costs = [float(c) for c in costs]
        return (time.perf_counter() - t0) / args.iters, costs

    wall_joint, costs_joint = wall(False)
    time.sleep(2)
    wall_red, costs_red = wall(True)

    result = {
        "frames": k,
        "voxels": int(prob.grid.num_voxels),
        "mu": mu,
        "cost0": c0,
        "probe_wall_s": {"joint": round(t_joint_probe, 1), "reduced": round(t_red_probe, 1)},
        "joint": {
            "exit_eta0.1": exit_step(rel_j, 0.1),
            "exit_eta0.01": exit_step(rel_j, 0.01),
            "cost_at_steps": [round(float(c), 6) for c in cost_j],
            "gn_iteration_s": round(wall_joint, 4),
            "gn_costs": costs_joint,
        },
        "reduced": {
            "exit_eta0.1": exit_step(rel_r, 0.1),
            "exit_eta0.01": exit_step(rel_r, 0.01),
            "cost_at_steps": [round(float(c), 6) for c in cost_r],
            "gn_iteration_s": round(wall_red, 4),
            "gn_costs": costs_red,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
