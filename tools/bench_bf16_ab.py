"""bf16-vs-f32 PCG-coefficient A/B at bench scale (VERDICT round 1 item 8).

`gn_iteration(cg_coeff_dtype="bfloat16")` — the production default — rounds
only the streamed E_g Jacobian coefficient fields inside the PCG matvec
(refine/blockform.cast_lin); gradients, diagonals, residuals, and all
accumulations stay f32. Validated so far on tiny scenes
(tests/test_blockform.py); this script runs the A/B at the bench problem
scale (voxel 4 mm, 320x240, ~142k voxels, 8 keyframes): N full outer
iterations each way from identical initial perturbations, comparing
per-iteration cost trajectories, the final cost, the refined-SDF agreement,
and the refined-mesh geometric error vs the analytic sphere.

Usage: python tools/bench_bf16_ab.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(prob, cfg, dtype, iters, cg_iters=12, lm_steps=8):
    import jax
    import jax.numpy as jnp

    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.refine.blockform import (
        dense_to_table,
        layout_plans,
        table_to_dense,
    )
    from intrinsic3d_tpu.refine.device_assembly import build_level_static, device_assembly
    from intrinsic3d_tpu.refine.solver import gn_iteration

    layout = BlockLayout.build(prob.grid)
    st = build_level_static(layout, prob.grid, prob.topo, prob.voxel_sh)
    sdf_plan, alb_plan = layout_plans(layout)
    params = prob.params._replace(
        sdf=table_to_dense(layout, prob.params.sdf),
        albedo=table_to_dense(layout, prob.params.albedo),
    )
    mu = jnp.float32(1e-4)
    lams = jnp.asarray([cfg.lambda_g, 10.0, 10.0, cfg.lambda_a], jnp.float32)
    akw = dict(
        num_obs=5,
        width=int(prob.images.shape[2]),
        height=int(prob.images.shape[1]),
        fix_poses=False,
        fix_intrinsics=False,
        fix_distortion=False,
        use_albedo=True,
    )
    scal = (
        jnp.float32(1.0),
        jnp.float32(prob.grid.voxel_size),
        jnp.float32(prob.grid.truncation),
        jnp.float32(prob.thres_shell),
        jnp.float32(cfg.occlusion_distance),
    )

    costs = []
    t_total = 0.0
    for i in range(iters):
        basm, bmasks = device_assembly(
            st, sdf_plan, alb_plan, params, prob.depths, prob.images, *scal, lams, **akw
        )
        t0 = time.perf_counter()
        params, c0, c1, mu, tries = gn_iteration(
            params, basm, bmasks, mu, lm_steps, 12, cg_coeff_dtype=dtype
        )
        c1v = float(c1)  # sync (outside the timed region only for compile i=0)
        if i > 0:
            t_total += time.perf_counter() - t0
        costs.append(c1v)
    sdf_t = np.asarray(dense_to_table(layout, params.sdf))
    return costs, sdf_t, t_total / max(iters - 1, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from intrinsic3d_tpu.config import RefinementConfig
    from intrinsic3d_tpu.mesh import extract_surface
    from intrinsic3d_tpu.mesh.metrics import mesh_error_vs_analytic
    from intrinsic3d_tpu.synthetic import DEFAULT_CENTER, DEFAULT_RADIUS, build_sphere_problem

    cfg = RefinementConfig(
        num_observations=5,
        occlusion_distance=0.02,
        fix_poses=False,
        fix_intrinsics=False,
        fix_distortion=False,
    )

    out = {}
    for dtype in ("float32", "bfloat16"):
        prob = build_sphere_problem(
            voxel_size=0.004,
            image_size=(320, 240),
            num_frames=8,
            num_observations=5,
            cfg=cfg,
            perturb_sdf=0.001,
            perturb_albedo=0.03,
        )
        costs, sdf_t, iter_s = run(prob, cfg, dtype, args.iters)
        grid = prob.grid
        grid.sdf_refined = sdf_t.astype(grid.sdf_refined.dtype)
        verts, faces, _ = extract_surface(grid, sdf=grid.sdf_refined)
        err = mesh_error_vs_analytic(
            verts,
            faces,
            lambda p: np.linalg.norm(p - np.asarray(DEFAULT_CENTER), axis=-1)
            - DEFAULT_RADIUS,
            num_samples=20000,
        )
        out[dtype] = {
            "costs": [round(c, 8) for c in costs],
            "final_cost": costs[-1],
            "outer_iteration_s": round(iter_s, 4),
            "mesh_err_rms_m": round(err["rms"], 7),
            "mesh_err_p95_m": round(err["p95"], 7),
            "sdf": sdf_t,
        }

    a, b = out["float32"], out["bfloat16"]
    sdf_rms = float(np.sqrt(np.mean((a.pop("sdf") - b.pop("sdf")) ** 2)))
    print(
        json.dumps(
            {
                "metric": "bf16_vs_f32_cg_coeffs",
                "float32": a,
                "bfloat16": b,
                "final_cost_ratio": round(b["final_cost"] / a["final_cost"], 5),
                "sdf_rms_diff_m": sdf_rms,
                "speedup": round(a["outer_iteration_s"] / b["outer_iteration_s"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
