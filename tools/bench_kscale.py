"""K-scaling measurement: outer-iteration time vs keyframe count (VERDICT 6).

The dense frame-major E_g layout scales with the TOTAL keyframe count K, not
the per-voxel observation cap (BENCH_NOTES "K >> num_obs"); the occlusion-
culled, per-block-capped frame buckets (refine/blockform.build_frame_buckets)
bound elements at M*nb*B^3 for any K. This script measures full production
outer iterations (device assembly + GN step) at the bench problem scale
(voxel 4 mm, 320x240, ~142k voxels) for an orbit capture — the bucketing
WORST case, where frustum projection alone culls nothing — at several K,
dense vs bucketed, and prints one JSON line per configuration.

Usage: python tools/bench_kscale.py [--ks 8,30] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_config(prob, cfg, bmap, iters, cg_iters=12, lm_steps=8):
    import jax
    import jax.numpy as jnp

    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.refine.blockform import layout_plans, table_to_dense
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
        num_obs=cfg.num_observations,
        width=int(prob.images.shape[2]),
        height=int(prob.images.shape[1]),
        fix_poses=False,
        fix_intrinsics=False,
        fix_distortion=False,
        use_albedo=True,
        bmap=None if bmap is None else jnp.asarray(bmap),
    )
    scal = (
        jnp.float32(1.0),
        jnp.float32(prob.grid.voxel_size),
        jnp.float32(prob.grid.truncation),
        jnp.float32(prob.thres_shell),
        jnp.float32(cfg.occlusion_distance),
    )

    def outer_iteration(params, mu):
        basm, bmasks = device_assembly(
            st, sdf_plan, alb_plan, params, prob.depths, prob.images, *scal, lams, **akw
        )
        return gn_iteration(params, basm, bmasks, mu, lm_steps, cg_iters)

    out = outer_iteration(params, mu)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, c0, c1, mu, tries = outer_iteration(params, mu)
    c1 = float(c1)
    dt = (time.perf_counter() - t0) / iters
    return dt, c1, layout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="8,30")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--voxel", type=float, default=0.004)
    ap.add_argument("--size", default="320x240")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from intrinsic3d_tpu.config import RefinementConfig
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.refine.blockform import build_frame_buckets
    from intrinsic3d_tpu.synthetic import build_sphere_problem

    results = []
    for k in (int(v) for v in args.ks.split(",")):
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
            num_frames=k,
            num_observations=5,
            cfg=cfg,
            perturb_sdf=0.001,
            perturb_albedo=0.03,
        )
        layout = BlockLayout.build(prob.grid)
        for mode in ("dense", "bucketed"):
            bmap = None
            if mode == "bucketed":
                bmap = build_frame_buckets(
                    layout,
                    np.asarray(prob.params.poses),
                    np.asarray(prob.params.intr),
                    w,
                    h,
                    prob.grid.voxel_size,
                    margin_px=0.08 * max(w, h),
                    depths=np.asarray(prob.depths),
                    occlusion=cfg.occlusion_distance,
                    max_frames_per_block=min(cfg.num_observations + 3, k),
                )
            dt, c1, _ = run_config(prob, cfg, bmap, args.iters)
            rec = {
                "k": k,
                "mode": mode,
                "outer_iteration_s": round(dt, 4),
                "final_cost": c1,
                "num_voxels": int(prob.grid.num_voxels),
                "elements": int(
                    k * (layout.num_blocks if bmap is None else bmap.shape[1]) * 512
                ),
                "nbc_over_nb": None
                if bmap is None
                else round(bmap.shape[1] / layout.num_blocks, 3),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    base = next(r for r in results if r["k"] == min(r2["k"] for r2 in results) and r["mode"] == "dense")
    for r in results:
        r["vs_k%d_dense" % base["k"]] = round(r["outer_iteration_s"] / base["outer_iteration_s"], 2)
    print(json.dumps({"summary": results}), file=sys.stderr)


if __name__ == "__main__":
    main()
