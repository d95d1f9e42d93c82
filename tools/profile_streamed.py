"""Op-level TPU profile of the STREAMED outer iteration (round 5).

Times the fused outer step (device assembly + chunked linearize + Schur GN)
at a configurable scale with the exact bucket layout and a forced chunk
count, captures an xplane trace, and attributes device time to the level's
phases via tools/xplane_reader.py — the round-5 twin of tools/profile_gn.py
for the memory-forced streamed regime.

    python tools/profile_streamed.py --voxel 0.002 --size 640x480 \
        --frames 10 --chunks 3 --iters 3
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxel", type=float, default=0.002)
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--num-obs", type=int, default=5)
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cg-iters", type=int, default=12)
    ap.add_argument("--trace-dir", default="/tmp/i3d_streamed_trace")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from intrinsic3d_tpu.config import RefinementConfig
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.refine.blockform import build_frame_buckets, layout_plans, table_to_dense
    from intrinsic3d_tpu.refine.device_assembly import build_level_static
    from intrinsic3d_tpu.refine.optimizer import _fused_outer_step
    from intrinsic3d_tpu.synthetic import build_sphere_problem

    cfg = RefinementConfig(
        num_observations=args.num_obs,
        occlusion_distance=0.02,
        fix_poses=False,
        fix_intrinsics=True,
        fix_distortion=True,
    )
    t0 = time.perf_counter()
    prob = build_sphere_problem(
        voxel_size=args.voxel,
        image_size=(w, h),
        num_frames=args.frames,
        num_observations=args.num_obs,
        cfg=cfg,
    )
    layout = BlockLayout.build(prob.grid, halo_table=False)
    st = build_level_static(layout, prob.grid, prob.topo, prob.voxel_sh)
    fb = build_frame_buckets(
        layout=layout,
        poses6=np.asarray(prob.params.poses),
        intr4=np.asarray(prob.params.intr, np.float64),
        width=w, height=h,
        voxel_size=prob.grid.voxel_size,
        depths=np.asarray(prob.depths),
        occlusion=cfg.occlusion_distance,
        depth_slack=0.05 + float(prob.thres_shell),
        margin_px=0.15 * max(w, h),
    )
    print(
        f"problem: {prob.grid.num_voxels} voxels, {layout.num_blocks} blocks, "
        f"buckets {fb.shape[1]}, {args.frames * fb.shape[1] * 512 / 1e6:.1f}M elements, "
        f"chunks {args.chunks}; build {time.perf_counter() - t0:.0f}s",
        file=sys.stderr,
    )
    sdf_plan, alb_plan = layout_plans(layout)
    bparams = prob.params._replace(
        sdf=table_to_dense(layout, prob.params.sdf),
        albedo=table_to_dense(layout, prob.params.albedo),
    )

    def step(bp, mu):
        return _fused_outer_step(
            st, sdf_plan, alb_plan, bp,
            prob.depths, prob.images,
            jnp.float32(1.0), jnp.float32(prob.grid.voxel_size),
            jnp.float32(prob.grid.truncation), jnp.float32(prob.thres_shell),
            jnp.float32(cfg.occlusion_distance),
            jnp.asarray([0.2, 20.0, 20.0, 0.1], jnp.float32), mu,
            jnp.asarray(fb),
            num_obs=args.num_obs, width=w, height=h,
            fix_poses=False, fix_intrinsics=True, fix_distortion=True,
            use_albedo=True, lm_steps=8, cg_iters=args.cg_iters,
            schur_globals=True, min_pose_obs=cfg.min_pose_obs,
            eg_chunks=args.chunks,
        )

    # warm (compile + first run)
    t0 = time.perf_counter()
    bp, c0, c1, mu, tries = step(bparams, jnp.float32(1e-4))
    jax.block_until_ready(c1)
    print(f"warm step: {time.perf_counter() - t0:.1f}s cost {float(c0):.4f} -> "
          f"{float(c1):.4f} tries {int(tries)}", file=sys.stderr)

    # timed
    t0 = time.perf_counter()
    for _ in range(args.iters):
        bp, c0, c1, mu, tries = step(bp, mu)
    jax.block_until_ready(c1)
    per_iter = (time.perf_counter() - t0) / args.iters

    # traced
    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    bp, c0, c1, mu, tries = step(bp, mu)
    jax.block_until_ready(c1)
    jax.profiler.stop_trace()

    result = {
        "metric": "streamed_outer_iteration_s",
        "voxels": int(prob.grid.num_voxels),
        "elements_m": round(args.frames * fb.shape[1] * 512 / 1e6, 2),
        "chunks": args.chunks,
        "per_iteration_s": round(per_iter, 4),
        "trace": args.trace_dir,
    }
    print(json.dumps(result))
    pats = glob.glob(os.path.join(args.trace_dir, "plugins/profile/*/*.xplane.pb"))
    if pats:
        print(f"parse with: python tools/xplane_reader.py '{sorted(pats)[-1]}'",
              file=sys.stderr)


if __name__ == "__main__":
    main()
