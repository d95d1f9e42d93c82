"""Calibrate the chunked-streaming E_g memory model (VERDICT r4 item 1).

Compiles the single-device production `_fused_outer_step` (device assembly +
damped GN, ONE program) at a chosen scale with the EXACT full-coverage
bucket layout and a sweep of `eg_chunks`, reading XLA's buffer assignment
(`compiled.memory_analysis()`). Nothing executes, so finest-pipeline shapes
compile on the CPU container. The sweep identifies the three constants of
`refine.optimizer.plan_eg_layout`'s streaming decision:

    peak(C) ≈ max(el·A,  el·P + ceil(K/C)·el_frame·T)

  - P (`_EG_CHUNK_PERSIST_BYTES`): per-element bytes persisting through the
    PCG regardless of chunk count (bf16 coefficient fields + residual + ...)
    — the high-C plateau minus the assembly floor;
  - T (`_EG_CHUNK_TRANSIENT_BYTES`): per-element bytes of ONE chunk's
    linearize/acceptance transients — the slope vs frames-per-chunk;
  - A (`_EG_ASSEMBLY_BYTES`): the un-chunkable assembly-phase floor
    (observation weights, global top-N rank argsorts, validity probe).

Usage (opt-in):

    JAX_PLATFORMS=cpu python tools/bench_chunked_memory.py \
        --voxel 0.004 --size 320x240 --frames 8 --chunks 1,2,4,8
    # finest-pipeline-scale configuration (slow compile, tens of minutes):
    ... --voxel 0.0012 --size 640x480 --frames 10 --chunks 1,2,5,10
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
    ap.add_argument("--voxel", type=float, default=0.004)
    ap.add_argument("--size", default="320x240")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--num-obs", type=int, default=5)
    ap.add_argument("--chunks", default="1,2,4,8")
    ap.add_argument("--cg-iters", type=int, default=12)
    ap.add_argument("--backend", default="cpu",
                    help="cpu (default) or the attached TPU backend (axon)")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax

    jax.config.update("jax_platforms", args.backend)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from intrinsic3d_tpu.config import RefinementConfig
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.refine.blockform import (
        build_frame_buckets,
        layout_plans,
    )
    from intrinsic3d_tpu.refine.device_assembly import build_level_static
    from intrinsic3d_tpu.refine.optimizer import _fused_outer_step
    from intrinsic3d_tpu.refine.residuals import Params
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
    # EXACT full-coverage buckets (per-voxel top-N over all frames)
    fb = build_frame_buckets(
        layout=layout,
        poses6=np.asarray(prob.params.poses),
        intr4=np.asarray(prob.params.intr, np.float64),
        width=w,
        height=h,
        voxel_size=prob.grid.voxel_size,
        depths=np.asarray(prob.depths),
        occlusion=cfg.occlusion_distance,
        depth_slack=0.05 + float(prob.thres_shell),
        margin_px=0.15 * max(w, h),
    )
    nb, s = layout.num_blocks, layout.block**3
    k = args.frames
    el = k * fb.shape[1] * s
    print(
        f"problem: {prob.grid.num_voxels} voxels, {nb} blocks, K={k}, "
        f"buckets {fb.shape[1]}/{nb} blocks/frame, {el / 1e6:.2f}M elements; "
        f"build {time.perf_counter() - t0:.0f}s",
        file=sys.stderr,
    )

    sdf_plan, alb_plan = layout_plans(layout)
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    from intrinsic3d_tpu.refine.device_assembly import LevelStatic

    zst = LevelStatic(
        occ=sds((nb + 1, s), f32),
        valid=sds((nb + 1, s), f32),
        vpos=sds((3, nb * s), jnp.int32),
        es_ref=sds((nb, s), f32),
        eg_sh=sds((9, nb * s), f32),
        ea_chroma=sds((3, nb, s), f32),
    )
    zparams = Params(
        sdf=sds((nb + 1, s), f32),
        albedo=sds((nb + 1, s), f32),
        poses=sds((k, 6), f32),
        intr=sds((4,), f32),
        dist=sds((5,), f32),
    )
    rows = []
    for c in (int(v) for v in args.chunks.split(",")):
        t0 = time.perf_counter()
        lowered = _fused_outer_step.lower(
            zst,
            sdf_plan,
            alb_plan,
            zparams,
            sds((k, h, w), f32),
            sds((k, h, w), f32),
            np.float32(1.0),
            np.float32(args.voxel),
            np.float32(5 * args.voxel),
            np.float32(prob.thres_shell),
            np.float32(cfg.occlusion_distance),
            np.zeros(4, np.float32),
            np.float32(1e-4),
            sds(tuple(fb.shape), jnp.int32),
            num_obs=args.num_obs,
            width=w,
            height=h,
            fix_poses=False,
            fix_intrinsics=True,
            fix_distortion=True,
            use_albedo=True,
            lm_steps=8,
            cg_iters=args.cg_iters,
            schur_globals=True,
            min_pose_obs=cfg.min_pose_obs,
            eg_chunks=c,
        )
        compiled = lowered.compile()
        ma = compiled.memory_analysis()

        def get(name):
            try:
                return int(getattr(ma, name))
            except Exception:
                return None

        row = {
            "eg_chunks": c,
            "frames_per_chunk": -(-k // c),
            "compile_s": round(time.perf_counter() - t0, 1),
            "argument_bytes": get("argument_size_in_bytes"),
            "temp_bytes": get("temp_size_in_bytes"),
            "output_bytes": get("output_size_in_bytes"),
            "temp_bytes_per_element": round(
                (get("temp_size_in_bytes") or 0) / el, 1
            ),
        }
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    # fit peak(C) = max(A_tot, P_tot + fpc·el_frame·T) on the temp bytes
    el_frame = fb.shape[1] * s
    fit = {}
    if len(rows) >= 2:
        r0, r1 = rows[0], rows[-1]
        d_fpc = r0["frames_per_chunk"] - r1["frames_per_chunk"]
        if d_fpc > 0 and r0["temp_bytes"] and r1["temp_bytes"]:
            t_slope = (r0["temp_bytes"] - r1["temp_bytes"]) / (d_fpc * el_frame)
            p_tot = r1["temp_bytes"] - r1["frames_per_chunk"] * el_frame * t_slope
            fit = {
                "T_bytes_per_element": round(t_slope, 1),
                "P_bytes_per_element": round(p_tot / el, 1),
            }
    print(
        json.dumps(
            {
                "voxels": int(prob.grid.num_voxels),
                "blocks": nb,
                "frames": k,
                "bucket_cols": int(fb.shape[1]),
                "elements": el,
                "image": f"{w}x{h}",
                "rows": rows,
                "fit": fit,
            }
        )
    )


if __name__ == "__main__":
    main()
