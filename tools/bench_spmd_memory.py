"""Measured per-device memory of the FULL sharded level step at scale.

VERDICT r3 item 7: per-device HBM at the memory-forced finest pipeline level
was asserted only for parameters; the assembly TRANSIENTS — the bucketed
top-N rank scatter (`device_assembly.py` wfull `[K, nb+1, B³]`) and the
bucket re-shard gather — were unmeasured. This tool compiles the production
`SpmdLevel._step` program (device assembly + damped GN, ONE shard_map) for an
n-device mesh at a chosen problem scale and reports XLA's buffer assignment
(`compiled.memory_analysis()`): per-device argument / output / TEMP bytes.
Nothing is executed, so the finest-level configuration compiles on the CPU
container in tens of minutes without the 8-device execution cost.

Usage (opt-in, like tools/bench_multichip_scale.py):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_spmd_memory.py --voxel 0.004 --frames 8
    # finest-pipeline-scale configuration (~1-2M voxels, K=10, 640x480):
    ... --voxel 0.0012 --size 640x480 --frames 10 --bucketing capped

Compare `--devices 8` vs `--devices 1`: temps must scale ~1/n for the
whole-step claim to hold (plus the replicated image stack).
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
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--num-obs", type=int, default=5)
    ap.add_argument("--bucketing", default="capped",
                    choices=("auto", "capped", "always", "never"))
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from intrinsic3d_tpu.config import RefinementConfig
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.parallel.sharding import make_mesh
    from intrinsic3d_tpu.parallel.spmd import SpmdLevel
    from intrinsic3d_tpu.refine.device_assembly import build_level_static
    from intrinsic3d_tpu.refine.optimizer import plan_eg_layout
    from intrinsic3d_tpu.synthetic import build_sphere_problem

    cfg = RefinementConfig(
        num_observations=args.num_obs,
        occlusion_distance=0.02,
        fix_poses=False,
        fix_intrinsics=True,
        fix_distortion=True,
        frame_bucketing=args.bucketing,
    )
    t0 = time.perf_counter()
    prob = build_sphere_problem(
        voxel_size=args.voxel,
        image_size=(w, h),
        num_frames=args.frames,
        num_observations=args.num_obs,
        cfg=cfg,
    )
    n = args.devices
    layout = BlockLayout.build(prob.grid, blocks_multiple=max(8, n), halo_table=False)
    st = build_level_static(
        layout, prob.grid, prob.topo, prob.voxel_sh, device=False
    )
    fb, reason, _chunks = plan_eg_layout(
        layout,
        np.asarray(prob.params.poses),
        np.asarray(prob.params.intr, np.float64),
        cfg,
        w,
        h,
        prob.grid.voxel_size,
        prob.thres_shell,
        np.asarray(prob.depths),
    )
    print(
        f"problem: {prob.grid.num_voxels} voxels, {layout.num_blocks} blocks, "
        f"K={args.frames}, layout={'dense' if fb is None else 'bucketed'} ({reason}); "
        f"build {time.perf_counter() - t0:.0f}s",
        file=sys.stderr,
    )

    mesh = make_mesh(n)
    level = SpmdLevel(
        mesh,
        layout,
        st,
        prob.depths,
        prob.images,
        num_obs=args.num_obs,
        width=w,
        height=h,
        pyr_scale=1.0,
        voxel_size=float(prob.grid.voxel_size),
        truncation=float(prob.grid.truncation),
        thres_shell=float(prob.thres_shell),
        occlusion_distance=float(cfg.occlusion_distance),
        fix_poses=False,
        fix_intrinsics=True,
        fix_distortion=True,
        use_albedo=True,
        bmap=fb,
        lm_steps=8,
        cg_iters=12,
    )
    bparams_s = level.begin(
        prob.params._replace(
            sdf=jnp.asarray(
                np.pad(
                    np.zeros((layout.num_blocks, layout.block**3), np.float32),
                    ((0, 1), (0, 0)),
                )
            ),
            albedo=jnp.asarray(
                np.pad(
                    np.zeros((layout.num_blocks, layout.block**3), np.float32),
                    ((0, 1), (0, 0)),
                )
            ),
        )
    )
    lambdas = jnp.asarray([0.2, 10.0, 10.0, 0.1], jnp.float32)
    mu = jnp.float32(1e-4)

    print("lowering + compiling the ONE-program level step ...", file=sys.stderr)
    t0 = time.perf_counter()
    lowered = level._step.lower(
        level._stat,
        level.ctx.sdf_plan_s,
        level.ctx.alb_plan_s,
        level._bmap,
        bparams_s,
        level._depths,
        level._images,
        level._scalars,
        lambdas,
        mu,
    )
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    ma = compiled.memory_analysis()

    def get(name):
        try:
            return int(getattr(ma, name))
        except Exception:
            return None

    result = {
        "devices": n,
        "voxels": int(prob.grid.num_voxels),
        "blocks": int(layout.num_blocks),
        "frames": args.frames,
        "image": f"{w}x{h}",
        "layout": "dense" if fb is None else f"bucketed ({reason})",
        "bucket_cols": None if fb is None else int(fb.shape[1]),
        "compile_s": round(compile_s, 1),
        # per-device bytes from XLA buffer assignment (SPMD executable)
        "argument_bytes": get("argument_size_in_bytes"),
        "output_bytes": get("output_size_in_bytes"),
        "temp_bytes": get("temp_size_in_bytes"),
        "alias_bytes": get("alias_size_in_bytes"),
        "generated_code_bytes": get("generated_code_size_in_bytes"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
