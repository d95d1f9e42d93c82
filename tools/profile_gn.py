"""Profile full outer iterations (device assembly + GN step) on the TPU and
print the aggregated device-op table — the input for the roofline rows in
BENCH_NOTES.md ("Roofline / MFU").

Usage:  python tools/profile_gn.py [--iters 3] [--trace-dir /tmp/gn_trace]
Then the op table prints directly (tools/xplane_reader.py parses the xplane;
the tensorboard plugin has a protobuf conflict in this container).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/gn_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from intrinsic3d_tpu.config import RefinementConfig
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.refine.blockform import layout_plans, table_to_dense
    from intrinsic3d_tpu.refine.device_assembly import build_level_static, device_assembly
    from intrinsic3d_tpu.refine.solver import gn_iteration
    from intrinsic3d_tpu.synthetic import build_sphere_problem

    cfg = RefinementConfig(
        num_observations=5, occlusion_distance=0.02,
        fix_poses=False, fix_intrinsics=False, fix_distortion=False,
    )
    prob = build_sphere_problem(
        voxel_size=0.004, image_size=(320, 240), num_frames=8,
        num_observations=5, cfg=cfg, perturb_sdf=0.001, perturb_albedo=0.03,
    )
    layout = BlockLayout.build(prob.grid)
    st = build_level_static(layout, prob.grid, prob.topo, prob.voxel_sh)
    sdf_plan, alb_plan = layout_plans(layout)
    params = prob.params._replace(
        sdf=table_to_dense(layout, prob.params.sdf),
        albedo=table_to_dense(layout, prob.params.albedo),
    )
    lams = jnp.asarray([cfg.lambda_g, 10.0, 10.0, cfg.lambda_a], jnp.float32)
    scal = (
        jnp.float32(1.0), jnp.float32(prob.grid.voxel_size),
        jnp.float32(prob.grid.truncation), jnp.float32(prob.thres_shell),
        jnp.float32(cfg.occlusion_distance),
    )

    def outer(params, mu):
        basm, bmasks = device_assembly(
            st, sdf_plan, alb_plan, params, prob.depths, prob.images, *scal, lams,
            num_obs=5, width=320, height=240,
        )
        return gn_iteration(params, basm, bmasks, mu, 8, 12)

    mu = jnp.float32(1e-4)
    out = outer(params, mu)
    jax.block_until_ready(out)
    print("warmup done; tracing", args.iters, "outer iterations", flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    t0 = time.perf_counter()
    p, m = params, mu
    for _ in range(args.iters):
        p, c0, c1, m, tries = outer(p, m)
    jax.block_until_ready((p, m))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"{args.iters} outer iterations: {dt:.3f}s ({dt/args.iters:.3f}s each)")
    print(f"elements: K=8 x nb={layout.num_blocks} x 512 = {8*layout.num_blocks*512/1e6:.2f}M")

    from tools.xplane_reader import main as xmain

    pat = os.path.join(args.trace_dir, "plugins/profile/*/*.xplane.pb")
    if not glob.glob(pat):
        print("no xplane produced at", pat)
        return 1
    xmain(pat, args.top)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
