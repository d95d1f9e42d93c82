"""Benchmark: Gauss-Newton voxel-residual throughput per chip.

Builds a realistic synthetic joint-refinement problem (shell voxel grid around
an analytic sphere, shading-consistent keyframes), then times FULL outer
iterations of the production pipeline — device-resident re-assembly
(observation re-collection with current poses, gating, weight normalization;
refine/device_assembly.py) + one relinearize→solve→accept damped-GN step
(refine/blockform.py + refine/solver.py) — the workload that dominates the
reference's runtime (problem construction + Ceres residual/autodiff-Jacobian
evaluation inside LM, SURVEY §3.3).

Metric: `gn_voxel_residual_evals_per_s` — E_g shading-cost residual+Jacobian
evaluations per second, counting the ALGEBRA produced per outer iteration
(1 linearization + exact 29-parameter Jacobi diagonal + 2·cg J-products and
1 cost evaluation per LM try) in units of one Ceres-style residual+Jacobian
evaluation — regardless of how cheaply the solver computes those objects
(BENCH_NOTES.md documents the accounting and its history).

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the ratio
is anchored against a generous estimate of Ceres-CPU throughput: 8 threads ×
~125k DynamicAutoDiffCostFunction(17 blocks) residual+Jacobian evaluations/s
per thread = 1e6 evals/s (see BENCH_NOTES.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


# optimistic estimate of the reference's Ceres CPU residual+Jacobian
# throughput (8 threads); see module docstring
REFERENCE_CPU_EVALS_PER_S = 1.0e6


def main():
    import jax

    # persistent compilation cache: the heavy jit graphs (gn_iteration,
    # device assembly) compile once per machine and reload in ~seconds
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
        num_observations=5,
        occlusion_distance=0.02,
        fix_poses=False,
        fix_intrinsics=False,
        fix_distortion=False,
    )
    prob = build_sphere_problem(
        voxel_size=0.004,
        image_size=(320, 240),
        num_frames=8,
        num_observations=5,
        cfg=cfg,
        perturb_sdf=0.001,
        perturb_albedo=0.03,
    )
    asm_t, _ = prob.assemble()
    n_active = int(np.sum(np.asarray(asm_t.eg_w) > 0))

    # production path: flat [nb, 512] block-dense fields, MXU one-hot stencil
    # shifts, fully device-resident per-iteration assembly
    layout = BlockLayout.build(prob.grid)
    st = build_level_static(layout, prob.grid, prob.topo, prob.voxel_sh)
    sdf_plan, alb_plan = layout_plans(layout)
    params = prob.params._replace(
        sdf=table_to_dense(layout, prob.params.sdf),
        albedo=table_to_dense(layout, prob.params.albedo),
    )

    cg_iters = 12
    lm_steps = 8
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
        jnp.float32(1.0),  # pyr_scale
        jnp.float32(prob.grid.voxel_size),
        jnp.float32(prob.grid.truncation),
        jnp.float32(prob.thres_shell),
        jnp.float32(cfg.occlusion_distance),
    )

    def outer_iteration(params, mu):
        basm, bmasks = device_assembly(
            st, sdf_plan, alb_plan, params, prob.depths, prob.images, *scal, lams, **akw
        )
        # production default: global block Schur-eliminated from the PCG
        # (same wall-clock per CG step, 30-35% lower cost per relinearization
        # at this configuration — BENCH_NOTES round 4 "Schur A/B")
        return gn_iteration(
            params, basm, bmasks, mu, lm_steps, cg_iters, schur_globals=True
        )

    # warmup/compile
    out = outer_iteration(params, mu)
    jax.block_until_ready(out)

    iters = 3
    tries_list = []
    t0 = time.perf_counter()
    for _ in range(iters):
        # no host sync inside the loop: iterations chain on device (pulling
        # `tries` here would stall the device ~24 ms per dispatch round-trip
        # on a remote-tunnel link); fetch everything once at the end
        params, c0, c1, mu, tries = outer_iteration(params, mu)
        tries_list.append(tries)
    # ONE value fetch of the last iteration's output is the sync point (the
    # iterations chain through `params`/`mu` data dependencies; fetching
    # every `tries` here would add a serial ~24 ms round trip per element)
    last_tries = int(tries_list[-1])
    dt = time.perf_counter() - t0
    tries_total = sum(int(t) for t in tries_list[:-1]) + last_tries

    # E_g algebra per GN iteration: 1 linearization + 29-parameter exact
    # Jacobi diagonal + per LM try (2·cg J-products + 1 cost evaluation)
    evals_per_iter = 1 + 29 + (2 * cg_iters + 1) * (tries_total / iters)
    total_evals = n_active * evals_per_iter * iters
    throughput = total_evals / dt

    result = {
        "metric": "gn_voxel_residual_evals_per_s",
        "value": round(throughput, 1),
        "unit": "E_g residual+Jacobian evals/s/chip",
        "vs_baseline": round(throughput / REFERENCE_CPU_EVALS_PER_S, 2),
        "detail": {
            "active_eg_residuals": n_active,
            "num_voxels": prob.grid.num_voxels,
            "outer_iteration_s": round(dt / iters, 4),
            "includes_device_assembly": True,
            "cg_iters": cg_iters,
            "mean_lm_tries": round(tries_total / iters, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
