"""Benchmark: Gauss-Newton voxel-residual throughput per chip.

Builds a realistic synthetic joint-refinement problem (shell voxel grid around
an analytic sphere, shading-consistent keyframes), then times full
relinearize→solve→accept GN iterations — the workload that dominates the
reference's runtime (Ceres residual+autodiff Jacobian evaluation inside LM,
SURVEY §3.3).

Metric: `gn_voxel_residual_evals_per_s` — E_g shading-cost residual
evaluations per second, counting every pass the solver makes over the residual
set per GN iteration (forward linearization, 2 per PCG iteration for JᵀJv,
29-tangent Jacobi diagonal, and one cost evaluation per LM try).

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the ratio
is anchored against a measured estimate of Ceres-CPU throughput: 8 threads ×
~125k DynamicAutoDiffCostFunction(17 blocks) residual+Jacobian evaluations/s
per thread = 1e6 evals/s (optimistic for the reference; see BENCH_NOTES.md).
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
    # observation collection) compile once per machine and reload in ~seconds
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from intrinsic3d_tpu.config import RefinementConfig
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.refine.blockform import to_block_problem
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
    asm, masks = prob.assemble()
    n_active = int(np.sum(np.asarray(asm.eg_w) > 0))

    # production layout: flat [nb, 512] block-dense fields + MXU one-hot
    # stencil shifts (refine/blockform.py)
    layout = BlockLayout.build(prob.grid)
    params, asm, masks = to_block_problem(
        layout, prob.topo.coords, asm, masks, prob.params, num_obs=5
    )

    cg_iters = 12
    lm_steps = 8
    mu = jnp.float32(1e-4)

    # warmup/compile
    out = gn_iteration(params, asm, masks, mu, lm_steps, cg_iters)
    jax.block_until_ready(out)

    iters = 3
    tries_total = 0
    t0 = time.perf_counter()
    for _ in range(iters):
        params, c0, c1, mu, tries = gn_iteration(params, asm, masks, mu, lm_steps, cg_iters)
        jax.block_until_ready(params)
        tries_total += int(tries)
    dt = time.perf_counter() - t0

    # E_g evaluations per GN iteration: 1 linearize fwd + 2·cg per LM try's
    # matvecs + 29 jacfwd tangents + 1 cost per try
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
            "gn_iteration_s": round(dt / iters, 4),
            "cg_iters": cg_iters,
            "mean_lm_tries": round(tries_total / iters, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
