"""Multi-process (2-host-shaped) dryrun of the sharded level step.

VERDICT r4 item 2: the staging paths must be valid under multi-process
`jax.distributed`, where a process can place data only on its OWN devices.
This tool launches 2 CPU processes × 4 virtual devices each (a 2-host,
8-chip shape), initializes `jax.distributed` (Gloo collectives), builds the
same synthetic problem in both processes, and runs ONE production
`SpmdLevel` step plus the sharded SVSH + recolor stages on the GLOBAL
8-device mesh — every array placed through `parallel/staging.py`'s
process-local construction. The parent then reruns the identical problem
single-process on a virtual 8-device mesh and asserts cost/coefficient
parity, proving the level loop never touches a non-addressable device's
data.

Usage:
    python tools/dryrun_multiprocess.py            # parent: spawn + compare
    python tools/dryrun_multiprocess.py --devices 8  # single-process ref only
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

PORT = 19753


def run_level(tag: str):
    """Build the problem and run one sharded step + stages on the current
    global mesh. Returns a JSON-able result dict."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from intrinsic3d_tpu.config import RefinementConfig
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.parallel.sharding import make_mesh
    from intrinsic3d_tpu.parallel.spmd import SpmdLevel, make_spmd_context
    from intrinsic3d_tpu.parallel.spmd_stages import SpmdStages, place_block_params
    from intrinsic3d_tpu.refine.device_assembly import build_level_static
    from intrinsic3d_tpu.synthetic import build_sphere_problem

    cfg = RefinementConfig(
        num_observations=2,
        occlusion_distance=0.04,
        fix_poses=False,
        fix_intrinsics=False,
        fix_distortion=False,
    )
    prob = build_sphere_problem(
        voxel_size=0.015,
        image_size=(64, 48),
        num_frames=2,
        num_observations=2,
        cfg=cfg,
        perturb_sdf=0.002,
        perturb_albedo=0.05,
    )
    n = jax.device_count()
    layout = BlockLayout.build(prob.grid, blocks_multiple=n, halo_table=False)
    st = build_level_static(layout, prob.grid, prob.topo, prob.voxel_sh, device=False)
    mesh = make_mesh(n)
    w, h = int(prob.images.shape[2]), int(prob.images.shape[1])
    level = SpmdLevel(
        mesh,
        layout,
        st,
        prob.depths,
        prob.images,
        num_obs=2,
        width=w,
        height=h,
        pyr_scale=1.0,
        voxel_size=float(prob.grid.voxel_size),
        truncation=float(prob.grid.truncation),
        thres_shell=float(prob.thres_shell),
        occlusion_distance=float(cfg.occlusion_distance),
        fix_poses=False,
        fix_intrinsics=False,
        fix_distortion=False,
        use_albedo=True,
        bmap=None,
        lm_steps=4,
        cg_iters=4,
        schur_globals=True,
        min_pose_obs=cfg.min_pose_obs,
    )
    from intrinsic3d_tpu.refine.blockform import table_to_dense

    import numpy as _np

    nb, s = layout.num_blocks, layout.block**3
    dense = _np.zeros((nb + 1) * s, _np.float32)
    dense[layout.vox_slot] = _np.asarray(prob.params.sdf)
    densea = _np.zeros((nb + 1) * s, _np.float32)
    densea[layout.vox_slot] = _np.asarray(prob.params.albedo)
    bparams = prob.params._replace(
        sdf=dense.reshape(nb + 1, s), albedo=densea.reshape(nb + 1, s)
    )
    bparams_s = level.begin(bparams)
    lambdas = jnp.asarray([0.2, 20.0, 20.0, 0.1], jnp.float32)
    out_p, c0, c1, mu, tries = level.step(bparams_s, lambdas, jnp.float32(1e-4))
    jax.block_until_ready(c1)

    # sharded SVSH + recolor stages through the process-local staging
    grid = prob.grid
    grid.sdf_refined = _np.asarray(prob.params.sdf).astype(_np.float32)
    grid.albedo = _np.asarray(prob.params.albedo).astype(_np.float32)
    colors_u8 = _np.clip(
        _np.stack([_np.asarray(prob.images)] * 3, axis=-1) * 255.0, 0, 255
    ).astype(_np.uint8)
    ctx = make_spmd_context(layout, mesh)
    stages = SpmdStages.build(
        mesh, ctx, layout, grid, prob.cam, prob.depths, jnp.asarray(colors_u8),
        0.12, 2, cfg.occlusion_distance,
    )
    bp_s = place_block_params(mesh, layout, prob.params)
    svsh, vox_sh = stages.svsh(
        bp_s, stages.stage_colors(grid.color), 10.0, prob.thres_shell
    )
    new_bd, has_bd = stages.recolor(bp_s, stages.stage_colors(grid.color))
    # replicated / process-local pulls only
    local_color_sum = float(
        sum(_np.asarray(sh.data, _np.float64).sum() for sh in new_bd.addressable_shards)
    )
    # grid-level-boundary gather: every process reconstructs the FULL table
    # (staging.to_host_global all_gathers remote shards under jax.distributed)
    cols_tab, has_tab = stages.colors_to_table(new_bd, has_bd)
    boundary_sum = float(_np.asarray(cols_tab, _np.float64).sum())
    return {
        "tag": tag,
        "devices": int(jax.device_count()),
        "local_devices": int(jax.local_device_count()),
        "process_count": int(jax.process_count()),
        "cost0": float(c0),
        "cost1": float(c1),
        "tries": int(tries),
        "svsh_sum": float(_np.asarray(svsh.coeffs, _np.float64).sum()),
        "svsh_absmax": float(_np.abs(_np.asarray(svsh.coeffs)).max()),
        "local_color_sum": local_color_sum,
        "boundary_sum": boundary_sum,
        "boundary_has": int(_np.asarray(has_tab).sum()),
    }


def child_main(pid: int, nproc: int, devices_per_proc: int):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}", num_processes=nproc, process_id=pid
    )
    res = run_level(f"proc{pid}")
    print("DRYRUN_RESULT " + json.dumps(res), flush=True)


def single_process_ref(devices: int):
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    return run_level("single")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=-1)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--devices", type=int, default=0,
                    help="run single-process reference only, on N devices")
    args = ap.parse_args()
    if args.child >= 0:
        child_main(args.child, args.nproc, 8 // args.nproc)
        return 0
    if args.devices:
        print(json.dumps(single_process_ref(args.devices)))
        return 0

    # parent: single-process reference in a subprocess (so our own jax stays
    # unconfigured), then the 2-process run, then compare
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)

    def collect(cmd):
        out = subprocess.run(
            cmd, cwd=_REPO, env=env, capture_output=True, text=True, timeout=1800
        )
        results = [
            json.loads(line.split(" ", 1)[1])
            for line in out.stdout.splitlines()
            if line.startswith("DRYRUN_RESULT ")
        ]
        if not results and out.returncode == 0 and out.stdout.strip():
            results = [json.loads(out.stdout.strip().splitlines()[-1])]
        if out.returncode != 0:
            sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:])
            raise RuntimeError(f"{cmd} failed rc={out.returncode}")
        return results

    ref = collect([sys.executable, __file__, "--devices", "8"])[0]
    print("single-process ref:", json.dumps(ref), flush=True)

    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--child", str(i), "--nproc", str(args.nproc)],
            cwd=_REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(args.nproc)
    ]
    results = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=1800)
        if p.returncode != 0:
            sys.stderr.write(out[-4000:] + "\n" + err[-4000:])
            raise RuntimeError(f"child {i} failed rc={p.returncode}")
        for line in out.splitlines():
            if line.startswith("DRYRUN_RESULT "):
                results.append(json.loads(line.split(" ", 1)[1]))
    assert len(results) == args.nproc, results
    for r in results:
        print("child:", json.dumps(r), flush=True)
        assert r["process_count"] == args.nproc
        assert r["devices"] == 8 and r["local_devices"] == 8 // args.nproc
        assert r["cost1"] < r["cost0"], r
        # parity with the single-process run (identical math; collectives
        # reorder reductions — tolerances match tests/test_multichip.py)
        assert abs(r["cost0"] - ref["cost0"]) <= 1e-4 * max(1.0, abs(ref["cost0"]))
        assert abs(r["cost1"] - ref["cost1"]) <= 1e-3 * max(1.0, abs(ref["cost1"]))
        assert abs(r["svsh_sum"] - ref["svsh_sum"]) <= 5e-3 * max(
            1.0, abs(ref["svsh_sum"])
        )
    # the two processes see the same replicated outputs, and their local
    # color shards partition the grid (sum of locals == single-process total)
    assert abs(results[0]["cost1"] - results[1]["cost1"]) < 1e-9
    mp_total = sum(r["local_color_sum"] for r in results)
    assert abs(mp_total - ref["local_color_sum"]) <= 1e-3 * max(
        1.0, abs(ref["local_color_sum"])
    )
    # the boundary gather reconstructed the full table identically on BOTH
    # processes and matches the single-process gather
    for r in results:
        assert abs(r["boundary_sum"] - ref["boundary_sum"]) <= 1e-3 * max(
            1.0, abs(ref["boundary_sum"])
        ), (r["boundary_sum"], ref["boundary_sum"])
        assert r["boundary_has"] == ref["boundary_has"]
    print(
        f"OK: 2-process x {8 // args.nproc}-device sharded level step + stages "
        f"match the single-process mesh (cost {ref['cost0']:.6f} -> "
        f"{ref['cost1']:.6f})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
