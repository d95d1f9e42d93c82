"""Host-side per-level stage profile at Tomb/Gate scale (VERDICT r4 item 6).

The ×2 upsample, thin-shell sparsify, `plan_eg_layout` frustum/occlusion
planning, `Subvolumes.compute`, topology/layout builds, and the staging
scatters all run host-side numpy once per grid level. At the current
pipeline scale (1.05M finest voxels) each is a few seconds; this tool
measures them on a synthetic ~5-10M-voxel shell (the SURVEY §6 Tomb/Gate
regime) so the next 10× scene's host budget is known, not guessed.

Opt-in (CPU, no device work on the hot path except the jitted sparsify
interior and the staging transfer, which are reported separately):

    JAX_PLATFORMS=cpu python tools/bench_host_stages.py --voxels 5e6
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shell_coords(target_voxels: float, voxel: float):
    """Analytic sphere-shell voxel coords sized to ~target_voxels: radius
    chosen so the ±2-voxel shell of a sphere holds the target count."""
    # shell count ≈ 4πr² · thickness / voxel³ with thickness = 5·voxel
    r = float(np.sqrt(target_voxels * voxel**3 / (4.0 * np.pi * 5.0 * voxel)))
    lo = int(np.floor(-(r + 4 * voxel) / voxel))
    hi = int(np.ceil((r + 4 * voxel) / voxel))
    axis = np.arange(lo, hi + 1, dtype=np.int64)
    # chunk over z-slabs to bound memory
    out = []
    for z0 in range(0, len(axis), 64):
        zz = axis[z0 : z0 + 64]
        gx, gy, gz = np.meshgrid(axis, axis, zz, indexing="ij")
        d = (
            np.sqrt(
                (gx.astype(np.float64) + 0.5) ** 2
                + (gy + 0.5) ** 2
                + (gz + 0.5) ** 2
            )
            * voxel
            - r
        )
        keep = np.abs(d) <= 2.5 * voxel
        out.append(
            (
                np.stack([gx[keep], gy[keep], gz[keep]], -1),
                d[keep].astype(np.float32),
            )
        )
    coords = np.concatenate([c for c, _ in out])
    sdf = np.concatenate([s for _, s in out])
    return coords, sdf, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=float, default=5e6)
    ap.add_argument("--voxel-size", type=float, default=0.002)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from jax.sharding import PartitionSpec as P

    from intrinsic3d_tpu.config import RefinementConfig
    from intrinsic3d_tpu.grid import algorithms as alg
    from intrinsic3d_tpu.grid.blocks import BlockLayout
    from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid
    from intrinsic3d_tpu.lighting.subvolumes import Subvolumes
    from intrinsic3d_tpu.parallel.sharding import make_mesh
    from intrinsic3d_tpu.parallel.staging import stage_table_rows
    from intrinsic3d_tpu.refine.assembly import level_topology
    from intrinsic3d_tpu.refine.optimizer import plan_eg_layout
    from intrinsic3d_tpu.mathutil import invert_pose, pose_matrix_to_vec

    timings = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                timings[name] = round(time.perf_counter() - self.t0, 2)
                print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)

        return _T()

    vs = args.voxel_size

    def fill(g, r):
        # analytic shell sdf from the grid's (sorted) coords
        d = (
            np.linalg.norm(g.coords.astype(np.float64) + 0.5, axis=-1) * g.voxel_size
            - r
        ).astype(np.float32)
        g.sdf = d
        g.sdf_refined = d.copy()
        g.weight = np.ones(len(d), np.float32)
        g.albedo = np.full(len(d), 0.6, np.float32)
        g.color = np.full((len(d), 3), 128.0, np.float32)

    with timed("synth_shell"):
        coords, _, radius = shell_coords(args.voxels, vs)
    with timed("grid_from_coords"):
        grid = VoxelGrid.from_coords(vs, coords, 0.1, 10.0, sbr=True)
        fill(grid, radius)
    n = grid.num_voxels
    print(f"shell grid: {n} voxels (radius {radius:.2f} m)", file=sys.stderr)

    with timed("level_topology"):
        topo = level_topology(grid)
    with timed("block_layout"):
        layout = BlockLayout.build(grid, blocks_multiple=args.devices, halo_table=False)
    pts = grid.voxel_to_world()
    with timed("subvolumes_compute"):
        sub = Subvolumes.compute(pts, 0.2)

    # orbit poses + flat depth maps for the planner
    from intrinsic3d_tpu.synthetic import look_at_pose

    poses6 = np.stack(
        [
            pose_matrix_to_vec(
                invert_pose(
                    look_at_pose(
                        np.array(
                            [np.sin(2 * np.pi * i / args.frames), 0.2,
                             -np.cos(2 * np.pi * i / args.frames)]
                        ) * 3.0 * radius,
                        np.zeros(3),
                    )
                )
            )
            for i in range(args.frames)
        ]
    ).astype(np.float32)
    depth_val = 3.0 * radius
    depths = np.full((args.frames, h, w), depth_val, np.float32)
    intr = np.array([0.92 * w, 0.92 * w, (w - 1) / 2, (h - 1) / 2], np.float64)
    cfg = RefinementConfig(num_observations=5, occlusion_distance=0.02)
    with timed("plan_eg_layout"):
        fb, reason, chunks = plan_eg_layout(
            layout, poses6, intr, cfg, w, h, vs, 2.0 * vs, depths
        )
    print(
        f"  plan: {'dense' if fb is None else fb.shape}, {reason}, chunks={chunks}",
        file=sys.stderr,
    )

    mesh = make_mesh(args.devices)
    with timed("staging_scatter_8dev"):
        arr = stage_table_rows(mesh, P("data", None), layout, grid.sdf_refined)
        arr.block_until_ready()

    with timed("thin_shell_sparsify"):
        g2 = alg.clear_voxels_outside_thin_shell(grid, 2.0 * vs)
    print(f"  sparsified {n} -> {g2.num_voxels}", file=sys.stderr)

    # upsample a PARENT grid sized so the child is the target scale
    with timed("upsample_parent_build"):
        pcoords, _, pr = shell_coords(args.voxels / 8.0, vs * 2)
        pgrid = VoxelGrid.from_coords(vs * 2, pcoords, 0.1, 10.0, sbr=True)
        fill(pgrid, pr)
    with timed("upsample_x2"):
        child = alg.upsample(pgrid)
    print(f"  upsample {pgrid.num_voxels} -> {child.num_voxels}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "host_stage_seconds_at_scale",
                "voxels": int(n),
                "voxel_size_m": vs,
                "frames": args.frames,
                "timings_s": timings,
                "plan": "dense" if fb is None else list(fb.shape),
                "plan_reason": reason,
                "eg_chunks": chunks,
                "upsample_child_voxels": int(child.num_voxels),
            }
        )
    )


if __name__ == "__main__":
    main()
