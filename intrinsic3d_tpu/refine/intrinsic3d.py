"""Intrinsic3D orchestrator: the double coarse-to-fine refinement driver.

Re-design of ``nv::Intrinsic3D`` (``libintrinsic3d/src/refinement/intrinsic3d.cpp``):
convert the fused grid to the refinement voxel type, build per-keyframe RGB-D
pyramids (depth resized to the color camera), then loop grid levels
(coarse→fine, thin-shell sparsify, ×2 upsample between levels) × RGB-D pyramid
levels (all levels only on the coarsest grid), per level estimating
spatially-varying SH lighting and running the joint GN optimization; voxel
colors are recomputed and refined poses/intrinsics written back after every
level.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.config import RefinementConfig
from intrinsic3d_tpu.grid import algorithms as alg
from intrinsic3d_tpu.grid import ops as gops
from intrinsic3d_tpu.grid.voxel_grid import NORMAL_OFFSETS, VoxelGrid
from intrinsic3d_tpu.image.processing import resize_depth
from intrinsic3d_tpu.lighting.svsh import estimate_svsh
from intrinsic3d_tpu.mathutil import (
    compute_varying_lambda,
    invert_pose,
    pose_matrix_to_vec,
    pose_vec_to_matrix,
)
from intrinsic3d_tpu.observations import collect_observations, recolor
from intrinsic3d_tpu.refine.optimizer import LevelPrep, optimize_level
from intrinsic3d_tpu.timer import record_phase
from intrinsic3d_tpu.refine.residuals import Params

log = logging.getLogger("intrinsic3d")


@functools.partial(jax.jit, static_argnames=("num_best", "width", "height"))
def _recolor_sweep(
    sdf,
    nbr4,
    validm,
    pts,
    poses,
    intr,
    dist,
    depths,
    colors0,
    occlusion,
    *,
    num_best,
    width,
    height,
):
    normals, _ = gops.surface_normals(sdf, nbr4, validm)
    iso = gops.voxel_center_to_iso(pts, normals, sdf)
    cam = Camera(
        fx=intr[0], fy=intr[1], cx=intr[2], cy=intr[3],
        width=width, height=height, dist=dist,
    )
    w, f = collect_observations(
        cam, poses, depths, iso, normals, occlusion, num_best=num_best
    )
    return recolor(cam, poses, depths, colors0, iso, normals, w, f, occlusion)


@dataclasses.dataclass
class RefinementInfo:
    grid_level: int
    pyramid_level: int
    num_grid_levels: int
    num_pyramid_levels: int
    grid: VoxelGrid
    params: Params
    lighting: object  # SVSHResult


class Intrinsic3D:
    """End-to-end joint appearance & geometry refinement."""

    def __init__(
        self,
        cfg: RefinementConfig,
        sensor,
        keyframe_ids: List[int],
        cg_iters: int = 12,
        mesh=None,
    ):
        """`mesh` (a `jax.sharding.Mesh`) runs every level's DEVICE stages
        spatially sharded over the mesh's devices: the joint GN optimization
        (bricked voxel blocks with halo exchange, per-iteration device
        assembly inside the sharded region, psum'd globals —
        parallel/spmd.py), the SVSH lighting estimate + per-voxel SH
        interpolation, and the recolor sweep (parallel/spmd_stages.py), with
        voxel state held brick-sharded across the whole level loop
        (refine/mesh_pipeline.py), and the INITIAL recolorization at the
        fused grid sharded through the same `SpmdStages.recolor` program
        (`_initial_recolor_mesh`). Host-side numpy stages (×2 upsample,
        thin-shell sparsify) run between grid levels on host RAM. TSDF
        fusion itself accepts its own `mesh` (grid/fusion.py::FusionVolume)."""
        self.cfg = cfg
        self.sensor = sensor
        self.keyframe_ids = list(keyframe_ids)
        self.cg_iters = cg_iters
        self.mesh = mesh
        self.callbacks: List[Callable[[RefinementInfo], None]] = []
        self.lighting = None
        # per-grid-level (name, global bytes, max per-device shard bytes)
        # placement records from the mesh path (refine/mesh_pipeline.py)
        self.mesh_placements: List[list] = []

        # image formation model (``intrinsic3d.cpp:151-203``)
        cam = sensor.color_cam
        self.intr0 = np.asarray(
            [float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)], np.float32
        )
        self.dist0 = np.zeros(5, np.float32)

        log.info("   convert and store input frames (%d keyframes)", len(self.keyframe_ids))
        t0 = time.perf_counter()
        colors_np = np.stack(
            [np.asarray(sensor.color(i), np.float32) for i in self.keyframe_ids]
        )  # [K, H, W, 3] 0..1
        depths_np = np.stack(
            [np.asarray(sensor.depth(i), np.float32) for i in self.keyframe_ids]
        )
        poses = [pose_matrix_to_vec(invert_pose(sensor.pose(i))) for i in self.keyframe_ids]

        self.num_levels = cfg.num_rgbd_levels
        # ALL keyframes' depth reprojection + color/intensity/depth pyramids
        # in ONE jitted batched program: the per-frame eager ops of
        # `Pyramid.create` cost a remote dispatch (and a one-time program
        # load) EACH on a tunnel link — measured ~60 s of the refinement
        # start-up at 10 keyframes × 640×480 (BENCH_NOTES "Per-level
        # program-load latency")
        import jax

        from intrinsic3d_tpu.image.pyramid import depth_down, pyr_down
        from intrinsic3d_tpu.color import intensity as rgb_intensity

        depth_cam = sensor.depth_cam
        num_levels = self.num_levels

        def _stacks(colors, depths):
            depths = jax.vmap(lambda d: resize_depth(depth_cam, d, cam))(depths)
            c = colors
            ds = [depths]
            xs = [jax.vmap(rgb_intensity)(c)]
            for _ in range(1, num_levels):
                c = jax.vmap(pyr_down)(c)
                xs.append(jax.vmap(rgb_intensity)(c))
                ds.append(jax.vmap(depth_down)(ds[-1]))
            return tuple(ds), tuple(xs)

        ds, xs = jax.jit(_stacks)(jnp.asarray(colors_np), jnp.asarray(depths_np))
        self.depths_lvl = list(ds)
        self.intens_lvl = list(xs)
        self.colors0 = jnp.asarray(
            np.clip(colors_np * 255.0, 0.0, 255.0).astype(np.uint8)
        )  # [K, H, W, 3] u8
        self.poses0 = np.stack(poses).astype(np.float32)  # [K, 6] world→cam
        record_phase("pyramids", time.perf_counter() - t0)
        log.info("   frame pyramids built: %.1fs", time.perf_counter() - t0)

    def add_callback(self, cb: Callable[[RefinementInfo], None]):
        self.callbacks.append(cb)

    # ------------------------------------------------------------------

    def recompute_colors(
        self, grid: VoxelGrid, params: Params, nbr4: Optional[np.ndarray] = None
    ) -> None:
        """Full observation resweep recoloring (``intrinsic3d.cpp:381-409``)
        as ONE jitted program per level shape (normals → iso-projection →
        observation collection → weighted recolor): the staged eager calls
        cost dozens of dispatches/program loads per sweep on a remote link.
        `nbr4` may pass the level's `[N, 4]` table (`LevelTopology.nbr4_idx`)."""
        if nbr4 is None:
            nbr4 = grid.neighbor_table(NORMAL_OFFSETS)
        cam = self.sensor.color_cam
        cols, has = _recolor_sweep(
            params.sdf,
            jnp.asarray(nbr4),
            jnp.asarray(grid.valid_mask()),
            jnp.asarray(grid.voxel_to_world()),
            params.poses,
            params.intr,
            params.dist,
            self.depths_lvl[0],
            self.colors0,
            jnp.float32(self.cfg.occlusion_distance),
            num_best=self.cfg.num_observations,
            width=cam.width,
            height=cam.height,
        )
        cols = np.asarray(cols)
        has = np.asarray(has)
        grid.color = np.where(has[:, None], cols, grid.color).astype(np.float32)

    def _initial_recolor_mesh(self, grid: VoxelGrid, params: Params) -> None:
        """The initial recolorization (``intrinsic3d.cpp:214-217``) sharded
        over `self.mesh` through the same `SpmdStages.recolor` program the
        level loop uses — so under a mesh NO device stage concentrates the
        full grid on one device, including this pre-level-loop sweep. Falls
        back to the single-device sweep when the grid has no subvolume
        partition (degenerate/empty scenes)."""
        from intrinsic3d_tpu.grid.blocks import BlockLayout
        from intrinsic3d_tpu.parallel.spmd import make_spmd_context
        from intrinsic3d_tpu.parallel.spmd_stages import (
            SpmdStages,
            place_block_params,
        )

        layout = BlockLayout.build(
            grid, blocks_multiple=max(8, self.mesh.devices.size), halo_table=False
        )
        ctx = make_spmd_context(layout, self.mesh)
        stages = SpmdStages.build(
            self.mesh,
            ctx,
            layout,
            grid,
            self.sensor.color_cam,
            self.depths_lvl[0],
            self.colors0,
            self.cfg.subvolume_size_sh,
            self.cfg.num_observations,
            self.cfg.occlusion_distance,
        )
        if stages is None:
            self.recompute_colors(grid, params)
            return
        bparams_s = place_block_params(self.mesh, layout, params)
        color_bd = stages.stage_colors(grid.color)
        color_bd, has_bd = stages.recolor(bparams_s, color_bd)
        cols, has = stages.colors_to_table(color_bd, has_bd)
        grid.color = np.where(has[:, None], cols, grid.color).astype(np.float32)
        self.mesh_placements.append(
            [("initial_recolor.color", int(color_bd.nbytes),
              int(max(s.data.nbytes for s in color_bd.addressable_shards)))]
        )

    def _write_back(self, grid: VoxelGrid, params: Params) -> None:
        grid.sdf_refined = np.asarray(params.sdf).astype(np.float32)
        grid.albedo = np.asarray(params.albedo).astype(np.float32)

    def _update_sensor(self, params: Params) -> None:
        """Refined poses/intrinsics back into the sensor
        (``intrinsic3d.cpp:353-378``)."""
        poses = np.asarray(params.poses)
        for i, fid in enumerate(self.keyframe_ids):
            T_w2c = pose_vec_to_matrix(poses[i])
            self.sensor.set_pose(fid, invert_pose(T_w2c))
        intr = np.asarray(params.intr)
        cam = self.sensor.color_cam
        self.sensor.color_cam = Camera.create(
            intr[0], intr[1], intr[2], intr[3], cam.width, cam.height, np.asarray(params.dist)
        )

    # ------------------------------------------------------------------

    def refine(self, fused: VoxelGrid) -> VoxelGrid:
        """Run the full double coarse-to-fine refinement
        (``intrinsic3d.cpp:206-295``). Returns the refined (finest) grid."""
        cfg = self.cfg
        grid = fused.to_sbr() if not fused.is_sbr else fused

        params = Params(
            sdf=jnp.asarray(grid.sdf_refined),
            albedo=jnp.asarray(grid.albedo),
            poses=jnp.asarray(self.poses0),
            intr=jnp.asarray(self.intr0),
            dist=jnp.asarray(self.dist0),
        )
        log.info("   initial SDF recolorization ...")
        t0 = time.perf_counter()
        if self.mesh is not None:
            self._initial_recolor_mesh(grid, params)
        else:
            self.recompute_colors(grid, params)
        record_phase("initial_recolor", time.perf_counter() - t0)

        mu = 1e-4
        coarsest = cfg.num_grid_levels - 1
        bprep = None  # coords-only boundary precompute (alg.UpsamplePrep)
        for grid_lvl in range(coarsest, -1, -1):
            log.info("refinement on grid level %d (voxel %.4f, %d voxels)",
                     grid_lvl, grid.voxel_size, grid.num_voxels)
            # thin-shell threshold schedule (``intrinsic3d.cpp:298-318``)
            factor = cfg.thin_shell_factor
            if cfg.thin_shell_factor_final > 0.0:
                factor = compute_varying_lambda(
                    coarsest - grid_lvl,
                    cfg.num_grid_levels,
                    cfg.thin_shell_factor,
                    cfg.thin_shell_factor_final,
                )
            thres_shell = factor * grid.voxel_size
            if cfg.clear_distant_voxels:
                t0 = time.perf_counter()
                grid = alg.clear_voxels_outside_thin_shell(
                    grid,
                    thres_shell,
                    layout=bprep.layout_for(grid) if bprep is not None else None,
                )
                bprep = None
                record_phase(f"sparsify[g{grid_lvl}]", time.perf_counter() - t0)
                log.info(
                    "   sparsified to %d voxels (%.1fs)",
                    grid.num_voxels,
                    time.perf_counter() - t0,
                )
                params = Params(
                    sdf=jnp.asarray(grid.sdf_refined),
                    albedo=jnp.asarray(grid.albedo),
                    poses=params.poses,
                    intr=params.intr,
                    dist=params.dist,
                )

            # the full topology (4 stencil tables + E_a pairs, ~2 s at the
            # finest level) is built lazily — in the LevelPrep background
            # thread on the production path (refine.assembly.level_topology
            # memoizes per grid object); the main thread only needs nbr4
            nbr4 = grid.neighbor_table(NORMAL_OFFSETS)

            if self.mesh is not None:
                # every device stage of the level loop sharded over the mesh
                # (solver + SVSH + recolor; refine/mesh_pipeline.py)
                from intrinsic3d_tpu.refine.assembly import level_topology
                from intrinsic3d_tpu.refine.mesh_pipeline import MeshLevelRunner

                runner = MeshLevelRunner(
                    self, grid, level_topology(grid), thres_shell, grid_lvl, coarsest
                )
                params, mu = runner.run(params, mu, self.cg_iters)
                self.mesh_placements.append(runner.placement)
                if grid_lvl > 0:
                    t0 = time.perf_counter()
                    self._write_back(grid, params)
                    grid = alg.upsample(grid)
                    log.info("   upsampled x2: %.1fs", time.perf_counter() - t0)
                    params = Params(
                        sdf=jnp.asarray(grid.sdf_refined),
                        albedo=jnp.asarray(grid.albedo),
                        poses=params.poses,
                        intr=params.intr,
                        dist=params.dist,
                    )
                continue

            prep = None
            for rgbd_lvl in range(cfg.num_rgbd_levels - 1, -1, -1):
                if rgbd_lvl > 0 and grid_lvl < coarsest:
                    continue
                log.info("level %d (pyramid %d)", grid_lvl, rgbd_lvl)
                if prep is None:
                    # overlap the level's topology/layout/static/bucket build
                    # and the remote program load with the lighting estimate
                    prep = LevelPrep(
                        grid, None, params, cfg,
                        self.depths_lvl[rgbd_lvl], self.intens_lvl[rgbd_lvl],
                        thres_shell, rgbd_lvl, self.cg_iters,
                    )

                # lighting estimation (``intrinsic3d.cpp:250-270``)
                t0 = time.perf_counter()
                self._write_back(grid, params)
                svsh, voxel_sh = estimate_svsh(
                    grid,
                    cfg.subvolume_size_sh,
                    cfg.subvolume_sh_lambda_reg,
                    thres_shell,
                    weighted=True,
                    with_voxel_sh=True,  # interpolated on device in-program
                    nbr4=nbr4,  # reuse the level's neighbor table
                )
                if svsh is None:
                    log.warning("lighting estimation failed on level %d", grid_lvl)
                    break
                self.lighting = svsh
                record_phase(f"svsh[g{grid_lvl}p{rgbd_lvl}]", time.perf_counter() - t0)
                log.info("   svsh + per-voxel coeffs: %.1fs", time.perf_counter() - t0)

                if grid_lvl > 0 and (bprep is None or bprep.grid is not grid):
                    # overlap the NEXT boundary's coords-only structure
                    # (upsample tables + child sparsify layout/program) with
                    # the solver iterations below (alg.UpsamplePrep)
                    bprep = alg.UpsamplePrep(grid)

                params, mu, _ = optimize_level(
                    grid,
                    None,  # topology resolved lazily (prep thread / memoized)
                    params,
                    cfg,
                    self.sensor.color_cam,
                    self.depths_lvl[rgbd_lvl],
                    self.intens_lvl[rgbd_lvl],
                    voxel_sh,
                    thres_shell,
                    rgbd_lvl,
                    mu0=mu,
                    cg_iters=self.cg_iters,
                    mesh=self.mesh,
                    prep=prep,
                )
                used_layout = prep.layout if (prep is not None and prep.enabled) else None
                next_r = rgbd_lvl - 1
                if next_r >= 0 and (grid_lvl == coarsest or next_r == 0):
                    # warm the next pyramid level's program while this level
                    # recolors and the next SVSH estimate runs
                    prep = LevelPrep(
                        grid, None, params, cfg,
                        self.depths_lvl[next_r], self.intens_lvl[next_r],
                        thres_shell, next_r, self.cg_iters,
                        layout=used_layout, program_only=True,
                    )  # topo: level_topology cache hit when needed
                else:
                    prep = None

                # finish rgbd level (``intrinsic3d.cpp:353-378``)
                t0 = time.perf_counter()
                self._write_back(grid, params)
                self.recompute_colors(grid, params, nbr4=nbr4)
                self._update_sensor(params)
                record_phase(f"recolor[g{grid_lvl}p{rgbd_lvl}]", time.perf_counter() - t0)
                log.info("   recolor + write-back: %.1fs", time.perf_counter() - t0)

                info = RefinementInfo(
                    grid_level=grid_lvl,
                    pyramid_level=rgbd_lvl,
                    num_grid_levels=cfg.num_grid_levels,
                    num_pyramid_levels=cfg.num_rgbd_levels,
                    grid=grid,
                    params=params,
                    lighting=svsh,
                )
                for cb in self.callbacks:
                    cb(info)

            # finish grid level: ×2 upsample (``intrinsic3d.cpp:320-333``)
            if grid_lvl > 0:
                t0 = time.perf_counter()
                self._write_back(grid, params)
                grid = alg.upsample(grid, prep=bprep)
                record_phase(f"upsample[g{grid_lvl}]", time.perf_counter() - t0)
                log.info("   upsampled x2: %.1fs", time.perf_counter() - t0)
                params = Params(
                    sdf=jnp.asarray(grid.sdf_refined),
                    albedo=jnp.asarray(grid.albedo),
                    poses=params.poses,
                    intr=params.intr,
                    dist=params.dist,
                )

        self._write_back(grid, params)
        return grid
