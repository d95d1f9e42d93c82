"""Multi-chip level loop: every device stage of one grid level on the mesh.

`Intrinsic3D(mesh=...)` routes each grid level through `MeshLevelRunner`,
which keeps the level's voxel state brick-sharded across the whole
(pyramid-level) loop:

    SVSH estimate + per-voxel SH interp   (parallel/spmd_stages.py, sharded)
      → joint GN optimization             (parallel/spmd.py::SpmdLevel, sharded)
      → recolor sweep                     (spmd_stages, sharded; colors loop
                                           back into the next SVSH on device)

Parameters and colors are materialized on the host only at grid-level
boundaries (for the host-side ×2 upsample / thin-shell sparsify between grid
levels, ``algorithms.cpp:202-237, 368-458``) and when refinement callbacks
are registered; pose/intrinsics updates pull only the replicated global
parameters. Host-side staging scatters run through the PROCESS-LOCAL
construction of `parallel/staging.py` (each addressable device's brick
built and placed directly, assembled with
`jax.make_array_from_single_device_arrays`) — no full-grid per-voxel device
array ever lives on a single device, and the placement is valid under
multi-process `jax.distributed` (tools/dryrun_multiprocess.py). Reference
orchestration parity: ``intrinsic3d.cpp:230-295``.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

import jax

from intrinsic3d_tpu.grid.blocks import BlockLayout
from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid
from intrinsic3d_tpu.mathutil import compute_varying_lambda, pyramid_level_to_scale
from intrinsic3d_tpu.parallel.spmd import SpmdLevel, make_spmd_context
from intrinsic3d_tpu.parallel.spmd_stages import SpmdStages, place_block_params
from intrinsic3d_tpu.refine.assembly import LevelTopology
from intrinsic3d_tpu.refine.device_assembly import build_level_static
from intrinsic3d_tpu.refine.optimizer import OptimizeStats, _log_iter, plan_eg_layout
from intrinsic3d_tpu.refine.residuals import Params

log = logging.getLogger("intrinsic3d")


class MeshLevelRunner:
    """One grid level of the refinement, fully sharded over `engine.mesh`."""

    def __init__(
        self,
        engine,  # Intrinsic3D
        grid: VoxelGrid,
        topo: LevelTopology,
        thres_shell: float,
        grid_lvl: int,
        coarsest: int,
    ):
        self.engine = engine
        self.grid = grid
        self.topo = topo
        self.thres_shell = float(thres_shell)
        self.grid_lvl = grid_lvl
        self.coarsest = coarsest
        self.placement = []  # (name, global bytes, max shard bytes) records
        mesh = engine.mesh
        self.mesh = mesh
        t0 = time.perf_counter()
        self.layout = BlockLayout.build(
            grid,
            blocks_multiple=max(8, mesh.devices.size),
            halo_table=False,
        )
        self.ctx = make_spmd_context(self.layout, mesh)
        self.stages = SpmdStages.build(
            mesh,
            self.ctx,
            self.layout,
            grid,
            engine.sensor.color_cam,
            engine.depths_lvl[0],
            engine.colors0,
            engine.cfg.subvolume_size_sh,
            engine.cfg.num_observations,
            engine.cfg.occlusion_distance,
        )
        log.info(
            "   mesh level setup: layout+halo+stages %.1fs (%d blocks / %d devices)",
            time.perf_counter() - t0,
            self.layout.num_blocks,
            mesh.devices.size,
        )

    # -- placement ----------------------------------------------------------

    def _record(self, name: str, arr) -> None:
        """Log (name, global bytes, max per-device shard bytes) for every
        per-voxel device array of the level loop — the measured evidence that
        the whole loop (not just parameters) stays ~1/n per device
        (tests/test_spmd_stages.py asserts on this)."""
        try:
            shards = arr.addressable_shards
        except Exception:
            return
        self.placement.append(
            (name, int(arr.nbytes), int(max(s.data.nbytes for s in shards)))
        )

    def table_params(self, bparams_s: Params) -> Params:
        """Brick-sharded block params → table-order Params (grid-level
        boundary host gather; multi-process-safe via
        `staging.to_host_global`)."""
        from intrinsic3d_tpu.parallel.staging import to_host_global

        sdf = to_host_global(bparams_s.sdf).reshape(-1)[self.layout.vox_slot]
        alb = to_host_global(bparams_s.albedo).reshape(-1)[self.layout.vox_slot]
        return Params(
            sdf=jnp.asarray(sdf),
            albedo=jnp.asarray(alb),
            poses=bparams_s.poses,
            intr=bparams_s.intr,
            dist=bparams_s.dist,
        )

    def _build_level(
        self, rgbd_lvl: int, poses_np: np.ndarray, intr_np: np.ndarray,
        cg_iters: int,
    ) -> SpmdLevel:
        """Statics + bucket plan + `SpmdLevel` construction + program warm
        for one pyramid level. Runs on the prefetch thread (overlapping the
        SVSH estimate) or inline when prefetch is disabled. The per-voxel SH
        static is staged as zeros and swapped for the sharded SVSH output via
        `SpmdLevel.set_eg_sh` (same aval/sharding — the warmed program stays
        valid)."""
        engine = self.engine
        cfg = engine.cfg
        grid = self.grid
        depths_level = engine.depths_lvl[rgbd_lvl]
        images_level = engine.intens_lvl[rgbd_lvl]
        pyr_scale = pyramid_level_to_scale(rgbd_lvl)
        h, w = int(depths_level.shape[1]), int(depths_level.shape[2])
        st = build_level_static(
            self.layout,
            grid,
            self.topo,
            np.zeros((grid.num_voxels, 9), np.float32),  # swapped on device
            device=False,
        )
        from intrinsic3d_tpu.refine.optimizer import eg_hbm_budget

        fb, reason, eg_chunks = plan_eg_layout(
            self.layout,
            poses_np,
            intr_np * pyr_scale,
            cfg,
            w,
            h,
            grid.voxel_size,
            self.thres_shell,
            np.asarray(depths_level),
            # element fields shard ~1/n per device on the mesh (measured
            # S/n + 0.15 GB, tools/bench_spmd_memory.py) — the memory
            # gate scales with the mesh instead of one chip
            budget=eg_hbm_budget() * self.mesh.devices.size,
        )
        if fb is not None:
            log.info(
                "  frame buckets: %d blocks/frame of %d (%.0f%% coverage, %s)",
                fb.shape[1],
                self.layout.num_blocks,
                100.0 * fb.shape[1] / self.layout.num_blocks,
                reason,
            )
        level = SpmdLevel(
            self.mesh,
            self.layout,
            st,
            depths_level,
            images_level,
            num_obs=cfg.num_observations,
            width=w,
            height=h,
            pyr_scale=float(pyr_scale),
            voxel_size=float(grid.voxel_size),
            truncation=float(grid.truncation),
            thres_shell=self.thres_shell,
            occlusion_distance=float(cfg.occlusion_distance),
            fix_poses=cfg.fix_poses,
            fix_intrinsics=cfg.fix_intrinsics,
            fix_distortion=cfg.fix_distortion,
            use_albedo=cfg.lambda_a >= 0.0,
            bmap=fb,
            lm_steps=cfg.lm_steps,
            cg_iters=cg_iters,
            ctx=self.ctx,
            schur_globals=cfg.schur_globals,
            min_pose_obs=cfg.min_pose_obs,
            eg_chunks=eg_chunks,
        )
        level.warm()
        return level

    # -- the level loop -------------------------------------------------------

    def run(self, params: Params, mu: float, cg_iters: int):
        """All pyramid levels of this grid level. Returns (table params, mu).

        Mirrors the single-device loop of `Intrinsic3D.refine` +
        `optimizer.optimize_level` (``intrinsic3d.cpp:242-295``,
        ``optimizer.cpp:109-173``) with all full-grid device stages sharded."""
        engine = self.engine
        cfg = engine.cfg
        grid = self.grid
        if self.stages is None:
            log.warning("lighting estimation impossible on level %d", self.grid_lvl)
            return params, mu

        bparams_s = place_block_params(self.mesh, self.layout, params)
        color_bd = self.stages.stage_colors(grid.color)
        for name, arr in (
            ("params.sdf", bparams_s.sdf),
            ("params.albedo", bparams_s.albedo),
            ("color", color_bd),
            ("stages.valid", self.stages._valid),
            ("stages.vpos", self.stages._vpos),
            ("stages.subvol", self.stages._subvol),
        ):
            self._record(name, arr)
        mu = jnp.float32(mu)

        for rgbd_lvl in range(cfg.num_rgbd_levels - 1, -1, -1):
            if rgbd_lvl > 0 and self.grid_lvl < self.coarsest:
                continue
            log.info("level %d (pyramid %d) [mesh]", self.grid_lvl, rgbd_lvl)

            # background level prep: statics, bucket plan, SpmdLevel
            # construction AND the program warm (trace + compile-cache read +
            # remote program load) overlap with the SVSH estimate below —
            # the mesh twin of `optimizer.LevelPrep` (VERDICT r4 item 3).
            # Pull the replicated globals to numpy on the main thread; the
            # plan needs them and SVSH does not change poses.
            import os
            import threading

            poses_np = np.asarray(bparams_s.poses)
            intr_np = np.asarray(bparams_s.intr, np.float64)
            prep_box: dict = {}

            def _prep():
                try:
                    prep_box["level"] = self._build_level(
                        rgbd_lvl, poses_np, intr_np, cg_iters
                    )
                except Exception as exc:  # noqa: BLE001 — prefetch must not kill the level
                    prep_box["exc"] = exc

            prefetch = os.environ.get("I3D_PREFETCH", "1") != "0"
            t_prep0 = time.perf_counter()
            if prefetch:
                th = threading.Thread(target=_prep, daemon=True)
                th.start()

            # lighting estimation, sharded (``intrinsic3d.cpp:250-270``)
            t0 = time.perf_counter()
            svsh, eg_sh_dev = self.stages.svsh(
                bparams_s, color_bd, cfg.subvolume_sh_lambda_reg, self.thres_shell
            )
            if svsh is None:
                log.warning("lighting estimation failed on level %d", self.grid_lvl)
                break
            engine.lighting = svsh
            log.info("   svsh + per-voxel coeffs (sharded): %.1fs", time.perf_counter() - t0)

            t0 = time.perf_counter()
            if prefetch:
                th.join()
                if "exc" in prep_box:
                    log.warning(
                        "mesh level prefetch failed (rebuilding inline): %r",
                        prep_box["exc"],
                    )
            if prep_box.get("level") is None:
                prep_box.clear()
                _prep()
                if "exc" in prep_box:
                    raise prep_box["exc"]
            level = prep_box["level"]
            level.set_eg_sh(eg_sh_dev)
            log.info(
                "   level setup: %.1fs after svsh (prep %.1fs total, overlapped)",
                time.perf_counter() - t0,
                time.perf_counter() - t_prep0,
            )
            self._record("eg_sh", eg_sh_dev)
            for arr, nm in zip(
                level._stat,
                ("st.occ", "st.valid", "st.vpos", "st.es_ref", "st.eg_sh", "st.ea_chroma"),
            ):
                self._record(f"{nm}[pyr{rgbd_lvl}]", arr)
            if level._bmap is not None:
                self._record(f"bmap[pyr{rgbd_lvl}]", level._bmap)

            # outer iterations (λ schedule + deferred scalar pulls, as
            # optimizer.optimize_level)
            stats = OptimizeStats([], [], [])
            for itr in range(cfg.iterations):
                if itr == 0:
                    t0 = time.perf_counter()
                lambda_r = compute_varying_lambda(
                    itr, cfg.iterations, cfg.lambda_r0, cfg.lambda_r1
                )
                lambda_s = compute_varying_lambda(
                    itr, cfg.iterations, cfg.lambda_s0, cfg.lambda_s1
                )
                bparams_s, cost0, cost1, mu, tries = level.step(
                    bparams_s,
                    jnp.asarray(
                        [cfg.lambda_g, lambda_r, lambda_s, cfg.lambda_a], jnp.float32
                    ),
                    mu,
                )
                stats.costs_before.append(cost0)
                stats.costs_after.append(cost1)
                stats.tries.append(tries)
                stats.mus.append(mu)
                if itr == 0:
                    log.info(
                        "   first-iteration dispatch (trace/compile/load): %.1fs",
                        time.perf_counter() - t0,
                    )
                if itr > 0:
                    _log_iter(stats, itr - 1)
            if cfg.iterations > 0:
                _log_iter(stats, cfg.iterations - 1)

            # recolor (sharded) + write-back (``intrinsic3d.cpp:353-378``)
            t0 = time.perf_counter()
            color_bd, has_bd = self.stages.recolor(bparams_s, color_bd)
            cols, has = self.stages.colors_to_table(color_bd, has_bd)
            grid.color = np.where(has[:, None], cols, grid.color).astype(np.float32)
            engine._update_sensor(bparams_s)  # uses only the replicated globals
            log.info("   recolor + write-back: %.1fs", time.perf_counter() - t0)

            if engine.callbacks:
                from intrinsic3d_tpu.refine.intrinsic3d import RefinementInfo

                params_tab = self.table_params(bparams_s)
                engine._write_back(grid, params_tab)
                info = RefinementInfo(
                    grid_level=self.grid_lvl,
                    pyramid_level=rgbd_lvl,
                    num_grid_levels=cfg.num_grid_levels,
                    num_pyramid_levels=cfg.num_rgbd_levels,
                    grid=grid,
                    params=params_tab,
                    lighting=svsh,
                )
                for cb in engine.callbacks:
                    cb(info)

        return self.table_params(bparams_s), float(mu)
