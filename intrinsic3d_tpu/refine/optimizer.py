"""Per-level optimization driver: the reference's ``Optimizer::optimize`` loop
(``libintrinsic3d/src/refinement/optimizer.cpp:109-173``) — for each outer
iteration: re-collect observations with the current parameters, rebuild the
static-shape assembly with the scheduled λ_r/λ_s, and take one accepted damped
Gauss-Newton step on device."""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.config import RefinementConfig
from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid
from intrinsic3d_tpu.mathutil import compute_varying_lambda, pyramid_level_to_scale
from intrinsic3d_tpu.grid.blocks import BlockLayout
from intrinsic3d_tpu.refine.assembly import (
    LevelTopology,
    build_assembly,
    level_topology,
)
from intrinsic3d_tpu.refine.blockform import (
    build_frame_buckets,
    layout_plans,
    params_from_block,
    table_to_dense,
)
from intrinsic3d_tpu.refine.device_assembly import (
    LevelStatic,
    build_level_static,
    device_assembly,
)
from intrinsic3d_tpu.refine.residuals import Params
from intrinsic3d_tpu.refine.solver import gn_iteration
from intrinsic3d_tpu.timer import record_phase

log = logging.getLogger("intrinsic3d")

# peak HLO-temp bytes per dense E_g element through the jitted gn_iteration
# graph (measured: 20.9 GB at K=10 × D=2.92M on TPU v5e, incl. padding and
# remat temporaries), and the fallback budget above which the dense
# frame-major layout must yield to bucketing regardless of its ~2x
# per-element stencil overhead (v5e HBM is 15.75 GB; leave room for images +
# persistent fields). The live budget is queried from the device
# (`eg_hbm_budget`) so other TPU generations get the right crossover.
_EG_DENSE_BYTES_PER_ELEMENT = 720
# the BUCKETED gn graph measured 595 B/element at the finest pipeline level
# (16.49 GB compile at [K=10, NBc=5408, B³=512] elements, v5e); 640 keeps a
# ~7% calibration margin. Used ONLY to size the hard per-frame trim — the
# dense-calibrated 720 over-trims the bucket budget by ~12% (measured
# quality: rms 0.570 mm at 720-sized trim vs 0.52-0.55 mm at 640)
_EG_BUCKET_BYTES_PER_ELEMENT = 640
# chunked-streaming mode (linearize_block_chunked) memory model:
#     peak ≈ max(el·ASSEMBLY,  el·PERSIST + ceil(K/C)·el_frame·TRANSIENT)
# Calibrated on the CHIP via XLA buffer assignment
# (tools/bench_chunked_memory.py --backend axon, bench scale: 1.97M
# exact-coverage elements, K=8, TPU v5e, 2026-08-22): total temps
# 872 B/el one-shot → 627 (C=2) → 439 (C=4) → 386 B/el (C=8, 1 frame per
# chunk); slope ≈ 420-555 B per chunk-resident element-frame, extrapolated
# fpc→0 floor ≈ 334 B/el (persistent bf16 coefficients + the un-chunkable
# assembly fields + the PCG loop's element-shaped matvec/unbucket buffers).
# The floor is element-proportional (no fixed-size component of note), so
# the bench-scale figures transfer to the finest level; constants carry a
# small margin, and the optimize_level RESOURCE_EXHAUSTED replan guard
# covers residual mis-calibration.
_EG_CHUNK_PERSIST_BYTES = 340
# per-element bytes of the PER-CHUNK linearize/acceptance transients (the
# stencil/vjp temporaries the streaming bounds), applied to one chunk's
# ceil(K/C)·NBc·B³ elements
_EG_CHUNK_TRANSIENT_BYTES = 560
# per-element bytes of the assembly phase (observation weights, global top-N
# rank argsorts, validity probe) — NOT chunk-reducible (the per-voxel top-N
# ranks over all K frames at once); if this alone exceeds the budget the
# plan falls back to the hard trim. Indistinguishable from the persistent
# floor in the measured curve; pinned to the same figure.
_EG_ASSEMBLY_BYTES = 340
_EG_DENSE_HBM_BUDGET_FALLBACK = 11e9
# headroom reserved out of the queried device memory for everything that is
# not E_g element temps: images, persistent parameter/static fields, and the
# non-element solver temps (calibrated on v5e: 15.75 GB − 4.75 GB = the
# measured 11 GB element budget)
_EG_HBM_HEADROOM = 4.75e9


_HBM_FALLBACK_WARNED = False


def _warn_hbm_fallback(msg: str, *args) -> None:
    """Warn once per process — the budget is re-queried every level, but the
    mis-calibration story doesn't change between calls."""
    global _HBM_FALLBACK_WARNED
    if not _HBM_FALLBACK_WARNED:
        _HBM_FALLBACK_WARNED = True
        log.warning(msg, *args)


def eg_hbm_budget() -> float:
    """HBM budget for the dense E_g element fields, from the attached
    device's reported memory (fallback: the measured v5e figure). Capped at
    70% of device memory so small-HBM devices keep proportional headroom."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        total = float(stats.get("bytes_limit", 0.0) or 0.0)
    except Exception as exc:  # noqa: BLE001 - any backend failure → fallback
        _warn_hbm_fallback(
            "eg_hbm_budget: device memory query failed (%r); falling back to "
            "the v5e constant %.1f GB — the dense/bucketed E_g crossover may "
            "be mis-calibrated on this backend",
            exc,
            _EG_DENSE_HBM_BUDGET_FALLBACK / 1e9,
        )
        return _EG_DENSE_HBM_BUDGET_FALLBACK
    if total <= 0.0:
        _warn_hbm_fallback(
            "eg_hbm_budget: backend reports no 'bytes_limit' in "
            "memory_stats(); using the v5e fallback budget %.1f GB",
            _EG_DENSE_HBM_BUDGET_FALLBACK / 1e9,
        )
        return _EG_DENSE_HBM_BUDGET_FALLBACK
    return min(total - _EG_HBM_HEADROOM, 0.7 * total)


def plan_eg_layout(
    layout: BlockLayout,
    poses: np.ndarray,  # [K, 6]
    intr_level: np.ndarray,  # [4] fx fy cx cy at the pyramid level
    cfg: RefinementConfig,
    width: int,
    height: int,
    voxel_size: float,
    thres_shell: float,
    depths: Optional[np.ndarray],  # [K, H, W] level depth maps
    *,
    budget: Optional[float] = None,
    bytes_per_element: float = _EG_DENSE_BYTES_PER_ELEMENT,
) -> tuple[Optional[np.ndarray], str, int]:
    """Choose the E_g element layout for one (grid, pyramid) level.

    Returns ``(bmap, reason, eg_chunks)``: ``bmap=None`` keeps the dense
    frame-major `[K, nb, B³]` element grid; otherwise ``bmap [K, NBc]``
    selects the frame-bucketed layout (``blockform.build_frame_buckets``).
    ``eg_chunks > 1`` streams the linearization/acceptance over that many
    frame chunks (``blockform.linearize_block_chunked``) — engaged when the
    exact layout exceeds the HBM budget but streaming makes it fit, so the
    reference's per-voxel top-N over ALL frames survives
    (``colorization.cpp:357-370``); the hard per-frame trim remains the last
    resort when even 1-frame chunks cannot fit.

    Decision rules (testable in isolation by pinning `budget`):

    - bucketing wins on SPEED when the uncapped, exact bucket layout halves
      the element count (the many-keyframe regime, BENCH_NOTES "K ≫
      num_obs") — the decision is made on an UNCAPPED build so the
      speed-win path stays exact (per-voxel top-N over all K frames);
    - ``cfg.frame_bucketing == "capped"`` additionally considers the
      PER-BLOCK FRAME-CAPPED layout (cap = num_observations + 3) as a speed
      candidate: elements are bounded at cap·nb·B³ for ANY keyframe count.
      This is a documented, opt-in divergence from the reference's
      per-voxel top-N over all K frames (each block's candidate set drops
      its worst views; step quality pinned within a few percent by
      tests/test_frame_buckets.py) — the exact modes never cap for speed;
    - bucketing is FORCED when the dense element fields would blow the HBM
      budget; only if the exact bucketed layout STILL exceeds the budget is
      the per-block frame cap engaged (benign approximation: each block
      keeps its `num_observations + 1` closest frames), and a residual
      overflow is logged rather than silently OOMing;
    - the depth-interval occlusion cull is applied only when
      ``cfg.occlusion_distance > 0`` — at ``0`` the observation weight skips
      the |depth−z| visibility test entirely (``colorization.cpp:256``,
      "0.0 = no occlusion checks"), so depth-culled blocks could carry
      nonzero-weight elements;
    - the cull's depth slack grows with the level's shell threshold: E_g iso
      points sit up to `thres_shell` outside the block AABB.
    """
    if getattr(cfg, "frame_bucketing", "auto") == "never":
        return None, "dense (bucketing disabled)", 1
    if budget is None:
        budget = eg_hbm_budget()
    k = int(poses.shape[0])
    s = layout.block**3
    nb = layout.num_blocks
    use_depth_cull = depths is not None and cfg.occlusion_distance > 0.0
    common = dict(
        layout=layout,
        poses6=np.asarray(poses),
        intr4=np.asarray(intr_level, np.float64),
        width=width,
        height=height,
        voxel_size=voxel_size,
        depths=np.asarray(depths) if use_depth_cull else None,
        occlusion=cfg.occlusion_distance,
        depth_slack=0.05 + float(thres_shell),
    )
    fb = build_frame_buckets(**common, margin_px=0.15 * max(width, height))
    dense_bytes = k * nb * s * bytes_per_element
    win_speed = 2 * fb.shape[1] <= nb
    win_memory = dense_bytes > budget and fb.shape[1] < nb
    reason = "memory-forced" if (win_memory and not win_speed) else (
        "speed" if win_speed else "forced by config"
    )
    cap = cfg.num_observations + 3
    if (
        cfg.frame_bucketing == "capped"
        and not (win_speed or win_memory)
        and k > cap
    ):
        # opt-in K-bounded speed mode: a capped bucket build can win where
        # the exact one cannot (per-block candidate frames drop the worst
        # views; BENCH_NOTES "K-scaling measurements")
        fbc = build_frame_buckets(
            **common, margin_px=0.15 * max(width, height), max_frames_per_block=cap
        )
        if 2 * fbc.shape[1] <= nb:
            return fbc, f"speed, frame-capped at {cap} (opt-in)", 1
    if not (cfg.frame_bucketing == "always" or win_speed or win_memory):
        return None, "dense (full frame coverage, fits HBM)", 1
    bucket_bytes = k * fb.shape[1] * s * bytes_per_element
    if bucket_bytes > budget:
        # exact buckets too big for the one-shot layout: FIRST try streaming
        # the exact layout over frame chunks (VERDICT r4 item 1 — coverage
        # must not pay for memory): only the compact bf16 coefficient fields
        # persist through the PCG while the linearize/acceptance transients
        # are bounded at one chunk's worth. Feasible when the un-chunkable
        # assembly phase and the persistent fields both fit.
        el = k * fb.shape[1] * s
        persist = el * _EG_CHUNK_PERSIST_BYTES
        assembly = el * _EG_ASSEMBLY_BYTES
        per_frame_t = fb.shape[1] * s * _EG_CHUNK_TRANSIENT_BYTES
        if persist < budget and assembly <= budget:
            f_max = int((budget - persist) // per_frame_t)
            if f_max >= 1:
                chunks = -(-k // f_max)
                if chunks > 1:
                    log.info(
                        "  E_g exact layout streamed in %d frame chunks "
                        "(%.1f GB persistent + %.1f GB/chunk transient + "
                        "%.1f GB assembly <= %.1f GB budget; full %d-block "
                        "coverage kept)",
                        chunks,
                        persist / 1e9,
                        min(f_max, k) * per_frame_t / 1e9,
                        assembly / 1e9,
                        budget / 1e9,
                        fb.shape[1],
                    )
                    return fb, reason + f", streamed in {chunks} chunks", chunks
        # exact buckets too big: ONE rebuild with (a) the per-block frame
        # cap (tightest cap that still covers the per-voxel top-N) + halved
        # frustum margin, and (b) the HARD per-frame budget backstop. The
        # frame cap bounds total (block, frame) pairs but NOT the largest
        # per-frame bucket, which is what the element grid [K, NBc, B³]
        # actually scales with (one central frame can sit in nearly every
        # block's top-M — measured NBc = 95% of nb at pipeline scale,
        # compiling to 105% of HBM and crashing). The trim is
        # cover-protected — a block keeps its per-voxel top-N frame support
        # wherever the cap left ≥ N frames — and engages only when a
        # frame's capped bucket exceeds b_max; without it the level's
        # program OOMs at compile, so any approximation is strictly better
        # than the alternative.
        trim_bytes = min(bytes_per_element, _EG_BUCKET_BYTES_PER_ELEMENT)
        b_max = int(budget // (k * s * trim_bytes))
        # down-quantize the trim cap to a bucket-ladder rung so the trimmed
        # width is a stable compiled shape (VERDICT r4 item 4)
        from intrinsic3d_tpu.refine.blockform import bucket_ladder_down

        b_max = bucket_ladder_down(max(8, b_max))
        trim_stats: dict = {}
        fb = build_frame_buckets(
            **common,
            margin_px=0.08 * max(width, height),
            max_frames_per_block=min(cfg.num_observations + 1, k),
            max_blocks_per_frame=b_max,
            protect_cover=cfg.num_observations,
            stats=trim_stats,
        )
        reason += ", frame-capped"
        if trim_stats.get("trimmed_pairs", 0):
            bucket_bytes = k * fb.shape[1] * s * trim_bytes
            reason += f", trimmed to {b_max} blocks/frame"
            log.warning(
                "  bucketed E_g elements exceeded the HBM budget after "
                "frame capping — per-frame buckets trimmed to %d blocks "
                "(%.1f GB <= %.1f GB budget at the bucket-calibrated "
                "%d B/element)",
                b_max,
                bucket_bytes / 1e9,
                budget / 1e9,
                int(trim_bytes),
            )
    return fb, reason, 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_obs",
        "width",
        "height",
        "fix_poses",
        "fix_intrinsics",
        "fix_distortion",
        "use_albedo",
        "lm_steps",
        "cg_iters",
        "schur_globals",
        "min_pose_obs",
        "eg_chunks",
    ),
)
def _fused_outer_step(
    st,
    sdf_plan,
    alb_plan,
    bparams,
    depths,
    images,
    pyr_scale,
    voxel_size,
    truncation,
    thres_shell,
    occlusion_distance,
    lambdas,
    mu,
    bmap,
    *,
    num_obs,
    width,
    height,
    fix_poses,
    fix_intrinsics,
    fix_distortion,
    use_albedo,
    lm_steps,
    cg_iters,
    schur_globals=False,
    min_pose_obs=0,
    eg_chunks=1,
):
    """Device assembly + damped-GN step as ONE program.

    The two halves are separately-jitted functions (inlined here); fusing
    them matters on the remote-tunnel link, where loading a compiled
    program onto the chip costs tens of seconds per (grid, pyramid) level —
    one program per level instead of two halves the per-level load latency
    (measured in BENCH_NOTES "Per-level program-load latency")."""
    basm, bmasks = device_assembly(
        st,
        sdf_plan,
        alb_plan,
        bparams,
        depths,
        images,
        pyr_scale,
        voxel_size,
        truncation,
        thres_shell,
        occlusion_distance,
        lambdas,
        num_obs=num_obs,
        width=width,
        height=height,
        fix_poses=fix_poses,
        fix_intrinsics=fix_intrinsics,
        fix_distortion=fix_distortion,
        use_albedo=use_albedo,
        bmap=bmap,
        min_pose_obs=min_pose_obs,
    )
    return gn_iteration(
        bparams, basm, bmasks, mu, lm_steps, cg_iters,
        schur_globals=schur_globals, eg_chunks=eg_chunks,
    )


class LevelPrep:
    """Background level preparation + program prefetch (VERDICT r3 item 6).

    On the tunnel link, loading a compiled program onto the chip costs
    seconds to tens of seconds per (grid, pyramid) level even with a warm
    persistent compile cache (BENCH_NOTES "Per-level program-load latency"),
    and it is paid at the level's FIRST solver dispatch — serialized after
    SVSH. The level's program shapes are fully known before SVSH runs, so
    this thread overlaps with it:

    - builds the level's BlockLayout / LevelStatic (zero SH — filled in
      after the lighting estimate) / frame-bucket plan on the host, and
    - issues ONE dummy `_fused_outer_step` call with zero parameters and
      images (all residual weights gate to zero, so every Pallas sampler
      chunk skips and the LM loop's evaluations are ~free) purely to drive
      the trace → compile-cache load → REMOTE PROGRAM UPLOAD through the
      same jit cache entry the real iterations will hit.

    `program_only=True` (subsequent pyramid levels of the coarsest grid)
    skips the reusable statics and warms only the program for the next image
    shapes. Disable with I3D_PREFETCH=0."""

    def __init__(
        self,
        grid,
        topo,
        params,
        cfg,
        depths_level,
        images_level,
        thres_shell,
        rgbd_level: int,
        cg_iters: int,
        layout: Optional[BlockLayout] = None,
        program_only: bool = False,
    ):
        import threading

        self.enabled = os.environ.get("I3D_PREFETCH", "1") != "0"
        self.layout = layout
        self.topo = topo  # may be None: built in-thread (level_topology)
        self.st = None
        self.fb = None
        self.compiled = None  # AOT-compiled `_fused_outer_step` executable
        self.reason = ""
        self.eg_chunks = 1
        self._exc = None
        self._program_only = program_only
        self._args = (grid, topo, params, cfg, depths_level, images_level,
                      thres_shell, rgbd_level, cg_iters)
        if not self.enabled:
            return
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            self._prepare()
        except Exception as exc:  # noqa: BLE001 — prefetch must never kill a level
            self._exc = exc
            log.warning("level prefetch failed (falling back to inline): %r", exc)
            self.layout = None
            self.st = None
            self.fb = None
            self.topo = None
            self.compiled = None
            self.eg_chunks = 1

    def _prepare(self):
        (grid, topo, params, cfg, depths_level, images_level, thres_shell,
         rgbd_level, cg_iters) = self._args
        t0 = time.perf_counter()
        marks = [("start", t0)]  # sub-phase attribution (logged at the end)
        pyr_scale = pyramid_level_to_scale(rgbd_level)
        h, w = int(depths_level.shape[1]), int(depths_level.shape[2])
        if self.layout is None:
            self.layout = BlockLayout.build(grid, halo_table=False)
        layout = self.layout
        marks.append(("layout", time.perf_counter()))
        self.fb, self.reason, self.eg_chunks = plan_eg_layout(
            layout,
            np.asarray(params.poses),
            np.asarray(params.intr, np.float64) * pyr_scale,
            cfg,
            w,
            h,
            grid.voxel_size,
            thres_shell,
            np.asarray(depths_level),
        )
        marks.append(("plan", time.perf_counter()))
        if not self._program_only:
            # the static build (host numpy scatters, seconds at the finest
            # level) overlaps with the dummy call's remote program load below:
            # the dummy needs only shapes, which are fixed once fb is planned
            import threading

            if topo is None:
                # the neighbor tables also move OFF the critical path: the
                # main thread only needs nbr4 (built separately for SVSH)
                topo = level_topology(grid)
            marks.append(("topo", time.perf_counter()))
            self.topo = topo
            st_box = {}

            def _build_st():
                try:
                    st_box["st"] = build_level_static(
                        layout, grid, topo, np.zeros((grid.num_voxels, 9), np.float32)
                    )
                except Exception as exc:  # noqa: BLE001
                    st_box["exc"] = exc

            st_thread = threading.Thread(target=_build_st, daemon=True)
            st_thread.start()
        # AOT program warm: `lower(...).compile()` drives the trace, the
        # persistent-compile-cache read, and the remote program load WITHOUT
        # executing the solver graph — the former zero-weight dummy call
        # still ran the full LM/CG loop over the dense block slots
        # (measured 10.1 s warm at the 1.05M-voxel finest level) and staged
        # ~250 MB of zero arrays over the link. ShapeDtypeStructs for the
        # big operands avoid even the host allocations; the compiled
        # executable is handed to `optimize_level`, whose every iteration
        # calls it directly (same avals the jit path would see —
        # `first_dispatch` stays 0.0).
        nb, s = layout.num_blocks, layout.block**3
        k = int(params.poses.shape[0])
        sdf_plan, alb_plan = layout_plans(layout)
        f32 = jnp.float32
        sds = jax.ShapeDtypeStruct
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
        lowered = _fused_outer_step.lower(
            zst,
            sdf_plan,
            alb_plan,
            zparams,
            sds(tuple(depths_level.shape), f32),
            sds(tuple(images_level.shape), f32),
            np.float32(pyr_scale),
            np.float32(1.0),
            np.float32(1.0),
            np.float32(thres_shell),
            np.float32(cfg.occlusion_distance),
            np.zeros(4, np.float32),
            np.float32(1e-4),
            None if self.fb is None else sds(tuple(self.fb.shape), jnp.int32),
            num_obs=cfg.num_observations,
            width=w,
            height=h,
            fix_poses=cfg.fix_poses,
            fix_intrinsics=cfg.fix_intrinsics,
            fix_distortion=cfg.fix_distortion,
            use_albedo=cfg.lambda_a >= 0.0,
            lm_steps=cfg.lm_steps,
            cg_iters=cg_iters,
            schur_globals=cfg.schur_globals,
            min_pose_obs=cfg.min_pose_obs,
            eg_chunks=self.eg_chunks,
        )
        self.compiled = lowered.compile()
        marks.append(("dummy", time.perf_counter()))
        if not self._program_only:
            st_thread.join()
            if "exc" in st_box:
                raise st_box["exc"]
            self.st = st_box["st"]
            marks.append(("st_join", time.perf_counter()))
        record_phase(f"prefetch[p{rgbd_level}v{grid.num_voxels}]", time.perf_counter() - t0)
        breakdown = " ".join(
            f"{name} {t - prev:.1f}s"
            for (_, prev), (name, t) in zip(marks, marks[1:])
        )
        log.info(
            "   prefetched level program (pyr %d%s): %.1fs in background (%s)",
            rgbd_level,
            ", program only" if self._program_only else "",
            time.perf_counter() - t0,
            breakdown,
        )

    def join(self):
        if self.enabled:
            self._thread.join()
        return self


@dataclasses.dataclass
class OptimizeStats:
    costs_before: list
    costs_after: list
    tries: list
    mus: list = dataclasses.field(default_factory=list)


def _log_iter(stats: OptimizeStats, itr: int) -> None:
    log.info(
        "   iter %d: cost %.6e -> %.6e (lm tries %d, mu %.2e)",
        itr,
        float(stats.costs_before[itr]),
        float(stats.costs_after[itr]),
        int(stats.tries[itr]),
        float(stats.mus[itr]),
    )


def optimize_level(
    grid: VoxelGrid,
    topo: Optional[LevelTopology],
    params: Params,
    cfg: RefinementConfig,
    base_cam: Camera,
    depths_level: jnp.ndarray,  # [K, H, W]
    images_level: jnp.ndarray,  # [K, H, W] intensity
    voxel_sh: np.ndarray,  # [N, 9]
    thres_shell: float,
    rgbd_level: int,
    mu0: float = 1e-4,
    cg_iters: int = 12,
    use_blocks: bool = True,
    mesh=None,
    prep: Optional[LevelPrep] = None,
) -> tuple[Params, float, OptimizeStats]:
    """Run cfg.iterations relinearized GN steps; returns updated params and the
    final damping (for warm-starting the next level, mirroring the reference's
    trust-region warm start).

    `use_blocks` runs the production path: the flat block-dense layout
    ([nb, B³] fields + MXU one-hot stencil shifts, refine/blockform.py) with
    the FULLY device-resident per-iteration assembly
    (refine/device_assembly.py) — the outer loop does no host work beyond the
    two jit calls and the logging pulls. The flat-table path (host assembly +
    jax.linearize solver) is kept as the equivalence oracle.

    `mesh` (a `jax.sharding.Mesh`) runs the SAME outer loop spatially
    sharded: per-device bricks of block rows with ppermute halo exchange,
    the per-iteration device assembly (observation re-collection, gates,
    weight normalization) INSIDE the sharded region, psum'd globals, and —
    when the level's layout decision picks frame buckets — owner-localized
    buckets (`parallel.spmd.SpmdLevel`). Plans and the jitted step are built
    once per level; iterations feed placed arrays straight back."""
    pyr_scale = pyramid_level_to_scale(rgbd_level)
    h, w = int(depths_level.shape[1]), int(depths_level.shape[2])
    mu = jnp.float32(mu0)
    stats = OptimizeStats([], [], [])
    level_spmd = None

    if prep is not None and mesh is None:
        prep.join()  # background layout/static/bucket build + program warm
    else:
        prep = None

    if use_blocks:
        t0 = time.perf_counter()
        if prep is not None and prep.layout is not None:
            layout = prep.layout
        else:
            layout = BlockLayout.build(
                grid,
                blocks_multiple=max(8, mesh.devices.size) if mesh is not None else 8,
                # the solver touches stencils only through ShiftPlan (nbr27);
                # the per-cell halo gather table costs nb·W³ host lookups
                halo_table=False,
            )
        if prep is not None and prep.st is not None:
            # the prefetched statics carry zero SH (built before the lighting
            # estimate); fill in the per-voxel coefficients now
            nb_, s_ = layout.num_blocks, layout.block**3
            eg_sh_np = np.zeros((9, nb_ * s_), np.float32)
            eg_sh_np[:, layout.vox_slot] = np.asarray(voxel_sh, np.float32).T
            st = prep.st._replace(eg_sh=jnp.asarray(eg_sh_np))
        else:
            if topo is None:
                topo = (
                    prep.topo if prep is not None and prep.topo is not None
                    else level_topology(grid)
                )
            st = build_level_static(layout, grid, topo, voxel_sh)
        sdf_plan, alb_plan = layout_plans(layout)
        bparams = params._replace(
            sdf=table_to_dense(layout, params.sdf),
            albedo=table_to_dense(layout, params.albedo),
        )
        t_static = time.perf_counter() - t0
        t0 = time.perf_counter()
        # frame-bucketed E_g elements: worth the ~2x per-element stencil
        # traffic when per-frame visibility is a fraction of the grid (the
        # many-keyframe regime where the dense [K, D] layout would scale
        # with the full keyframe count, BENCH_NOTES "K ≫ num_obs") — and
        # REQUIRED when the dense fields would blow the HBM budget (the
        # finest grid level at production scale: ~700 B/element through the
        # jitted gn_iteration graph, measured on v5e at 1.05M voxels).
        bmap = None
        eg_chunks = 1
        if prep is not None and (prep.fb is not None or prep.st is not None):
            fb, reason, eg_chunks = prep.fb, prep.reason, prep.eg_chunks
        else:
            fb, reason, eg_chunks = plan_eg_layout(
                layout,
                np.asarray(params.poses),
                np.asarray(params.intr, np.float64) * pyr_scale,
                cfg,
                w,
                h,
                grid.voxel_size,
                thres_shell,
                np.asarray(depths_level),
            )
        if fb is not None:
            bmap = jnp.asarray(fb)
            log.info(
                "  frame buckets: %d blocks/frame of %d (%.0f%% coverage, %s)",
                fb.shape[1],
                layout.num_blocks,
                100.0 * fb.shape[1] / layout.num_blocks,
                reason,
            )

        record_phase(
            f"level_setup[p{rgbd_level}v{grid.num_voxels}]",
            t_static + (time.perf_counter() - t0),
        )
        log.info(
            "   level setup: layout+static %.1fs, bucket plan %.1fs (%d blocks, %d voxels)",
            t_static,
            time.perf_counter() - t0,
            layout.num_blocks,
            grid.num_voxels,
        )

        level_spmd = None
        if mesh is not None:
            from intrinsic3d_tpu.parallel.spmd import SpmdLevel

            level_spmd = SpmdLevel(
                mesh,
                layout,
                st,
                depths_level,
                images_level,
                num_obs=cfg.num_observations,
                width=w,
                height=h,
                pyr_scale=float(pyr_scale),
                voxel_size=float(grid.voxel_size),
                truncation=float(grid.truncation),
                thres_shell=float(thres_shell),
                occlusion_distance=float(cfg.occlusion_distance),
                fix_poses=cfg.fix_poses,
                fix_intrinsics=cfg.fix_intrinsics,
                fix_distortion=cfg.fix_distortion,
                use_albedo=cfg.lambda_a >= 0.0,
                bmap=fb,
                lm_steps=cfg.lm_steps,
                cg_iters=cg_iters,
                schur_globals=cfg.schur_globals,
                min_pose_obs=cfg.min_pose_obs,
            )
            bparams_s = level_spmd.begin(bparams)

    t_loop0 = time.perf_counter()
    for itr in range(cfg.iterations):
        if itr == 0:
            t0 = time.perf_counter()
        lambda_r = compute_varying_lambda(itr, cfg.iterations, cfg.lambda_r0, cfg.lambda_r1)
        lambda_s = compute_varying_lambda(itr, cfg.iterations, cfg.lambda_s0, cfg.lambda_s1)

        if level_spmd is not None:
            bparams_s, cost0, cost1, mu, tries = level_spmd.step(
                bparams_s,
                jnp.asarray([cfg.lambda_g, lambda_r, lambda_s, cfg.lambda_a], jnp.float32),
                mu,
            )
        elif use_blocks:
            step_args = (
                st,
                sdf_plan,
                alb_plan,
                bparams,
                depths_level,
                images_level,
                jnp.float32(pyr_scale),
                jnp.float32(grid.voxel_size),
                jnp.float32(grid.truncation),
                jnp.float32(thres_shell),
                jnp.float32(cfg.occlusion_distance),
                jnp.asarray([cfg.lambda_g, lambda_r, lambda_s, cfg.lambda_a], jnp.float32),
                mu,
                bmap,
            )
            out = None
            if prep is not None and prep.compiled is not None:
                # the AOT executable LevelPrep loaded in the background —
                # identical avals to the jit path (the statics are baked in)
                try:
                    out = prep.compiled(*step_args)
                except Exception as exc:  # noqa: BLE001 — aval drift: jit path
                    log.warning(
                        "prefetched executable rejected the level args "
                        "(%r); falling back to the jit path", exc
                    )
                    prep.compiled = None
            if out is None:
                fused_kw = dict(
                    num_obs=cfg.num_observations,
                    width=w,
                    height=h,
                    fix_poses=cfg.fix_poses,
                    fix_intrinsics=cfg.fix_intrinsics,
                    fix_distortion=cfg.fix_distortion,
                    use_albedo=cfg.lambda_a >= 0.0,
                    lm_steps=cfg.lm_steps,
                    cg_iters=cg_iters,
                    schur_globals=cfg.schur_globals,
                    min_pose_obs=cfg.min_pose_obs,
                )
                try:
                    out = _fused_outer_step(
                        *step_args, **fused_kw, eg_chunks=eg_chunks
                    )
                    if itr == 0:
                        jax.block_until_ready(out[1])
                except Exception as exc:  # noqa: BLE001 — HBM overflow guard
                    msg = str(exc)
                    oom = "RESOURCE_EXHAUSTED" in msg or "hbm" in msg.lower()
                    if itr != 0 or not oom:
                        raise
                    # the planned layout exceeded real HBM (mis-calibrated
                    # memory constants — the round-4b failure mode): replan
                    # at 60% of the budget, which raises the chunk count
                    # and/or engages the hard trim, and retry ONCE
                    log.warning(
                        "level program exhausted device memory (%s...); "
                        "replanning the E_g layout at 60%% budget",
                        msg[:200],
                    )
                    fb, reason, eg_chunks = plan_eg_layout(
                        layout,
                        np.asarray(params.poses),
                        np.asarray(params.intr, np.float64) * pyr_scale,
                        cfg,
                        w,
                        h,
                        grid.voxel_size,
                        thres_shell,
                        np.asarray(depths_level),
                        budget=0.6 * eg_hbm_budget(),
                    )
                    log.warning(
                        "  retry layout: %s (%s, %d chunks)",
                        "dense" if fb is None else f"{fb.shape[1]} blocks/frame",
                        reason,
                        eg_chunks,
                    )
                    bmap = None if fb is None else jnp.asarray(fb)
                    step_args = step_args[:-1] + (bmap,)
                    out = _fused_outer_step(
                        *step_args, **fused_kw, eg_chunks=eg_chunks
                    )
            bparams, cost0, cost1, mu, tries = out
        else:
            intr = np.asarray(params.intr)
            cam_level = Camera.create(
                intr[0] * pyr_scale,
                intr[1] * pyr_scale,
                intr[2] * pyr_scale,
                intr[3] * pyr_scale,
                w,
                h,
                dist=params.dist,
            )
            if topo is None:
                topo = level_topology(grid)
            asm, masks = build_assembly(
                grid,
                topo,
                params,
                cam_level,
                depths_level,
                images_level,
                voxel_sh,
                thres_shell,
                cfg.occlusion_distance,
                cfg.num_observations,
                cfg.lambda_g,
                lambda_r,
                lambda_s,
                cfg.lambda_a,
                pyr_scale,
                cfg.fix_poses,
                cfg.fix_intrinsics,
                cfg.fix_distortion,
                min_pose_obs=cfg.min_pose_obs,
            )
            params, cost0, cost1, mu, tries = gn_iteration(
                params,
                asm,
                masks,
                mu,
                cfg.lm_steps,
                cg_iters,
                schur_globals=cfg.schur_globals,
            )
        # defer the scalar pulls by ONE iteration: a host round trip stalls
        # the device ~24 ms per fetch on a remote link (BENCH_NOTES.md), so
        # iteration i's values are logged after iteration i+1 has been
        # dispatched — the fetch overlaps device compute instead of gating
        # it, and mid-level progress/diagnostics are still printed live
        stats.costs_before.append(cost0)
        stats.costs_after.append(cost1)
        stats.tries.append(tries)
        stats.mus.append(mu)
        if itr == 0:
            # the first call blocks on trace + compile-cache load + remote
            # program upload; later iterations dispatch asynchronously
            record_phase(
                f"first_dispatch[p{rgbd_level}v{grid.num_voxels}]",
                time.perf_counter() - t0,
            )
            log.info(
                "   first-iteration dispatch (trace/compile/load): %.1fs",
                time.perf_counter() - t0,
            )
        if itr > 0:
            _log_iter(stats, itr - 1)

    if cfg.iterations > 0:
        _log_iter(stats, cfg.iterations - 1)
    stats.costs_before = [float(c) for c in stats.costs_before]
    record_phase(
        f"solve[p{rgbd_level}v{grid.num_voxels}]", time.perf_counter() - t_loop0
    )
    stats.costs_after = [float(c) for c in stats.costs_after]
    stats.tries = [int(t) for t in stats.tries]
    stats.mus = [float(m) for m in stats.mus]

    if level_spmd is not None:
        bparams = level_spmd.finish(bparams_s)
    if use_blocks:
        params = params_from_block(layout, bparams)
    return params, float(mu), stats
