"""Sharded non-solver pipeline stages: SVSH lighting + the recolor sweep.

Round 3 left the solver loop fully multi-chip (`parallel/spmd.py::SpmdLevel`)
but ran the surrounding level stages — SVSH estimation
(``lighting_svsh.cpp:166-346``), per-voxel SH interpolation
(``lighting_svsh.cpp:93-110``) and the full recolor sweep
(``colorization.cpp:162-212``) — single-device with full-grid arrays. This
module moves them under the same level mesh:

- **SVSH estimate** — the normal equations are per-subvolume segment sums of
  per-voxel outer products, which is exactly the psum-friendly shape: each
  device assembles partial ``AᵀA``/``Aᵀb`` blocks over its brick's voxels
  (normals via the same ppermute halo plans the solver uses), the partials
  are `psum`'d, and every device runs the identical tiny replicated
  block-Jacobi PCG (`lighting.svsh.solve_block_system`, shared verbatim with
  the single-device path). The data-weight normalization (1/Σw) is applied
  after the psum, so the energy matches the reference's
  (``lighting_svsh.cpp:296-318``) with only reduction-order differences.
- **Per-voxel SH interpolation** — each device trilinearly interpolates the
  replicated `[S, 9]` coefficients at its own brick's voxel positions
  through a dense subvolume-cell lookup volume
  (`Subvolumes.cell_lookup`), reproducing the −0.5-offset missing-neighbor
  semantics of ``subvolumes.cpp:164-208``. The result stays sharded
  `[9, nb, B³]` and feeds `SpmdLevel` directly — the full-grid `[N, 9]`
  voxel-SH array never exists on one device.
- **Recolor sweep** — normals → iso-projection → all-frame observation
  weights (the same frame-windowed Pallas depth probe the sharded assembly
  uses) → per-voxel top-N → weighted bilinear recolor, all on brick-local
  voxels with replicated images; output colors stay sharded and loop back
  into the next SVSH estimate on device.

Together with `SpmdLevel` this makes every device stage of the
`Intrinsic3D(mesh=...)` level loop brick-sharded; see
`refine/mesh_pipeline.py` for the orchestration.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.color import intensity
from intrinsic3d_tpu.grid.blocks import BlockLayout, pad_flat
from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid
from intrinsic3d_tpu.lighting.sh import sh_basis
from intrinsic3d_tpu.lighting.subvolumes import Subvolumes
from intrinsic3d_tpu.lighting.svsh import (
    SVSHResult,
    solve_block_system,
    trilerp_subvolumes,
)
from intrinsic3d_tpu.mathutil import sdf_to_weight
from intrinsic3d_tpu.observations import compute_observations_batch
from intrinsic3d_tpu.parallel.spmd import SpmdContext, _base_specs, _plan_spec
from intrinsic3d_tpu.refine.residuals import Params


def place_block_params(mesh: Mesh, layout: BlockLayout, params: Params, axis: str = "data") -> Params:
    """Table params → stripped brick-sharded block form, built process-local
    per addressable device (`parallel.staging.stage_table_rows`) — valid
    under multi-process `jax.distributed`, where a process cannot place data
    on another host's devices; no full-grid single-device transient either
    (unlike `blockform.table_to_dense`, a jitted single-device scatter)."""
    from intrinsic3d_tpu.parallel.staging import stage_replicated, stage_table_rows

    blk = P(axis, None)
    return Params(
        sdf=stage_table_rows(mesh, blk, layout, params.sdf),
        albedo=stage_table_rows(mesh, blk, layout, params.albedo),
        poses=stage_replicated(mesh, params.poses),
        intr=stage_replicated(mesh, params.intr),
        dist=stage_replicated(mesh, params.dist),
    )


def shard_fraction(arr) -> float:
    """max per-device shard bytes / global bytes — 1/n for an evenly
    brick-sharded array, 1.0 for replicated/single-device placement."""
    shards = arr.addressable_shards
    return max(s.data.nbytes for s in shards) / max(arr.nbytes, 1)


def _block_normals(sdf_plan, sdf_pad, valid_pad):
    """Forward-difference surface normals on the brick-local block layout —
    the halo'd twin of `grid.ops.surface_normals` (``operators.cpp:58-77``),
    identical to the gating used by `refine.device_assembly`."""
    sh = sdf_plan.apply(sdf_pad)  # [13, m, S]
    vs = sdf_plan.apply(valid_pad)
    c = sdf_plan.index((0, 0, 0))
    ex = sdf_plan.index((1, 0, 0))
    ey = sdf_plan.index((0, 1, 0))
    ez = sdf_plan.index((0, 0, 1))
    nb_valid = vs[c] * vs[ex] * vs[ey] * vs[ez]
    n = jnp.stack([sh[ex] - sh[c], sh[ey] - sh[c], sh[ez] - sh[c]], axis=-1)
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
    nonzero = norm[..., 0] > 0.0
    ok = (nb_valid > 0.0) & nonzero
    normals = jnp.where(ok[..., None], n / jnp.where(norm == 0.0, 1.0, norm), 0.0)
    return sh[c], normals, ok


def _bilinear_frame_rows(images, u, v):
    """Bilinear sample of `images [K, H, W, C]` at `(u, v) [K, D]` where row k
    samples frame k — the frame-uniform-row twin of
    `observations.bilinear_frames` (identical edge-weight and
    renormalization semantics), expressed as per-frame batched gathers
    instead of scattered (frame, y, x) tuples."""
    k, h, w = images.shape[0], images.shape[1], images.shape[2]
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = u - x0
    wy1 = v - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    wx0 = jnp.where((x0 >= 0) & (x0 < w), wx0, 0.0)
    wx1 = jnp.where((x1 >= 0) & (x1 < w), wx1, 0.0)
    wy0 = jnp.where((y0 >= 0) & (y0 < h), wy0, 0.0)
    wy1 = jnp.where((y1 >= 0) & (y1 < h), wy1, 0.0)
    x0c, x1c = jnp.clip(x0, 0, w - 1), jnp.clip(x1, 0, w - 1)
    y0c, y1c = jnp.clip(y0, 0, h - 1), jnp.clip(y1, 0, h - 1)
    flat = images.reshape(k, h * w, -1).astype(jnp.float32)

    def tap(yc, xc):
        return jnp.take_along_axis(flat, (yc * w + xc)[:, :, None], axis=1)

    w00, w10, w01, w11 = wx0 * wy0, wx1 * wy0, wx0 * wy1, wx1 * wy1
    acc = (
        tap(y0c, x0c) * w00[..., None]
        + tap(y0c, x1c) * w10[..., None]
        + tap(y1c, x0c) * w01[..., None]
        + tap(y1c, x1c) * w11[..., None]
    )
    wsum = w00 + w10 + w01 + w11
    wsafe = jnp.where(wsum > 0.0, wsum, 1.0)
    return jnp.where(wsum[..., None] > 0.0, acc / wsafe[..., None], 0.0)


@dataclasses.dataclass
class SpmdStages:
    """Per-grid-level sharded SVSH + recolor programs.

    Built once per (grid level, mesh): stages the level's static per-voxel
    fields bricked on the mesh, the subvolume partition (host-discovered,
    exactly as the single-device `estimate_svsh`), and jits one shard_map
    program per stage. All per-voxel inputs/outputs stay sharded; only the
    `[S, 9]` coefficients and scalar telemetry are replicated."""

    mesh: Mesh
    ctx: SpmdContext
    layout: BlockLayout
    subvolumes: Subvolumes
    num_best: int
    occlusion_distance: float
    truncation: float
    width: int
    height: int

    @classmethod
    def build(
        cls,
        mesh: Mesh,
        ctx: SpmdContext,
        layout: BlockLayout,
        grid: VoxelGrid,
        cam: Camera,
        depths0: jnp.ndarray,  # [K, H, W] full-resolution depth maps
        colors0: jnp.ndarray,  # [K, H, W, 3] u8 source colors
        subvolume_size: float,
        num_best: int,
        occlusion_distance: float,
        axis: str = "data",
    ) -> Optional["SpmdStages"]:
        pts = grid.voxel_to_world()
        sub = Subvolumes.compute(pts, subvolume_size)
        if grid.num_voxels == 0 or sub.count == 0:
            return None
        self = cls(
            mesh=mesh,
            ctx=ctx,
            layout=layout,
            subvolumes=sub,
            num_best=num_best,
            occlusion_distance=float(occlusion_distance),
            truncation=float(grid.truncation),
            width=int(cam.width),
            height=int(cam.height),
        )
        self._axis = axis
        nb, s = layout.num_blocks, layout.block**3

        from intrinsic3d_tpu.parallel.staging import (
            stage_replicated,
            stage_rows,
            stage_table_rows,
        )

        blk = P(axis, None)
        mid3 = P(None, axis, None)

        # process-local brick staging: each addressable device's block rows
        # are built and placed directly (parallel/staging.py) — no full-grid
        # single-device transient, valid under multi-process jax.distributed
        subvol = sub.point_to_subvolume(pts)
        self._valid = stage_table_rows(
            mesh, blk, layout, grid.valid_mask().astype(np.float32)
        )
        coords_i32 = grid.coords.astype(np.int32)
        slot = layout.vox_slot

        def vpos_rows(lo, hi):
            out = np.zeros((3, (hi - lo) * s), np.int32)
            sel = (slot >= lo * s) & (slot < hi * s)
            out[:, slot[sel] - lo * s] = coords_i32[sel].T
            return out.reshape(3, hi - lo, s)

        self._vpos = stage_rows(mesh, mid3, (3, nb, s), np.int32, vpos_rows, 1)
        self._subvol = stage_table_rows(
            mesh, blk, layout, subvol, dtype=np.int32, fill=-1
        )
        tab, origin = sub.cell_lookup()
        self._cell_tab = stage_replicated(mesh, tab)
        self._cell_origin = stage_replicated(mesh, np.asarray(origin, np.int32))
        self._pairs = stage_replicated(mesh, sub.neighbor_pairs())
        self._depths0 = stage_replicated(mesh, depths0)
        self._colors0 = stage_replicated(mesh, colors0)
        self._voxel_size = float(grid.voxel_size)

        p_specs, _, blk_p, rep_p = _base_specs(axis)
        self._specs = dict(
            p=p_specs, blk=blk_p, rep=rep_p,
            mid3=P(None, axis, None), lastb=P(axis, None, None),
        )
        self._svsh_fn = self._build_svsh(axis)
        self._recolor_fn = self._build_recolor(axis)
        return self

    def stage_colors(self, colors: np.ndarray) -> jnp.ndarray:
        """Host voxel-table colors [N, 3] → sharded block-dense [nb, B³, 3],
        built process-local per addressable device (parallel/staging.py)."""
        from intrinsic3d_tpu.parallel.staging import stage_table_rows

        return stage_table_rows(
            self.mesh, P(self._axis, None, None), self.layout, colors,
            trailing=(3,),
        )

    # ------------------------------------------------------------------
    # SVSH estimate + per-voxel interpolation (one sharded program)
    # ------------------------------------------------------------------

    def _build_svsh(self, axis: str):
        sp = self._specs
        num_sub = self.subvolumes.count
        sub_size = self.subvolumes.size
        trunc = self.truncation
        voxel_size = self._voxel_size

        def body(valid, vpos, subvol, sdf_plan, bp, color, pairs, cell_tab,
                 cell_origin, lambda_reg, thres_shell):
            m, s = valid.shape
            sdfr, normals, normal_ok = _block_normals(
                sdf_plan, pad_flat(bp.sdf), pad_flat(valid)
            )
            sdfr_f = sdfr.reshape(-1)
            albedo = bp.albedo.reshape(-1).astype(jnp.float32)
            sv = subvol.reshape(-1)
            ok = (
                (valid.reshape(-1) > 0.0)
                & (jnp.abs(sdfr_f) <= thres_shell)
                & normal_ok.reshape(-1)
                & (albedo != 0.0)
                & ~jnp.isnan(albedo)
                & (sv >= 0)
            )
            w = sdf_to_weight(sdfr_f, trunc)
            w = jnp.where(ok, w, 0.0).astype(jnp.float32)
            H = sh_basis(normals.reshape(-1, 3))
            lum = intensity(color.reshape(-1, 3).astype(jnp.float32)) / 255.0

            # per-device partial normal equations → psum → identical
            # replicated solve (lighting_svsh.cpp:296-342; the 1/Σw data
            # normalization is applied post-psum)
            aH = H * albedo[:, None]
            outer = aH[:, :, None] * aH[:, None, :] * w[:, None, None]
            seg = jnp.maximum(sv, 0).astype(jnp.int32)
            A_u = jax.ops.segment_sum(outer, seg, num_segments=num_sub)
            b_u = jax.ops.segment_sum(aH * (w * lum)[:, None], seg, num_segments=num_sub)
            wsum = jnp.sum(w)
            A_u = jax.lax.psum(A_u, axis)
            b_u = jax.lax.psum(b_u, axis)
            wsum = jax.lax.psum(wsum, axis)
            nvalid = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), axis)
            scale = jnp.where(wsum > 0.0, 1.0 / jnp.where(wsum > 0.0, wsum, 1.0), 1.0)
            coeffs = solve_block_system(
                A_u * scale, b_u * scale, pairs, num_sub, lambda_reg
            )

            # per-voxel trilinear SH interpolation on the local brick
            pts = (
                jnp.moveaxis(vpos, 0, -1).reshape(-1, 3).astype(jnp.float32)
                * voxel_size
            )
            cvox = trilerp_subvolumes(coeffs, pts, cell_tab, cell_origin, sub_size)
            inside = (valid.reshape(-1) > 0.0) & (jnp.abs(sdfr_f) <= thres_shell)
            vox_sh = jnp.where(inside[:, None], cvox, 0.0)  # [m·S, 9]
            vox_sh = jnp.moveaxis(vox_sh.reshape(m, s, 9), -1, 0)  # [9, m, S]
            return coeffs, nvalid, vox_sh

        return jax.jit(
            jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(
                    sp["blk"],  # valid
                    sp["mid3"],  # vpos
                    sp["blk"],  # subvol
                    _plan_spec(self.ctx.sdf_plan_s, axis),
                    sp["p"],  # params (stripped voxel leaves)
                    sp["lastb"],  # color [nb, S, 3]
                    sp["rep"],  # pairs
                    sp["rep"],  # cell_tab
                    sp["rep"],  # cell_origin
                    sp["rep"],  # lambda_reg
                    sp["rep"],  # thres_shell
                ),
                out_specs=(sp["rep"], sp["rep"], sp["mid3"]),
                check_vma=False,
            )
        )

    def svsh(
        self, bparams_s: Params, color_bd: jnp.ndarray, lambda_reg: float,
        thres_shell: float,
    ) -> Tuple[Optional[SVSHResult], Optional[jnp.ndarray]]:
        """Sharded `estimate_svsh` + `voxel_sh_coeffs`.

        `bparams_s` is the stripped/placed block form (`SpmdLevel.begin`).
        Returns (SVSHResult with host coeffs — None on the reference's
        estimation-failure path — and the sharded `[9, nb, B³]` per-voxel
        coefficient field for `SpmdLevel(eg_sh_device=...)`)."""
        coeffs, nvalid, vox_sh = self._svsh_fn(
            self._valid, self._vpos, self._subvol, self.ctx.sdf_plan_s,
            bparams_s, color_bd, self._pairs, self._cell_tab,
            self._cell_origin, jnp.float32(lambda_reg), jnp.float32(thres_shell),
        )
        if int(nvalid) == 0:
            return None, None
        return SVSHResult(subvolumes=self.subvolumes, coeffs=np.asarray(coeffs)), vox_sh

    # ------------------------------------------------------------------
    # Recolor sweep
    # ------------------------------------------------------------------

    def _build_recolor(self, axis: str):
        sp = self._specs
        num_best = self.num_best
        occl = self.occlusion_distance
        width, height = self.width, self.height
        voxel_size = self._voxel_size

        def body(valid, vpos, occ_gate, sdf_plan, bp, depths, colors, old_color):
            m, s = valid.shape
            d = m * s
            sdfr, normals, _ = _block_normals(
                sdf_plan, pad_flat(bp.sdf), pad_flat(valid)
            )
            cam = Camera(
                fx=bp.intr[0], fy=bp.intr[1], cx=bp.intr[2], cy=bp.intr[3],
                width=width, height=height, dist=bp.dist,
            )
            pts = (
                jnp.moveaxis(vpos, 0, -1).reshape(-1, 3).astype(jnp.float32)
                * voxel_size
            )
            nflat = normals.reshape(d, 3)
            iso = pts - nflat * sdfr.reshape(d)[:, None]
            k = bp.poses.shape[0]
            w, uv = compute_observations_batch(
                cam, bp.poses, depths, iso, nflat, occl,
                active=jnp.broadcast_to(occ_gate.reshape(-1)[None, :], (k, d)),
                return_uv=True,
            )  # [K, D], [K, D, 2]
            # per-voxel top-N over frames, in place (rank tie order = lax.top_k)
            kcap = min(num_best, k)
            order = jnp.argsort(-w, axis=0, stable=True)
            rank = jnp.argsort(order, axis=0, stable=True)
            wsel = jnp.where(rank < kcap, w, 0.0)
            cols = _bilinear_frame_rows(colors, uv[..., 0], uv[..., 1])  # [K, D, 3]
            acc = jnp.sum(cols * wsel[..., None], axis=0)  # [D, 3]
            wsum = jnp.sum(wsel, axis=0)
            has = wsum > 0.0
            out = jnp.where(
                has[:, None], acc / jnp.maximum(wsum, 1e-12)[:, None], 0.0
            )
            new_color = jnp.where(
                has[:, None], out, old_color.reshape(d, 3)
            ).reshape(m, s, 3)
            return new_color, has.reshape(m, s)

        return jax.jit(
            jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(
                    sp["blk"],  # valid
                    sp["mid3"],  # vpos
                    sp["blk"],  # occ gate (chunk-skip; exact — see .recolor)
                    _plan_spec(self.ctx.sdf_plan_s, axis),
                    sp["p"],
                    sp["rep"],  # depths
                    sp["rep"],  # colors
                    sp["lastb"],  # old colors [nb, S, 3]
                ),
                out_specs=(sp["lastb"], sp["blk"]),
                check_vma=False,
            )
        )

    def recolor(
        self, bparams_s: Params, color_bd: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sharded full recolor sweep (`intrinsic3d._recolor_sweep` twin):
        returns (new sharded block colors [nb, B³, 3], has [nb, B³]).

        The occupancy gate only skips empty slots in the Pallas depth probe —
        exact, since empty slots have zero normals and hence zero observation
        weight in the single-device sweep too."""
        return self._recolor_fn(
            self._valid, self._vpos, self._occ_gate(), self.ctx.sdf_plan_s,
            bparams_s, self._depths0, self._colors0, color_bd,
        )

    def _occ_gate(self):
        gate = getattr(self, "_occ_gate_arr", None)
        if gate is None:
            from intrinsic3d_tpu.parallel.staging import stage_table_rows

            n = len(self.layout.vox_slot)
            gate = stage_table_rows(
                self.mesh, P(self._axis, None), self.layout,
                np.ones(n, np.float32),
            )
            self._occ_gate_arr = gate
        return gate

    # ------------------------------------------------------------------
    # Host gather helpers (grid-level boundaries)
    # ------------------------------------------------------------------

    def colors_to_table(self, color_bd: jnp.ndarray, has_bd: jnp.ndarray):
        """Sharded block colors → host table order (np [N, 3], has [N]).
        Grid-level-boundary gather: multi-process-safe via
        `staging.to_host_global` (all_gather when shards are remote)."""
        from intrinsic3d_tpu.parallel.staging import to_host_global

        flat = to_host_global(color_bd).reshape(-1, 3)
        has = to_host_global(has_bd).reshape(-1)
        return flat[self.layout.vox_slot], has[self.layout.vox_slot]
