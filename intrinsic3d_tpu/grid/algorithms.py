"""Grid-level SDF algorithms: distance-transform correction, sparsification,
trilinear resampling, 2× upsampling.

Re-designs of ``nv::SDFAlgorithms`` (``libintrinsic3d/src/sdf/algorithms.cpp``).
The reference mutates its hash map in serial sweeps; here every pass is a
vectorized gather over precomputed neighbor tables — `correct_sdf` runs fully
on device as Jacobi iterations, the structural passes (thin shell, upsample)
run as vectorized numpy between solver phases, where the active set is allowed
to change.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.grid.voxel_grid import (
    RING6_OFFSETS,
    VoxelGrid,
    find_indices,
    full_neighborhood_offsets,
)

_NB26 = full_neighborhood_offsets(1)
_NB26_DIST = np.linalg.norm(_NB26.astype(np.float64), axis=-1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("num_iter",))
def _correct_sdf_device(sdf, weight, nbr26_idx, voxel_size, num_iter: int):
    """Jacobi distance-transform sweeps (``algorithms.cpp:260-339``).

    Only valid (weight>0) voxels update, pulling toward the best neighbor
    distance `sdf_nb + sgn_nb·‖Δ‖` when it shrinks |sdf| and the signs agree.
    The reference's serial in-place sweep takes the last improving neighbor;
    the Jacobi form takes the best one, converging to the same fixed point.
    Updated voxels get weight 1 (``algorithms.cpp:315``).
    """
    offs_dist = jnp.asarray(_NB26_DIST) * voxel_size

    def body(state):
        sdf, weight, it, changed = state
        valid = weight > 0.0
        safe = jnp.maximum(nbr26_idx, 0)
        nb_ok = (nbr26_idx >= 0) & valid[safe]
        sdf_nb = sdf[safe]
        sgn = jnp.where(sdf >= 0.0, 1.0, -1.0)
        sgn_nb = jnp.where(sdf_nb >= 0.0, 1.0, -1.0)
        dist_nb = sdf_nb + sgn_nb * offs_dist[None, :]
        improving = (
            nb_ok
            & (jnp.abs(dist_nb) < jnp.abs(sdf)[:, None])
            & (sgn_nb == sgn[:, None])
            & valid[:, None]
        )
        cand = jnp.where(improving, jnp.abs(dist_nb), jnp.inf)
        best = jnp.argmin(cand, axis=-1)
        has = jnp.any(improving, axis=-1)
        new_sdf = jnp.where(has, jnp.take_along_axis(dist_nb, best[:, None], axis=-1)[:, 0], sdf)
        new_weight = jnp.where(has, 1.0, weight)
        return new_sdf, new_weight, it + 1, jnp.any(has)

    def cond(state):
        _, _, it, changed = state
        return (it < num_iter) & changed

    sdf, weight, _, _ = jax.lax.while_loop(
        cond, body, (sdf, weight, jnp.int32(0), jnp.bool_(True))
    )
    return sdf, weight


def correct_sdf(
    grid: VoxelGrid, num_iter: int = 10, dense: bool | None = None
) -> VoxelGrid:
    """Distance-transform correction of the fused SDF, in place on the grid.

    Two device paths: the gather-table Jacobi iteration, and (preferred on
    TPU when the bounding box is affordable) the iteration-fused Pallas
    stencil kernel over a dense window (ops/pallas/distance_transform.py),
    which replaces 26·N scattered reads × num_iter HBM sweeps with one
    blocked VMEM-resident pass per chunk. Both compute the same fixed point.
    """
    if dense is None:
        lo = grid.coords.min(axis=0)
        hi = grid.coords.max(axis=0)
        vol = int(np.prod((hi - lo + 1).astype(np.int64)))
        dense = jax.default_backend() != "cpu" and 0 < vol <= 300_000_000
    if dense:
        return _correct_sdf_via_dense(grid, num_iter)
    nbr26 = grid.neighbor_table(_NB26)
    sdf, weight = _correct_sdf_device(
        jnp.asarray(grid.sdf),
        jnp.asarray(grid.weight),
        jnp.asarray(nbr26),
        grid.voxel_size,
        num_iter,
    )
    grid.sdf = np.asarray(sdf)
    grid.weight = np.asarray(weight)
    return grid


def _correct_sdf_via_dense(
    grid: VoxelGrid, num_iter: int, interpret: bool = False
) -> VoxelGrid:
    """Scatter the sparse grid into its dense AABB, run the Pallas
    iteration-fused kernel, gather back. Axes are ordered so the smallest
    extent is the (128-padded) lane dimension."""
    from intrinsic3d_tpu.ops.pallas.distance_transform import correct_sdf_dense

    lo = grid.coords.min(axis=0)
    dims = grid.coords.max(axis=0) - lo + 1
    order = np.argsort(dims)[::-1]  # largest..smallest → smallest becomes lanes
    inv_order = np.argsort(order)
    c = (grid.coords - lo)[:, order]
    shape = tuple(int(d) for d in dims[order])
    dense_sdf = np.zeros(shape, np.float32)
    dense_w = np.zeros(shape, np.float32)
    dense_sdf[c[:, 0], c[:, 1], c[:, 2]] = grid.sdf
    dense_w[c[:, 0], c[:, 1], c[:, 2]] = grid.weight
    out_s, out_w = correct_sdf_dense(
        jnp.asarray(dense_sdf),
        jnp.asarray(dense_w),
        grid.voxel_size,
        iters=num_iter,
        interpret=interpret,
    )
    out_s = np.asarray(out_s)
    out_w = np.asarray(out_w)
    grid.sdf = out_s[c[:, 0], c[:, 1], c[:, 2]].astype(np.float32)
    grid.weight = out_w[c[:, 0], c[:, 1], c[:, 2]].astype(np.float32)
    _ = inv_order
    return grid


def clear_invalid_voxels(grid: VoxelGrid) -> VoxelGrid:
    """Drop voxels with weight ≤ 0 (``algorithms.cpp:342-365``)."""
    return grid.select(grid.valid_mask())


def apply_refined_sdf(grid: VoxelGrid) -> VoxelGrid:
    """`sdf ← sdf_refined` (``algorithms.cpp:250-257``)."""
    grid.sdf = grid.sdf_refined.copy()
    return grid


# ---------------------------------------------------------------------------
# Thin-shell sparsification
# ---------------------------------------------------------------------------

# the reference's keep-stencil: 6-ring plus (+2,0,0),(0,+2,0),(0,0,+2)
# (``algorithms.cpp:380-385``) — the forward-difference support of E_g
_SHELL_SUPPORT = np.concatenate(
    [RING6_OFFSETS, np.array([[2, 0, 0], [0, 2, 0], [0, 0, 2]], np.int32)], axis=0
)
_NB_CROSS = full_neighborhood_offsets(2)


@functools.partial(jax.jit, static_argnames=())
def _thin_shell_mask_blocks(occ_p, valid_p, sdfr_p, nbr27, thres):
    """Device thin-shell keep mask over padded `[nb+1, B,B,B]` block fields.

    Same predicate as the host path below, evaluated with structured block
    ops: (a) core = valid ∧ |sdf_refined| ≤ thres; (b) the 9-offset stencil
    support of core via negated-offset halo views (keep[u] ⇐ core[u − off]);
    (c) the 5³ zero-crossing test as three separable 5-tap max-pools over
    sign masks. Including the center cell in the pools is exact: a voxel's
    own sign can never fabricate a crossing against itself."""
    from intrinsic3d_tpu.grid.blocks import halo27

    b = occ_p.shape[-1]
    h_occ = halo27(occ_p, nbr27, 2, 2)  # [nb, B+4, B+4, B+4]
    h_sdf = halo27(sdfr_p, nbr27, 2, 2)
    h_val = halo27(valid_p, nbr27, 2, 2)

    def view(h, off):
        ox, oy, oz = (int(o) + 2 for o in off)
        return h[:, ox : ox + b, oy : oy + b, oz : oz + b]

    core_h = h_occ * h_val * (jnp.abs(h_sdf) <= thres)
    keep = view(core_h, (0, 0, 0)) > 0.0
    for off in _SHELL_SUPPORT:
        keep = keep | (view(core_h, -off) > 0.0)

    pos = h_occ * (h_sdf >= 0.0)
    neg = h_occ * (h_sdf < 0.0)

    def pool5(x):
        x = jnp.max(jnp.stack([x[:, i : i + b] for i in range(5)]), axis=0)
        x = jnp.max(jnp.stack([x[:, :, i : i + b] for i in range(5)]), axis=0)
        x = jnp.max(jnp.stack([x[:, :, :, i : i + b] for i in range(5)]), axis=0)
        return x

    center_neg = view(h_sdf, (0, 0, 0)) < 0.0
    crossing = jnp.where(center_neg, pool5(pos) > 0.0, pool5(neg) > 0.0)
    return (keep | crossing).astype(jnp.float32)


# host↔device crossover: the host path's 124-neighbor table costs N×124
# sorted-key lookups (~55 s at 2.1M voxels on a 2-core host — measured in
# bench_pipeline round 3); the block path is ~30 structured slices + pools
_THIN_SHELL_DEVICE_MIN_VOXELS = 150_000


def clear_voxels_outside_thin_shell(
    grid: VoxelGrid,
    thres_shell: float,
    use_device: bool | None = None,
    layout=None,
) -> VoxelGrid:
    """Keep (a) valid voxels with |sdf_refined| ≤ thres plus their stencil
    support, and (b) voxels with a zero-crossing in their 5³ neighborhood
    (``algorithms.cpp:368-458``).

    Large grids evaluate the keep predicate on device over the block-dense
    layout (`_thin_shell_mask_blocks` — identical result, no N×124 host
    neighbor table); `use_device` forces either path (tests pin equality).
    `layout` may supply this grid's (lo=2, hi=2) BlockLayout prebuilt in the
    background (`UpsamplePrep`) — structure-only, so precomputable during
    the preceding solve."""
    sdfr = grid.sdf_refined
    if use_device is None:
        use_device = (
            layout is not None or grid.num_voxels >= _THIN_SHELL_DEVICE_MIN_VOXELS
        )
    if use_device:
        from intrinsic3d_tpu.grid.blocks import BlockLayout, pad_block

        if layout is None:
            layout = BlockLayout.build(grid, lo=2, hi=2, halo_table=False)
        b = layout.block
        nb = layout.num_blocks

        def dense(vals):
            out = np.zeros(nb * b**3, np.float32)
            out[layout.vox_slot] = vals
            return jnp.asarray(out.reshape(nb, b, b, b))

        keep_d = _thin_shell_mask_blocks(
            pad_block(dense(np.ones(grid.num_voxels, np.float32))),
            pad_block(dense(grid.valid_mask().astype(np.float32))),
            pad_block(dense(sdfr.astype(np.float32))),
            jnp.asarray(layout.nbr27),
            jnp.float32(thres_shell),
        )
        keep = np.asarray(keep_d).reshape(-1)[layout.vox_slot] > 0.0
        return grid.select(keep)

    core = grid.valid_mask() & (np.abs(sdfr) <= thres_shell)

    keep = core.copy()
    support_idx = grid.neighbor_table(_SHELL_SUPPORT)  # [N, 9]
    touched = support_idx[core].reshape(-1)
    touched = touched[touched >= 0]
    keep[touched] = True

    # zero-crossing test for the rest
    rest = ~keep
    if np.any(rest):
        nb_idx = grid.neighbor_table(_NB_CROSS)[rest]  # [M, 124]
        present = nb_idx >= 0
        nb_sdf = sdfr[np.maximum(nb_idx, 0)]
        center_neg = sdfr[rest] < 0.0
        has_pos = np.any(present & (nb_sdf >= 0.0), axis=-1)
        has_neg = np.any(present & (nb_sdf < 0.0), axis=-1)
        crossing = np.where(center_neg, has_pos, has_neg)
        keep[np.flatnonzero(rest)[crossing]] = True

    return grid.select(keep)


# ---------------------------------------------------------------------------
# Trilinear resampling and 2× upsample
# ---------------------------------------------------------------------------

_CORNER_OFFS = np.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [0, 1, 0],
        [0, 0, 1],
        [1, 1, 0],
        [0, 1, 1],
        [1, 0, 1],
        [1, 1, 1],
    ],
    np.int32,
)


def interpolate_fields(grid: VoxelGrid, positions: np.ndarray):
    """Trilinear interpolation of all voxel fields at continuous grid
    positions `[M, 3]` (``algorithms.cpp:118-199``): invalid corners get zero
    weight; ≤4 valid corners zero the interpolated weight.

    Returns dict of field arrays.
    """
    pos = np.asarray(positions, np.float64)
    base = np.floor(pos).astype(np.int64)
    frac = (pos - base).astype(np.float32)
    corners = base[:, None, :] + _CORNER_OFFS[None, :, :]  # [M, 8, 3]
    w = np.where(
        _CORNER_OFFS[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :]
    ).prod(axis=-1)  # [M, 8]
    idx = grid.lookup(corners)  # [M, 8]
    valid = (idx >= 0) & (grid.weight[np.maximum(idx, 0)] > 0.0)
    w = np.where(valid, w, 0.0)
    cnt = valid.sum(axis=-1)
    wsum = w.sum(axis=-1)
    wsafe = np.where(wsum > 0.0, wsum, 1.0)

    def avg(field):
        vals = field[np.maximum(idx, 0)]
        if vals.ndim == 3:
            return (vals * w[..., None]).sum(axis=1) / wsafe[:, None]
        return (vals * w).sum(axis=1) / wsafe

    out = {
        "sdf": avg(grid.sdf.astype(np.float32)),
        "color": avg(grid.color),
        "weight": np.maximum(np.where(cnt > 4, avg(grid.weight), 0.0), 0.0),
    }
    if grid.is_sbr:
        out["albedo"] = avg(grid.albedo)
        out["sdf_refined"] = avg(grid.sdf_refined)
    return out


# Per-(child, corner) trilinear weights for the 2× upsample. Child c sits at
# parent + offs_c/2, so frac ∈ {0, 0.5} per axis and the 8-corner cell is the
# SAME parent + {0,1}³ set for every child of a parent — weights collapse to a
# fixed [8, 8] table (values 0.5^popcount(offs_c), binary-exact, so results
# are bitwise-identical to the general `interpolate_fields` path).
_UP_W8 = np.where(
    _CORNER_OFFS[None, :, :] == 1,
    (_CORNER_OFFS[:, None, :] * 0.5).astype(np.float32),
    (1.0 - _CORNER_OFFS[:, None, :] * 0.5).astype(np.float32),
).prod(axis=-1)  # [child c, corner k]


def _upsample_fields(grid: VoxelGrid, idx: np.ndarray | None = None) -> dict:
    """Field resampling for `upsample` using the shared-corner structure:
    ONE 8-neighbor lookup per parent (vs one per child — 8× fewer sorted-key
    searches, the dominant cost at pipeline scale) + the fixed `_UP_W8`
    weight table. Summation order over corners matches `interpolate_fields`.
    `idx` may supply the `[N, 8]` parent-corner lookup precomputed in the
    background (coords-only — `UpsamplePrep`).
    """
    parent = grid.coords.astype(np.int64)
    if idx is None:
        idx = grid.lookup(parent[:, None, :] + _CORNER_OFFS[None, :, :])  # [N, 8]
    valid = (idx >= 0) & (grid.weight[np.maximum(idx, 0)] > 0.0)
    w = np.where(valid[:, None, :], _UP_W8[None, :, :], 0.0)  # [N, c, k]
    cnt = valid.sum(axis=-1)  # same for all 8 children of a parent
    wsum = w.sum(axis=-1)  # [N, c]
    wsafe = np.where(wsum > 0.0, wsum, 1.0)

    def avg(field):
        # Weighted corner sum accumulated in the SAME reduction order numpy
        # uses in `interpolate_fields`, so results stay bitwise-equal without
        # materializing [N, 8, 8(,3)] products: last-axis scalar reduces use
        # the pairwise tree ((0+1)+(2+3))+((4+5)+(6+7)); the vector (color)
        # reduce over the non-contiguous middle axis is sequential.
        # CAVEAT: that reduction order is numpy-internal and undocumented
        # (observed stable through numpy 1.x/2.x). If a future numpy changes
        # it, tests/test_grid.py::test_upsample_matches_general_interpolation_bitwise
        # fails even though both results stay numerically valid — the fix is
        # to update this accumulation tree to match the new order (or relax
        # the parity test to a tight allclose and regenerate the goldens).
        vals = field[np.maximum(idx, 0)]  # [N, 8] or [N, 8, 3]
        if vals.ndim == 3:
            s = vals[:, None, 0, :] * w[:, :, 0, None]
            for k in range(1, 8):
                s = s + vals[:, None, k, :] * w[:, :, k, None]
            return (s / wsafe[..., None]).reshape(-1, 3)
        def term(k):
            return vals[:, None, k] * w[:, :, k]
        pair = [term(2 * i) + term(2 * i + 1) for i in range(4)]
        s = (pair[0] + pair[1]) + (pair[2] + pair[3])
        return (s / wsafe).reshape(-1)

    out = {
        "sdf": avg(grid.sdf.astype(np.float32)),
        "color": avg(grid.color),
        "weight": np.maximum(
            np.where((cnt > 4)[:, None], avg(grid.weight).reshape(len(parent), 8), 0.0), 0.0
        ).reshape(-1),
    }
    if grid.is_sbr:
        out["albedo"] = avg(grid.albedo)
        out["sdf_refined"] = avg(grid.sdf_refined)
    return out


def upsample(grid: VoxelGrid, prep: "UpsamplePrep | None" = None) -> VoxelGrid:
    """2× refinement: each voxel spawns 8 children at half voxel size, fields
    trilinearly resampled from the parent grid (``algorithms.cpp:202-237``).

    `prep` may supply the coords-only structure (corner index table, child
    grid skeleton, field reorder permutation) prebuilt in the background by
    `UpsamplePrep` while the level's solve ran — fields are identical
    (`np.argsort(kind="stable")` on the same keys, same lookup table)."""
    if prep is not None:
        prep.join()
        if not prep.ok(grid):
            prep = None
    if prep is not None:
        idx, up, order = prep.idx, prep.up, prep.order
    else:
        parent = grid.coords.astype(np.int64)
        child_coords = (2 * parent)[:, None, :] + _CORNER_OFFS[None, :, :]
        child_coords = child_coords.reshape(-1, 3)
        idx = None
        up = VoxelGrid.from_coords(
            grid.voxel_size * 0.5,
            child_coords,
            grid.depth_min,
            grid.depth_max,
            sbr=grid.is_sbr,
        )
        # from_coords sorted by key; re-apply the same ordering to the fields
        from intrinsic3d_tpu.grid.voxel_grid import pack_coords

        order = np.argsort(pack_coords(child_coords), kind="stable")

    fields = _upsample_fields(grid, idx=idx)
    up.sdf = fields["sdf"][order].astype(np.float32)
    up.weight = fields["weight"][order].astype(np.float32)
    up.color = fields["color"][order].astype(np.float32)
    if grid.is_sbr:
        up.albedo = fields["albedo"][order].astype(np.float32)
        up.sdf_refined = fields["sdf_refined"][order].astype(np.float32)
    up.integration_weight_sample = grid.integration_weight_sample
    return up


class UpsamplePrep:
    """Coords-only level-boundary precompute, overlapped with the solve.

    The serial chain at a grid-level boundary is
    solve → recolor → ×2 `upsample` → `clear_voxels_outside_thin_shell`,
    and the upsample/sparsify host structure — the parent-corner lookup
    table, the child-grid skeleton + field reorder permutation, and the
    child grid's (lo=2, hi=2) sparsify BlockLayout — depends ONLY on voxel
    coords, which the solve and recolor never change. This thread builds all
    of it (and warms the `_thin_shell_mask_blocks` program for the child
    shapes) while the solver iterations run, taking those seconds off the
    boundary's critical path (BENCH_NOTES round 4: upsample 3.4 s +
    sparsify 3.5 s serial at the finest boundary).

    Field resampling itself (which DOES need the solved `sdf_refined`) stays
    in `upsample`; results are bitwise-identical with or without the prep.
    """

    def __init__(self, grid: VoxelGrid, warm_program: bool = True):
        import threading

        self.grid = grid
        self.idx = None
        self.up = None
        self.order = None
        self.layout = None
        self._exc = None
        self._warm = warm_program
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            self._prepare()
        except Exception as exc:  # noqa: BLE001 — prep must never kill a level
            self._exc = exc
            self.idx = self.up = self.order = self.layout = None

    def _prepare(self):
        grid = self.grid
        parent = grid.coords.astype(np.int64)
        self.idx = grid.lookup(parent[:, None, :] + _CORNER_OFFS[None, :, :])
        child_coords = (2 * parent)[:, None, :] + _CORNER_OFFS[None, :, :]
        child_coords = child_coords.reshape(-1, 3)
        up = VoxelGrid.from_coords(
            grid.voxel_size * 0.5,
            child_coords,
            grid.depth_min,
            grid.depth_max,
            sbr=grid.is_sbr,
        )
        from intrinsic3d_tpu.grid.voxel_grid import pack_coords

        self.order = np.argsort(pack_coords(child_coords), kind="stable")
        from intrinsic3d_tpu.grid.blocks import BlockLayout, pad_block

        self.layout = BlockLayout.build(up, lo=2, hi=2, halo_table=False)
        self.up = up
        if self._warm:
            # dummy zero-field call: drives trace + compile-cache load +
            # remote program upload for the child shapes off the critical path
            nb, b = self.layout.num_blocks, self.layout.block
            z = pad_block(jnp.zeros((nb, b, b, b), jnp.float32))
            out = _thin_shell_mask_blocks(
                z, z, z, jnp.asarray(self.layout.nbr27), jnp.float32(0.0)
            )
            jax.block_until_ready(out)

    def join(self) -> "UpsamplePrep":
        self._thread.join()
        return self

    def ok(self, grid: VoxelGrid) -> bool:
        """Usable for this parent grid? (same object, built without error)"""
        return self._exc is None and self.grid is grid and self.up is not None

    def layout_for(self, grid: VoxelGrid):
        """The prebuilt sparsify BlockLayout, iff `grid` IS the child grid
        this prep produced (the object `upsample(..., prep=self)` returned)."""
        self.join()
        if self._exc is None and self.up is grid:
            return self.layout
        return None
