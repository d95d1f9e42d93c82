"""Block-dense formulation of the joint-refinement problem (flat [nb, B³]).

The flat-table solver pays one scattered memory access per stencil tap inside
every PCG matvec — measured at ≈130M gather elements/s, the dominant cost of a
GN iteration (BENCH_NOTES.md). This module re-lays the problem out the TPU way
(ARCHITECTURE.md, SURVEY §7.1):

- per-voxel fields live as `[nb+1, B³]` blocks — B³ = 512 lanes = four exact
  (8,128) f32 tiles, zero padding waste (the earlier 4D `[nb,B,B,B]` layout
  padded 8 lanes to 128 — 16x physical bytes — and profiled 3x slower);
- every stencil offset is realized by `grid.blocks.ShiftPlan`: block-row
  gathers along the MAJOR dim + static one-hot `[512,512]` lane-permutation
  matmuls — the MXU does the lane gathering, exactly at any precision;
- **E_r / E_s / E_a** (``volumetric_regularizer.h:59-72``,
  ``surface_stab_regularizer.h:59-66``, ``albedo_regularizer.h:59-66``) are
  evaluated densely over all block slots with per-slot weights — zero gathers.
  E_a pairs are re-expressed as three +axis direction fields (each undirected
  6-neighborhood pair (v, v+e_d) is visited exactly once, preserving the
  reference's `voxels_added` dedup, ``optimizer.cpp:268-274``);
- **E_g** (``shading_cost.h:132-197``) stays compacted over active
  (voxel, observation) elements; its 10-SDF/4-albedo stencil values are read
  by ONE contiguous row-gather per element from the shifted stencil stack
  `[nb·B³, 10]`, and `jax.linear_transpose` turns that into a row-granular
  scatter-add plus transposed one-hot matmuls — the whole JᵀJ·v chain stays
  structured automatically.

The solver (`refine/solver.py::gn_iteration`) is layout-agnostic: it dispatches
on the assembly type, so the damped-GN/PCG algorithm is shared verbatim with
the flat-table path (kept as the equivalence oracle).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.grid.blocks import BlockLayout, ShiftPlan, build_shift_plan, pad_flat
from intrinsic3d_tpu.grid.voxel_grid import EG_ALBEDO_OFFSETS, EG_SDF_OFFSETS
from intrinsic3d_tpu.refine.residuals import Assembly, Params, eg_core, eg_elem

# sdf plan: the 10 E_g forward-difference offsets + the three −axis offsets
# (completing the ±6-ring for the E_r Laplacian and its diagonal)
SDF_OFFSETS = tuple(map(tuple, EG_SDF_OFFSETS)) + ((-1, 0, 0), (0, -1, 0), (0, 0, -1))
# albedo plan: E_g's 4 albedo taps (= center + the three +axis E_a partners)
# + the three −axis offsets for the E_a diagonal
ALB_OFFSETS = tuple(map(tuple, EG_ALBEDO_OFFSETS)) + ((-1, 0, 0), (0, -1, 0), (0, 0, -1))

_PLUS = ((1, 0, 0), (0, 1, 0), (0, 0, 1))
_MINUS = ((-1, 0, 0), (0, -1, 0), (0, 0, -1))
_RING6 = _PLUS + _MINUS


class BlockAssembly(NamedTuple):
    """Static per-outer-iteration problem data in flat block-dense layout."""

    # E_g — compacted (voxel, observation) elements
    eg_slot: jnp.ndarray  # [M] int32 flat slot (block·B³ + local) of the voxel
    eg_frame: jnp.ndarray  # [M] int32
    eg_onehot: jnp.ndarray  # [M, K] or [M, 0]
    eg_w: jnp.ndarray  # [M]
    eg_sh: jnp.ndarray  # [M, 9]
    eg_vpos: jnp.ndarray  # [M, 3] int32 voxel coords
    # stencil shift plans (one-hot matmul decompositions)
    sdf_plan: ShiftPlan
    alb_plan: ShiftPlan
    # dense per-slot fields [nb, B³]
    er_w: jnp.ndarray
    es_ref: jnp.ndarray
    es_w: jnp.ndarray
    ea_w: jnp.ndarray  # [3, nb, B³] — weight of pair (v, v + e_d)
    # shared
    lam: jnp.ndarray  # [4]
    images: jnp.ndarray  # [K, H, W]
    pyr_scale: jnp.ndarray
    voxel_size: jnp.ndarray


def _rows_of(stack: jnp.ndarray, slots: jnp.ndarray) -> jnp.ndarray:
    """`[T, nb, B³]` shifted stack → per-element rows `[M, T]` via ONE
    contiguous row-gather (the transpose is a row-granular scatter-add)."""
    t = stack.shape[0]
    flat = jnp.moveaxis(stack, 0, -1).reshape(-1, t)
    return flat[slots]


def block_all_residuals(params: Params, asm: BlockAssembly) -> jnp.ndarray:
    """Concatenated weighted residual vector — identical energy to
    `residuals.all_residuals` on the equivalent table assembly (E_r/E_s/E_a
    rows appear in slot order rather than table order; the total cost, the
    gradient, and JᵀJ are unchanged)."""
    sh_sdf = asm.sdf_plan.apply(params.sdf)  # [13, nb, B³]
    sh_alb = asm.alb_plan.apply(params.albedo)  # [7, nb, B³]

    # --- E_g over compacted elements ----------------------------------------
    sdf10 = _rows_of(sh_sdf[:10], asm.eg_slot)
    alb4 = _rows_of(sh_alb[:4], asm.eg_slot)
    if asm.eg_onehot.shape[1]:
        pose6 = jnp.dot(
            asm.eg_onehot,
            params.poses,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    else:
        pose6 = params.poses[asm.eg_frame]
    r_g = eg_core(
        sdf10,
        alb4,
        pose6,
        params.intr,
        params.dist,
        asm.eg_sh,
        asm.eg_vpos,
        asm.eg_frame,
        asm.images,
        asm.pyr_scale,
        asm.voxel_size,
    )
    r_g = jnp.sqrt(asm.eg_w * asm.lam[0]) * r_g

    # --- E_r: dense Laplacian (gather-free) ---------------------------------
    center = sh_sdf[asm.sdf_plan.index((0, 0, 0))]
    lap = -6.0 * center
    for o in _RING6:
        lap = lap + sh_sdf[asm.sdf_plan.index(o)]
    r_r = (jnp.sqrt(asm.er_w * asm.lam[1]) * lap).reshape(-1)

    # --- E_s: dense anchor ---------------------------------------------------
    r_s = (jnp.sqrt(asm.es_w * asm.lam[2]) * (center - asm.es_ref)).reshape(-1)

    # --- E_a: three direction fields (gather-free) ---------------------------
    a_c = sh_alb[asm.alb_plan.index((0, 0, 0))]
    ra = []
    for d, e in enumerate(_PLUS):
        diff = a_c - sh_alb[asm.alb_plan.index(e)]
        ra.append((jnp.sqrt(asm.ea_w[d] * asm.lam[3]) * diff).reshape(-1))

    return jnp.concatenate([r_g, r_r, r_s] + ra)


def jtj_diag_block(params: Params, asm: BlockAssembly) -> Params:
    """Exact diag(JᵀJ) in block layout (mirror of `solver.jtj_diag`)."""
    k = params.poses.shape[0]

    def gather_sdf(f):
        return _rows_of(asm.sdf_plan.apply(f)[:10], asm.eg_slot)

    def gather_alb(f):
        return _rows_of(asm.alb_plan.apply(f)[:4], asm.eg_slot)

    local = jnp.concatenate(
        [
            gather_sdf(params.sdf),
            gather_alb(params.albedo),
            params.poses[asm.eg_frame],
            jnp.broadcast_to(params.intr, (asm.eg_frame.shape[0], 4)),
            jnp.broadcast_to(params.dist, (asm.eg_frame.shape[0], 5)),
        ],
        axis=-1,
    )
    sqrt_wlam = jnp.sqrt(asm.eg_w * asm.lam[0])
    jac = jax.vmap(
        jax.jacfwd(eg_elem, argnums=0),
        in_axes=(0, 0, 0, 0, None, None, None, 0),
    )(local, asm.eg_sh, asm.eg_vpos, asm.eg_frame, asm.images, asm.pyr_scale, asm.voxel_size, sqrt_wlam)
    j2 = jac * jac  # [M, 29]

    # scatter stencil contributions back through the exact transposes of the
    # row-gather chains (row scatter-add + transposed one-hot matmuls)
    d_sdf = jax.linear_transpose(gather_sdf, params.sdf)(j2[:, :10])[0]
    d_alb = jax.linear_transpose(gather_alb, params.albedo)(j2[:, 10:14])[0]
    d_pose = jnp.zeros((k, 6), params.poses.dtype).at[asm.eg_frame].add(j2[:, 14:20])
    d_intr = jnp.sum(j2[:, 20:24], axis=0)
    d_dist = jnp.sum(j2[:, 24:29], axis=0)

    # E_r: ∂lap/∂center = −6 → 36·w at v; ∂lap/∂nbr = 1 → w at v+e, i.e.
    # d(v) += w(v−e) — a −e shift of the dense weight field
    wl_r = asm.er_w * asm.lam[1]
    sh_wr = asm.sdf_plan.apply(pad_flat(wl_r))
    d_sdf_int = d_sdf[:-1] + 36.0 * wl_r
    for o in _RING6:
        d_sdf_int = d_sdf_int + sh_wr[asm.sdf_plan.index(tuple(-c for c in o))]

    # E_s
    d_sdf_int = d_sdf_int + asm.es_w * asm.lam[2]
    d_sdf = jnp.concatenate([d_sdf_int, d_sdf[-1:]], axis=0)

    # E_a: d(v) += w_d(v);  d(v+e_d) += w_d(v) ⇔ d(v) += w_d(v−e_d)
    wl_a = asm.ea_w * asm.lam[3]
    d_alb_int = d_alb[:-1] + jnp.sum(wl_a, axis=0)
    for d, e in enumerate(_PLUS):
        sh_wa = asm.alb_plan.apply(pad_flat(wl_a[d]))
        d_alb_int = d_alb_int + sh_wa[asm.alb_plan.index(tuple(-c for c in e))]
    d_alb = jnp.concatenate([d_alb_int, d_alb[-1:]], axis=0)

    return Params(d_sdf, d_alb, d_pose, d_intr, d_dist)


# ---------------------------------------------------------------------------
# Table ⇄ block transport
# ---------------------------------------------------------------------------


def table_to_dense(layout: BlockLayout, table, pad: bool = True):
    """[N] table field → flat `[nb(+1), B³]` dense blocks (empties 0)."""
    s = layout.block**3
    nb = layout.num_blocks
    out = jnp.zeros(nb * s, jnp.asarray(table).dtype)
    out = out.at[jnp.asarray(layout.vox_slot)].set(jnp.asarray(table))
    out = out.reshape(nb, s)
    return pad_flat(out) if pad else out


def dense_to_table(layout: BlockLayout, dense) -> jnp.ndarray:
    """Flat dense blocks (padded or not) → [N] table order."""
    return dense.reshape(-1)[jnp.asarray(layout.vox_slot)]


def layout_plans(layout: BlockLayout) -> Tuple[ShiftPlan, ShiftPlan]:
    """Build (and cache on the layout) the sdf/albedo shift plans."""
    cache = getattr(layout, "_plan_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(layout, "_plan_cache", cache)
    if "sdf" not in cache:
        cache["sdf"] = build_shift_plan(layout, SDF_OFFSETS)
        cache["alb"] = build_shift_plan(layout, ALB_OFFSETS)
    return cache["sdf"], cache["alb"]


def to_block_problem(
    layout: BlockLayout,
    coords: np.ndarray,
    asm: Assembly,
    masks,
    params: Params,
) -> Tuple[Params, BlockAssembly, object]:
    """Convert a flat-table problem (from `assembly.build_assembly`) into the
    block-dense form. Pure re-layout: same energy, same free parameters."""
    s = layout.block**3
    nb = layout.num_blocks

    eg_slot = layout.slots_of(np.asarray(asm.eg_vpos))
    # padded/invalid elements carry weight 0 — park them on slot 0
    eg_slot = np.where(eg_slot >= 0, eg_slot, 0).astype(np.int32)

    def densify(table_vals):
        out = np.zeros(nb * s, np.float32)
        out[layout.vox_slot] = np.asarray(table_vals, np.float32)
        return out.reshape(nb, s)

    # E_a pairs → three +axis direction weight fields
    pairs = np.asarray(asm.ea_pairs)
    ea_wt = np.asarray(asm.ea_w, np.float32)
    delta = coords[pairs[:, 1]] - coords[pairs[:, 0]]
    slots_i = layout.vox_slot[pairs[:, 0]]
    slots_j = layout.vox_slot[pairs[:, 1]]
    ea_w = np.zeros((3, nb * s), np.float32)
    for d in range(3):
        e = np.zeros(3, np.int64)
        e[d] = 1
        fwd = np.all(delta == e, axis=-1)
        bwd = np.all(delta == -e, axis=-1)
        ea_w[d, slots_i[fwd]] = ea_wt[fwd]
        ea_w[d, slots_j[bwd]] = ea_wt[bwd]
    ea_w = ea_w.reshape(3, nb, s)

    sdf_plan, alb_plan = layout_plans(layout)

    basm = BlockAssembly(
        eg_slot=jnp.asarray(eg_slot),
        eg_frame=asm.eg_frame,
        eg_onehot=asm.eg_onehot,
        eg_w=asm.eg_w,
        eg_sh=asm.eg_sh,
        eg_vpos=asm.eg_vpos,
        sdf_plan=sdf_plan,
        alb_plan=alb_plan,
        er_w=jnp.asarray(densify(asm.er_w)),
        es_ref=jnp.asarray(densify(asm.es_ref)),
        es_w=jnp.asarray(densify(asm.es_w)),
        ea_w=jnp.asarray(ea_w),
        lam=asm.lam,
        images=asm.images,
        pyr_scale=asm.pyr_scale,
        voxel_size=asm.voxel_size,
    )

    bparams = params._replace(
        sdf=table_to_dense(layout, params.sdf),
        albedo=table_to_dense(layout, params.albedo),
    )
    bmasks = type(masks)(
        sdf=table_to_dense(layout, masks.sdf),
        albedo=table_to_dense(layout, masks.albedo),
        poses=masks.poses,
        intr=masks.intr,
        dist=masks.dist,
    )
    return bparams, basm, bmasks


def params_from_block(layout: BlockLayout, bparams: Params) -> Params:
    """Block-dense parameters → table-order Params."""
    return bparams._replace(
        sdf=dense_to_table(layout, bparams.sdf),
        albedo=dense_to_table(layout, bparams.albedo),
    )
