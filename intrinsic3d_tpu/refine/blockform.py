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
    # dense (obs-slot, block-slot) element indexing for the hand-rolled
    # linearization: element m owns dense row eg_dense_idx[m] ∈ [0, O·nb·B³)
    # ((obs, slot) pairs are unique over active elements; padded elements
    # carry all-zero updates and park at row 0, harmless under scatter-ADD)
    eg_dense_idx: jnp.ndarray  # [M] int32
    pose_onehot_d: jnp.ndarray  # [K, O·nb·B³] f32 frame one-hot per dense row
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
# Hand-rolled linearization: fully dense (gather/scatter-free) GN matvec
# ---------------------------------------------------------------------------
#
# `jax.linearize` of the E_g chain drags [M]-shaped element intermediates
# through the PCG loop and re-derives per-matvec row gathers/scatters of the
# stencil stack (~12 ms each on TPU v5e — the loop bottleneck, BENCH_NOTES.md).
# Instead: ONE reverse pass (`vmap(value_and_grad)`) yields the exact per-
# element Jacobian [M, 29]; one row scatter-add moves it into dense
# (obs-slot, block-slot) coefficient fields; after that the matvec, its
# transpose, the gradient, and the exact Jacobi diagonal are pure dense
# elementwise math + ShiftPlan one-hot matmuls + a [K,D] pose one-hot matmul —
# zero gathers, zero scatters, no [M]-shaped loop state.


class BlockLin(NamedTuple):
    """Linearization of the block problem at a point (static through PCG)."""

    a_sdf: jnp.ndarray  # [10, O, nb·B³]
    a_alb: jnp.ndarray  # [4, O, nb·B³]
    a_pose: jnp.ndarray  # [6, O, nb·B³]
    a_intr: jnp.ndarray  # [4, O, nb·B³]
    a_dist: jnp.ndarray  # [5, O, nb·B³]
    r0_g: jnp.ndarray  # [O, nb·B³] weighted E_g residual
    r0_r: jnp.ndarray  # [nb, B³]
    r0_s: jnp.ndarray  # [nb, B³]
    r0_a: jnp.ndarray  # [3, nb, B³]
    sq_er: jnp.ndarray  # [nb, B³] √(w·λ) factors (Jacobians of the linear terms)
    sq_es: jnp.ndarray  # [nb, B³]
    sq_ea: jnp.ndarray  # [3, nb, B³]


def _ring_into(plan: ShiftPlan, cot: list, center_val, ring_val) -> None:
    """Accumulate a Laplacian-shaped cotangent: −6·x at center, +x at ±axes."""
    c = plan.index((0, 0, 0))
    cot[c] = cot[c] + center_val
    for o in _RING6:
        cot[plan.index(o)] = cot[plan.index(o)] + ring_val


def linearize_block(params: Params, asm: BlockAssembly) -> Tuple[jnp.ndarray, BlockLin]:
    """One reverse-mode pass over the compacted E_g elements + closed forms
    for the linear terms. Returns (cost0, lin)."""
    nb = params.sdf.shape[0] - 1
    s = params.sdf.shape[1]
    k = params.poses.shape[0]
    d_rows = asm.pose_onehot_d.shape[1]
    o_slots = d_rows // (nb * s)

    sh = asm.sdf_plan.apply(params.sdf)  # [13, nb, B³]
    sha = asm.alb_plan.apply(params.albedo)  # [7, nb, B³]

    # --- E_g: value + exact per-element Jacobian in one reverse pass --------
    sdf10 = _rows_of(sh[:10], asm.eg_slot)
    alb4 = _rows_of(sha[:4], asm.eg_slot)
    local = jnp.concatenate(
        [
            sdf10,
            alb4,
            params.poses[asm.eg_frame],
            jnp.broadcast_to(params.intr, (asm.eg_frame.shape[0], 4)),
            jnp.broadcast_to(params.dist, (asm.eg_frame.shape[0], 5)),
        ],
        axis=-1,
    )
    sqrt_wlam = jnp.sqrt(asm.eg_w * asm.lam[0])

    def _eg_weighted(loc):
        return sqrt_wlam * eg_core(
            loc[:, :10],
            loc[:, 10:14],
            loc[:, 14:20],
            loc[:, 20:24],
            loc[:, 24:29],
            asm.eg_sh,
            asm.eg_vpos,
            asm.eg_frame,
            asm.images,
            asm.pyr_scale,
            asm.voxel_size,
        )

    # elements are independent, so ONE batched reverse pass with a ones
    # cotangent yields the exact per-element Jacobian [M, 29] — and it runs
    # through the batched row-gather bicubic sampler instead of 64 per-element
    # scalar tap gathers (BENCH_NOTES.md)
    val, vjp_fn = jax.vjp(_eg_weighted, local)
    jac = vjp_fn(jnp.ones_like(val))[0]

    # one row scatter-add into dense (obs, slot) rows; padded elements are
    # all-zero rows parked at index 0
    updates = jnp.concatenate([jac, val[:, None]], axis=-1)  # [M, 30]
    buf = jnp.zeros((d_rows, 30), jnp.float32).at[asm.eg_dense_idx].add(updates)
    bt = buf.T  # [30, D] — one relayout, then every coefficient is dense
    a_sdf = bt[:10].reshape(10, o_slots, nb * s)
    a_alb = bt[10:14].reshape(4, o_slots, nb * s)
    a_pose = bt[14:20].reshape(6, o_slots, nb * s)
    a_intr = bt[20:24].reshape(4, o_slots, nb * s)
    a_dist = bt[24:29].reshape(5, o_slots, nb * s)
    r0_g = bt[29].reshape(o_slots, nb * s)

    # --- linear terms (closed-form Jacobians = the √(w·λ) factors) -----------
    c = asm.sdf_plan.index((0, 0, 0))
    center = sh[c]
    lap = -6.0 * center
    for o in _RING6:
        lap = lap + sh[asm.sdf_plan.index(o)]
    sq_er = jnp.sqrt(asm.er_w * asm.lam[1])
    r0_r = sq_er * lap
    sq_es = jnp.sqrt(asm.es_w * asm.lam[2])
    r0_s = sq_es * (center - asm.es_ref)
    a_c = sha[asm.alb_plan.index((0, 0, 0))]
    sq_ea = jnp.sqrt(asm.ea_w * asm.lam[3])
    r0_a = jnp.stack(
        [sq_ea[d] * (a_c - sha[asm.alb_plan.index(e)]) for d, e in enumerate(_PLUS)]
    )

    cost0 = 0.5 * (
        jnp.sum(r0_g * r0_g)
        + jnp.sum(r0_r * r0_r)
        + jnp.sum(r0_s * r0_s)
        + jnp.sum(r0_a * r0_a)
    )
    lin = BlockLin(a_sdf, a_alb, a_pose, a_intr, a_dist, r0_g, r0_r, r0_s, r0_a, sq_er, sq_es, sq_ea)
    return cost0, lin


def jv_block(lin: BlockLin, asm: BlockAssembly, v: Params):
    """J·v — tangent of the residual parts, fully dense."""
    nb = v.sdf.shape[0] - 1
    s = v.sdf.shape[1]
    o_slots = lin.r0_g.shape[0]

    sh = asm.sdf_plan.apply(v.sdf)
    sha = asm.alb_plan.apply(v.albedo)
    shf = sh[:10].reshape(10, nb * s)
    shaf = sha[:4].reshape(4, nb * s)

    y_g = jnp.einsum("jon,jn->on", lin.a_sdf, shf)
    y_g = y_g + jnp.einsum("jon,jn->on", lin.a_alb, shaf)
    vsel = jnp.einsum(
        "kd,ka->ad", asm.pose_onehot_d, v.poses, preferred_element_type=jnp.float32
    ).reshape(6, o_slots, nb * s)
    y_g = y_g + jnp.einsum("aon,aon->on", lin.a_pose, vsel)
    y_g = y_g + jnp.einsum("aon,a->on", lin.a_intr, v.intr)
    y_g = y_g + jnp.einsum("aon,a->on", lin.a_dist, v.dist)

    c = asm.sdf_plan.index((0, 0, 0))
    lap = -6.0 * sh[c]
    for o in _RING6:
        lap = lap + sh[asm.sdf_plan.index(o)]
    y_r = lin.sq_er * lap
    y_s = lin.sq_es * sh[c]
    a_c = sha[asm.alb_plan.index((0, 0, 0))]
    y_a = jnp.stack(
        [lin.sq_ea[d] * (a_c - sha[asm.alb_plan.index(e)]) for d, e in enumerate(_PLUS)]
    )
    return (y_g, y_r, y_s, y_a)


def jtv_block(lin: BlockLin, asm: BlockAssembly, y) -> Params:
    """Jᵀ·y — exact adjoint of `jv_block` (PCG needs the pair symmetric)."""
    y_g, y_r, y_s, y_a = y
    nb = lin.r0_r.shape[0]
    s = lin.r0_r.shape[1]
    k = asm.pose_onehot_d.shape[0]

    # sdf cotangent stack over the plan's 13 offsets
    q = jnp.einsum("jon,on->jn", lin.a_sdf, y_g).reshape(10, nb, s)
    cot = [None] * len(asm.sdf_plan.offsets)
    for j in range(10):
        cot[j] = q[j]
    for j in range(10, len(cot)):
        cot[j] = jnp.zeros((nb, s), jnp.float32)
    yr = lin.sq_er * y_r
    _ring_into(asm.sdf_plan, cot, -6.0 * yr, yr)
    c = asm.sdf_plan.index((0, 0, 0))
    cot[c] = cot[c] + lin.sq_es * y_s
    g_sdf = asm.sdf_plan.apply_transpose(jnp.stack(cot))

    qa = jnp.einsum("jon,on->jn", lin.a_alb, y_g).reshape(4, nb, s)
    cot_a = [None] * len(asm.alb_plan.offsets)
    for j in range(4):
        cot_a[j] = qa[j]
    for j in range(4, len(cot_a)):
        cot_a[j] = jnp.zeros((nb, s), jnp.float32)
    ca = asm.alb_plan.index((0, 0, 0))
    for d, e in enumerate(_PLUS):
        ya = lin.sq_ea[d] * y_a[d]
        cot_a[ca] = cot_a[ca] + ya
        ei = asm.alb_plan.index(e)
        cot_a[ei] = cot_a[ei] - ya
    g_alb = asm.alb_plan.apply_transpose(jnp.stack(cot_a))

    p = (lin.a_pose * y_g[None]).reshape(6, -1)  # [6, D]
    g_pose = jnp.einsum(
        "kd,ad->ka", asm.pose_onehot_d, p, preferred_element_type=jnp.float32
    )
    g_intr = jnp.einsum("aon,on->a", lin.a_intr, y_g)
    g_dist = jnp.einsum("aon,on->a", lin.a_dist, y_g)
    return Params(g_sdf, g_alb, g_pose, g_intr, g_dist)


def diag_from_lin(lin: BlockLin, asm: BlockAssembly) -> Params:
    """Exact diag(JᵀJ) from the dense coefficient fields."""
    nb = lin.r0_r.shape[0]
    s = lin.r0_r.shape[1]

    cot = [None] * len(asm.sdf_plan.offsets)
    q2 = jnp.sum(lin.a_sdf * lin.a_sdf, axis=1).reshape(10, nb, s)
    for j in range(10):
        cot[j] = q2[j]
    for j in range(10, len(cot)):
        cot[j] = jnp.zeros((nb, s), jnp.float32)
    wl_r = lin.sq_er * lin.sq_er
    _ring_into(asm.sdf_plan, cot, 36.0 * wl_r, wl_r)
    c = asm.sdf_plan.index((0, 0, 0))
    cot[c] = cot[c] + lin.sq_es * lin.sq_es
    d_sdf = asm.sdf_plan.apply_transpose(jnp.stack(cot))

    cot_a = [None] * len(asm.alb_plan.offsets)
    qa2 = jnp.sum(lin.a_alb * lin.a_alb, axis=1).reshape(4, nb, s)
    for j in range(4):
        cot_a[j] = qa2[j]
    for j in range(4, len(cot_a)):
        cot_a[j] = jnp.zeros((nb, s), jnp.float32)
    ca = asm.alb_plan.index((0, 0, 0))
    wl_a = lin.sq_ea * lin.sq_ea
    cot_a[ca] = cot_a[ca] + jnp.sum(wl_a, axis=0)
    for d, e in enumerate(_PLUS):
        ei = asm.alb_plan.index(e)
        cot_a[ei] = cot_a[ei] + wl_a[d]
    d_alb = asm.alb_plan.apply_transpose(jnp.stack(cot_a))

    p2 = (lin.a_pose * lin.a_pose).reshape(6, -1)
    d_pose = jnp.einsum(
        "kd,ad->ka", asm.pose_onehot_d, p2, preferred_element_type=jnp.float32
    )
    d_intr = jnp.einsum("aon->a", lin.a_intr * lin.a_intr)
    d_dist = jnp.einsum("aon->a", lin.a_dist * lin.a_dist)
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
    num_obs: int = 0,
) -> Tuple[Params, BlockAssembly, object]:
    """Convert a flat-table problem (from `assembly.build_assembly`) into the
    block-dense form. Pure re-layout: same energy, same free parameters.

    `num_obs` is the observation-slot capacity O of the dense (obs, slot)
    element indexing (``Intrinsic3D::Config num_observations``); 0 derives the
    smallest capacity from the active elements (fine for one-shot problems,
    but pass the config value to keep shapes static across outer iterations)."""
    s = layout.block**3
    nb = layout.num_blocks

    eg_slot = layout.slots_of(np.asarray(asm.eg_vpos))
    # padded/invalid elements carry weight 0 — park them on slot 0
    eg_slot = np.where(eg_slot >= 0, eg_slot, 0).astype(np.int32)

    # dense (obs, slot) indexing: rank each ACTIVE element among its voxel's
    # active observations (unique (rank, slot) pairs); padded elements write
    # all-zero updates and park at dense row 0 (harmless under scatter-add)
    eg_w_np = np.asarray(asm.eg_w)
    eg_frame_np = np.asarray(asm.eg_frame)
    active = eg_w_np > 0.0
    order = np.argsort(eg_slot[active], kind="stable")
    srt = eg_slot[active][order]
    first = np.searchsorted(srt, srt)  # first occurrence index per element
    rank = np.empty(len(srt), np.int64)
    rank[order] = np.arange(len(srt)) - first
    o_cap = max(int(num_obs), int(rank.max()) + 1 if len(rank) else 1, 1)
    dense_idx = np.zeros(len(eg_slot), np.int64)
    dense_idx[active] = rank * (nb * s) + eg_slot[active]
    num_frames = int(params.poses.shape[0])
    onehot_d = np.zeros((num_frames, o_cap * nb * s), np.float32)
    onehot_d[eg_frame_np[active], dense_idx[active]] = 1.0

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
        eg_dense_idx=jnp.asarray(dense_idx.astype(np.int32)),
        pose_onehot_d=jnp.asarray(onehot_d),
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
