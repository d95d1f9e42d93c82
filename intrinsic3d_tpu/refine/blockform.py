"""Block-dense formulation of the joint-refinement problem.

The flat-table solver pays one scattered memory access per stencil tap inside
every PCG matvec — measured at ≈130M gather rows/s, the dominant cost of a GN
iteration (BENCH_NOTES.md). This module re-lays the problem out the TPU way
(ARCHITECTURE.md, SURVEY §7.1): per-voxel fields live as dense `[nb+1, B,B,B]`
blocks (one trailing all-zero pad block), halos are filled by 27 structured
block-row copies, and every fixed stencil offset becomes a static shifted
slice. Consequences for each energy term:

- **E_r / E_s / E_a** (``volumetric_regularizer.h:59-72``,
  ``surface_stab_regularizer.h:59-66``, ``albedo_regularizer.h:59-66``):
  evaluated densely over all block slots with per-slot weights — ZERO gathers.
  E_a pairs are re-expressed as three +axis direction fields (each undirected
  6-neighborhood pair (v, v+e_d) is visited exactly once, preserving the
  reference's `voxels_added` dedup, ``optimizer.cpp:268-274``).
- **E_g** (``shading_cost.h:132-197``): stays compacted over active
  (voxel, observation) elements, but its 10-SDF/4-albedo stencil values are
  read by ONE contiguous row-gather per element from a dense
  stencil-stack `[nb·B³, 10]` built out of shifted slices — 10× fewer gather
  rows than per-tap gathers, and the transpose (the JᵀJ·v scatter) inherits
  the same structure automatically through `jax.linear_transpose`.

The solver (`refine/solver.py::gn_iteration`) is layout-agnostic: it dispatches
on the assembly type, so the damped-GN/PCG algorithm is shared verbatim with
the flat-table path.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.grid.blocks import BlockLayout, halo27, pad_block, shifted27
from intrinsic3d_tpu.grid.voxel_grid import (
    EG_ALBEDO_OFFSETS,
    EG_SDF_OFFSETS,
    RING6_OFFSETS,
)
from intrinsic3d_tpu.refine.residuals import (
    Assembly,
    Params,
    eg_core,
    eg_elem,
)


class BlockAssembly(NamedTuple):
    """Static per-outer-iteration problem data in block-dense layout."""

    # E_g — compacted (voxel, observation) elements
    eg_slot: jnp.ndarray  # [M] int32 flat slot (block·B³ + local) of the voxel
    eg_frame: jnp.ndarray  # [M] int32
    eg_onehot: jnp.ndarray  # [M, K] or [M, 0]
    eg_w: jnp.ndarray  # [M]
    eg_sh: jnp.ndarray  # [M, 9]
    eg_vpos: jnp.ndarray  # [M, 3] int32 voxel coords
    # block topology
    nbr27: jnp.ndarray  # [nb, 27] neighbor block rows (nb = zero pad block)
    # dense per-slot fields [nb, B, B, B]
    er_w: jnp.ndarray
    es_ref: jnp.ndarray
    es_w: jnp.ndarray
    ea_w: jnp.ndarray  # [3, nb, B, B, B] — weight of pair (v, v + e_d)
    # shared
    lam: jnp.ndarray  # [4]
    images: jnp.ndarray  # [K, H, W]
    pyr_scale: jnp.ndarray
    voxel_size: jnp.ndarray


_EA_DIRS = ((1, 0, 0), (0, 1, 0), (0, 0, 1))


def _stencil_rows(field_pad, nbr27, offsets, slots):
    """Per-element stencil value rows `[M, T]`: halo → T shifted slices →
    `[nb·B³, T]` stack → one contiguous row-gather. Linear in `field_pad`
    (its `linear_transpose` is the structured row scatter-add)."""
    B = field_pad.shape[-1]
    h = halo27(field_pad, nbr27)
    cols = [shifted27(h, o, B) for o in np.asarray(offsets)]
    stack = jnp.stack(cols, axis=-1).reshape(-1, len(cols))
    return stack[slots]


def block_all_residuals(params: Params, asm: BlockAssembly) -> jnp.ndarray:
    """Concatenated weighted residual vector — identical energy to
    `residuals.all_residuals` on the equivalent table assembly (E_r/E_s/E_a
    rows appear in slot order rather than table order; the total cost, the
    gradient, and JᵀJ are unchanged)."""
    B = params.sdf.shape[-1]
    sdf_h = halo27(params.sdf, asm.nbr27)
    alb_h = halo27(params.albedo, asm.nbr27)

    # --- E_g over compacted elements ---------------------------------------
    cols = [shifted27(sdf_h, o, B) for o in np.asarray(EG_SDF_OFFSETS)]
    sdf10 = jnp.stack(cols, axis=-1).reshape(-1, 10)[asm.eg_slot]
    cols = [shifted27(alb_h, o, B) for o in np.asarray(EG_ALBEDO_OFFSETS)]
    alb4 = jnp.stack(cols, axis=-1).reshape(-1, 4)[asm.eg_slot]
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

    # --- E_r: dense Laplacian (gather-free) --------------------------------
    center = params.sdf[:-1]
    lap = -6.0 * center
    for o in np.asarray(RING6_OFFSETS):
        lap = lap + shifted27(sdf_h, o, B)
    r_r = (jnp.sqrt(asm.er_w * asm.lam[1]) * lap).reshape(-1)

    # --- E_s: dense anchor --------------------------------------------------
    r_s = (jnp.sqrt(asm.es_w * asm.lam[2]) * (center - asm.es_ref)).reshape(-1)

    # --- E_a: three direction fields (gather-free) --------------------------
    a_c = params.albedo[:-1]
    ra = []
    for d, e in enumerate(_EA_DIRS):
        diff = a_c - shifted27(alb_h, e, B)
        ra.append((jnp.sqrt(asm.ea_w[d] * asm.lam[3]) * diff).reshape(-1))

    return jnp.concatenate([r_g, r_r, r_s] + ra)


def jtj_diag_block(params: Params, asm: BlockAssembly) -> Params:
    """Exact diag(JᵀJ) in block layout (mirror of `solver.jtj_diag`)."""
    B = params.sdf.shape[-1]
    k = params.poses.shape[0]

    def gather_sdf(f):
        return _stencil_rows(f, asm.nbr27, EG_SDF_OFFSETS, asm.eg_slot)

    def gather_alb(f):
        return _stencil_rows(f, asm.nbr27, EG_ALBEDO_OFFSETS, asm.eg_slot)

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
    # row-gather chains (structured block-row scatter-adds)
    d_sdf = jax.linear_transpose(gather_sdf, params.sdf)(j2[:, :10])[0]
    d_alb = jax.linear_transpose(gather_alb, params.albedo)(j2[:, 10:14])[0]
    d_pose = jnp.zeros((k, 6), params.poses.dtype).at[asm.eg_frame].add(j2[:, 14:20])
    d_intr = jnp.sum(j2[:, 20:24], axis=0)
    d_dist = jnp.sum(j2[:, 24:29], axis=0)

    # E_r: ∂lap/∂center = −6 → 36·w at v; ∂lap/∂nbr = 1 → w at v+e, i.e.
    # d(v) += w(v−e) — a shifted read of the halo'd weight field
    wl_r = asm.er_w * asm.lam[1]
    d_sdf_int = d_sdf[:-1] + 36.0 * wl_r
    wr_h = halo27(pad_block(wl_r), asm.nbr27)
    for o in np.asarray(RING6_OFFSETS):
        d_sdf_int = d_sdf_int + shifted27(wr_h, -o, B)

    # E_s
    d_sdf_int = d_sdf_int + asm.es_w * asm.lam[2]
    d_sdf = jnp.concatenate([d_sdf_int, d_sdf[-1:]], axis=0)

    # E_a: d(v) += w_d(v);  d(v+e_d) += w_d(v) ⇔ d(v) += w_d(v−e_d)
    wl_a = asm.ea_w * asm.lam[3]
    d_alb_int = d_alb[:-1] + jnp.sum(wl_a, axis=0)
    for d, e in enumerate(_EA_DIRS):
        wa_h = halo27(pad_block(wl_a[d]), asm.nbr27)
        d_alb_int = d_alb_int + shifted27(wa_h, tuple(-c for c in e), B)
    d_alb = jnp.concatenate([d_alb_int, d_alb[-1:]], axis=0)

    return Params(d_sdf, d_alb, d_pose, d_intr, d_dist)


# ---------------------------------------------------------------------------
# Table ⇄ block transport
# ---------------------------------------------------------------------------


def table_to_dense(layout: BlockLayout, table, pad: bool = True):
    """[N] table field → padded `[nb+1, B,B,B]` dense blocks (empties 0)."""
    B = layout.block
    nb = layout.num_blocks
    out = jnp.zeros(nb * B**3, jnp.asarray(table).dtype)
    out = out.at[jnp.asarray(layout.vox_slot)].set(jnp.asarray(table))
    out = out.reshape(nb, B, B, B)
    return pad_block(out) if pad else out


def dense_to_table(layout: BlockLayout, dense) -> jnp.ndarray:
    """Padded (or unpadded) dense blocks → [N] table order."""
    return dense.reshape(-1)[jnp.asarray(layout.vox_slot)]


def to_block_problem(
    layout: BlockLayout,
    coords: np.ndarray,
    asm: Assembly,
    masks,
    params: Params,
) -> Tuple[Params, BlockAssembly, object]:
    """Convert a flat-table problem (from `assembly.build_assembly`) into the
    block-dense form. Pure re-layout: same energy, same free parameters."""
    B = layout.block
    nb = layout.num_blocks

    eg_slot = layout.slots_of(np.asarray(asm.eg_vpos))
    # padded/invalid elements carry weight 0 — park them on slot 0
    eg_slot = np.where(eg_slot >= 0, eg_slot, 0).astype(np.int32)

    def densify(table_vals):
        out = np.zeros(nb * B**3, np.float32)
        out[layout.vox_slot] = np.asarray(table_vals, np.float32)
        return out.reshape(nb, B, B, B)

    # E_a pairs → three +axis direction weight fields
    pairs = np.asarray(asm.ea_pairs)
    ea_wt = np.asarray(asm.ea_w, np.float32)
    delta = coords[pairs[:, 1]] - coords[pairs[:, 0]]
    slots_i = layout.vox_slot[pairs[:, 0]]
    slots_j = layout.vox_slot[pairs[:, 1]]
    ea_w = np.zeros((3, nb * B**3), np.float32)
    for d in range(3):
        e = np.zeros(3, np.int64)
        e[d] = 1
        fwd = np.all(delta == e, axis=-1)
        bwd = np.all(delta == -e, axis=-1)
        ea_w[d, slots_i[fwd]] = ea_wt[fwd]
        ea_w[d, slots_j[bwd]] = ea_wt[bwd]
    ea_w = ea_w.reshape(3, nb, B, B, B)

    basm = BlockAssembly(
        eg_slot=jnp.asarray(eg_slot),
        eg_frame=asm.eg_frame,
        eg_onehot=asm.eg_onehot,
        eg_w=asm.eg_w,
        eg_sh=asm.eg_sh,
        eg_vpos=asm.eg_vpos,
        nbr27=jnp.asarray(layout.nbr27),
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
