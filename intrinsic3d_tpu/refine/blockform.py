"""Block-dense formulation of the joint-refinement problem (flat [nb, B³]).

The flat-table solver pays one scattered memory access per stencil tap inside
every PCG matvec — measured at ≈130M gather elements/s, the dominant cost of a
GN iteration (BENCH_NOTES.md). This module re-lays the problem out the TPU way
(ARCHITECTURE.md, SURVEY §7.1, §7.3 "no host round-trips in the inner loop"):

- per-voxel fields live as `[nb+1, B³]` blocks — B³ = 512 lanes = four exact
  (8,128) f32 tiles, zero padding waste (the earlier 4D `[nb,B,B,B]` layout
  padded 8 lanes to 128 — 16x physical bytes — and profiled 3x slower);
- every stencil offset is realized by `grid.blocks.ShiftPlan`: block-row
  gathers along the MAJOR dim + static one-hot `[512,512]` lane-permutation
  matmuls — the MXU does the lane gathering;
- **E_r / E_s / E_a** (``volumetric_regularizer.h:59-72``,
  ``surface_stab_regularizer.h:59-66``, ``albedo_regularizer.h:59-66``) are
  evaluated densely over all block slots with per-slot weights — zero gathers.
  E_a pairs are re-expressed as three +axis direction fields (each undirected
  6-neighborhood pair (v, v+e_d) is visited exactly once, preserving the
  reference's `voxels_added` dedup, ``optimizer.cpp:268-274``);
- **E_g** (``shading_cost.h:132-197``) is evaluated DENSELY over
  FRAME-MAJOR (keyframe k, block b, slot s) elements `[K, nb, B³]` — element
  (k, b, s) is the observation of block b's voxel s by keyframe k, weight 0
  where frame k is not among the voxel's top-N observations. The keyframe
  axis stays MAJOR so the (8,128) tiling lands on (nb, B³) — a flat
  `[K, nb·B³]` grid would sublane-pad K itself to 8 (measured 1.6x HBM on
  every element temp at K=10). No element compaction, no
  gathers, no scatters: the per-element stencil values are the shifted
  stacks broadcast over k, the frame index is the ROW INDEX (so the pose
  "gather" is a plain broadcast of `poses[k]` and its transpose a per-row
  sum — no one-hot contraction at all), and the exact per-element Jacobian
  falls out of ONE batched `jax.vjp` already in dense layout. Frame-major
  rows also make every 512-element sampler chunk single-frame, which is what
  lets the Pallas bicubic kernel fetch a narrow row WINDOW of the image
  stack instead of all K·H rows (ops/pallas/bicubic.py). The entire
  relinearize→solve→accept cycle touches no dynamic shapes and no host.

The solver (`refine/solver.py::gn_iteration`) dispatches on the assembly
type, so the damped-GN/PCG algorithm is shared verbatim with the flat-table
path (kept as the equivalence oracle).
"""

from __future__ import annotations

import functools
import logging
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("intrinsic3d")

from intrinsic3d_tpu.grid.blocks import BlockLayout, ShiftPlan, build_shift_plan, pad_flat
from intrinsic3d_tpu.grid.voxel_grid import EG_ALBEDO_OFFSETS, EG_SDF_OFFSETS
from intrinsic3d_tpu.refine.residuals import Assembly, Params, eg_core

# sdf plan: the 10 E_g forward-difference offsets + the three −axis offsets
# (completing the ±6-ring for the E_r Laplacian and its diagonal)
SDF_OFFSETS = tuple(map(tuple, EG_SDF_OFFSETS)) + ((-1, 0, 0), (0, -1, 0), (0, 0, -1))
# albedo plan: E_g's 4 albedo taps (= center + the three +axis E_a partners)
# + the three −axis offsets for the E_a diagonal
ALB_OFFSETS = tuple(map(tuple, EG_ALBEDO_OFFSETS)) + ((-1, 0, 0), (0, -1, 0), (0, 0, -1))

_PLUS = ((1, 0, 0), (0, 1, 0), (0, 0, 1))
_RING6 = _PLUS + ((-1, 0, 0), (0, -1, 0), (0, 0, -1))


class BlockAssembly(NamedTuple):
    """Static per-outer-iteration problem data in flat block-dense layout.

    E_g elements are dense FRAME-MAJOR over (keyframe, block, slot):
    `[K, nb, B³]` — the keyframe index of an element IS its leading index.

    With `bmap` set (FRAME-BUCKETED layout, for scenes whose keyframe count K
    far exceeds the per-voxel observation cap — BENCH_NOTES "K ≫ num_obs"),
    row k's columns cover only the NBc blocks of frame k's visibility bucket:
    element (k, j, s) is the observation of block `bmap[k, j]`'s slot s by
    keyframe k, so `eg_w` is `[K, NBc, B³]` and every per-element stencil/
    per-voxel value is fetched by a BLOCK-ROW gather `field[:, bmap, :]`
    (contiguous 2 KB rows — not per-element gathers). `bmap` padding entries
    equal `nb` and index the all-zero pad row of `[nb+1, B³]` fields, so
    padded columns carry weight 0 by construction. Rows stay frame-uniform,
    preserving the windowed Pallas sampler's chunk contract (B³ = CHUNK)."""

    eg_w: jnp.ndarray  # [K, nb, B³] (or [K, NBc, B³]) observation·shell weight (0 = inactive)
    eg_sh: jnp.ndarray  # [9, D] per-voxel interpolated SH coefficients (per-slot)
    eg_vpos: jnp.ndarray  # [3, D] int32 voxel coords (0 on empty slots)
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
    # frame buckets: [K, NBc] int32 visible-block rows (pad = nb), or None
    bmap: Optional[jnp.ndarray] = None


def _fid_rows(k: int, kb: int, s: int) -> jnp.ndarray:
    """Per-element keyframe index of the frame-major layout: the row index.

    Element arrays are `[K, kb, B³]` (kb = nb dense / NBc bucketed): keeping
    the keyframe axis MAJOR and (block, slot) as the tiled minor pair means
    the (8,128) TPU tiling pads only kb up to a multiple of 8 — a flat
    `[K, kb·B³]` layout tiles (K, D) instead and pads K itself to 8, a
    measured 1.6x HBM expansion of every element temp at K=10."""
    return jax.lax.broadcasted_iota(jnp.int32, (k, kb, s), 0)


def _eg_dense(params_pose_intr_dist, sdf10, alb4, asm: BlockAssembly, validity_only=False, masked=False):
    """Dense E_g forward: all arguments per (keyframe, slot/bucket) element."""
    poses, intr, dist = params_pose_intr_dist
    k, kb, s = asm.eg_w.shape
    pose6 = jnp.broadcast_to(poses[:, None, None, :], (k, kb, s, 6))
    if asm.bmap is None:
        sh9 = jnp.broadcast_to(
            jnp.moveaxis(asm.eg_sh.reshape(9, kb, s), 0, -1)[None], (k, kb, s, 9)
        )
        vpos = jnp.broadcast_to(
            jnp.moveaxis(asm.eg_vpos.reshape(3, kb, s), 0, -1)[None], (k, kb, s, 3)
        )
    else:
        sh9 = _perslot_bucket(asm.eg_sh, asm.bmap, s)
        vpos = _perslot_bucket(asm.eg_vpos, asm.bmap, s)
    r = eg_core(
        sdf10,
        alb4,
        pose6,
        intr,
        dist,
        sh9,
        vpos,
        _fid_rows(k, kb, s),
        asm.images,
        asm.pyr_scale,
        asm.voxel_size,
        validity_only=validity_only,
        active=(asm.eg_w > 0).astype(jnp.float32) if masked else None,
        frame_major=masked,
    )
    return jnp.sqrt(asm.eg_w * asm.lam[0]) * r  # [K, kb, B³]


def _stencil_dense(sh: jnp.ndarray, t: int, k: int) -> jnp.ndarray:
    """`[T', nb, B³]` shifted stack → broadcast per-element rows [K, nb, B³, t]."""
    nb, s = sh.shape[1], sh.shape[2]
    stack = jnp.moveaxis(sh[:t], 0, -1)  # [nb, B³, t]
    return jnp.broadcast_to(stack[None], (k, nb, s, t))


# ---------------------------------------------------------------------------
# Frame-bucketed element transport (bmap is not None)
# ---------------------------------------------------------------------------
#
# All per-element data movement is at BLOCK-ROW granularity: gathers and
# scatter-adds move contiguous B³-lane rows keyed by `bmap [K, NBc]` — the
# layout never touches the ~130M elements/s scattered-access ceiling
# (BENCH_NOTES.md "Layout lessons").


def _pad_rows(stack: jnp.ndarray) -> jnp.ndarray:
    """`[T, nb, S]` → `[T, nb+1, S]` with an all-zero pad row (bmap target)."""
    return jnp.pad(stack, ((0, 0), (0, 1), (0, 0)))


def _stencil_bucket(sh: jnp.ndarray, t: int, bmap: jnp.ndarray) -> jnp.ndarray:
    """`[T', nb, B³]` shifted stack → bucketed per-element rows [K, NBc, B³, t]."""
    g = _pad_rows(sh[:t])[:, bmap, :]  # [t, K, NBc, S]
    return jnp.moveaxis(g, 0, -1)


def _stencil_for(asm: BlockAssembly, sh: jnp.ndarray, t: int) -> jnp.ndarray:
    """Per-element stencil rows in the assembly's element layout."""
    if asm.bmap is None:
        return _stencil_dense(sh, t, asm.eg_w.shape[0])
    return _stencil_bucket(sh, t, asm.bmap)


def _perslot_bucket(field: jnp.ndarray, bmap: jnp.ndarray, s: int = 512) -> jnp.ndarray:
    """Per-slot `[C, nb·B³]` field → bucketed per-element rows [K, NBc, B³, C]
    (`s` = B³ = 512 for the production B=8 blocks)."""
    c = field.shape[0]
    g = _pad_rows(field.reshape(c, -1, s))[:, bmap, :]  # [C, K, NBc, S]
    return jnp.moveaxis(g, 0, -1)


def _unbucket(vals: jnp.ndarray, bmap: jnp.ndarray, nb: int, s: int) -> jnp.ndarray:
    """`[F, K, NBc, S]` bucketed cotangents → `[F, nb, S]` per-slot sums.

    ONE scatter-add of K·NBc contiguous (F·S)-lane rows keyed by bmap
    (duplicate block rows across frames accumulate; padding rows land on the
    dropped pad row)."""
    f, k, nbc = vals.shape[:3]
    v = jnp.moveaxis(vals.reshape(f, k * nbc, s), 0, 1).reshape(k * nbc, f * s)
    out = jnp.zeros((nb + 1, f * s), vals.dtype).at[bmap.reshape(-1)].add(v)
    return jnp.moveaxis(out[:-1].reshape(nb, f, s), 1, 0)


def block_all_residuals(params: Params, asm: BlockAssembly, masked: bool = True) -> jnp.ndarray:
    """Concatenated weighted residual vector — identical energy to
    `residuals.all_residuals` on the equivalent table assembly (rows appear
    in dense (keyframe, slot) order with zero rows for inactive elements; the
    total cost, the gradient, and JᵀJ are unchanged).

    `masked=True` routes the image sampling through the Pallas masked kernel
    (reverse-mode only); pass False on paths that `jax.linearize`/jvp."""
    sh = asm.sdf_plan.apply(params.sdf)  # [13, nb, B³]
    sha = asm.alb_plan.apply(params.albedo)  # [7, nb, B³]

    r_g = _eg_dense(
        (params.poses, params.intr, params.dist),
        _stencil_for(asm, sh, 10),
        _stencil_for(asm, sha, 4),
        asm,
        masked=masked,
    ).reshape(-1)

    # --- E_r: dense Laplacian (gather-free) ---------------------------------
    c = asm.sdf_plan.index((0, 0, 0))
    center = sh[c]
    lap = -6.0 * center
    for off in _RING6:
        lap = lap + sh[asm.sdf_plan.index(off)]
    r_r = (jnp.sqrt(asm.er_w * asm.lam[1]) * lap).reshape(-1)

    # --- E_s: dense anchor ---------------------------------------------------
    r_s = (jnp.sqrt(asm.es_w * asm.lam[2]) * (center - asm.es_ref)).reshape(-1)

    # --- E_a: three direction fields (gather-free) ---------------------------
    a_c = sha[asm.alb_plan.index((0, 0, 0))]
    ra = []
    for dd, e in enumerate(_PLUS):
        diff = a_c - sha[asm.alb_plan.index(e)]
        ra.append((jnp.sqrt(asm.ea_w[dd] * asm.lam[3]) * diff).reshape(-1))

    return jnp.concatenate([r_g, r_r, r_s] + ra)


# ---------------------------------------------------------------------------
# Hand-rolled linearization: fully dense (gather/scatter-free) GN matvec
# ---------------------------------------------------------------------------
#
# `jax.linearize` of the E_g chain drags element intermediates through the
# PCG loop and re-derives per-matvec gathers/scatters. Instead: ONE batched
# reverse pass (elements are independent, so a ones-cotangent `jax.vjp` wrt
# the per-element argument arrays IS the exact per-element Jacobian) produces
# the coefficient fields directly in dense (keyframe, slot) layout; the matvec,
# its transpose, the gradient, and the exact Jacobi diagonal are then pure
# dense elementwise math + ShiftPlan one-hot matmuls + an in-register frame
# one-hot matmul — zero gathers, zero scatters, no element-shaped loop state.


class BlockLin(NamedTuple):
    """Linearization of the block problem at a point (static through PCG)."""

    a_sdf: jnp.ndarray  # [10, K, kb, B³]
    a_alb: jnp.ndarray  # [4, K, kb, B³]
    a_pose: jnp.ndarray  # [6, K, kb, B³]
    a_intr: jnp.ndarray  # [4, K, kb, B³]
    a_dist: jnp.ndarray  # [5, K, kb, B³]
    r0_g: jnp.ndarray  # [K, kb, B³] weighted E_g residual
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
    """One reverse-mode pass over the dense E_g elements + closed forms for
    the linear terms. Returns (cost0, lin)."""
    o, kb, s_blk = asm.eg_w.shape

    sh = asm.sdf_plan.apply(params.sdf)  # [13, nb, B³]
    sha = asm.alb_plan.apply(params.albedo)  # [7, nb, B³]

    # --- E_g: value + exact per-element Jacobian in one reverse pass --------
    sdf10 = _stencil_for(asm, sh, 10) + 0.0  # materialize as vjp inputs
    alb4 = _stencil_for(asm, sha, 4) + 0.0
    pose6 = jnp.broadcast_to(params.poses[:, None, None, :], (o, kb, s_blk, 6)) + 0.0
    intr_e = jnp.broadcast_to(params.intr, (o, kb, s_blk, 4))
    dist_e = jnp.broadcast_to(params.dist, (o, kb, s_blk, 5))
    sqrt_wlam = jnp.sqrt(asm.eg_w * asm.lam[0])
    if asm.bmap is None:
        sh9 = jnp.broadcast_to(
            jnp.moveaxis(asm.eg_sh.reshape(9, kb, s_blk), 0, -1)[None], (o, kb, s_blk, 9)
        )
        vpos = jnp.broadcast_to(
            jnp.moveaxis(asm.eg_vpos.reshape(3, kb, s_blk), 0, -1)[None], (o, kb, s_blk, 3)
        )
    else:
        sh9 = _perslot_bucket(asm.eg_sh, asm.bmap, s_blk)
        vpos = _perslot_bucket(asm.eg_vpos, asm.bmap, s_blk)

    def _eg_weighted(s10, a4, p6, it4, ds5):
        return sqrt_wlam * eg_core(
            s10,
            a4,
            p6,
            it4,
            ds5,
            sh9,
            vpos,
            _fid_rows(o, kb, s_blk),
            asm.images,
            asm.pyr_scale,
            asm.voxel_size,
            active=(asm.eg_w > 0).astype(jnp.float32),
            frame_major=True,
        )

    # elements are independent, so ONE reverse pass with a ones cotangent
    # yields the exact per-element Jacobian, directly in dense layout
    r0_g, vjp_fn = jax.vjp(_eg_weighted, sdf10, alb4, pose6, intr_e, dist_e)
    c_sdf, c_alb, c_pose, c_intr, c_dist = vjp_fn(jnp.ones_like(r0_g))
    a_sdf = jnp.moveaxis(c_sdf, -1, 0)  # [10, O, kb, B³]
    a_alb = jnp.moveaxis(c_alb, -1, 0)
    a_pose = jnp.moveaxis(c_pose, -1, 0)
    a_intr = jnp.moveaxis(c_intr, -1, 0)
    a_dist = jnp.moveaxis(c_dist, -1, 0)

    # --- linear terms (closed-form Jacobians = the √(w·λ) factors) -----------
    c = asm.sdf_plan.index((0, 0, 0))
    center = sh[c]
    lap = -6.0 * center
    for off in _RING6:
        lap = lap + sh[asm.sdf_plan.index(off)]
    sq_er = jnp.sqrt(asm.er_w * asm.lam[1])
    r0_r = sq_er * lap
    sq_es = jnp.sqrt(asm.es_w * asm.lam[2])
    r0_s = sq_es * (center - asm.es_ref)
    a_c = sha[asm.alb_plan.index((0, 0, 0))]
    sq_ea = jnp.sqrt(asm.ea_w * asm.lam[3])
    r0_a = jnp.stack(
        [sq_ea[dd] * (a_c - sha[asm.alb_plan.index(e)]) for dd, e in enumerate(_PLUS)]
    )

    cost0 = 0.5 * (
        jnp.sum(r0_g * r0_g)
        + jnp.sum(r0_r * r0_r)
        + jnp.sum(r0_s * r0_s)
        + jnp.sum(r0_a * r0_a)
    )
    lin = BlockLin(a_sdf, a_alb, a_pose, a_intr, a_dist, r0_g, r0_r, r0_s, r0_a, sq_er, sq_es, sq_ea)
    return cost0, lin


def _eg_chunk_inputs(asm: BlockAssembly, sh, sha, eg_w_c, bmap_c, fids, poses, intr, dist):
    """Per-element E_g inputs for one frame chunk of the element grid.

    `eg_w_c [kc, kb, B³]` are the chunk's weight rows, `fids [kc]` the true
    keyframe index of each row (chunk rows need not start at frame 0), and
    `bmap_c [kc, NBc]` the chunk's bucket rows (None in the dense layout).
    Returns the same tuple shape `linearize_block` builds for the full grid.
    """
    kc, kb, s_blk = eg_w_c.shape
    if bmap_c is None:
        sdf10 = _stencil_dense(sh, 10, kc)
        alb4 = _stencil_dense(sha, 4, kc)
        sh9 = jnp.broadcast_to(
            jnp.moveaxis(asm.eg_sh.reshape(9, kb, s_blk), 0, -1)[None],
            (kc, kb, s_blk, 9),
        )
        vpos = jnp.broadcast_to(
            jnp.moveaxis(asm.eg_vpos.reshape(3, kb, s_blk), 0, -1)[None],
            (kc, kb, s_blk, 3),
        )
    else:
        sdf10 = _stencil_bucket(sh, 10, bmap_c)
        alb4 = _stencil_bucket(sha, 4, bmap_c)
        sh9 = _perslot_bucket(asm.eg_sh, bmap_c, s_blk)
        vpos = _perslot_bucket(asm.eg_vpos, bmap_c, s_blk)
    pose6 = jnp.broadcast_to(
        jnp.take(poses, fids, axis=0)[:, None, None, :], (kc, kb, s_blk, 6)
    )
    intr_e = jnp.broadcast_to(intr, (kc, kb, s_blk, 4))
    dist_e = jnp.broadcast_to(dist, (kc, kb, s_blk, 5))
    fid = jnp.broadcast_to(fids[:, None, None], (kc, kb, s_blk))
    return sdf10, alb4, pose6, intr_e, dist_e, sh9, vpos, fid


def _chunk_xs(asm: BlockAssembly, num_chunks: int):
    """Split the element grid's frame axis into `num_chunks` equal chunks
    (frames padded with zero-weight rows; padded bucket rows index the pad
    block). Returns (xs, kpad) for `lax.map`."""
    k, kb, s_blk = asm.eg_w.shape
    kc = -(-k // num_chunks)
    kpad = kc * num_chunks
    eg_w = jnp.pad(asm.eg_w, ((0, kpad - k), (0, 0), (0, 0)))
    # padded rows carry weight 0 everywhere, so their (clipped) frame index
    # contributes nothing — clip keeps image/pose takes in bounds
    fids = jnp.minimum(jnp.arange(kpad, dtype=jnp.int32), k - 1)
    xs = {
        "eg_w": eg_w.reshape(num_chunks, kc, kb, s_blk),
        "fids": fids.reshape(num_chunks, kc),
    }
    if asm.bmap is not None:
        nb = asm.er_w.shape[0]
        bmap = jnp.pad(
            asm.bmap, ((0, kpad - k), (0, 0)), constant_values=nb
        )
        xs["bmap"] = bmap.reshape(num_chunks, kc, -1)
    return xs, kpad


def linearize_block_chunked(
    params: Params, asm: BlockAssembly, num_chunks: int, coeff_dtype=jnp.float32
) -> Tuple[jnp.ndarray, BlockLin]:
    """`linearize_block` with the E_g reverse pass STREAMED over frame chunks
    (VERDICT r4 item 1: the reference keeps the per-voxel top-N over ALL
    frames regardless of memory, ``colorization.cpp:357-370`` — streaming
    bounds the linearization transients at `ceil(K/C)` frames' worth while
    the full element grid keeps exact coverage).

    Only the compact per-element outputs persist: the 29 Jacobian
    coefficient fields in `coeff_dtype` (bf16 = 60 B/element — the same
    fields `cast_lin` would hand the PCG) plus the f32 residual. Everything
    downstream (`jv_block`/`jtv_block`/`diag_from_lin`/`global_gram`/the
    Schur elimination) consumes the stacked result unchanged. With
    `coeff_dtype=float32` the result matches `linearize_block` to f32
    rounding order (elements are independent; chunking only re-batches the
    same per-element math, but the windowed sampler's internal chunk
    geometry reorders FMAs — measured ≤7e-5 relative on every field)."""
    if num_chunks <= 1:
        cost0, lin = linearize_block(params, asm)
        if jnp.dtype(coeff_dtype) != jnp.float32:
            lin = cast_lin(lin, coeff_dtype)
        return cost0, lin
    k, kb, s_blk = asm.eg_w.shape
    sh = asm.sdf_plan.apply(params.sdf)
    sha = asm.alb_plan.apply(params.albedo)
    xs, kpad = _chunk_xs(asm, num_chunks)

    def body(x):
        eg_w_c, fids = x["eg_w"], x["fids"]
        bmap_c = x.get("bmap")
        sdf10, alb4, pose6, intr_e, dist_e, sh9, vpos, fid = _eg_chunk_inputs(
            asm, sh, sha, eg_w_c, bmap_c, fids, params.poses, params.intr, params.dist
        )
        sqrt_wlam = jnp.sqrt(eg_w_c * asm.lam[0])

        def _eg_weighted(s10, a4, p6, it4, ds5):
            return sqrt_wlam * eg_core(
                s10, a4, p6, it4, ds5, sh9, vpos, fid,
                asm.images, asm.pyr_scale, asm.voxel_size,
                active=(eg_w_c > 0).astype(jnp.float32), frame_major=True,
            )

        r0_c, vjp_fn = jax.vjp(
            _eg_weighted, sdf10 + 0.0, alb4 + 0.0, pose6 + 0.0, intr_e, dist_e
        )
        c_sdf, c_alb, c_pose, c_intr, c_dist = vjp_fn(jnp.ones_like(r0_c))
        cast = lambda a: jnp.moveaxis(a, -1, 0).astype(coeff_dtype)  # noqa: E731
        return (r0_c, cast(c_sdf), cast(c_alb), cast(c_pose), cast(c_intr), cast(c_dist))

    outs = jax.lax.map(body, xs)

    def restack(a):  # [C, F, kc, kb, B³] → [F, K, kb, B³]
        return jnp.moveaxis(a, 0, 1).reshape(
            a.shape[1], kpad, kb, s_blk
        )[:, :k]

    r0_g = outs[0].reshape(kpad, kb, s_blk)[:k]
    a_sdf, a_alb, a_pose, a_intr, a_dist = (restack(a) for a in outs[1:])

    # linear terms + total cost (identical to linearize_block's tail)
    c = asm.sdf_plan.index((0, 0, 0))
    center = sh[c]
    lap = -6.0 * center
    for off in _RING6:
        lap = lap + sh[asm.sdf_plan.index(off)]
    sq_er = jnp.sqrt(asm.er_w * asm.lam[1])
    r0_r = sq_er * lap
    sq_es = jnp.sqrt(asm.es_w * asm.lam[2])
    r0_s = sq_es * (center - asm.es_ref)
    a_c = sha[asm.alb_plan.index((0, 0, 0))]
    sq_ea = jnp.sqrt(asm.ea_w * asm.lam[3])
    r0_a = jnp.stack(
        [sq_ea[dd] * (a_c - sha[asm.alb_plan.index(e)]) for dd, e in enumerate(_PLUS)]
    )
    cost0 = 0.5 * (
        jnp.sum(r0_g * r0_g)
        + jnp.sum(r0_r * r0_r)
        + jnp.sum(r0_s * r0_s)
        + jnp.sum(r0_a * r0_a)
    )
    lin = BlockLin(
        a_sdf, a_alb, a_pose, a_intr, a_dist, r0_g, r0_r, r0_s, r0_a, sq_er, sq_es, sq_ea
    )
    return cost0, lin


def block_total_cost(
    params: Params, asm: BlockAssembly, num_chunks: int = 1, masked: bool = True
) -> jnp.ndarray:
    """Total cost `0.5·‖r‖²` with the E_g forward streamed over frame chunks
    (the LM acceptance evaluation of the chunked solve path — the full
    residual stack would otherwise materialize element-grid-sized temps)."""
    if num_chunks <= 1:
        r = block_all_residuals(params, asm, masked=masked)
        return 0.5 * jnp.sum(r * r)
    sh = asm.sdf_plan.apply(params.sdf)
    sha = asm.alb_plan.apply(params.albedo)
    xs, _ = _chunk_xs(asm, num_chunks)

    def body(x):
        eg_w_c, fids = x["eg_w"], x["fids"]
        bmap_c = x.get("bmap")
        sdf10, alb4, pose6, intr_e, dist_e, sh9, vpos, fid = _eg_chunk_inputs(
            asm, sh, sha, eg_w_c, bmap_c, fids, params.poses, params.intr, params.dist
        )
        r = eg_core(
            sdf10, alb4, pose6, intr_e, dist_e, sh9, vpos, fid,
            asm.images, asm.pyr_scale, asm.voxel_size,
            active=(eg_w_c > 0).astype(jnp.float32) if masked else None,
            frame_major=masked,
        )
        r = jnp.sqrt(eg_w_c * asm.lam[0]) * r
        return jnp.sum(r * r)

    cost_g = jnp.sum(jax.lax.map(body, xs))

    c = asm.sdf_plan.index((0, 0, 0))
    center = sh[c]
    lap = -6.0 * center
    for off in _RING6:
        lap = lap + sh[asm.sdf_plan.index(off)]
    r_r = jnp.sqrt(asm.er_w * asm.lam[1]) * lap
    r_s = jnp.sqrt(asm.es_w * asm.lam[2]) * (center - asm.es_ref)
    a_c = sha[asm.alb_plan.index((0, 0, 0))]
    cost_lin = jnp.sum(r_r * r_r) + jnp.sum(r_s * r_s)
    for dd, e in enumerate(_PLUS):
        diff = a_c - sha[asm.alb_plan.index(e)]
        r_a = jnp.sqrt(asm.ea_w[dd] * asm.lam[3]) * diff
        cost_lin = cost_lin + jnp.sum(r_a * r_a)
    return 0.5 * (cost_g + cost_lin)


def cast_lin(lin: BlockLin, dtype) -> BlockLin:
    """Cast the dense E_g coefficient fields — the PCG matvec's dominant HBM
    traffic, 29 × [K, D] — to `dtype` (bf16 halves the bytes the LM/PCG loop
    streams per J·v / Jᵀ·y). Residuals and the linear-term √(w·λ) factors stay
    f32. `jv_block`/`jtv_block` consume the SAME cast fields, so the J/Jᵀ pair
    remains exactly adjoint and JᵀJ an exactly symmetric PSD Gram matrix (of a
    ~2⁻⁸-perturbed J — well inside the inexact-Newton forcing tolerance the
    PCG exit already allows, solver.py::_pcg)."""
    return lin._replace(
        a_sdf=lin.a_sdf.astype(dtype),
        a_alb=lin.a_alb.astype(dtype),
        a_pose=lin.a_pose.astype(dtype),
        a_intr=lin.a_intr.astype(dtype),
        a_dist=lin.a_dist.astype(dtype),
    )


def jv_block(lin: BlockLin, asm: BlockAssembly, v: Params, include_globals: bool = True):
    """J·v — tangent of the residual parts, fully dense.

    `include_globals=False` skips the pose/intr/dist tangent einsums (their
    15 coefficient fields are the matvec's global-side HBM traffic) — the
    Schur-reduced matvec uses it for the voxel-only tangent."""
    nb = v.sdf.shape[0] - 1
    s = v.sdf.shape[1]

    sh = asm.sdf_plan.apply(v.sdf)
    sha = asm.alb_plan.apply(v.albedo)
    if asm.bmap is None:
        shf = sh[:10][:, None]  # [10, 1, nb, B³]
        shaf = sha[:4][:, None]
    else:
        shf = _pad_rows(sh[:10])[:, asm.bmap, :]  # [10, K, NBc, B³]
        shaf = _pad_rows(sha[:4])[:, asm.bmap, :]

    y_g = jnp.sum(lin.a_sdf * shf, axis=0)
    y_g = y_g + jnp.sum(lin.a_alb * shaf, axis=0)
    if include_globals:
        # frame-major rows: the pose tangent of row k is simply v.poses[k]
        y_g = y_g + jnp.einsum("akbs,ka->kbs", lin.a_pose, v.poses)
        y_g = y_g + jnp.einsum("akbs,a->kbs", lin.a_intr, v.intr)
        y_g = y_g + jnp.einsum("akbs,a->kbs", lin.a_dist, v.dist)

    c = asm.sdf_plan.index((0, 0, 0))
    lap = -6.0 * sh[c]
    for off in _RING6:
        lap = lap + sh[asm.sdf_plan.index(off)]
    y_r = lin.sq_er * lap
    y_s = lin.sq_es * sh[c]
    a_c = sha[asm.alb_plan.index((0, 0, 0))]
    y_a = jnp.stack(
        [lin.sq_ea[dd] * (a_c - sha[asm.alb_plan.index(e)]) for dd, e in enumerate(_PLUS)]
    )
    return (y_g, y_r, y_s, y_a)


def jtv_block(lin: BlockLin, asm: BlockAssembly, y, include_globals: bool = True) -> Params:
    """Jᵀ·y — exact adjoint of `jv_block` (PCG needs the pair symmetric).

    `include_globals=False` returns zero global cotangents without streaming
    their 15 coefficient fields (the Schur-reduced matvec needs only the
    voxel cotangents; global coupling is handled through the [G, G] Gram)."""
    y_g, y_r, y_s, y_a = y
    nb = lin.r0_r.shape[0]
    s = lin.r0_r.shape[1]

    # sdf cotangent stack over the plan's 13 offsets
    if asm.bmap is None:
        q = jnp.sum(lin.a_sdf * y_g[None], axis=1)  # [10, nb, B³]
    else:
        q = _unbucket(lin.a_sdf * y_g[None], asm.bmap, nb, s)
    cot = [q[j] for j in range(10)] + [
        jnp.zeros((nb, s), jnp.float32) for _ in range(len(asm.sdf_plan.offsets) - 10)
    ]
    yr = lin.sq_er * y_r
    _ring_into(asm.sdf_plan, cot, -6.0 * yr, yr)
    c = asm.sdf_plan.index((0, 0, 0))
    cot[c] = cot[c] + lin.sq_es * y_s
    g_sdf = asm.sdf_plan.apply_transpose(jnp.stack(cot))

    if asm.bmap is None:
        qa = jnp.sum(lin.a_alb * y_g[None], axis=1)  # [4, nb, B³]
    else:
        qa = _unbucket(lin.a_alb * y_g[None], asm.bmap, nb, s)
    cot_a = [qa[j] for j in range(4)] + [
        jnp.zeros((nb, s), jnp.float32) for _ in range(len(asm.alb_plan.offsets) - 4)
    ]
    ca = asm.alb_plan.index((0, 0, 0))
    for dd, e in enumerate(_PLUS):
        ya = lin.sq_ea[dd] * y_a[dd]
        cot_a[ca] = cot_a[ca] + ya
        ei = asm.alb_plan.index(e)
        cot_a[ei] = cot_a[ei] - ya
    g_alb = asm.alb_plan.apply_transpose(jnp.stack(cot_a))

    if not include_globals:
        k = lin.a_pose.shape[1]
        return Params(
            g_sdf,
            g_alb,
            jnp.zeros((k, 6), g_sdf.dtype),
            jnp.zeros((4,), g_sdf.dtype),
            jnp.zeros((5,), g_sdf.dtype),
        )
    # frame-major rows: the pose cotangent of frame k is the row-k sum
    g_pose = jnp.einsum("akbs,kbs->ka", lin.a_pose, y_g)  # [K, 6]
    g_intr = jnp.einsum("akbs,kbs->a", lin.a_intr, y_g)
    g_dist = jnp.einsum("akbs,kbs->a", lin.a_dist, y_g)
    return Params(g_sdf, g_alb, g_pose, g_intr, g_dist)


def diag_from_lin(lin: BlockLin, asm: BlockAssembly) -> Params:
    """Exact diag(JᵀJ) from the dense coefficient fields. Squares are
    accumulated in f32 even when the fields are bf16 (the chunked-linearize
    path hands this function cast fields; the upcast fuses into the
    reductions — no materialized f32 copy)."""
    nb = lin.r0_r.shape[0]
    s = lin.r0_r.shape[1]
    f32 = jnp.float32
    asq = lin.a_sdf.astype(f32)
    aasq = lin.a_alb.astype(f32)

    if asm.bmap is None:
        q2 = jnp.sum(asq * asq, axis=1)  # [10, nb, B³]
    else:
        q2 = _unbucket(asq * asq, asm.bmap, nb, s)
    cot = [q2[j] for j in range(10)] + [
        jnp.zeros((nb, s), jnp.float32) for _ in range(len(asm.sdf_plan.offsets) - 10)
    ]
    wl_r = lin.sq_er * lin.sq_er
    _ring_into(asm.sdf_plan, cot, 36.0 * wl_r, wl_r)
    c = asm.sdf_plan.index((0, 0, 0))
    cot[c] = cot[c] + lin.sq_es * lin.sq_es
    d_sdf = asm.sdf_plan.apply_transpose(jnp.stack(cot))

    if asm.bmap is None:
        qa2 = jnp.sum(aasq * aasq, axis=1)  # [4, nb, B³]
    else:
        qa2 = _unbucket(aasq * aasq, asm.bmap, nb, s)
    cot_a = [qa2[j] for j in range(4)] + [
        jnp.zeros((nb, s), jnp.float32) for _ in range(len(asm.alb_plan.offsets) - 4)
    ]
    ca = asm.alb_plan.index((0, 0, 0))
    wl_a = lin.sq_ea * lin.sq_ea
    cot_a[ca] = cot_a[ca] + jnp.sum(wl_a, axis=0)
    for dd, e in enumerate(_PLUS):
        ei = asm.alb_plan.index(e)
        cot_a[ei] = cot_a[ei] + wl_a[dd]
    d_alb = asm.alb_plan.apply_transpose(jnp.stack(cot_a))

    psq = lin.a_pose.astype(f32)
    isq = lin.a_intr.astype(f32)
    dsq = lin.a_dist.astype(f32)
    d_pose = jnp.einsum("akbs->ka", psq * psq)  # [K, 6]
    d_intr = jnp.einsum("akbs->a", isq * isq)
    d_dist = jnp.einsum("akbs->a", dsq * dsq)
    return Params(d_sdf, d_alb, d_pose, d_intr, d_dist)


# ---------------------------------------------------------------------------
# Schur complement of the global block (poses, intrinsics, distortion)
# ---------------------------------------------------------------------------
#
# The globals span G = 6K+9 dims whose J columns are DENSE over every E_g
# element — exactly the low-rank dense coupling a Jacobi preconditioner
# handles worst (SURVEY §7.1 solver row: "Schur-complement out the small
# dense global params … reduced via psum", nls_solver.cpp:305-307). Because
# the elimination folds into the cotangent BEFORE the stencil transpose —
#     S·x = Jᵥᵀ(Jᵥx − J_g·C̃⁻¹·J_gᵀ·Jᵥx) + μDᵥx
# — the reduced matvec costs exactly ONE J/Jᵀ pair plus G-sized einsums and
# one [G, G] triangular solve: the same per-step cost as the joint matvec,
# on a strictly smaller, globals-free Krylov space.


def flatten_globals(p_pose, p_intr, p_dist):
    """(K·6, 4, 5) global leaves → one [G] vector (pose-major)."""
    return jnp.concatenate([p_pose.reshape(-1), p_intr, p_dist])


def unflatten_globals(g, k):
    return g[: 6 * k].reshape(k, 6), g[6 * k : 6 * k + 4], g[6 * k + 4 :]


def global_gram(lin: BlockLin) -> jnp.ndarray:
    """Dense `C = J_gᵀ J_g` `[G, G]` from the coefficient fields. Frame-major
    rows make the pose-pose part block-diagonal per frame (an element's pose
    coefficients belong only to its own row's frame). Built from the SAME
    (possibly bf16-cast) fields the matvec streams, accumulated in f32, so
    the reduced operator is the exact Schur complement of the cast joint
    Gram matrix — symmetric PSD by construction."""
    k = lin.a_pose.shape[1]
    f32 = jnp.float32

    def gram(a, b, per_frame):
        eq = "akbs,ckbs->kac" if per_frame else "akbs,ckbs->ac"
        return jnp.einsum(eq, a, b, preferred_element_type=f32)

    c_pp = gram(lin.a_pose, lin.a_pose, True)  # [K, 6, 6]
    c_pi = gram(lin.a_pose, lin.a_intr, True)  # [K, 6, 4]
    c_pd = gram(lin.a_pose, lin.a_dist, True)  # [K, 6, 5]
    c_ii = gram(lin.a_intr, lin.a_intr, False)
    c_id = gram(lin.a_intr, lin.a_dist, False)
    c_dd = gram(lin.a_dist, lin.a_dist, False)

    g = 6 * k + 9
    C = jnp.zeros((g, g), f32)
    # pose-pose block diagonal
    pp = jax.scipy.linalg.block_diag(*[c_pp[i] for i in range(k)])
    C = C.at[: 6 * k, : 6 * k].set(pp)
    C = C.at[: 6 * k, 6 * k : 6 * k + 4].set(c_pi.reshape(6 * k, 4))
    C = C.at[6 * k : 6 * k + 4, : 6 * k].set(c_pi.reshape(6 * k, 4).T)
    C = C.at[: 6 * k, 6 * k + 4 :].set(c_pd.reshape(6 * k, 5))
    C = C.at[6 * k + 4 :, : 6 * k].set(c_pd.reshape(6 * k, 5).T)
    C = C.at[6 * k : 6 * k + 4, 6 * k : 6 * k + 4].set(c_ii)
    C = C.at[6 * k : 6 * k + 4, 6 * k + 4 :].set(c_id)
    C = C.at[6 * k + 4 :, 6 * k : 6 * k + 4].set(c_id.T)
    C = C.at[6 * k + 4 :, 6 * k + 4 :].set(c_dd)
    return C


def jg_apply(lin: BlockLin, g_pose, g_intr, g_dist) -> jnp.ndarray:
    """`J_g · v_g` on the E_g rows only — pure einsums, `[K, kb, B³]`."""
    y = jnp.einsum("akbs,ka->kbs", lin.a_pose, g_pose)
    y = y + jnp.einsum("akbs,a->kbs", lin.a_intr, g_intr)
    y = y + jnp.einsum("akbs,a->kbs", lin.a_dist, g_dist)
    return y


def jgt_apply(lin: BlockLin, y_g):
    """`J_gᵀ · y` restricted to the E_g rows — the global cotangents."""
    g_pose = jnp.einsum("akbs,kbs->ka", lin.a_pose, y_g)
    g_intr = jnp.einsum("akbs,kbs->a", lin.a_intr, y_g)
    g_dist = jnp.einsum("akbs,kbs->a", lin.a_dist, y_g)
    return g_pose, g_intr, g_dist


# ---------------------------------------------------------------------------
# Frame bucket construction
# ---------------------------------------------------------------------------


def _depth_interval_mips(depth: np.ndarray):
    """Conservative min/max mip pyramid of a depth map (invalid = 0 pixels
    carry +inf/-inf so they never shrink the interval). Level l cell (i, j)
    bounds the valid depths of pixels [i·2^l, (i+1)·2^l) × [j·2^l, ...)."""
    valid = depth > 0.0
    dmin = np.where(valid, depth, np.inf).astype(np.float64)
    dmax = np.where(valid, depth, -np.inf).astype(np.float64)
    mips = [(dmin, dmax)]
    while max(dmin.shape) > 1:
        h, w = dmin.shape
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2

        def pool(a, f, fill):
            p = np.full((ph, pw), fill, a.dtype)
            p[:h, :w] = a
            return f(f(p.reshape(ph // 2, 2, pw // 2, 2), axis=3), axis=1)

        dmin = pool(dmin, np.min, np.inf)
        dmax = pool(dmax, np.max, -np.inf)
        mips.append((dmin, dmax))
    return mips


def _footprint_depth_interval(mips, u0, u1, v0, v1):
    """Per-block [Dmin, Dmax] of valid depths inside pixel rects (vectorized;
    HiZ-style: pick the mip level where each rect spans ≤ 2×2 cells and
    combine those ≤ 4 cells — strictly conservative since cells round out)."""
    n = len(u0)
    dmin = np.full(n, np.inf)
    dmax = np.full(n, -np.inf)
    span = np.maximum(u1 - u0, v1 - v0)
    lvl = np.clip(np.ceil(np.log2(np.maximum(span, 1))).astype(int), 0, len(mips) - 1)
    for l in np.unique(lvl):
        sel = lvl == l
        mn, mx = mips[l]
        h, w = mn.shape
        i0 = np.clip(v0[sel] >> l, 0, h - 1)
        j0 = np.clip(u0[sel] >> l, 0, w - 1)
        i1 = np.clip(i0 + 1, 0, h - 1)
        j1 = np.clip(j0 + 1, 0, w - 1)
        dmin[sel] = np.minimum(
            np.minimum(mn[i0, j0], mn[i0, j1]), np.minimum(mn[i1, j0], mn[i1, j1])
        )
        dmax[sel] = np.maximum(
            np.maximum(mx[i0, j0], mx[i0, j1]), np.maximum(mx[i1, j0], mx[i1, j1])
        )
    return dmin, dmax


def bucket_ladder_up(x: int, step: int = 8) -> int:
    """Smallest rung ≥ x of the geometric bucket-width ladder: multiples of
    `step` growing by ~1.25x (8, 16, 24, 32, 40, 56, 72, 96, 120, 152, …).
    Bounds the compiled-shape universe per (nb, K) to O(log nb) rungs."""
    r = step
    while r < x:
        r = max(r + step, -(-int(r * 1.25) // step) * step)
    return r


def bucket_ladder_down(x: int, step: int = 8) -> int:
    """Largest rung ≤ x (≥ step) — used to quantize the hard-trim budget cap
    so the trimmed width lands exactly on a rung."""
    if x <= step:
        return step
    r = prev = step
    while r <= x:
        prev = r
        r = max(r + step, -(-int(r * 1.25) // step) * step)
    return prev


def build_frame_buckets(
    layout: BlockLayout,
    poses6: np.ndarray,  # [K, 6] world→cam angle-axis + t
    intr4: np.ndarray,  # [4] fx fy cx cy at the target pyramid level
    width: int,
    height: int,
    voxel_size: float,
    margin_px: float = 48.0,
    round_to: int = 8,
    depths: Optional[np.ndarray] = None,  # [K, H, W] level depth maps
    occlusion: float = 0.0,
    depth_slack: float = 0.05,
    max_frames_per_block: int = 0,
    max_blocks_per_frame: int = 0,
    protect_cover: int = 0,
    stats: Optional[dict] = None,
) -> np.ndarray:
    """Per-frame visible-block lists from block-AABB frustum projection.

    Host-side, once per (grid, pyramid) level: frame k's bucket is every
    block whose 8 voxel-AABB corners project (pinhole, no distortion) into
    the image rect inflated by `margin_px` — the margin absorbs distortion,
    the iso-projection offset (≤ truncation), and pose drift across the
    level's outer iterations. Conservative by construction: a block
    straddling the z≈0 plane is always included. Observations outside the
    bucket are geometrically impossible (they cannot project in-bounds), so
    the bucketed energy equals the dense frame-major energy.

    With `depths`, frustum-passing blocks are additionally OCCLUSION-culled:
    the device observation weight needs `|depth(u,v) − z| ≤ occlusion`
    (``colorization.cpp:215-270``), so a block whose camera-z interval misses
    the valid-depth interval of its pixel footprint (inflated by
    `occlusion + depth_slack`; footprint intervals from conservative min/max
    depth mips) can only produce weight-0 elements — dropping it leaves the
    energy EXACTLY unchanged. For an orbit capture this removes the far
    hemisphere (~2x fewer elements), which frustum projection alone cannot.

    `max_frames_per_block` > 0 additionally caps each block's candidate
    frames to the M closest (by footprint-center depth) observable ones —
    the TPU answer to "element fields must not scale with the total keyframe
    count K" (BENCH_NOTES "K ≫ num_obs"): total elements are bounded by
    M·nb·B³ for ANY K. With M ≥ num_obs + margin this is a benign
    approximation of the reference's per-voxel top-N over all K frames (the
    dropped frames are the block's worst views); exactness tests should
    leave it 0.

    `max_blocks_per_frame` > 0 additionally trims each frame's bucket to at
    most M blocks. This is the HARD budget backstop for the element grid
    `[K, NBc, B³]`, whose bytes scale with the LARGEST per-frame bucket — a
    cap on frames-per-block bounds the total pair count but not that
    maximum (one central frame can sit in almost every block's top-M; at
    pipeline scale this measured NBc = 95% of nb and the level's program
    exceeded HBM at compile). Pair-drop priority: straddling blocks
    (score ∞) are kept first, then blocks whose covering-frame count is
    ≤ `protect_cover` (so every block keeps its per-voxel top-N support
    wherever the frame cap left ≥ N frames — set it to `num_observations`),
    then by view score; within the droppable pool the frame's most
    REDUNDANTLY covered, most distant blocks go first, and the cover counts
    update as frames are processed (largest excess first). `stats` (a dict)
    receives `trimmed_pairs` / `uncovered_blocks`.

    Returns `bmap [K, NBc] int32` (padding = num_blocks, the pad row)."""
    from intrinsic3d_tpu.mathutil import pose_vec_to_matrix

    nb = layout.num_blocks
    b = layout.block
    fx, fy, cx, cy = (float(v) for v in np.asarray(intr4, np.float64))
    lo = np.asarray(layout.block_coords, np.float64) * b * voxel_size
    sel = np.array(
        [[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], np.float64
    )  # [8, 3] ∈ {0,1}
    corners = lo[:, None, :] + sel[None, :, :] * (b * voxel_size)  # [nb, 8, 3]

    buckets = []
    scores = []  # per frame: [nb] score of observable blocks (0 = not in bucket)
    for ki, pose in enumerate(np.asarray(poses6, np.float64)):
        t_mat = pose_vec_to_matrix(pose)
        pc = corners @ np.asarray(t_mat)[:3, :3].T + np.asarray(t_mat)[:3, 3]
        z = pc[..., 2]
        front = z > 1e-4
        any_front = np.any(front, axis=1)
        straddle = any_front & np.any(~front, axis=1)
        zs = np.where(front, z, 1.0)
        u = fx * pc[..., 0] / zs + cx
        v = fy * pc[..., 1] / zs + cy
        big = 1e18
        u_min = np.min(np.where(front, u, big), axis=1)
        u_max = np.max(np.where(front, u, -big), axis=1)
        v_min = np.min(np.where(front, v, big), axis=1)
        v_max = np.max(np.where(front, v, -big), axis=1)
        in_rect = (
            (u_max >= -margin_px)
            & (u_min <= width - 1 + margin_px)
            & (v_max >= -margin_px)
            & (v_min <= height - 1 + margin_px)
        )
        keep = (any_front & in_rect) | straddle
        z_lo = np.min(np.where(front, z, big), axis=1)
        z_hi = np.max(np.where(front, z, -big), axis=1)

        if depths is not None:
            mips = _depth_interval_mips(np.asarray(depths[ki]))
            pad = 0.5 * margin_px  # pose-drift slack on the pixel side
            u0 = np.clip(np.floor(u_min - pad).astype(np.int64), 0, width - 1)
            u1 = np.clip(np.ceil(u_max + pad).astype(np.int64), 0, width - 1)
            v0 = np.clip(np.floor(v_min - pad).astype(np.int64), 0, height - 1)
            v1 = np.clip(np.ceil(v_max + pad).astype(np.int64), 0, height - 1)
            dmin, dmax = _footprint_depth_interval(mips, u0, u1, v0, v1)
            slack = occlusion + depth_slack
            observable = (dmin - slack <= z_hi) & (dmax + slack >= z_lo)
            # blocks straddling z≈0 keep their conservative free pass
            keep = (keep & observable) | straddle

        buckets.append(np.flatnonzero(keep))
        if max_frames_per_block > 0 or max_blocks_per_frame > 0:
            s = np.where(keep, 1.0 / np.maximum(0.5 * (z_lo + z_hi), 1e-3) ** 2, 0.0)
            scores.append(np.where(straddle, np.inf, s))

    if max_frames_per_block > 0 and len(buckets) > max_frames_per_block:
        m = max_frames_per_block
        sc = np.stack(scores, axis=0)  # [K, nb]
        # per block: keep the M best-scoring frames (ties -> lower frame id)
        order = np.argsort(-sc, axis=0, kind="stable")  # [K, nb]
        rank = np.empty_like(order)
        np.put_along_axis(rank, order, np.arange(len(buckets))[:, None], axis=0)
        keep_kb = (rank < m) & (sc > 0.0)
        buckets = [np.flatnonzero(keep_kb[k]) for k in range(len(buckets))]

    if max_blocks_per_frame > 0:
        sc = np.stack(scores, axis=0)  # [K, nb]
        m = max_blocks_per_frame
        cover = np.zeros(nb, np.int64)
        for bk in buckets:
            cover[bk] += 1
        dropped = 0
        excess = [max(0, len(bk) - m) for bk in buckets]
        for k in np.argsort(-np.asarray(excess), kind="stable"):
            bk = buckets[k]
            if len(bk) <= m:
                continue
            s_k = sc[k, bk]
            # keep priority (first m survive): straddle (∞ score) > blocks
            # at/below the protected cover (their per-voxel top-N support is
            # not redundant) > least-redundantly-covered > higher view
            # score. np.lexsort: LAST key is primary.
            straddle_k = np.isinf(s_k)
            protected = (cover[bk] <= protect_cover) & ~straddle_k
            keep_rank = np.lexsort(
                (-s_k, cover[bk], (~protected).astype(np.int8),
                 (~straddle_k).astype(np.int8))
            )
            keep = bk[keep_rank[:m]]
            drop = bk[keep_rank[m:]]
            cover[drop] -= 1
            dropped += len(drop)
            buckets[k] = np.sort(keep)
        uncovered = int(nb - np.count_nonzero(cover))
        if stats is not None:
            stats["trimmed_pairs"] = dropped
            stats["uncovered_blocks"] = uncovered
        if dropped:
            log.warning(
                "  frame buckets: HBM budget trimmed %d (block, frame) pairs "
                "to %d blocks/frame (cover-protected at %d frames/block); "
                "%d/%d blocks lost all frames (regularizer-only there, as "
                "reference voxels with no observations)",
                dropped,
                m,
                protect_cover,
                uncovered,
                nb,
            )

    nbc = max((len(bk) for bk in buckets), default=1)
    # quantize the bucket WIDTH to the geometric ladder (VERDICT r4 item 4):
    # NBc is the one data-dependent static of the level program — snapping it
    # to ~1.25x rungs makes warm sessions hit the persistent compile cache
    # across trajectory/session variation (padding entries index the pad
    # block, weight 0 by construction — exactness unchanged). Capped at the
    # dense-equivalent width nb (rounded to round_to).
    cap = max(round_to, -(-nb // round_to) * round_to)
    nbc = min(bucket_ladder_up(max(nbc, 1), round_to), cap)
    bmap = np.full((len(buckets), nbc), nb, np.int32)
    for k, bk in enumerate(buckets):
        bmap[k, : min(len(bk), nbc)] = bk[:nbc]
    return bmap


# ---------------------------------------------------------------------------
# Table ⇄ block transport
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("nb", "s", "pad"))
def _table_to_dense_jit(vox_slot, tab, nb, s, pad):
    out = jnp.zeros(nb * s, tab.dtype).at[vox_slot].set(tab).reshape(nb, s)
    return pad_flat(out) if pad else out


def table_to_dense(layout: BlockLayout, table, pad: bool = True):
    """[N] table field → flat `[nb(+1), B³]` dense blocks (empties 0).

    One jitted program (scatter + reshape + pad) — the previous eager ops
    each paid a dispatch/program load on a remote link."""
    return _table_to_dense_jit(
        jnp.asarray(layout.vox_slot),
        jnp.asarray(table),
        nb=layout.num_blocks,
        s=layout.block**3,
        pad=pad,
    )


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
    bucket: bool = False,
) -> Tuple[Params, BlockAssembly, object]:
    """Convert a flat-table problem (from `assembly.build_assembly`) into the
    block-dense form — host-side numpy path, used by tests/benchmarks as the
    equivalence bridge (the production pipeline builds the dense assembly
    directly on device, see `refine.device_assembly`). Pure re-layout: same
    energy, same free parameters.

    `num_obs` is accepted for API stability but unused: the dense layout is
    FRAME-MAJOR `[K, D]` (row = keyframe), so the row capacity is the
    keyframe count and each active element lands at its (frame, slot).

    `bucket=True` emits the FRAME-BUCKETED layout instead: per-frame block
    lists built exactly from the active elements (the production pipeline
    builds them from frustum projection, `build_frame_buckets`)."""
    del num_obs
    s = layout.block**3
    nb = layout.num_blocks
    d = nb * s

    eg_slot = layout.slots_of(np.asarray(asm.eg_vpos))

    # frame-major placement: active element (voxel, frame) → row `frame`
    # (the table assembly already applied the top-N observation cap, and a
    # voxel observes each keyframe at most once — no collisions, PROVIDED
    # every active element's voxel exists in this layout; a clamped -1 slot
    # would silently overwrite the real (frame, slot 0) element)
    eg_w_np = np.asarray(asm.eg_w)
    active = eg_w_np > 0.0
    if np.any(eg_slot[active] < 0):
        raise ValueError("active E_g element references a voxel outside the block layout")
    eg_slot = np.where(eg_slot >= 0, eg_slot, 0).astype(np.int64)
    o_cap = int(asm.images.shape[0])

    bmap_j = None
    if bucket:
        frames = np.asarray(asm.eg_frame).astype(np.int64)
        blk = eg_slot // s
        bks = [np.unique(blk[active & (frames == k)]) for k in range(o_cap)]
        nbc = max((len(bk) for bk in bks), default=1)
        nbc = max(8, -(-max(nbc, 1) // 8) * 8)
        bmap_np = np.full((o_cap, nbc), nb, np.int32)
        pos = np.full((o_cap, nb + 1), -1, np.int64)
        for k, bk in enumerate(bks):
            bmap_np[k, : len(bk)] = bk
            pos[k, bk] = np.arange(len(bk))
        af = frames[active]
        e_cap = nbc * s
        didx = af * e_cap + pos[af, blk[active]] * s + (eg_slot[active] % s)
        eg_w = np.zeros((o_cap, nbc, s), np.float32)
        eg_w.reshape(-1)[didx] = eg_w_np[active]
        bmap_j = jnp.asarray(bmap_np)
    else:
        didx = np.asarray(asm.eg_frame)[active].astype(np.int64) * d + eg_slot[active]
        eg_w = np.zeros((o_cap, nb, s), np.float32)
        eg_w.reshape(-1)[didx] = eg_w_np[active]

    # per-voxel element data (identical across a voxel's observations —
    # scatter from active elements; slots without elements carry weight 0)
    eg_sh = np.zeros((9, d), np.float32)
    eg_sh[:, eg_slot[active]] = np.asarray(asm.eg_sh, np.float32)[active].T
    eg_vpos = np.zeros((3, d), np.int32)
    eg_vpos[:, layout.vox_slot] = np.asarray(coords, np.int32).T

    def densify(table_vals):
        out = np.zeros(d, np.float32)
        out[layout.vox_slot] = np.asarray(table_vals, np.float32)
        return out.reshape(nb, s)

    # E_a pairs → three +axis direction weight fields
    pairs = np.asarray(asm.ea_pairs)
    ea_wt = np.asarray(asm.ea_w, np.float32)
    delta = coords[pairs[:, 1]] - coords[pairs[:, 0]]
    slots_i = layout.vox_slot[pairs[:, 0]]
    slots_j = layout.vox_slot[pairs[:, 1]]
    ea_w = np.zeros((3, d), np.float32)
    for dd in range(3):
        e = np.zeros(3, np.int64)
        e[dd] = 1
        fwd = np.all(delta == e, axis=-1)
        bwd = np.all(delta == -e, axis=-1)
        ea_w[dd, slots_i[fwd]] = ea_wt[fwd]
        ea_w[dd, slots_j[bwd]] = ea_wt[bwd]
    ea_w = ea_w.reshape(3, nb, s)

    sdf_plan, alb_plan = layout_plans(layout)

    basm = BlockAssembly(
        eg_w=jnp.asarray(eg_w),
        eg_sh=jnp.asarray(eg_sh),
        eg_vpos=jnp.asarray(eg_vpos),
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
        bmap=bmap_j,
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
