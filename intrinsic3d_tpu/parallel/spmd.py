"""Manual-SPMD (shard_map) spatial block sharding of the production solver.

The auto-sharded placement (`sharding.shard_block_problem`) replicates the
per-voxel parameter fields and relies on XLA's partitioner — which cannot
split the Pallas sampler custom call on real hardware (ARCHITECTURE.md
"Known limitation"). This module is the production multi-chip path:

- the device mesh's ``data`` axis owns contiguous BRICKS of block rows —
  parameters, masks, per-slot weights, and the dense frame-major E_g element
  fields all shard along the block axis, so per-device parameter memory is
  `nb/n` plus a halo surface;
- stencil shifts cross brick boundaries through a precomputed static halo
  exchange (`parallel.halo.HaloPlan`): one `all_to_all` ships exactly the
  needed boundary rows, and the transposed scatter-add rides the same tables
  backwards (`ShardedPlan.apply/apply_transpose` — drop-in duck-typed
  replacements for `grid.blocks.ShiftPlan`, so every `refine.blockform`
  routine runs UNCHANGED inside `shard_map`);
- the frame-windowed Pallas sampler executes per shard on its local element
  columns with replicated images — no partitioner involvement, the exact
  pattern validated by `tests/test_multichip.py::test_windowed_sampler_under_shard_map`;
- global parameters (poses/intrinsics/distortion) replicate; their gradient,
  Gauss-Newton products and the PCG/cost scalars are `psum`'d over the axis
  (`refine.solver.gn_iteration(axis_name=...)`);
- the FRAME-BUCKETED element layout (`blockform.build_frame_buckets`) shards
  by bucket column, partitioned by block owner: each device's per-frame
  bucket holds exactly the visible blocks of its own brick
  (`localize_buckets`), so per-slot fetches, the per-voxel top-N, and the
  `_unbucket` scatter-adds all stay device-local — the memory-forced
  finest-level regime runs under the mesh;
- plan construction and the jitted shard_map step are built ONCE per level
  and reused across the outer loop (`SpmdContext` / `SpmdLevel`) — the
  production pipeline path (`refine.optimizer.optimize_level(mesh=...)`)
  runs the ENTIRE per-iteration relinearization (device assembly: normals,
  gates, observation collection, validity probe, weight normalization) and
  the damped-GN solve inside the same sharded region, so per-iteration
  observation re-collection never re-replicates.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from intrinsic3d_tpu.grid.blocks import BlockLayout, ShiftPlan
from intrinsic3d_tpu.parallel.halo import HaloPlan, build_halo_plan
from intrinsic3d_tpu.refine.blockform import BlockAssembly
from intrinsic3d_tpu.refine.residuals import Params


@dataclasses.dataclass
class ShardedPlan:
    """Per-device stencil-shift plan with halo exchange.

    Duck-typed for `ShiftPlan` consumers (`apply`, `apply_transpose`,
    `index`, `offsets`): fields are the device-LOCAL `[m+1, B³]` block rows
    (trailing pad row), outputs `[T, m, B³]`. Leaves `nbr_loc`/`send` arrive
    through shard_map with a leading sharded device axis of size 1.
    """

    offsets: np.ndarray  # [T, 3] (static)
    term_mats: Tuple  # D × [B³, k_d·B³] (replicated)
    term_offs: Tuple  # static
    center_dir: int  # index into dir order, −1 if absent
    nbr_loc: jnp.ndarray  # [1, D, m] int32 ext-row ids (device-local slice)
    send: Tuple  # per active shift δ: [1, Hs_δ] int32 local rows to ship
    block: int
    axis: str
    n: int
    shifts: Tuple[int, ...]  # active mesh shifts
    hs: Tuple[int, ...]  # rows per shift

    @property
    def m(self) -> int:
        return self.nbr_loc.shape[-1]

    def _exchange(self, field_pad: jnp.ndarray) -> jnp.ndarray:
        """`[m+1, B³]` local rows → `[m + Σhs + 1, B³]` extended rows: one
        ppermute per active mesh shift (two, for brick partitions)."""
        pools = []
        for shift, tbl in zip(self.shifts, self.send):
            buf = field_pad[tbl[0]]  # [Hs_δ, B³] (pad rows send zeros)
            perm = [(q, (q + shift) % self.n) for q in range(self.n)]
            pools.append(jax.lax.ppermute(buf, self.axis, perm))
        return jnp.concatenate(
            [field_pad[: self.m]] + pools + [field_pad[self.m :]], axis=0
        )

    def _exchange_transpose(self, acc_ext: jnp.ndarray) -> jnp.ndarray:
        """Adjoint of `_exchange`: extended-row cotangents → `[m+1, B³]`."""
        m = self.m
        out = jnp.zeros((m + 1, acc_ext.shape[-1]), acc_ext.dtype)
        out = out.at[:m].add(acc_ext[:m])
        out = out.at[m].add(acc_ext[-1])
        off = m
        for shift, tbl, h in zip(self.shifts, self.send, self.hs):
            perm = [(q, (q - shift) % self.n) for q in range(self.n)]
            back = jax.lax.ppermute(acc_ext[off : off + h], self.axis, perm)
            out = out.at[tbl[0]].add(back)
            off += h
        return out

    def apply(self, field_pad: jnp.ndarray) -> jnp.ndarray:
        s = self.block**3
        ext = self._exchange(field_pad)
        out = [None] * len(self.offsets)
        for d in range(self.nbr_loc.shape[1]):
            if d == self.center_dir:
                rows = ext[: self.m]
            else:
                rows = ext[self.nbr_loc[0, d]]
            prod = jnp.dot(rows, self.term_mats[d], preferred_element_type=jnp.float32)
            for g, t in enumerate(self.term_offs[d]):
                sl = prod[:, g * s : (g + 1) * s]
                out[t] = sl if out[t] is None else out[t] + sl
        return jnp.stack(out)

    def apply_transpose(self, cot: jnp.ndarray) -> jnp.ndarray:
        s = self.block**3
        acc = jnp.zeros((self.m + sum(self.hs) + 1, s), cot.dtype)
        for d in range(self.nbr_loc.shape[1]):
            pc = jnp.concatenate([cot[t] for t in self.term_offs[d]], axis=-1)
            rows_ct = jax.lax.dot_general(
                pc,
                self.term_mats[d],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if d == self.center_dir:
                acc = acc.at[: self.m].add(rows_ct)
            else:
                acc = acc.at[self.nbr_loc[0, d]].add(rows_ct)
        return self._exchange_transpose(acc)

    def index(self, offset) -> int:
        o = np.asarray(offset)
        hit = np.flatnonzero(np.all(self.offsets == o, axis=-1))
        if len(hit) != 1:
            raise KeyError(f"offset {tuple(o)} not in plan")
        return int(hit[0])


def _plan_flatten(p: ShardedPlan):
    children = (p.term_mats, p.nbr_loc, p.send)
    aux = (
        tuple(map(tuple, np.asarray(p.offsets).tolist())),
        p.term_offs,
        p.center_dir,
        p.block,
        p.axis,
        p.n,
        p.shifts,
        p.hs,
    )
    return children, aux


def _plan_unflatten(aux, children):
    offsets, term_offs, center_dir, block, axis, n, shifts, hs = aux
    term_mats, nbr_loc, send = children
    return ShardedPlan(
        offsets=np.asarray(offsets),
        term_mats=term_mats,
        term_offs=term_offs,
        center_dir=center_dir,
        nbr_loc=nbr_loc,
        send=send,
        block=block,
        axis=axis,
        n=n,
        shifts=shifts,
        hs=hs,
    )


jax.tree_util.register_pytree_node(ShardedPlan, _plan_flatten, _plan_unflatten)


def _center_dir(plan: ShiftPlan) -> int:
    for d, v in enumerate(plan.dir_vecs):
        if tuple(v) == (0, 0, 0):
            return d
    return -1


def make_sharded_plans(
    layout: BlockLayout, plans: Tuple[ShiftPlan, ...], n: int, axis: str = "data"
) -> Tuple[HaloPlan, Tuple[ShardedPlan, ...]]:
    """Build the halo exchange and per-plan ShardedPlans (full [n, ...] leaf
    arrays — shard them along their leading axis when placing)."""
    hp = build_halo_plan(layout.num_blocks, n, [np.asarray(p.nbr) for p in plans])
    out = []
    for p, nbr_loc in zip(plans, hp.nbr_local):
        out.append(
            ShardedPlan(
                offsets=p.offsets,
                term_mats=p.term_mats,
                term_offs=p.term_offs,
                center_dir=_center_dir(p),
                nbr_loc=jnp.asarray(nbr_loc),
                send=tuple(jnp.asarray(t) for t in hp.send),
                block=p.block,
                axis=axis,
                n=n,
                shifts=hp.shifts,
                hs=hp.hs,
            )
        )
    return hp, tuple(out)


# ---------------------------------------------------------------------------
# Frame-bucket localization (bucketed layout under spatial sharding)
# ---------------------------------------------------------------------------


def localize_buckets(
    num_blocks: int, bmap: np.ndarray, n: int, round_to: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    """Partition global frame buckets by block OWNER.

    Device p owns the contiguous brick of block rows `[p·m, (p+1)·m)`; its
    local bucket for frame k is exactly the global bucket's blocks inside
    that brick, remapped to local rows. Because every per-slot quantity of a
    bucketed element (stencil values, SH, top-N rank, the `_unbucket`
    scatter-add target) is keyed by the element's BLOCK row, owner
    partitioning makes the entire bucketed data path device-local — the only
    cross-device traffic remains the stencil halo exchange and the psum'd
    globals, same as the dense layout.

    Returns:
      - ``bmap_dev [n, K, NBc_l] int32`` — per-device local block rows
        (padding = m, each device's all-zero pad row);
      - ``colsel [n, K, NBc_l] int64`` — the GLOBAL bucket column each local
        entry came from (padding = NBc, a zero pad column) — the gather table
        for re-sharding prebuilt `[K, NBc, B³]` element fields.
    """
    nb = num_blocks
    if nb % n != 0:
        raise ValueError(f"num_blocks {nb} not divisible by mesh size {n}")
    m = nb // n
    k, nbc = bmap.shape
    owner = np.where(bmap < nb, bmap // m, -1)  # [K, NBc]
    counts = np.zeros((n, k), np.int64)
    for p in range(n):
        counts[p] = np.sum(owner == p, axis=1)
    nbc_l = max(int(counts.max()), 1)
    nbc_l = -(-nbc_l // round_to) * round_to
    bmap_dev = np.full((n, k, nbc_l), m, np.int32)
    colsel = np.full((n, k, nbc_l), nbc, np.int64)
    for p in range(n):
        for kk in range(k):
            cols = np.flatnonzero(owner[kk] == p)
            bmap_dev[p, kk, : len(cols)] = bmap[kk, cols] - p * m
            colsel[p, kk, : len(cols)] = cols
    return bmap_dev, colsel


# ---------------------------------------------------------------------------
# Per-level SPMD context: plans + jit built once, reused across iterations
# ---------------------------------------------------------------------------


def _plan_spec(plan: ShardedPlan, axis: str) -> ShardedPlan:
    """PartitionSpec pytree matching a ShardedPlan's leaves."""
    return _plan_unflatten(
        _plan_flatten(plan)[1],
        (
            tuple(P() for _ in plan.term_mats),
            P(axis, None, None),
            tuple(P(axis, None) for _ in plan.send),
        ),
    )


def _strip_pad(x):
    return x[:-1]


@dataclasses.dataclass
class SpmdContext:
    """Sharded stencil plans + jit cache for one (BlockLayout, mesh) pair.

    Built ONCE per level (`make_spmd_context`); every `spmd_gn_iteration`
    call or `SpmdLevel` step reuses the halo tables and the jitted shard_map
    callables instead of rebuilding them per call (the round-2 per-call
    plan/jit rebuild)."""

    mesh: Mesh
    axis: str
    layout: BlockLayout
    halo: HaloPlan
    sdf_plan_s: ShardedPlan
    alb_plan_s: ShardedPlan
    _jit_cache: dict = dataclasses.field(default_factory=dict)

    @property
    def n(self) -> int:
        return int(self.mesh.devices.size)

    def jitted(self, key, make):
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jit_cache[key] = make()
        return fn


def make_spmd_context(layout: BlockLayout, mesh: Mesh, axis: str = "data") -> SpmdContext:
    from intrinsic3d_tpu.refine.blockform import layout_plans

    plans = layout_plans(layout)
    hp, (sdf_s, alb_s) = make_sharded_plans(layout, plans, mesh.devices.size, axis)
    return SpmdContext(
        mesh=mesh, axis=axis, layout=layout, halo=hp, sdf_plan_s=sdf_s, alb_plan_s=alb_s
    )


def _base_specs(axis: str):
    """(params/masks, per-slot, element, replicated) PartitionSpecs."""
    from intrinsic3d_tpu.refine.solver import Masks

    blk = P(axis, None)
    rep = P()
    p_specs = Params(sdf=blk, albedo=blk, poses=rep, intr=rep, dist=rep)
    m_specs = Masks(sdf=blk, albedo=blk, poses=rep, intr=rep, dist=rep)
    return p_specs, m_specs, blk, rep


# ---------------------------------------------------------------------------
# The SPMD GN iteration (prebuilt-assembly form: tests / dryrun / benches)
# ---------------------------------------------------------------------------


def spmd_gn_iteration(
    bparams: Params,
    basm: BlockAssembly,
    bmasks,
    mu,
    layout: BlockLayout,
    mesh: Mesh,
    lm_steps: int = 50,
    cg_iters: int = 12,
    cg_coeff_dtype: str = "bfloat16",
    axis: str = "data",
    ctx: Optional[SpmdContext] = None,
):
    """One relinearize→solve→accept cycle under spatial block sharding.

    Numerically identical energy to `solver.gn_iteration` on the same block
    problem (the halo'd stencils reproduce the global shifts exactly; global
    reductions are psum'd). Inputs are ordinary host/DEVICE arrays in the
    global block layout — including the FRAME-BUCKETED element layout, whose
    element fields are re-sharded by block owner (`localize_buckets`).
    Outputs match `gn_iteration`'s. Pass `ctx` (from `make_spmd_context`) to
    reuse halo plans and the jitted step across calls."""
    from intrinsic3d_tpu.refine.solver import gn_iteration

    if ctx is None:
        ctx = make_spmd_context(layout, mesh, axis)
    n = ctx.n
    nb = layout.num_blocks
    bucketed = basm.bmap is not None

    p_specs, m_specs, blk, rep = _base_specs(axis)
    col = P(None, axis)  # [C, D] per-slot fields
    mid = P(None, axis, None)  # [K, nb, B³] element fields (block axis shards)

    basm_in = basm._replace(sdf_plan=ctx.sdf_plan_s, alb_plan=ctx.alb_plan_s)
    if bucketed:
        bmap_np = np.asarray(basm.bmap)
        k, nbc = bmap_np.shape
        bmap_dev, colsel = localize_buckets(nb, bmap_np, n)
        nbc_l = bmap_dev.shape[-1]
        # re-shard the element weights by owner: one gather through the
        # global-column table (pad column NBc is all-zero)
        eg_w_pad = jnp.pad(basm.eg_w, ((0, 0), (0, 1), (0, 0)))
        cs = jnp.asarray(colsel.transpose(1, 0, 2).reshape(k, n * nbc_l))
        eg_w_loc = jnp.take_along_axis(eg_w_pad, cs[:, :, None], axis=1)  # [K, n·NBc_l, B³]
        basm_in = basm_in._replace(eg_w=eg_w_loc, bmap=jnp.asarray(bmap_dev))
        eg_spec = P(None, axis, None)
        bmap_spec = P(axis, None, None)
    else:
        eg_spec = mid
        bmap_spec = None
    asm_specs = BlockAssembly(
        eg_w=eg_spec,
        eg_sh=col,
        eg_vpos=col,
        sdf_plan=_plan_spec(ctx.sdf_plan_s, axis),
        alb_plan=_plan_spec(ctx.alb_plan_s, axis),
        er_w=blk,
        es_ref=blk,
        es_w=blk,
        ea_w=mid,
        lam=rep,
        images=rep,
        pyr_scale=rep,
        voxel_size=rep,
        bmap=bmap_spec,
    )

    # strip pad rows (the +1 breaks even sharding); re-padded per device inside
    bp_in = bparams._replace(sdf=_strip_pad(bparams.sdf), albedo=_strip_pad(bparams.albedo))
    bm_in = type(bmasks)(
        sdf=_strip_pad(bmasks.sdf),
        albedo=_strip_pad(bmasks.albedo),
        poses=bmasks.poses,
        intr=bmasks.intr,
        dist=bmasks.dist,
    )

    def make():
        def body(bp, ba, bm, mu):
            from intrinsic3d_tpu.grid.blocks import pad_flat

            bp = bp._replace(sdf=pad_flat(bp.sdf), albedo=pad_flat(bp.albedo))
            bm = bm._replace(sdf=pad_flat(bm.sdf), albedo=pad_flat(bm.albedo))
            if ba.bmap is not None:
                ba = ba._replace(bmap=ba.bmap[0])  # [1, K, NBc_l] → local [K, NBc_l]
            out_p, c0, c1, mu2, tries = gn_iteration(
                bp,
                ba,
                bm,
                mu,
                lm_steps=lm_steps,
                cg_iters=cg_iters,
                cg_coeff_dtype=cg_coeff_dtype,
                axis_name=axis,
            )
            out_p = out_p._replace(sdf=_strip_pad(out_p.sdf), albedo=_strip_pad(out_p.albedo))
            return out_p, c0, c1, mu2, tries

        return jax.jit(
            jax.shard_map(
                body,
                mesh=ctx.mesh,
                in_specs=(p_specs, asm_specs, m_specs, rep),
                out_specs=(p_specs, rep, rep, rep, rep),
                check_vma=False,  # pallas_call outputs carry no vma annotation
            )
        )

    fn = ctx.jitted(("gn", lm_steps, cg_iters, cg_coeff_dtype, bucketed), make)
    out_p, c0, c1, mu2, tries = fn(bp_in, basm_in, bm_in, mu)
    from intrinsic3d_tpu.grid.blocks import pad_flat

    out_p = out_p._replace(sdf=pad_flat(out_p.sdf), albedo=pad_flat(out_p.albedo))
    return out_p, c0, c1, mu2, tries


def place_spmd_problem(bparams, basm, bmasks, mesh: Mesh, axis: str = "data"):
    """Pre-place the block problem for `spmd_gn_iteration`: voxel-shaped data
    sharded by brick, globals replicated (device_put before the call avoids
    per-iteration host transfers)."""
    blk = NamedSharding(mesh, P(axis, None))
    col = NamedSharding(mesh, P(None, axis))
    mid = NamedSharding(mesh, P(None, axis, None))
    rep = NamedSharding(mesh, P())

    def put(x, sh):
        return jax.device_put(x, sh)

    basm_s = basm._replace(
        eg_w=put(basm.eg_w, mid),
        eg_sh=put(basm.eg_sh, col),
        eg_vpos=put(basm.eg_vpos, col),
        er_w=put(basm.er_w, blk),
        es_ref=put(basm.es_ref, blk),
        es_w=put(basm.es_w, blk),
        ea_w=put(basm.ea_w, mid),
        lam=put(basm.lam, rep),
        images=put(basm.images, rep),
        pyr_scale=put(basm.pyr_scale, rep),
        voxel_size=put(basm.voxel_size, rep),
    )
    return bparams, basm_s, bmasks


# ---------------------------------------------------------------------------
# SpmdLevel: the production pipeline path (assembly + solve in ONE sharded
# region, statics placed once, jit built once per level)
# ---------------------------------------------------------------------------


class SpmdLevel:
    """Per-(grid, pyramid)-level multi-chip execution of the production
    outer loop (`refine.optimizer.optimize_level(mesh=...)`).

    Construction (once per level) builds the halo plans, places the level
    statics — occupancy/validity, fused-SDF anchor, per-voxel SH, chromaticity
    pair weights, depth/intensity images — on the mesh (bricked per-voxel
    fields, replicated images), localizes the frame buckets by block owner,
    and jits ONE shard_map step that runs the ENTIRE outer-iteration body on
    device: `device_assembly` (observation re-collection with current
    parameters, gates, validity probe, psum'd weight normalization) followed
    by `gn_iteration` (damped-GN/PCG with halo'd stencils and psum'd
    globals). The outer loop then only feeds back sharded parameters and the
    two scalars (μ, scheduled λ) — no per-iteration host re-assembly, no
    plan rebuild, no re-jit."""

    def __init__(
        self,
        mesh: Mesh,
        layout: BlockLayout,
        st,  # refine.device_assembly.LevelStatic
        depths: jnp.ndarray,  # [K, H, W]
        images: jnp.ndarray,  # [K, H, W]
        *,
        num_obs: int,
        width: int,
        height: int,
        pyr_scale: float,
        voxel_size: float,
        truncation: float,
        thres_shell: float,
        occlusion_distance: float,
        fix_poses: bool,
        fix_intrinsics: bool,
        fix_distortion: bool,
        use_albedo: bool,
        bmap: Optional[np.ndarray] = None,  # [K, NBc] global frame buckets
        lm_steps: int = 50,
        cg_iters: int = 12,
        cg_coeff_dtype: str = "bfloat16",
        axis: str = "data",
        ctx: Optional[SpmdContext] = None,
        eg_sh_device: Optional[jnp.ndarray] = None,
        schur_globals: bool = False,
        min_pose_obs: int = 0,
        eg_chunks: int = 1,
    ):
        """`eg_sh_device` overrides the per-voxel SH coefficients of
        `st.eg_sh` with an already-on-mesh `[9, nb, B³]` array (the sharded
        output of `parallel.spmd_stages.SpmdStages.svsh`) — the full-grid
        voxel-SH field then never exists on a single device."""
        self.ctx = ctx or make_spmd_context(layout, mesh, axis)
        self.mesh = mesh
        self.axis = axis
        self.layout = layout
        n = self.ctx.n
        nb = layout.num_blocks
        s = layout.block**3

        from intrinsic3d_tpu.parallel.staging import stage_replicated, stage_sliced

        blk = P(axis, None)
        mid3 = P(None, axis, None)

        def put(x, spec, shard_dim=0):
            # process-local staging (parallel/staging.py): each addressable
            # device's slice only — valid under multi-process jax.distributed
            return stage_sliced(mesh, spec, np.asarray(x), shard_dim)

        # statics re-laid for brick sharding: pad rows stripped, per-slot
        # [C, D] fields folded to [C, nb, B³] so the block axis shards
        eg_sh = (
            eg_sh_device  # already sharded on this mesh — pass through
            if eg_sh_device is not None
            else put(np.asarray(st.eg_sh).reshape(9, nb, s), mid3, 1)
        )
        self._stat = (
            put(_strip_pad(st.occ), blk),
            put(_strip_pad(st.valid), blk),
            put(np.asarray(st.vpos).reshape(3, nb, s), mid3, 1),
            put(st.es_ref, blk),
            eg_sh,
            put(st.ea_chroma, mid3, 1),
        )
        self._depths = stage_replicated(mesh, depths)
        self._images = stage_replicated(mesh, images)
        self._scalars = tuple(
            stage_replicated(mesh, np.float32(v))
            for v in (pyr_scale, voxel_size, truncation, thres_shell, occlusion_distance)
        )
        self._bucketed = bmap is not None
        if self._bucketed:
            bmap_dev, _ = localize_buckets(nb, np.asarray(bmap), n)
            self._bmap = put(bmap_dev, P(axis, None, None))
        else:
            self._bmap = None

        p_specs, _, blk_p, rep_p = _base_specs(axis)
        self._p_specs = p_specs
        stat_specs = (
            blk_p,
            blk_p,
            P(None, axis, None),
            blk_p,
            P(None, axis, None),
            P(None, axis, None),
        )
        scal_specs = tuple(rep_p for _ in self._scalars)
        bmap_spec = P(axis, None, None) if self._bucketed else None
        plan_spec_sdf = _plan_spec(self.ctx.sdf_plan_s, axis)
        plan_spec_alb = _plan_spec(self.ctx.alb_plan_s, axis)
        bucketed = self._bucketed

        from intrinsic3d_tpu.refine.device_assembly import LevelStatic, device_assembly
        from intrinsic3d_tpu.refine.solver import gn_iteration
        from intrinsic3d_tpu.grid.blocks import pad_flat

        def body(stat, sdf_plan, alb_plan, bmap_loc, bp, depths, images, scalars, lambdas, mu):
            occ, valid, vpos, es_ref, eg_sh, ea_chroma = stat
            st_loc = LevelStatic(
                occ=pad_flat(occ),
                valid=pad_flat(valid),
                vpos=vpos.reshape(3, -1),
                es_ref=es_ref,
                eg_sh=eg_sh.reshape(9, -1),
                ea_chroma=ea_chroma,
            )
            bp = bp._replace(sdf=pad_flat(bp.sdf), albedo=pad_flat(bp.albedo))
            basm, bmasks = device_assembly(
                st_loc,
                sdf_plan,
                alb_plan,
                bp,
                depths,
                images,
                *scalars,
                lambdas,
                num_obs=num_obs,
                width=width,
                height=height,
                fix_poses=fix_poses,
                fix_intrinsics=fix_intrinsics,
                fix_distortion=fix_distortion,
                use_albedo=use_albedo,
                bmap=bmap_loc[0] if bucketed else None,
                axis_name=axis,
                min_pose_obs=min_pose_obs,
            )
            out_p, c0, c1, mu2, tries = gn_iteration(
                bp,
                basm,
                bmasks,
                mu,
                lm_steps=lm_steps,
                cg_iters=cg_iters,
                cg_coeff_dtype=cg_coeff_dtype,
                axis_name=axis,
                schur_globals=schur_globals,
                eg_chunks=eg_chunks,
            )
            out_p = out_p._replace(
                sdf=_strip_pad(out_p.sdf), albedo=_strip_pad(out_p.albedo)
            )
            return out_p, c0, c1, mu2, tries

        self._step = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(
                    stat_specs,
                    plan_spec_sdf,
                    plan_spec_alb,
                    bmap_spec,
                    p_specs,
                    rep_p,
                    rep_p,
                    scal_specs,
                    rep_p,
                    rep_p,
                ),
                out_specs=(p_specs, rep_p, rep_p, rep_p, rep_p),
                check_vma=False,  # pallas_call outputs carry no vma annotation
            )
        )

    # -- outer-loop API ----------------------------------------------------

    def begin(self, bparams: Params) -> Params:
        """Strip pad rows and place the parameters on the mesh (bricked),
        process-local per addressable device (parallel/staging.py). Leaves
        already sharded on this mesh (the mesh pipeline's loop state) pass
        through untouched."""
        from intrinsic3d_tpu.parallel.staging import stage_replicated, stage_sliced

        def on_mesh(x):
            sh = getattr(x, "sharding", None)
            return sh is not None and getattr(sh, "mesh", None) is self.mesh

        def brick(x):
            if on_mesh(x):
                return x
            return stage_sliced(self.mesh, P(self.axis, None), np.asarray(x))

        def rep(x):
            if on_mesh(x):
                return x
            return stage_replicated(self.mesh, np.asarray(x))

        return Params(
            sdf=brick(_strip_pad(bparams.sdf)),
            albedo=brick(_strip_pad(bparams.albedo)),
            poses=rep(bparams.poses),
            intr=rep(bparams.intr),
            dist=rep(bparams.dist),
        )

    def set_eg_sh(self, eg_sh_dev: jnp.ndarray) -> None:
        """Swap in the per-voxel SH field (the sharded SVSH output) after a
        background construction that staged a zero placeholder — the statics
        are per-call arguments, so the swap is free and the warmed program
        (same aval/sharding) stays valid."""
        st = list(self._stat)
        st[4] = eg_sh_dev
        self._stat = tuple(st)

    def warm(self) -> None:
        """AOT-compile the step program — trace + persistent-compile-cache
        read + remote program upload WITHOUT executing the solve (the mesh
        twin of `optimizer.LevelPrep`'s program warm; VERDICT r4 item 3).
        `step` then calls the compiled executable directly; any aval drift
        falls back to the jit path."""
        sds = jax.ShapeDtypeStruct
        f32 = jnp.float32
        blk = NamedSharding(self.mesh, P(self.axis, None))
        rep = NamedSharding(self.mesh, P())
        nb, s = self.layout.num_blocks, self.layout.block**3
        k = int(self._depths.shape[0])
        zp = Params(
            sdf=sds((nb, s), f32, sharding=blk),
            albedo=sds((nb, s), f32, sharding=blk),
            poses=sds((k, 6), f32, sharding=rep),
            intr=sds((4,), f32, sharding=rep),
            dist=sds((5,), f32, sharding=rep),
        )
        lowered = self._step.lower(
            self._stat,
            self.ctx.sdf_plan_s,
            self.ctx.alb_plan_s,
            self._bmap,
            zp,
            self._depths,
            self._images,
            self._scalars,
            sds((4,), f32, sharding=rep),
            sds((), f32, sharding=rep),
        )
        self._compiled = lowered.compile()

    def _replicated_scalar(self, x):
        sh = getattr(x, "sharding", None)
        if (
            sh is not None
            and getattr(sh, "mesh", None) is self.mesh
            and sh.is_fully_replicated
        ):
            return x
        from intrinsic3d_tpu.parallel.staging import stage_replicated

        return stage_replicated(self.mesh, np.asarray(x, np.float32))

    def step(self, bparams_s: Params, lambdas: jnp.ndarray, mu):
        """One outer iteration: device assembly + damped-GN solve, sharded.

        `bparams_s` is the stripped/placed form from `begin` (or a previous
        `step`); returns (params', cost0, cost1, mu', tries) with params'
        still placed — feed it straight back in."""
        args = (
            self._stat,
            self.ctx.sdf_plan_s,
            self.ctx.alb_plan_s,
            self._bmap,
            bparams_s,
            self._depths,
            self._images,
            self._scalars,
            self._replicated_scalar(lambdas),
            self._replicated_scalar(mu),
        )
        if getattr(self, "_compiled", None) is not None:
            try:
                return self._compiled(*args)
            except Exception as exc:  # noqa: BLE001 — aval drift: jit path
                import logging

                logging.getLogger("intrinsic3d").warning(
                    "warmed SpmdLevel executable rejected the step args "
                    "(%r); falling back to the jit path", exc
                )
                self._compiled = None
        return self._step(*args)

    def finish(self, bparams_s: Params) -> Params:
        """Re-pad the voxel fields back to the `[nb+1, B³]` block form."""
        from intrinsic3d_tpu.grid.blocks import pad_flat

        return bparams_s._replace(
            sdf=pad_flat(bparams_s.sdf), albedo=pad_flat(bparams_s.albedo)
        )
