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
  (`refine.solver.gn_iteration(axis_name=...)`).
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
# The SPMD GN iteration
# ---------------------------------------------------------------------------


def _strip_pad(x):
    return x[:-1]


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
):
    """One relinearize→solve→accept cycle under spatial block sharding.

    Numerically identical energy to `solver.gn_iteration` on the same block
    problem (the halo'd stencils reproduce the global shifts exactly; global
    reductions are psum'd). Inputs are ordinary host/DEVICE arrays in the
    global block layout; outputs match `gn_iteration`'s.
    """
    from intrinsic3d_tpu.refine.solver import Masks, gn_iteration

    if basm.bmap is not None:
        raise NotImplementedError("frame-bucketed layout under SPMD: use the dense layout")
    n = mesh.devices.size
    _, (sdf_plan_s, alb_plan_s) = make_sharded_plans(
        layout, (basm.sdf_plan, basm.alb_plan), n, axis
    )

    nb = layout.num_blocks
    s = layout.block**3
    k = basm.eg_w.shape[0]

    # specs: block-axis sharding for voxel-shaped data, replication for globals
    blk = P(axis, None)
    col = P(None, axis)  # [C, D] per-slot fields
    mid = P(None, axis, None)  # [K, nb, B³] element fields (block axis shards)
    rep = P()

    p_specs = Params(sdf=blk, albedo=blk, poses=rep, intr=rep, dist=rep)
    m_specs = Masks(sdf=blk, albedo=blk, poses=rep, intr=rep, dist=rep)
    def plan_spec(plan):
        return _plan_unflatten(
            _plan_flatten(plan)[1],
            (
                tuple(P() for _ in plan.term_mats),
                P(axis, None, None),
                tuple(P(axis, None) for _ in plan.send),
            ),
        )

    plan_spec_sdf = plan_spec(sdf_plan_s)
    plan_spec_alb = plan_spec(alb_plan_s)
    asm_specs = BlockAssembly(
        eg_w=mid,
        eg_sh=col,
        eg_vpos=col,
        sdf_plan=plan_spec_sdf,
        alb_plan=plan_spec_alb,
        er_w=blk,
        es_ref=blk,
        es_w=blk,
        ea_w=P(None, axis, None),
        lam=rep,
        images=rep,
        pyr_scale=rep,
        voxel_size=rep,
        bmap=None,
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
    basm_in = basm._replace(sdf_plan=sdf_plan_s, alb_plan=alb_plan_s)

    def body(bp, ba, bm, mu):
        from intrinsic3d_tpu.grid.blocks import pad_flat

        bp = bp._replace(sdf=pad_flat(bp.sdf), albedo=pad_flat(bp.albedo))
        bm = bm._replace(sdf=pad_flat(bm.sdf), albedo=pad_flat(bm.albedo))
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

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(p_specs, asm_specs, m_specs, rep),
            out_specs=(p_specs, rep, rep, rep, rep),
            check_vma=False,  # pallas_call outputs carry no vma annotation
        )
    )
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
