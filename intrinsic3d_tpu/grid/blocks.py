"""Block-dense voxel layout — groundwork for the gather-free stencil solver.

The flat-table solver pays one scattered memory access per stencil tap inside
every PCG matvec (see BENCH_NOTES.md). This module provides the dense-block
alternative the architecture plans for (ARCHITECTURE.md, SURVEY §7.1): voxels
partitioned into B³ blocks, fields stored as `[nb, B, B, B]` arrays, and a
precomputed **halo expansion** `[nb, B+lo+hi, ...]` whose interior is a pure
reshape and whose shell is one structured gather — after which every fixed
stencil offset is a shifted dense slice, not a gather.

Round-1 usage: the E_r Laplacian and stencil neighborhood ops are implemented
and verified equivalent to the gather-table forms; the round-2 plan moves the
E_g/E_r/E_a tangent chains of the GN matvec onto this layout.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid, pack_coords


@dataclasses.dataclass
class BlockLayout:
    """Mapping between a sorted voxel table and dense B³ blocks."""

    block: int  # B, block edge length
    lo: int  # halo cells before the block on each axis
    hi: int  # halo cells after
    block_coords: np.ndarray  # [nb, 3] block grid coords
    block_keys: np.ndarray  # [nb] sorted packed block keys
    vox_slot: np.ndarray  # [N] flat index into [nb * B³] for each table voxel
    occupied: np.ndarray  # [nb * B³] bool — slot holds a table voxel
    halo_src: np.ndarray  # [nb, W, W, W] int32 into [nb * B³], −1 absent
    dense_to_vox: np.ndarray  # [nb * B³] int32 table index per slot (−1 empty)
    nbr27: np.ndarray  # [nb, 27] neighbor block row per 3³ direction; nb = absent

    @property
    def num_blocks(self) -> int:
        return len(self.block_coords)

    @property
    def window(self) -> int:
        return self.block + self.lo + self.hi

    @classmethod
    def build(
        cls,
        grid: VoxelGrid,
        block: int = 8,
        lo: int = 1,
        hi: int = 2,
        blocks_multiple: int = 8,
        halo_table: bool = True,
    ) -> "BlockLayout":
        """Partition the grid's voxels into blocks and precompute the halo
        gather plan (margins sized for the E_g stencil: −1 … +2).

        `blocks_multiple` pads the block count with empty, mutually
        non-adjacent blocks beyond the grid's corner so the block axis shards
        evenly over a device mesh (parallel/sharding.py).

        `halo_table=False` skips the per-cell `halo_src` gather table (nb·W³
        host lookups — the dominant build cost at large nb); consumers that
        only need the structured 27-direction exchange (`halo27`) don't pay
        for it."""
        B = block
        coords = grid.coords.astype(np.int64)
        bc = np.floor_divide(coords, B)
        bkeys = pack_coords(bc)
        ukeys = np.unique(bkeys)
        need = (-len(ukeys)) % max(blocks_multiple, 1)
        if need:
            mx = bc.max(axis=0)
            pads = np.stack(
                [
                    mx[0] + 2 + 2 * np.arange(need),
                    np.full(need, mx[1] + 2),
                    np.full(need, mx[2] + 2),
                ],
                axis=-1,
            )
            ukeys = np.sort(np.concatenate([ukeys, pack_coords(pads)]))
        binv = np.searchsorted(ukeys, bkeys)
        nb = len(ukeys)
        from intrinsic3d_tpu.grid.voxel_grid import unpack_keys

        block_coords = unpack_keys(ukeys)

        lc = coords - bc * B  # [N,3] in [0,B)
        slot = (lc[:, 0] * B + lc[:, 1]) * B + lc[:, 2]
        vox_slot = (binv * (B**3) + slot).astype(np.int64)

        occupied = np.zeros(nb * B**3, bool)
        occupied[vox_slot] = True
        dense_to_vox = np.full(nb * B**3, -1, np.int32)
        dense_to_vox[vox_slot] = np.arange(len(coords), dtype=np.int32)

        # halo plan: for each block, every window position → owning slot
        W = B + lo + hi
        if halo_table:
            r = np.arange(-lo, B + hi)
            gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")  # [W,W,W]
            offs = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # [W³,3]
            # absolute voxel coords of every window cell of every block
            abs_coords = (
                block_coords[:, None, :] * B + offs[None, :, :]
            )  # [nb, W³, 3]
            owner_bc = np.floor_divide(abs_coords, B)
            owner_keys = pack_coords(owner_bc.reshape(-1, 3))
            pos = np.searchsorted(ukeys, owner_keys)
            pos_c = np.clip(pos, 0, nb - 1)
            hit = (pos < nb) & (ukeys[pos_c] == owner_keys)
            owner_id = np.where(hit, pos_c, -1)
            olc = abs_coords.reshape(-1, 3) - owner_bc.reshape(-1, 3) * B
            oslot = (olc[:, 0] * B + olc[:, 1]) * B + olc[:, 2]
            flat = np.where(owner_id >= 0, owner_id * (B**3) + oslot, -1)
            # absent blocks → −1; present-but-empty slots stay (masking uses occupancy)
            halo_src = flat.reshape(nb, W, W, W).astype(np.int64)
        else:
            halo_src = None

        # 27-direction block adjacency: one row per (block, 3³ direction) → the
        # neighbor's row, or `nb` (the zero pad block) when absent. This is the
        # whole "halo exchange plan": filling halos becomes 27 structured
        # block-row gathers instead of per-cell gathers.
        d = np.arange(-1, 2)
        ddx, ddy, ddz = np.meshgrid(d, d, d, indexing="ij")
        dirs = np.stack([ddx, ddy, ddz], axis=-1).reshape(-1, 3)  # [27, 3]
        nbr_bc = block_coords[:, None, :] + dirs[None, :, :]  # [nb, 27, 3]
        nbr_keys = pack_coords(nbr_bc.reshape(-1, 3))
        npos = np.searchsorted(ukeys, nbr_keys)
        npos_c = np.clip(npos, 0, nb - 1)
        nhit = (npos < nb) & (ukeys[npos_c] == nbr_keys)
        nbr27 = np.where(nhit, npos_c, nb).reshape(nb, 27).astype(np.int32)

        return cls(
            block=B,
            lo=lo,
            hi=hi,
            block_coords=block_coords,
            block_keys=ukeys,
            vox_slot=vox_slot,
            occupied=occupied,
            halo_src=halo_src,
            dense_to_vox=dense_to_vox,
            nbr27=nbr27,
        )

    def slots_of(self, coords: np.ndarray) -> np.ndarray:
        """Flat slot index into `[nb * B³]` for voxel coords `[..., 3]`
        (−1 where the owning block is absent)."""
        B = self.block
        shape = coords.shape[:-1]
        c = np.asarray(coords, np.int64).reshape(-1, 3)
        bc = np.floor_divide(c, B)
        keys = pack_coords(bc)
        pos = np.searchsorted(self.block_keys, keys)
        pos_c = np.clip(pos, 0, self.num_blocks - 1)
        hit = (pos < self.num_blocks) & (self.block_keys[pos_c] == keys)
        lc = c - bc * B
        slot = (lc[:, 0] * B + lc[:, 1]) * B + lc[:, 2]
        out = np.where(hit, pos_c * (B**3) + slot, -1)
        return out.reshape(shape).astype(np.int64)

    # -- field transport ---------------------------------------------------

    def to_dense(self, field) -> jnp.ndarray:
        """[N] table field → [nb, B, B, B] dense blocks (empty slots 0)."""
        B = self.block
        out = jnp.zeros(self.num_blocks * B**3, jnp.asarray(field).dtype)
        out = out.at[jnp.asarray(self.vox_slot)].set(jnp.asarray(field))
        return out.reshape(self.num_blocks, B, B, B)

    def from_dense(self, dense) -> jnp.ndarray:
        """[nb, B, B, B] → [N] table order."""
        return dense.reshape(-1)[jnp.asarray(self.vox_slot)]

    def halo(self, dense, fill=0.0) -> jnp.ndarray:
        """[nb, B, B, B] → [nb, W, W, W] halo-expanded windows.

        One structured gather; after it every stencil offset is a static
        shifted slice via `shifted`."""
        flat = dense.reshape(-1)
        src = jnp.asarray(self.halo_src)
        vals = flat[jnp.maximum(src, 0)]
        return jnp.where(src >= 0, vals, fill)

    def shifted(self, halo_arr, offset: Tuple[int, int, int]) -> jnp.ndarray:
        """Dense view of field at `voxel + offset` for every block voxel:
        `[nb, B, B, B]` slice of the halo windows."""
        B = self.block
        ox, oy, oz = (o + self.lo for o in offset)
        return halo_arr[:, ox : ox + B, oy : oy + B, oz : oz + B]

    def occupancy_dense(self) -> jnp.ndarray:
        return jnp.asarray(self.occupied.reshape(self.num_blocks, self.block, self.block, self.block))


def _halo_rng(d: int, B: int, lo: int, hi: int):
    """(src, dst) slices along one axis for block-neighbor direction d."""
    if d == -1:
        return slice(B - lo, B), slice(0, lo)
    if d == 0:
        return slice(0, B), slice(lo, lo + B)
    return slice(0, hi), slice(lo + B, lo + B + hi)


def halo27(field_pad: jnp.ndarray, nbr27: jnp.ndarray, lo: int = 1, hi: int = 2) -> jnp.ndarray:
    """Structured halo expansion `[nb+1, B,B,B] → [nb, W,W,W]`.

    `field_pad` carries one trailing all-zero pad block that absent neighbors
    point at. 27 block-row gathers (one per direction) + static region copies —
    and, crucially, XLA transposes this to the mirror-image 27 block-row
    scatter-adds inside `linear_transpose`/vjp, so the GN matvec inherits the
    structured (gather-row-cheap) form automatically."""
    nb = nbr27.shape[0]
    B = field_pad.shape[-1]
    W = lo + B + hi
    out = jnp.zeros((nb, W, W, W), field_pad.dtype)
    d = 0
    for dx in (-1, 0, 1):
        sx, tx = _halo_rng(dx, B, lo, hi)
        for dy in (-1, 0, 1):
            sy, ty = _halo_rng(dy, B, lo, hi)
            for dz in (-1, 0, 1):
                sz, tz = _halo_rng(dz, B, lo, hi)
                if (dx, dy, dz) == (0, 0, 0):
                    blk = field_pad[:-1]
                else:
                    if min(sx.stop - sx.start, sy.stop - sy.start, sz.stop - sz.start) == 0:
                        d += 1
                        continue
                    blk = field_pad[nbr27[:, d]]
                out = out.at[:, tx, ty, tz].set(blk[:, sx, sy, sz])
                d += 1
    return out


def shifted27(halo_arr: jnp.ndarray, offset, B: int, lo: int = 1) -> jnp.ndarray:
    """`[nb, B,B,B]` view of a halo expansion at `voxel + offset` (static)."""
    ox, oy, oz = (int(o) + lo for o in offset)
    return halo_arr[:, ox : ox + B, oy : oy + B, oz : oz + B]


def pad_block(field: jnp.ndarray) -> jnp.ndarray:
    """Append the all-zero pad block: `[nb, B,B,B] → [nb+1, B,B,B]`."""
    return jnp.concatenate([field, jnp.zeros_like(field[:1])], axis=0)


# ---------------------------------------------------------------------------
# Flat [nb, B³] layout with MXU one-hot stencil shifts
# ---------------------------------------------------------------------------
#
# The 4D [nb, B, B, B] layout pads its last dim B=8 to the TPU's 128-lane tile
# — 16x physical bytes on every halo/shift intermediate (measured: PCG loop
# 1.2s -> 3.4s, BENCH_NOTES.md). The production layout flattens each block to
# B³ = 512 lanes (4 exact (8,128) f32 tiles, zero padding waste) and realizes
# every stencil shift as
#
#     shifted_o(f)[n, l] = Σ_c  f[nbr_c[n]] @ T_{o,c}        (one-hot matmuls)
#
# where c ranges over the ≤8 block-corner directions offset o can cross,
# `f[nbr_c]` is a block-row gather along the MAJOR dim (contiguous 2KB rows),
# and T_{o,c} is a static 0/1 [512, 512] lane-permutation matrix: the MXU does
# the lane gathering. Each output lane receives exactly one input (or zero),
# so the matmul is numerically EXACT at any precision. `jax.linear_transpose`
# of this chain is `cot @ T.T` + block-row scatter-add — equally structured,
# so the GN matvec inherits the gather-free form automatically.


@dataclasses.dataclass
class ShiftPlan:
    """Static plan applying a set of stencil offsets to `[nb+1, B³]` fields
    (trailing all-zero pad row absorbs absent neighbors)."""

    offsets: np.ndarray  # [T, 3]
    dir_vecs: np.ndarray  # [D, 3] unique block directions used
    nbr: np.ndarray  # [D, nb] neighbor block row per direction (nb = pad row)
    term_mats: Tuple  # D × [B³, k_d·B³] jnp.float32 — concatenated one-hots
    term_offs: Tuple  # D × tuple(offset index per 512-col group)
    block: int

    def apply(self, field_pad: jnp.ndarray) -> jnp.ndarray:
        """`[nb+1, B³]` → `[T, nb, B³]` shifted fields (absent neighbors 0)."""
        s = self.block**3
        nb = field_pad.shape[0] - 1
        out = [None] * len(self.offsets)
        for d in range(len(self.dir_vecs)):
            if tuple(self.dir_vecs[d]) == (0, 0, 0):
                rows = field_pad[:-1]
            else:
                rows = field_pad[jnp.asarray(self.nbr[d])]
            prod = jnp.dot(rows, self.term_mats[d], preferred_element_type=jnp.float32)
            for g, t in enumerate(self.term_offs[d]):
                sl = prod[:, g * s : (g + 1) * s]
                out[t] = sl if out[t] is None else out[t] + sl
        return jnp.stack(out)

    def apply_transpose(self, cot: jnp.ndarray) -> jnp.ndarray:
        """Exact adjoint of `apply`: `[T, nb, B³]` cotangents → `[nb+1, B³]`.

        Per direction: contract with the SAME one-hot matrix on its other side
        (no transposed copy is ever materialized — `dot_general` swaps the
        contracting dims) and block-row scatter-add along the major dim
        (injective per direction; absent neighbors land on the pad row)."""
        s = self.block**3
        nb = cot.shape[1]
        out = jnp.zeros((nb + 1, s), cot.dtype)
        for d in range(len(self.dir_vecs)):
            pc = jnp.concatenate([cot[t] for t in self.term_offs[d]], axis=-1)
            rows_ct = jax.lax.dot_general(
                pc,
                self.term_mats[d],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if tuple(self.dir_vecs[d]) == (0, 0, 0):
                out = out.at[:-1].add(rows_ct)
            else:
                out = out.at[jnp.asarray(self.nbr[d])].add(rows_ct)
        return out

    def index(self, offset) -> int:
        o = np.asarray(offset)
        hit = np.flatnonzero(np.all(self.offsets == o, axis=-1))
        if len(hit) != 1:
            raise KeyError(f"offset {tuple(o)} not in plan")
        return int(hit[0])


def _shift_plan_flatten(p: "ShiftPlan"):
    children = (p.nbr, p.term_mats)
    aux = (
        tuple(map(tuple, np.asarray(p.offsets).tolist())),
        tuple(map(tuple, np.asarray(p.dir_vecs).tolist())),
        p.term_offs,
        p.block,
    )
    return children, aux


def _shift_plan_unflatten(aux, children):
    offsets, dir_vecs, term_offs, block = aux
    nbr, term_mats = children
    return ShiftPlan(
        offsets=np.asarray(offsets),
        dir_vecs=np.asarray(dir_vecs),
        nbr=nbr,
        term_mats=term_mats,
        term_offs=term_offs,
        block=block,
    )


jax.tree_util.register_pytree_node(
    ShiftPlan, _shift_plan_flatten, _shift_plan_unflatten
)


def build_shift_plan(layout: BlockLayout, offsets) -> ShiftPlan:
    """Precompute the one-hot decomposition of `offsets` on `layout`."""
    B = layout.block
    s = B**3
    offsets = np.asarray(offsets, np.int64).reshape(-1, 3)
    r = np.arange(B)
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    cells = np.stack([gx, gy, gz], -1).reshape(-1, 3)  # [B³,3] flat-order locals

    # group (offset, corner-direction) terms by direction
    terms = {}  # dir tuple -> list of (offset_idx, mat)
    for t, o in enumerate(offsets):
        tgt = cells + o  # [B³,3]
        c = np.floor_divide(tgt, B)  # corner direction per cell
        lt = tgt - c * B
        for cd in np.unique(c, axis=0):
            m = np.all(c == cd, axis=-1)
            mat = np.zeros((s, s), np.float32)
            src = (lt[m, 0] * B + lt[m, 1]) * B + lt[m, 2]
            dst = (cells[m, 0] * B + cells[m, 1]) * B + cells[m, 2]
            mat[src, dst] = 1.0
            terms.setdefault(tuple(cd), []).append((t, mat))

    dir_vecs, nbr_rows, term_mats, term_offs = [], [], [], []
    for cd, lst in sorted(terms.items()):
        dir_vecs.append(cd)
        d_idx = (cd[0] + 1) * 9 + (cd[1] + 1) * 3 + (cd[2] + 1)
        nbr_rows.append(layout.nbr27[:, d_idx])
        term_mats.append(jnp.asarray(np.concatenate([m for _, m in lst], axis=1)))
        term_offs.append(tuple(t for t, _ in lst))

    return ShiftPlan(
        offsets=offsets,
        dir_vecs=np.asarray(dir_vecs),
        nbr=np.asarray(nbr_rows),
        term_mats=tuple(term_mats),
        term_offs=tuple(term_offs),
        block=B,
    )


def pad_flat(field: jnp.ndarray) -> jnp.ndarray:
    """Append the all-zero pad row: `[nb, B³] → [nb+1, B³]`."""
    return jnp.concatenate([field, jnp.zeros_like(field[:1])], axis=0)


def block_laplacian(layout: BlockLayout, sdf_table) -> jnp.ndarray:
    """E_r Laplacian for every table voxel via halo slices (gather-free in the
    stencil): equivalent to grid/ops.py::laplacian with absent neighbors
    contributing the center value."""
    d = layout.to_dense(sdf_table)
    vd = layout.occupancy_dense().astype(jnp.float32)
    h = layout.halo(d)
    vh = layout.halo(vd)
    center = layout.shifted(h, (0, 0, 0))
    acc = -6.0 * center
    for off in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
        nb = layout.shifted(h, off)
        present = layout.shifted(vh, off)
        acc = acc + jnp.where(present > 0.0, nb, center)
    return layout.from_dense(acc)
