"""Multi-chip sharding of the refinement problem.

The reference is a single-process CPU program (SURVEY §2.3); scaling is a
design obligation of this framework. The scheme (the scaling-book recipe:
pick a mesh, annotate shardings, let XLA insert the collectives):

- 1-D device mesh with a ``data`` axis.
- **Residual elements are sharded** along their leading axis: E_g
  (voxel×observation) rows, E_r/E_s voxel rows, E_a pairs. Each device
  evaluates its residual slice and the corresponding Jacobian slice.
- **Parameters are replicated** (per-voxel SDF/albedo plus the small globals).
  The transposed scatter-adds of Jᵀr / JᵀJv then produce partial sums that
  XLA all-reduces over ``data`` — the moral equivalent of the per-block
  JtJ/Jtr + psum reduction design in BASELINE.json. Keyframe images are
  replicated (read-only gathers).

Because `gn_iteration` is a plain jit function, sharding is purely a matter of
placing its inputs: XLA's SPMD partitioner propagates the placements through
linearize/transpose/while_loop and inserts psums where the element axis
contracts away. Voxel-block spatial sharding with halo exchange is the planned
refinement for scenes whose parameter arrays outgrow replication.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from intrinsic3d_tpu.refine.residuals import Assembly, Params
from intrinsic3d_tpu.refine.solver import Masks


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        # fall back to the (possibly force-multiplied) host CPU devices — the
        # driver validates multi-chip sharding on a virtual CPU mesh while the
        # default platform may still be the single attached TPU
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= n:
            devs = cpu
        else:
            raise RuntimeError(f"requested {n} devices, only {len(devs)} available")
    return Mesh(np.array(devs[:n]), (axis,))


def _pad_to(x, mult: int, fill=0):
    n = x.shape[0]
    rem = (-n) % mult
    if rem == 0:
        return x
    pad = np.full((rem,) + x.shape[1:], fill, dtype=np.asarray(x).dtype)
    return np.concatenate([np.asarray(x), pad], axis=0)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_assembly(asm: Assembly, mesh: Mesh, axis: str = "data") -> Assembly:
    """Pad each element axis to the mesh size and place it sharded; everything
    else replicated. Padded rows carry weight 0 and index 0 — exact no-ops."""
    n = mesh.devices.size
    row = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def srow(x, fill=0):
        return jax.device_put(np.asarray(_pad_to(np.asarray(x), n, fill)), row)

    return Assembly(
        eg_sdf10_idx=srow(asm.eg_sdf10_idx),
        eg_alb4_idx=srow(asm.eg_alb4_idx),
        eg_frame=srow(asm.eg_frame),
        eg_onehot=srow(asm.eg_onehot, 0.0),
        eg_w=srow(asm.eg_w, 0.0),
        eg_sh=srow(asm.eg_sh, 0.0),
        eg_vpos=srow(asm.eg_vpos),
        er_idx=srow(asm.er_idx),
        er_w=srow(asm.er_w, 0.0),
        es_idx=srow(asm.es_idx),
        es_ref=srow(asm.es_ref, 0.0),
        es_w=srow(asm.es_w, 0.0),
        ea_pairs=srow(asm.ea_pairs),
        ea_w=srow(asm.ea_w, 0.0),
        lam=jax.device_put(asm.lam, rep),
        images=jax.device_put(asm.images, rep),
        pyr_scale=jax.device_put(asm.pyr_scale, rep),
        voxel_size=jax.device_put(asm.voxel_size, rep),
    )


def shard_problem(
    params: Params, asm: Assembly, masks: Masks, mesh: Mesh
) -> Tuple[Params, Assembly, Masks]:
    """Placement for one multi-chip GN iteration: replicated parameters/masks,
    element-sharded assembly."""
    return replicate(params, mesh), shard_assembly(asm, mesh), replicate(masks, mesh)


# ---------------------------------------------------------------------------
# Block-dense (production) layout
# ---------------------------------------------------------------------------


def shard_block_problem(bparams, basm, bmasks, mesh: Mesh, axis: str = "data"):
    """Placement for the flat block-dense problem (refine/blockform.py):

    - the dense frame-major (keyframe, slot) E_g element fields shard along their slot axis;
    - the dense per-slot weight/anchor fields shard along the block axis;
    - parameters, masks, shift-plan tables and one-hot matrices replicate —
      the apply/apply_transpose matmuls then run on local block rows and the
      transposed scatter-adds produce partials that XLA psums over ``axis``.

    Spatial block sharding with halo RDMA (each device owning a contiguous
    brick of blocks) is the planned refinement once parameter arrays outgrow
    replication; this placement already exercises the full multi-chip
    lowering of the production solver."""
    from intrinsic3d_tpu.refine.blockform import BlockAssembly

    row = NamedSharding(mesh, P(axis))
    row1 = NamedSharding(mesh, P(None, axis))
    mid = NamedSharding(mesh, P(None, axis, None))
    rep = NamedSharding(mesh, P())

    def put(x, sh):
        return jax.device_put(x, sh)

    basm_s = basm._replace(
        eg_w=put(basm.eg_w, mid),
        eg_sh=put(basm.eg_sh, row1),
        eg_vpos=put(basm.eg_vpos, row1),
        # frame buckets replicate (block-row index table, small); the bucketed
        # element fields still shard along their slot axis
        bmap=None if basm.bmap is None else put(basm.bmap, rep),
        sdf_plan=jax.tree_util.tree_map(lambda x: put(x, rep), basm.sdf_plan),
        alb_plan=jax.tree_util.tree_map(lambda x: put(x, rep), basm.alb_plan),
        er_w=put(basm.er_w, row),
        es_ref=put(basm.es_ref, row),
        es_w=put(basm.es_w, row),
        ea_w=put(basm.ea_w, mid),
        lam=put(basm.lam, rep),
        images=put(basm.images, rep),
        pyr_scale=put(basm.pyr_scale, rep),
        voxel_size=put(basm.voxel_size, rep),
    )
    return replicate(bparams, mesh), basm_s, replicate(bmasks, mesh)
