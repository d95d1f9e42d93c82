"""Multi-host-capable device staging (VERDICT r4 item 2).

Every sharded staging path used to build a FULL global numpy array and
`jax.device_put` it with a `NamedSharding` — valid only when one process
addresses all devices. Under `jax.distributed` (multi-host: SURVEY §5.8
"sharded across hosts/chips … over ICI/DCN"; BASELINE north star 3) a
process can place data only on its OWN devices, so staging must construct
per-device shards locally and assemble the global `jax.Array` with
`jax.make_array_from_single_device_arrays`.

This module is that one pattern, shared by every staging site
(`parallel/spmd_stages.py`, `parallel/spmd.py::SpmdLevel`,
`refine/mesh_pipeline.py`, `grid/fusion.py::FusionVolume`):

- `stage_rows(mesh, spec, shape, dtype, build_rows, shard_dim)` — each
  ADDRESSABLE device's index range along the sharded dim is materialized by
  the `build_rows(lo, hi)` callback and placed directly on that device;
  nothing is ever built for (or sent to) another host's devices.
- `stage_sliced(mesh, spec, array, shard_dim)` — convenience wrapper
  slicing a host array (each process may hold the full host-side numpy
  table — shared-nothing duplication of HOST memory is the standard
  single-dataset pattern; the DEVICE placement is what must stay local).
- `stage_replicated(mesh, array)` — one host copy placed on every
  addressable device.

On a single-process mesh these produce exactly the arrays the old
`device_put(full, NamedSharding)` staging produced (same sharding, same
values) — pinned by tests/test_staging.py, which also runs the real
2-process `jax.distributed` dryrun via tools/dryrun_multiprocess.py.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def to_host_global(arr) -> np.ndarray:
    """The inverse of the staging helpers: a sharded `jax.Array` → a FULL
    host numpy copy on every process. Single-process this is `np.asarray`;
    under multi-process `jax.distributed` (where `np.asarray` of a
    non-fully-addressable array raises) it allgathers the remote shards
    (`multihost_utils.process_allgather`) so the grid-level-boundary host
    stages (×2 upsample, thin-shell sparsify, callbacks — ``SURVEY §5.8``)
    can run shared-nothing-redundantly on each host."""
    try:
        return np.asarray(arr)
    except Exception:
        # non-fully-addressable: reshard to replicated (one all_gather over
        # the mesh — every process reaches this point at the same program
        # position, so the collective matches) and read the local copy
        mesh = arr.sharding.mesh
        rep = jax.jit(
            lambda x: x, out_shardings=NamedSharding(mesh, P())
        )(arr)
        return np.asarray(rep)


def stage_rows(
    mesh: Mesh,
    spec: P,
    shape: Sequence[int],
    dtype,
    build_rows: Callable[[int, int], np.ndarray],
    shard_dim: int = 0,
) -> jax.Array:
    """Assemble a sharded array from process-local row construction.

    ``build_rows(lo, hi)`` must return the global rows ``[lo:hi)`` along
    ``shard_dim`` (all other dims full). It is called once per addressable
    device with that device's index range; ranges owned by other processes'
    devices are never materialized. Repeated ranges (e.g. a dim replicated
    across a second mesh axis) are built once and reused.
    """
    shape = tuple(int(v) for v in shape)
    sharding = NamedSharding(mesh, spec)
    cache: dict = {}
    arrays = []
    devices = []
    for dev, idx in sharding.addressable_devices_indices_map(shape).items():
        sl = idx[shard_dim]
        lo = 0 if sl.start is None else int(sl.start)
        hi = shape[shard_dim] if sl.stop is None else int(sl.stop)
        key = (lo, hi)
        if key not in cache:
            rows = np.ascontiguousarray(np.asarray(build_rows(lo, hi), dtype))
            want = shape[:shard_dim] + (hi - lo,) + shape[shard_dim + 1 :]
            if rows.shape != want:
                raise ValueError(
                    f"build_rows({lo}, {hi}) returned {rows.shape}, expected {want}"
                )
            cache[key] = rows
        arrays.append(jax.device_put(cache[key], dev))
        devices.append(dev)
    return jax.make_array_from_single_device_arrays(shape, sharding, arrays)


def stage_sliced(mesh: Mesh, spec: P, array, shard_dim: int = 0) -> jax.Array:
    """`stage_rows` for a host array already materialized in full: each
    addressable device receives its slice along `shard_dim`."""
    arr = np.asarray(array)

    def build(lo, hi):
        return np.take(arr, np.arange(lo, hi), axis=shard_dim)

    return stage_rows(mesh, spec, arr.shape, arr.dtype, build, shard_dim)


def stage_replicated(mesh: Mesh, array) -> jax.Array:
    """Fully-replicated staging: the host value placed on every addressable
    device (multi-process: every process must pass the same value)."""
    arr = np.asarray(array)
    sharding = NamedSharding(mesh, P())
    arrays = [
        jax.device_put(arr, dev)
        for dev in sharding.addressable_devices_indices_map(arr.shape)
    ]
    return jax.make_array_from_single_device_arrays(arr.shape, sharding, arrays)


def stage_table_rows(
    mesh: Mesh,
    spec: P,
    layout,
    vals,
    dtype=np.float32,
    fill=0.0,
    shard_dim: int = 0,
    trailing: Sequence[int] = (),
) -> jax.Array:
    """Stage a voxel-TABLE field `[N(, C...)]` into brick-sharded block-dense
    form `[nb, B³(, C...)]` (the `layout.vox_slot` scatter), building only
    each addressable device's block rows. The multi-host twin of the old
    `densify + device_put` staging."""
    s = layout.block**3
    nb = layout.num_blocks
    slot = layout.vox_slot
    vals = np.asarray(vals)
    shape = (nb, s) + tuple(trailing)

    def build(lo, hi):
        out = np.full(((hi - lo) * s,) + tuple(trailing), fill, dtype)
        sel = (slot >= lo * s) & (slot < hi * s)
        out[slot[sel] - lo * s] = vals[sel].astype(dtype)
        return out.reshape((hi - lo, s) + tuple(trailing))

    return stage_rows(mesh, spec, shape, dtype, build, shard_dim)
