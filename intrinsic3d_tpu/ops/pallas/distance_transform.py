"""Pallas TPU kernel: iteration-fused SDF distance-transform sweeps.

The reference's ``SDFAlgorithms::correctSDF`` (``libintrinsic3d/src/sdf/
algorithms.cpp:260-339``) runs up to 10 serial sweeps pulling every voxel's
SDF toward the best neighbor distance. The table-based device version
(grid/algorithms.py) gathers a 26-neighborhood per voxel per sweep — 26·N
scattered reads × 10 iterations of HBM traffic.

This kernel runs on a dense voxel window instead and **fuses all sweeps in
VMEM**: the (X, Y) plane is tiled; each program DMAs its tile plus an
`halo ≥ iters` margin (information travels one voxel per Jacobi sweep in the
26-neighborhood/Chebyshev metric, so an `iters`-deep halo makes the interior
exactly equal to the global iteration) across the full Z extent, runs all
sweeps as shifted-slice min-propagation entirely in VMEM, and writes the
interior back — one HBM read + one write total instead of 2×iters.

TPU layout: blocks are (tile, tile, Z) with Z as the lane dimension — the
last block dim equals the full array dim, the second-to-last is a multiple
of 8, satisfying the Mosaic tiling constraints. Callers should orient the
volume so Z is a modest axis (the dense wrapper in grid/algorithms.py picks
the smallest extent).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 26-neighborhood offsets and Euclidean step lengths
_OFFS = np.array(
    [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
        if (dx, dy, dz) != (0, 0, 0)
    ],
    np.int32,
)
_DIST = np.linalg.norm(_OFFS.astype(np.float64), axis=-1).astype(np.float32)


def _sweep(sdf, weight, voxel_size):
    """One Jacobi sweep over the whole VMEM window (mirrors the update rule of
    grid/algorithms.py::_correct_sdf_device). Entries near the window's x/y
    edges go stale by one voxel per sweep — covered by the halo margin."""
    wx, wy, wz = sdf.shape
    # float 0/1 masks throughout — Mosaic's vector lanes handle f32 selects
    # more robustly than packed i1 vectors
    valid = jnp.where(weight > 0.0, 1.0, 0.0)
    sgn = jnp.where(sdf >= 0.0, 1.0, -1.0)
    best_abs = jnp.abs(sdf)
    best_val = sdf
    updated = jnp.zeros_like(sdf)
    sdf_p = jnp.pad(sdf, 1)
    valid_p = jnp.pad(valid, 1)
    for k in range(26):
        dx, dy, dz = (int(v) + 1 for v in _OFFS[k])  # shift into 0..2
        nb_sdf = sdf_p[dx : dx + wx, dy : dy + wy, dz : dz + wz]
        nb_valid = valid_p[dx : dx + wx, dy : dy + wy, dz : dz + wz]
        sgn_nb = jnp.where(nb_sdf >= 0.0, 1.0, -1.0)
        cand = nb_sdf + sgn_nb * (_DIST[k] * voxel_size)
        improving = (
            nb_valid
            * valid
            * jnp.where(sgn_nb == sgn, 1.0, 0.0)
            * jnp.where(jnp.abs(cand) < best_abs, 1.0, 0.0)
        )
        best_val = improving * cand + (1.0 - improving) * best_val
        best_abs = improving * jnp.abs(cand) + (1.0 - improving) * best_abs
        updated = jnp.maximum(updated, improving)
    return best_val, updated * 1.0 + (1.0 - updated) * weight


def correct_sdf_dense(
    sdf: jnp.ndarray,
    weight: jnp.ndarray,
    voxel_size: float,
    tile: int = 8,
    iters: int = 10,
    interpret: bool = False,
    iters_per_call: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distance-transform correction on a dense grid of any shape.

    Sweeps are chunked into `iters_per_call` fused passes to bound the VMEM
    working set of the unrolled 26-offset update; volumes with a large last
    axis are processed in 128-lane z-slabs (interior 128 − 2·iters_per_call,
    halo iters_per_call) that are re-stitched between chunks, so the result
    equals the global Jacobi iteration exactly."""
    Z = sdf.shape[2]
    done = 0
    while done < iters:
        k = min(iters_per_call, iters - done)
        if Z <= 128:
            sdf, weight = _correct_chunk(sdf, weight, voxel_size, tile, k, interpret)
        else:
            sdf, weight = _slabbed_chunk(sdf, weight, voxel_size, tile, k, interpret)
        done += k
    return sdf, weight


def _slabbed_chunk(sdf, weight, voxel_size, tile, k, interpret):
    """One k-sweep pass over a Z>128 volume via overlapping 128-lane slabs."""
    Z = sdf.shape[2]
    interior = 128 - 2 * k
    out_s = []
    out_w = []
    z0 = 0
    while z0 < Z:
        lo = max(z0 - k, 0)
        hi = min(z0 + interior + k, Z)
        s_win = sdf[:, :, lo:hi]
        w_win = weight[:, :, lo:hi]
        # pad the z-window to exactly 128 lanes (zeros = invalid)
        pz = 128 - (hi - lo)
        if pz:
            s_win = jnp.pad(s_win, ((0, 0), (0, 0), (0, pz)))
            w_win = jnp.pad(w_win, ((0, 0), (0, 0), (0, pz)))
        s2, w2 = _correct_chunk(s_win, w_win, voxel_size, tile, k, interpret)
        a = z0 - lo  # interior start inside the window
        b = min(z0 + interior, Z) - lo
        out_s.append(s2[:, :, a:b])
        out_w.append(w2[:, :, a:b])
        z0 += interior
    return jnp.concatenate(out_s, axis=2), jnp.concatenate(out_w, axis=2)


@functools.partial(jax.jit, static_argnames=("voxel_size", "tile", "iters", "interpret"))
def _correct_chunk(
    sdf: jnp.ndarray,  # [X, Y, Z] f32
    weight: jnp.ndarray,  # [X, Y, Z] f32 (0 = absent/unseen)
    voxel_size: float,
    tile: int,
    iters: int,
    interpret: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # halo ≥ iters, and window = tile + 2·halo must be a multiple of 8
    halo = -((-iters) // 4) * 4
    while (tile + 2 * halo) % 8:
        halo += 1
    win = tile + 2 * halo

    X, Y, Z = sdf.shape
    gx, gy = pl.cdiv(X, tile), pl.cdiv(Y, tile)
    px, py = gx * tile, gy * tile
    zp = -((-Z) // 128) * 128  # lane dim must be 128-aligned for the DMA slices
    pad = ((halo, px - X + halo), (halo, py - Y + halo), (0, zp - Z))
    sdf_p = jnp.pad(sdf, pad)
    weight_p = jnp.pad(weight, pad)

    def kernel(sdf_hbm, w_hbm, out_s, out_w, scratch_s, scratch_w, sem_s, sem_w):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp_s = pltpu.make_async_copy(
            sdf_hbm.at[pl.ds(i * tile, win), pl.ds(j * tile, win), :], scratch_s, sem_s
        )
        cp_w = pltpu.make_async_copy(
            w_hbm.at[pl.ds(i * tile, win), pl.ds(j * tile, win), :], scratch_w, sem_w
        )
        cp_s.start()
        cp_w.start()
        cp_s.wait()
        cp_w.wait()
        def body(_, sw):
            return _sweep(sw[0], sw[1], voxel_size)

        s, w = jax.lax.fori_loop(0, iters, body, (scratch_s[...], scratch_w[...]))
        out_s[...] = s[halo : halo + tile, halo : halo + tile, :]
        out_w[...] = w[halo : halo + tile, halo : halo + tile, :]

    out_sdf, out_w = pl.pallas_call(
        kernel,
        grid=(gx, gy),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile, zp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile, zp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((px, py, zp), jnp.float32),
            jax.ShapeDtypeStruct((px, py, zp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((win, win, zp), jnp.float32),
            pltpu.VMEM((win, win, zp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sdf_p, weight_p)
    return out_sdf[:X, :Y, :Z], out_w[:X, :Y, :Z]
