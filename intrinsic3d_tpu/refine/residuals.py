"""Residual functions of the joint refinement energy.

The four cost terms of the reference (E = λ_g·E_g + λ_r·E_r + λ_s·E_s + λ_a·E_a):

- **E_g** gradient-based shading cost (``include/nv/refinement/shading_cost.h:132-197``):
  per (voxel, observation) — 10-SDF/4-albedo forward-difference stencil → 4
  normals → 4 iso-surface points → angle-axis rigid transform → distorted
  projection → bicubic intensity sample → SH shading → ‖∇shading − ∇I‖.
- **E_r** volumetric Laplacian regularizer (``volumetric_regularizer.h:59-72``).
- **E_s** surface stabilization `sdf_refined − sdf_fused` (``surface_stab_regularizer.h:59-66``).
- **E_a** chromaticity-weighted pairwise albedo smoothness (``albedo_regularizer.h:59-66``).

Where the reference instantiates one Ceres autodiff functor per residual, here
each term is ONE batched jnp function over static-shape assembly arrays; the
solver differentiates them with `jvp`/`vjp` (exact matrix-free Gauss-Newton
products) and `jacfwd` (exact Jacobi preconditioner). Residuals are pre-scaled
by √(w·λ̃) so the total cost is ½‖r‖² — the Ceres ScaledLoss formulation
(``nls_solver.cpp:236-249``) expressed as plain least squares.

Invalid configurations (projection out of bounds, z ≤ 0) yield residual 0 with
zero gradient — exactly Ceres' `NV_INVALID_RESIDUAL` convention (``cost.h:45``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.grid.ops import compute_normal_from_sdf4
from intrinsic3d_tpu.lighting.sh import sh_basis
from intrinsic3d_tpu.mathutil import rotate_angle_axis


class Params(NamedTuple):
    """Optimizable parameters (the Ceres parameter blocks, flattened)."""

    sdf: jnp.ndarray  # [N] sdf_refined
    albedo: jnp.ndarray  # [N]
    poses: jnp.ndarray  # [K, 6] world→cam angle-axis + translation
    intr: jnp.ndarray  # [4] fx fy cx cy (full resolution)
    dist: jnp.ndarray  # [5] k1 k2 k3 p1 p2


class Assembly(NamedTuple):
    """Static per-outer-iteration problem data (rebuilt each relinearization,
    as the reference re-collects observations per iteration,
    ``optimizer.cpp:119-156``)."""

    # E_g — flattened (voxel, observation) elements
    eg_sdf10_idx: jnp.ndarray  # [M, 10] int32 into sdf (stencil order of the ref)
    eg_alb4_idx: jnp.ndarray  # [M, 4] int32 into albedo {v, +x, +y, +z}
    eg_frame: jnp.ndarray  # [M] int32 keyframe index
    eg_onehot: jnp.ndarray  # [M, K] f32 one-hot of eg_frame, or [M, 0] to disable
    eg_w: jnp.ndarray  # [M] observation·shell weight (0 = inactive)
    eg_sh: jnp.ndarray  # [M, 9] per-voxel interpolated SH coefficients
    eg_vpos: jnp.ndarray  # [M, 3] int32 voxel coords
    # E_r
    er_idx: jnp.ndarray  # [N, 7] int32 {center, +x, −x, +y, −y, +z, −z}
    er_w: jnp.ndarray  # [N]
    # E_s
    es_idx: jnp.ndarray  # [N] int32 voxel index of each anchor row
    es_ref: jnp.ndarray  # [N] fused sdf anchor
    es_w: jnp.ndarray  # [N]
    # E_a
    ea_pairs: jnp.ndarray  # [P, 2] int32 albedo index pairs
    ea_w: jnp.ndarray  # [P] chromaticity weights
    # normalized per-type weights λ̃ = λ/Σw × 1000 (``nls_solver.cpp:379-394``)
    lam: jnp.ndarray  # [4] for (E_g, E_r, E_s, E_a)
    # intensity images of the current pyramid level
    images: jnp.ndarray  # [K, H, W] float32
    pyr_scale: jnp.ndarray  # scalar 2^-level
    voxel_size: jnp.ndarray  # scalar


def _catmull_rom_w(t):
    t2 = t * t
    t3 = t2 * t
    return (
        -0.5 * t + t2 - 0.5 * t3,
        1.0 - 2.5 * t2 + 1.5 * t3,
        0.5 * t + 2.0 * t2 - 1.5 * t3,
        -0.5 * t2 + 0.5 * t3,
    )


def catrom_sample_frames(images, fid, x, y, active=None, frame_major=False):
    """Catmull-Rom bicubic sample of `images[fid]` at (x, y), batched over
    elements. Callers must guarantee x∈[1, W−2), y∈[1, H−2) (enforced via
    clipping + validity masks).

    Batched elements sample with ZERO gathers: the 4-row selection is a
    weighted one-hot matmul `[chunk, K·H] @ [K·H, W]` against the flattened
    image stack (the MXU does the row gathering; the one-hot is built
    in-register from iota compares), and the 4-tap column combine is an
    in-register one-hot contraction over the resulting row. Chunked with
    `lax.map` to bound the one-hot intermediate. Measured ~3x faster per
    linearization than 16 full-row `lax.gather`s per element (71M gather
    rows/s ceiling), and ~30x faster than per-element scalar taps.
    NOTE: do NOT express the patch fetch as a vmapped `dynamic_slice` — XLA
    lowers that to a serial per-element while-loop (measured 650 ms/pass;
    BENCH_NOTES.md).

    `active` (same batch shape as x/y, 0 = inactive) opts into the Pallas
    masked kernel (ops/pallas/bicubic.py): whole inactive chunks are skipped
    on the MXU and the backward pass is two analytic dots instead of a
    checkpoint replay. Reverse-mode only — leave `active=None` on paths that
    need `jax.linearize`/jvp.

    `frame_major=True` (requires `[K, ...]` batches whose leading index k
    samples only keyframe k, the block layout of refine/blockform.py; trailing
    batch dims are collapsed) additionally
    opts into the frame-WINDOWED kernel: each 512-element chunk fetches
    only ITS FRAME of the image stack from HBM instead of holding all
    K·H rows in VMEM — K× fewer row-select MACs and no K·H ceiling."""
    k, h, w = images.shape
    scalar = jnp.ndim(x) == 0
    x = jnp.clip(x, 1.0, w - 2.001)
    y = jnp.clip(y, 1.0, h - 2.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    tx = x - x0
    ty = y - y0
    wxs = _catmull_rom_w(tx)
    wys = _catmull_rom_w(ty)

    if scalar:
        acc = 0.0
        for j in range(4):
            row = 0.0
            for i in range(4):
                row = row + images[fid, y0 + (j - 1), x0 + (i - 1)] * wxs[i]
            acc = acc + row * wys[j]
        return acc

    shape = x0.shape
    m = int(np.prod(shape))
    if active is not None and frame_major and jnp.ndim(x) >= 2 and m >= 1024:
        from intrinsic3d_tpu.ops.pallas.bicubic import CHUNK, bicubic_sample_rows

        # collapse trailing batch dims: rows stay frame-uniform whether the
        # caller batches [K, D] or [K, kb, B³]
        x, y, fid, active = (a.reshape(a.shape[0], -1) for a in (x, y, fid, active))
        # pad the slot axis to a chunk multiple so no sampler chunk straddles
        # two keyframe rows (the windowed kernel's frame-uniformity contract)
        kk, d = x.shape
        dpad = (-d) % CHUNK

        def padded(a):
            return jnp.pad(a, ((0, 0), (0, dpad))) if dpad else a

        out = bicubic_sample_rows(
            images,
            padded(fid).reshape(-1).astype(jnp.int32),
            padded(x).reshape(-1),
            padded(y).reshape(-1),
            padded(active).reshape(-1).astype(jnp.float32),
        ).reshape(kk, d + dpad)
        out = out[:, :d] if dpad else out
        return out.reshape(shape)
    if active is not None and k * h <= 4096 and m >= 1024:
        from intrinsic3d_tpu.ops.pallas.bicubic import bicubic_sample

        out = bicubic_sample(
            images,
            fid.reshape(-1).astype(jnp.int32),
            x.reshape(-1),
            y.reshape(-1),
            active.reshape(-1).astype(jnp.float32),
        )
        return out.reshape(shape)
    imgflat = images.reshape(k * h, w)
    row0 = (fid.reshape(-1) * h + y0.reshape(-1) - 1).astype(jnp.int32)  # [M]
    wy = jnp.stack([wj.reshape(-1) for wj in wys], axis=-1)  # [M, 4]
    col0 = (x0.reshape(-1) - 1).astype(jnp.int32)
    wx = jnp.stack([wi.reshape(-1) for wi in wxs], axis=-1)  # [M, 4]

    chunk = min(8192, m)
    nchunks = -(-m // chunk)
    pad = nchunks * chunk - m
    if pad:
        row0 = jnp.pad(row0, (0, pad))
        wy = jnp.pad(wy, ((0, pad), (0, 0)))
        col0 = jnp.pad(col0, (0, pad))
        wx = jnp.pad(wx, ((0, pad), (0, 0)))

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, k * h), 1)
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, w), 1)

    # checkpointed: the [chunk, K·H] one-hots are cheap to rebuild from the
    # per-chunk indices — never keep them as vjp residuals (a full-problem
    # linearization would otherwise store [nchunks, chunk, K·H] ≈ tens of GB)
    @jax.checkpoint
    def one_chunk(args):
        r0, wyc, c0, wxc = args
        sel = jnp.zeros((chunk, k * h), imgflat.dtype)
        for j in range(4):
            sel = sel + jnp.where(rows_iota == (r0 + j)[:, None], wyc[:, j : j + 1], 0.0)
        # HIGH (bf16_3x): the residual is a DIFFERENCE of nearby samples, so
        # single-pass-bf16 luminance error (~1e-3) is material relative to the
        # gradient magnitudes; bf16_3x restores ~f32 quality at 3x DEFAULT cost
        a = jnp.dot(
            sel,
            imgflat,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH,
        )  # [chunk, W]
        colw = jnp.zeros((chunk, w), imgflat.dtype)
        for i in range(4):
            colw = colw + jnp.where(cols_iota == (c0 + i)[:, None], wxc[:, i : i + 1], 0.0)
        return jnp.sum(a * colw, axis=-1)

    out = jax.lax.map(
        one_chunk,
        (
            row0.reshape(nchunks, chunk),
            wy.reshape(nchunks, chunk, 4),
            col0.reshape(nchunks, chunk),
            wx.reshape(nchunks, chunk, 4),
        ),
    ).reshape(-1)[:m]
    return out.reshape(shape)


# stencil index mapping: positions of the 4 normal stencils inside the
# 10-value E_g SDF stencil (see EG_SDF_OFFSETS in grid/voxel_grid.py):
#   normal(v)    ← {(0,0,0), (1,0,0), (0,1,0), (0,0,1)} = s[0], s[6], s[1], s[4]
#   normal(v+x)  ← {(1,0,0), (2,0,0), (1,1,0), (1,0,1)} = s[6], s[9], s[7], s[8]
#   normal(v+y)  ← {(0,1,0), (1,1,0), (0,2,0), (0,1,1)} = s[1], s[7], s[2], s[3]
#   normal(v+z)  ← {(0,0,1), (1,0,1), (0,1,1), (0,0,2)} = s[4], s[8], s[3], s[5]
_N4 = ((0, 6, 1, 4), (6, 9, 7, 8), (1, 7, 2, 3), (4, 8, 3, 5))
_POINT_OFFSETS = ((0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1))


def eg_core(sdf10, alb4, pose6, intr4, dist5, sh9, vpos3, fid, images, pyr_scale, voxel_size, validity_only=False, active=None, frame_major=False):
    """E_g residual body; every argument batched over elements `[M, ...]`
    except `images` (``shading_cost.h:132-197``). Returns unweighted r [M].

    `validity_only=True` skips the image sampling and shading entirely and
    returns 1.0/0.0 validity — exactly the `r != 0` predicate of the full
    evaluation (r = √(‖d‖²+1e-12) ≥ 1e-6 whenever valid), used by the
    creation-time residual probe (``shading_cost.cpp:136-147``) without
    paying for a sampler pass."""
    h, w = images.shape[1], images.shape[2]
    # `[..., i]` so intrinsics may be shared [4] or per-element [M, 4]
    fx = intr4[..., 0] * pyr_scale
    fy = intr4[..., 1] * pyr_scale
    cx = intr4[..., 2] * pyr_scale
    cy = intr4[..., 3] * pyr_scale

    lums = []
    shadings = []
    uvs = []
    valid = jnp.ones(sdf10.shape[:-1], bool)
    aa = pose6[..., :3]
    t = pose6[..., 3:]
    for k in range(4):
        sdf4 = sdf10[..., _N4[k]]
        n = compute_normal_from_sdf4(sdf4)  # [M, 3]
        off = jnp.asarray(_POINT_OFFSETS[k], sdf10.dtype)
        p_world = (vpos3.astype(sdf10.dtype) + off) * voxel_size - n * sdf4[..., :1]
        p_cam = rotate_angle_axis_batched(aa, p_world) + t
        z = p_cam[..., 2]
        z_ok = z > 1e-6
        zs = jnp.where(z_ok, z, 1.0)
        xn = jnp.clip(p_cam[..., 0] / zs, -10.0, 10.0)
        yn = jnp.clip(p_cam[..., 1] / zs, -10.0, 10.0)
        # distortion (3 radial + 2 tangential, ``camera.h:96-116``)
        r2 = xn * xn + yn * yn
        r4 = r2 * r2
        r6 = r4 * r2
        rad = 1.0 + dist5[..., 0] * r2 + dist5[..., 1] * r4 + dist5[..., 2] * r6
        xd = xn * rad + 2.0 * dist5[..., 3] * xn * yn + dist5[..., 4] * (r2 + 2.0 * xn * xn)
        yd = yn * rad + 2.0 * dist5[..., 4] * xn * yn + dist5[..., 3] * (r2 + 2.0 * yn * yn)
        u = fx * xd + cx
        v = fy * yd + cy
        # bicubic support needs u∈[1, W−2), v∈[1, H−2)
        valid = valid & z_ok & (u >= 1.0) & (u < w - 2) & (v >= 1.0) & (v < h - 2)
        if not validity_only:
            if jnp.ndim(u) == 0:
                lums.append(catrom_sample_frames(images, fid, u, v, active=active))
            else:
                uvs.append((u, v))
            shadings.append(alb4[..., k] * jnp.sum(sh9 * sh_basis(n), axis=-1))

    if validity_only:
        return jnp.where(valid, 1.0, 0.0)
    if uvs:
        # ONE batched sampler call for all 4 sample sites (concatenated along
        # the leading axis, which keeps frame-major rows frame-uniform):
        # amortizes the kernel launch + scalar-prefetch transfers 4x
        us = jnp.concatenate([u for u, _ in uvs], axis=0)
        vs = jnp.concatenate([v for _, v in uvs], axis=0)
        fid4 = jnp.concatenate([fid] * 4, axis=0)
        act4 = None if active is None else jnp.concatenate([active] * 4, axis=0)
        lum = catrom_sample_frames(images, fid4, us, vs, active=act4, frame_major=frame_major)
        # splitting the 4-site concat along axis 0 restores each site's shape
        lums = list(jnp.split(lum, 4, axis=0))
    lum4 = jnp.stack(lums, axis=-1)
    sh4 = jnp.stack(shadings, axis=-1)
    d = (sh4[..., 1:] - sh4[..., :1]) - (lum4[..., 1:] - lum4[..., :1])
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    return jnp.where(valid, r, 0.0)


def eg_elem(local29, sh9, vpos3, fid, images, pyr_scale, voxel_size, sqrt_wlam):
    """One weighted E_g residual from its 29 local parameters
    {10 sdf, 4 albedo, 6 pose, 4 intr, 5 dist} — the per-element form the
    solver `jacfwd`s for the exact Jacobi diag(JᵀJ)."""
    r = eg_core(
        local29[:10],
        local29[10:14],
        local29[14:20],
        local29[20:24],
        local29[24:29],
        sh9,
        vpos3,
        fid,
        images,
        pyr_scale,
        voxel_size,
    )
    return sqrt_wlam * r


def rotate_angle_axis_batched(aa, pts):
    """rotate_angle_axis with batched angle-axis vectors `[..., 3]`."""
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + 1e-32)
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    cos_f = jnp.where(small, 1.0 - theta2 * b, jnp.cos(theta))
    cross = jnp.cross(jnp.broadcast_to(aa, pts.shape), pts)
    dot = jnp.sum(pts * aa, axis=-1, keepdims=True)
    return pts * cos_f + cross * a + aa * dot * b


def eg_residuals(params: Params, asm: Assembly):
    """Weighted E_g residual vector `[M]`.

    Pose rows are contracted through the one-hot matrix when present: the MXU
    turns the per-element pose gather (and its transposed scatter in vjp) into
    a matmul — scattered-element access is the TPU's weak spot, small-K
    contractions are its strength."""
    sdf10 = params.sdf[asm.eg_sdf10_idx]
    alb4 = params.albedo[asm.eg_alb4_idx]
    if asm.eg_onehot.shape[1]:
        pose6 = jnp.dot(
            asm.eg_onehot,
            params.poses,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    else:
        pose6 = params.poses[asm.eg_frame]
    r = eg_core(
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
    return jnp.sqrt(asm.eg_w * asm.lam[0]) * r


def er_residuals(params: Params, asm: Assembly):
    """Weighted Laplacian residuals `[N]` (``volumetric_regularizer.h:59-72``)."""
    s = params.sdf[asm.er_idx]  # [N, 7]
    lap = (
        s[:, 1] + s[:, 2] + s[:, 3] + s[:, 4] + s[:, 5] + s[:, 6] - 6.0 * s[:, 0]
    )
    return jnp.sqrt(asm.er_w * asm.lam[1]) * lap


def es_residuals(params: Params, asm: Assembly):
    """Weighted surface-stabilization residuals `[N]`."""
    return jnp.sqrt(asm.es_w * asm.lam[2]) * (params.sdf[asm.es_idx] - asm.es_ref)


def ea_residuals(params: Params, asm: Assembly):
    """Weighted albedo-pair residuals `[P]`."""
    a = params.albedo
    d = a[asm.ea_pairs[:, 0]] - a[asm.ea_pairs[:, 1]]
    return jnp.sqrt(asm.ea_w * asm.lam[3]) * d


def all_residuals(params: Params, asm: Assembly):
    """Concatenated weighted residual vector — the whole NLS problem."""
    return jnp.concatenate(
        [
            eg_residuals(params, asm),
            er_residuals(params, asm),
            es_residuals(params, asm),
            ea_residuals(params, asm),
        ]
    )


def total_cost(params: Params, asm: Assembly):
    r = all_residuals(params, asm)
    return 0.5 * jnp.sum(r * r)
