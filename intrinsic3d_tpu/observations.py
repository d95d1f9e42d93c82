"""Voxel ↔ keyframe observation machinery.

Re-design of ``nv::SDFColorization`` (``libintrinsic3d/src/sdf/colorization.cpp``):
for every (voxel, keyframe) pair — iso-project the voxel along its normal,
transform into the frame, apply the distorted camera projection, test visibility
against the frame's depth (occlusion distance), and score the observation with
the grazing-angle robust weight. The reference loops voxels × frames on the
host; here one jitted pass evaluates a whole [voxel-chunk × all-frames] block on
device and `lax.top_k` replaces the per-voxel sort for best-N selection
(``colorization.cpp:357-370``).

Outputs are static-shape arrays `(obs_frame [N, K_best], obs_weight [N, K_best])`
consumed directly by the shading-cost assembly, plus weighted-mean recoloring.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from intrinsic3d_tpu.camera import Camera, project
from intrinsic3d_tpu.image.interp import bilinear
from intrinsic3d_tpu.mathutil import robust_kernel, transform_points


def observation_weight(pt_cam, normal_cam, d):
    """Grazing-angle × depth observation weight (``colorization.cpp:274-315``).

    Note the reference's depth term degenerates to the constant 1 (it is
    `clamp(max(1 − d_norm, 1.0), 0.001, 5)`), which we reproduce faithfully.
    """
    n_zero = jnp.all(normal_cam == 0.0, axis=-1)
    v = pt_cam / jnp.maximum(jnp.linalg.norm(pt_cam, axis=-1, keepdims=True), 1e-12)
    w_normal = 1.0 - jnp.abs(jnp.sum(v * normal_cam, axis=-1))
    w_normal = jnp.clip(w_normal, 0.0, 1.0)
    w_normal = jnp.maximum(robust_kernel(w_normal), 0.001)
    w_normal = jnp.where(n_zero, 0.0, w_normal)
    d_norm = (jnp.clip(d, 0.01, 5.0) - 0.01) / (5.0 - 0.01)
    w_depth = jnp.clip(jnp.maximum(1.0 - d_norm, 1.0), 0.001, 5.0)
    return w_normal * w_depth


def compute_observation(
    cam: Camera,
    pose6,  # [6] world→cam angle-axis+t
    depth,  # [H, W]
    iso_pts,  # [M, 3] world-space iso-surface points
    normals,  # [M, 3] world-space voxel normals
    occlusion_distance: float,
):
    """Weights of one frame's observations of M voxels
    (``colorization.cpp:215-315``). Returns (weight [M], uv [M, 2])."""
    pt = transform_points(pose6, iso_pts)
    uv, valid = project(cam, pt)
    ui = jnp.floor(uv[:, 0] + 0.5).astype(jnp.int32)
    vi = jnp.floor(uv[:, 1] + 0.5).astype(jnp.int32)
    uic = jnp.clip(ui, 0, cam.width - 1)
    vic = jnp.clip(vi, 0, cam.height - 1)
    d = depth[vic, uic]
    # visibility: |d − z| ≤ occlusion_distance (``colorization.cpp:252-270``)
    visible = jnp.where(
        occlusion_distance > 0.0,
        (d > 0.0) & (jnp.abs(d - pt[:, 2]) <= occlusion_distance),
        True,
    )
    n_cam = transform_points(pose6.at[3:].set(0.0), normals)  # rotate only
    w = observation_weight(pt, n_cam, d)
    w = jnp.where(valid & visible & (d > 0.0), w, 0.0)
    return w, uv


@functools.partial(jax.jit, static_argnames=("num_best",))
def collect_observations(
    cam: Camera,
    poses,  # [K, 6] world→cam
    depths,  # [K, H, W]
    iso_pts,  # [N, 3]
    normals,  # [N, 3]
    occlusion_distance: float,
    num_best: int = 5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best-`num_best` observations per voxel over all K frames.

    Returns (obs_weight [N, num_best], obs_frame [N, num_best] int32);
    weight 0 marks an empty slot.
    """

    def one_frame(args):
        pose6, depth = args
        w, _ = compute_observation(cam, pose6, depth, iso_pts, normals, occlusion_distance)
        return w

    weights = jax.lax.map(one_frame, (poses, depths))  # [K, N]
    weights = weights.T  # [N, K]
    k = min(num_best, weights.shape[1])
    best_w, best_f = jax.lax.top_k(weights, k)
    return best_w, best_f.astype(jnp.int32)


def bilinear_frames(images, frame_ids, x, y):
    """Bilinear sampling where each query selects its own frame:
    `images [K, H, W, C?]`, `frame_ids [N]`, `x/y [N]`. One fused 4-tap gather
    over (frame, row, col) — never materializes per-voxel images."""
    h, w = images.shape[1], images.shape[2]
    chan = images.ndim == 4
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    wx0 = jnp.where((x0 >= 0) & (x0 < w), wx0, 0.0)
    wx1 = jnp.where((x1 >= 0) & (x1 < w), wx1, 0.0)
    wy0 = jnp.where((y0 >= 0) & (y0 < h), wy0, 0.0)
    wy1 = jnp.where((y1 >= 0) & (y1 < h), wy1, 0.0)
    x0c, x1c = jnp.clip(x0, 0, w - 1), jnp.clip(x1, 0, w - 1)
    y0c, y1c = jnp.clip(y0, 0, h - 1), jnp.clip(y1, 0, h - 1)

    def tap(yc, xc):
        return images[frame_ids, yc, xc].astype(jnp.float32)

    w00, w10, w01, w11 = wx0 * wy0, wx1 * wy0, wx0 * wy1, wx1 * wy1
    if chan:
        w00, w10, w01, w11 = (z[:, None] for z in (w00, w10, w01, w11))
    acc = (
        tap(y0c, x0c) * w00
        + tap(y0c, x1c) * w10
        + tap(y1c, x0c) * w01
        + tap(y1c, x1c) * w11
    )
    wsum = w00 + w10 + w01 + w11
    wsafe = jnp.where(wsum > 0.0, wsum, 1.0)
    return jnp.where(wsum > 0.0, acc / wsafe, 0.0)


@functools.partial(jax.jit, static_argnames=())
def recolor(
    cam: Camera,
    poses,  # [K, 6]
    depths,  # [K, H, W]
    colors,  # [K, H, W, 3] uint8 or float 0..255
    iso_pts,  # [N, 3]
    normals,  # [N, 3]
    obs_weight,  # [N, B]
    obs_frame,  # [N, B]
    occlusion_distance: float,
):
    """Weighted-mean voxel colors from the selected observations
    (``colorization.cpp:162-189, 320-370``). Returns colors [N, 3] in 0..255."""

    def one_slot(b):
        pose6 = poses[obs_frame[:, b]]  # [N, 6]
        pt = jax.vmap(transform_points)(pose6, iso_pts)
        uv, _ = project(cam, pt)
        return bilinear_frames(colors, obs_frame[:, b], uv[:, 0], uv[:, 1])

    n, bmax = obs_weight.shape
    acc = jnp.zeros((n, 3), jnp.float32)
    for b in range(bmax):
        c = one_slot(b)
        acc = acc + c * obs_weight[:, b][:, None]
    wsum = jnp.sum(obs_weight, axis=-1)
    has = wsum > 0.0
    out = acc / jnp.maximum(wsum, 1e-12)[:, None]
    return jnp.where(has[:, None], out, 0.0), has


def compute_observations_batch(
    cam: Camera,
    poses,  # [K, 6]
    depths,  # [K, H, W]
    iso_pts,  # [D, 3] shared, or [K, E, 3] per-row (frame-bucketed elements)
    normals,  # [D, 3] or [K, E, 3], matching iso_pts
    occlusion_distance: float,
    active=None,  # [K, D] float, 0 ⇒ weight not needed (chunks skipped)
    return_uv: bool = False,
):
    """All-frames observation weights `[K, D]` — semantically
    `vmap(compute_observation)` over keyframes, but the per-voxel depth
    visibility lookup runs through the frame-windowed nearest-pixel Pallas
    kernel instead of a scattered gather (the dominant cost of the device
    assembly, BENCH_NOTES.md). Rows of the [K, D] layout are frame-uniform
    by construction, which is the kernel's contract.

    3-D `iso_pts`/`normals` give each keyframe row its own point set — the
    frame-bucketed element layout of refine/blockform.py, where row k holds
    only the slots of frame k's visible blocks.

    Row-compactness assumption: elements are voxel-linear within 512-slot
    blocks, so a CHUNK of consecutive elements is one (frame, 8³ voxel
    block) projection whose nearest-pixel taps land in a compact image-row
    band — the property that makes the windowed kernel's first pass resolve
    nearly all chunks. Scattered element orderings still compute exactly,
    but degrade to serialized fallback window passes."""
    from intrinsic3d_tpu.ops.pallas.bicubic import CHUNK, nearest_sample_rows

    k = poses.shape[0]
    d = iso_pts.shape[-2]
    if iso_pts.ndim == 3:
        pt = jax.vmap(transform_points)(poses, iso_pts)  # [K, E, 3]
        n_cam = jax.vmap(lambda p, nn: transform_points(p.at[3:].set(0.0), nn))(
            poses, normals
        )
    else:
        pt = jax.vmap(lambda p: transform_points(p, iso_pts))(poses)  # [K, D, 3]
        n_cam = jax.vmap(lambda p: transform_points(p.at[3:].set(0.0), normals))(poses)
    uv, valid = project(cam, pt)
    ui = jnp.floor(uv[..., 0] + 0.5).astype(jnp.int32)
    vi = jnp.floor(uv[..., 1] + 0.5).astype(jnp.int32)
    uic = jnp.clip(ui, 0, cam.width - 1)
    vic = jnp.clip(vi, 0, cam.height - 1)

    act = jnp.ones((k, d), jnp.float32) if active is None else active
    dpad = (-d) % CHUNK  # keep sampler chunks frame-uniform

    def padded(a):
        return jnp.pad(a, ((0, 0), (0, dpad))) if dpad else a

    fid = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[:, None], (k, d))
    depth = nearest_sample_rows(
        depths,
        padded(fid).reshape(-1),
        padded(vic).reshape(-1),
        padded(uic).reshape(-1),
        padded(act).reshape(-1),
    ).reshape(k, d + dpad)[:, :d]

    visible = jnp.where(
        occlusion_distance > 0.0,
        (depth > 0.0) & (jnp.abs(depth - pt[..., 2]) <= occlusion_distance),
        True,
    )
    w = observation_weight(pt, n_cam, depth)
    w = jnp.where(valid & visible & (depth > 0.0) & (act > 0.0), w, 0.0)
    return (w, uv) if return_uv else w
