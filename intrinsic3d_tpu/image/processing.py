"""RGB-D image processing: vertex maps, normals, depth resampling, erosion.

JAX re-design of the reference's per-pixel loops
(``libintrinsic3d/src/rgbd/processing.cpp:40-235``): every operation is a
whole-image tensor expression (jit/vmap-able over frames) instead of nested
y/x loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.image.interp import bilinear


def threshold_depth(depth, depth_min, depth_max):
    """Zero out depth outside [min, max] (``sensor.cpp:211-220``)."""
    return jnp.where((depth >= depth_min) & (depth <= depth_max), depth, 0.0)


def compute_vertex_map(cam: Camera, depth):
    """Back-project a depth image `[H, W]` to camera-frame points `[H, W, 3]`
    (``processing.cpp:49-71``)."""
    h, w = depth.shape
    ys = jnp.arange(h, dtype=depth.dtype)[:, None]
    xs = jnp.arange(w, dtype=depth.dtype)[None, :]
    x0 = (xs - cam.cx) / cam.fx
    y0 = (ys - cam.cy) / cam.fy
    return jnp.stack([x0 * depth, y0 * depth, depth], axis=-1)


def compute_normals_from_vertex_map(vertex_map, depth_threshold=0.3):
    """Central-difference cross-product normals with depth-discontinuity
    gating (``processing.cpp:74-126``). Zero normal where invalid."""
    v = vertex_map
    vx0 = jnp.roll(v, 1, axis=1)   # x-1
    vx1 = jnp.roll(v, -1, axis=1)  # x+1
    vy0 = jnp.roll(v, 1, axis=0)   # y-1
    vy1 = jnp.roll(v, -1, axis=0)  # y+1
    tangent_x = vx1 - vx0
    tangent_y = vy1 - vy0
    n = jnp.cross(tangent_y, tangent_x)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(norm == 0.0, 1e-12, norm)

    valid = (
        (v[..., 2] != 0.0)
        & (vx0[..., 2] != 0.0)
        & (vx1[..., 2] != 0.0)
        & (vy0[..., 2] != 0.0)
        & (vy1[..., 2] != 0.0)
        & (jnp.linalg.norm(tangent_x, axis=-1) < depth_threshold)
        & (jnp.linalg.norm(tangent_y, axis=-1) < depth_threshold)
    )
    # border pixels are invalid (reference loops y,x in [1, dim-2])
    h, w = v.shape[0], v.shape[1]
    border = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    valid = valid & border
    return jnp.where(valid[..., None], n, 0.0)


def compute_normals(cam: Camera, depth, depth_threshold=0.3):
    return compute_normals_from_vertex_map(compute_vertex_map(cam, depth), depth_threshold)


def resize_depth(input_cam: Camera, depth, output_cam: Camera):
    """Reproject a depth map from the depth camera into the (larger) color
    camera's pixel grid (``processing.cpp:129-181``). Depth and color frames are
    registered, so each output pixel looks up the input depth along its ray with
    bilinear interpolation; zero stays zero."""
    if depth.shape == (output_cam.height, output_cam.width):
        return depth
    h, w = output_cam.height, output_cam.width
    ys = jnp.arange(h, dtype=depth.dtype)[:, None]
    xs = jnp.arange(w, dtype=depth.dtype)[None, :]
    x0 = (xs - output_cam.cx) / output_cam.fx
    y0 = (ys - output_cam.cy) / output_cam.fy
    px = input_cam.fx * x0 + input_cam.cx
    py = input_cam.fy * y0 + input_cam.cy
    px = jnp.broadcast_to(px, (h, w))
    py = jnp.broadcast_to(py, (h, w))
    # reference gates on the rounded coordinate being inside the input image
    pxi = jnp.floor(px + 0.5).astype(jnp.int32)
    pyi = jnp.floor(py + 0.5).astype(jnp.int32)
    inside = (pxi >= 0) & (pyi >= 0) & (pxi < depth.shape[1]) & (pyi < depth.shape[0])
    d = bilinear(depth, px, py)
    return jnp.where(inside, d, 0.0)


def erode_discontinuities(depth, window_size=2, max_depth_diff=0.5):
    """Invalidate pixels whose (2k+1)² window contains a zero or a depth jump
    larger than max_depth_diff (``processing.cpp:184-235``).

    The reference clamps the window at image borders (out-of-image taps are
    simply not inspected); we replicate that by padding with the center value.
    """
    if window_size <= 0:
        return depth
    k = window_size

    def shift(arr, dy, dx):
        pad = jnp.pad(arr, ((k, k), (k, k)), mode="edge")
        h, w = arr.shape
        return jax.lax.dynamic_slice(pad, (k + dy, k + dx), (h, w))

    valid = depth != 0.0
    ok = jnp.ones_like(depth, dtype=bool)
    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            dn = shift(depth, dy, dx)
            ok = ok & (dn != 0.0) & (jnp.abs(dn - depth) <= max_depth_diff)
    # edge padding repeats border pixels; the reference instead skips
    # out-of-image taps. Padding with "edge" inspects the border value again,
    # which is identical to skipping for the zero/diff checks.
    return jnp.where(valid & ok, depth, 0.0)
