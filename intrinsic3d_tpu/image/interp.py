"""Image sampling: bilinear and bicubic (Catmull-Rom) interpolation.

The reference uses two image samplers: a boundary-aware bilinear lookup for
observation colors (``libintrinsic3d/src/rgbd/processing.cpp:238-301``) and
Ceres' ``BiCubicInterpolator`` over a clamped ``Grid2D`` for the differentiable
intensity lookup inside the shading cost (``include/nv/refinement/cost.h:108-127``).
Both are implemented here as batched jnp gathers so they vmap over millions of
sample points and differentiate cleanly (the bicubic path is C¹, which is what
makes image-gradient-based refinement work at all).

Convention: images are `[H, W]` or `[H, W, C]`; sample coordinates are `(x, y)`
pixel coordinates with integer values centered on pixels, matching the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear(img, x, y):
    """Boundary-aware bilinear sampling (``processing.cpp:238-301``).

    Out-of-bounds taps get zero weight; the result is renormalized by the sum of
    valid weights (zero when no tap is valid). img `[H, W]` or `[H, W, C]`;
    x, y broadcastable arrays.
    """
    h, w = img.shape[0], img.shape[1]
    chan = img.ndim == 3
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    vx0 = (x0 >= 0) & (x0 < w)
    vx1 = (x1 >= 0) & (x1 < w)
    vy0 = (y0 >= 0) & (y0 < h)
    vy1 = (y1 >= 0) & (y1 < h)
    wx0 = jnp.where(vx0, wx0, 0.0)
    wx1 = jnp.where(vx1, wx1, 0.0)
    wy0 = jnp.where(vy0, wy0, 0.0)
    wy1 = jnp.where(vy1, wy1, 0.0)
    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y1, 0, h - 1)

    w00 = wx0 * wy0
    w10 = wx1 * wy0
    w01 = wx0 * wy1
    w11 = wx1 * wy1
    wsum = w00 + w10 + w01 + w11

    def tap(yc, xc):
        return img[yc, xc]

    acc = (
        tap(y0c, x0c) * (w00[..., None] if chan else w00)
        + tap(y0c, x1c) * (w10[..., None] if chan else w10)
        + tap(y1c, x0c) * (w01[..., None] if chan else w01)
        + tap(y1c, x1c) * (w11[..., None] if chan else w11)
    )
    wsafe = jnp.where(wsum > 0.0, wsum, 1.0)
    out = acc / (wsafe[..., None] if chan else wsafe)
    return jnp.where((wsum > 0.0)[..., None] if chan else wsum > 0.0, out, 0.0)


def _catmull_rom_weights(t):
    """Cubic convolution weights (a = −1/2, Catmull-Rom) for the 4 taps
    {-1, 0, 1, 2} at fractional position t ∈ [0, 1)."""
    t2 = t * t
    t3 = t2 * t
    wm1 = -0.5 * t + t2 - 0.5 * t3
    w0 = 1.0 - 2.5 * t2 + 1.5 * t3
    w1 = 0.5 * t + 2.0 * t2 - 1.5 * t3
    w2 = -0.5 * t2 + 0.5 * t3
    return wm1, w0, w1, w2


def bicubic(img, x, y):
    """Clamped-boundary Catmull-Rom bicubic sampling, the behavioral equivalent
    of ceres::BiCubicInterpolator over Grid2D (``cost.h:108-127``).

    C¹-continuous and differentiable w.r.t. x and y. img `[H, W]`; x, y arrays.
    """
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    wxs = _catmull_rom_weights(tx)
    wys = _catmull_rom_weights(ty)

    acc = jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y)), img.dtype)
    for j, wy in enumerate(wys):
        yi = jnp.clip(y0i + (j - 1), 0, h - 1)
        row = jnp.zeros_like(acc)
        for i, wx in enumerate(wxs):
            xi = jnp.clip(x0i + (i - 1), 0, w - 1)
            row = row + img[yi, xi] * wx
        acc = acc + row * wy
    return acc
