"""Crete-2007 no-reference perceptual blur metric.

Re-design of ``KeyframeSelection::estimateBlurCrete``
(``libintrinsic3d/src/keyframe_selection.cpp:240-310``) as a single jittable
tensor expression, vmap-able over a batch of frames: 9-tap box blur along each
axis, directional absolute-difference images, variation ratio, and the final
score 1 − max(b_ver, b_hor) (1.0 = sharpest).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intrinsic3d_tpu.color import intensity as rgb_intensity


def _box9(img, axis):
    """9-tap box filter along one axis with REFLECT_101 borders (cv::filter2D
    default border)."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (4, 4)
    ap = jnp.pad(img, pad, mode="reflect")
    out = jnp.zeros_like(img)
    n = img.shape[axis]
    for i in range(9):
        sl = [slice(None), slice(None)]
        sl[axis] = slice(i, i + n)
        out = out + ap[tuple(sl)]
    return out / 9.0


def blur_score_gray(gray):
    """Blur score of a grayscale image `[H, W]` in [0,1]; higher = sharper."""
    b_ver = _box9(gray, 0)
    b_hor = _box9(gray, 1)

    # vertical abs differences (zero on the first row, as in the reference loops)
    d_f_ver = jnp.abs(gray[1:, :] - gray[:-1, :])
    d_b_ver = jnp.abs(b_ver[1:, :] - b_ver[:-1, :])
    d_f_hor = jnp.abs(gray[:, 1:] - gray[:, :-1])
    d_b_hor = jnp.abs(b_hor[:, 1:] - b_hor[:, :-1])

    v_ver = jnp.maximum(0.0, d_f_ver - d_b_ver)
    v_hor = jnp.maximum(0.0, d_f_hor - d_b_hor)

    s_f_ver = jnp.sum(d_f_ver)
    s_v_ver = jnp.sum(v_ver)
    s_f_hor = jnp.sum(d_f_hor)
    s_v_hor = jnp.sum(v_hor)

    b_f_ver = (s_f_ver - s_v_ver) / jnp.where(s_f_ver == 0.0, 1.0, s_f_ver)
    b_f_hor = (s_f_hor - s_v_hor) / jnp.where(s_f_hor == 0.0, 1.0, s_f_hor)
    return 1.0 - jnp.maximum(b_f_ver, b_f_hor)


@jax.jit
def blur_score_rgb(color):
    """Blur score of an RGB image `[H, W, 3]` in [0,1]."""
    return blur_score_gray(rgb_intensity(color))


blur_scores_batch = jax.jit(jax.vmap(blur_score_rgb))
"""Blur scores for a stacked batch of RGB frames `[F, H, W, 3]`."""
