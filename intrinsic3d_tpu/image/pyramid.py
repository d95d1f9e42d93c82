"""Per-keyframe image pyramids: color, intensity, depth.

Re-design of the reference ``Pyramid`` (``libintrinsic3d/src/rgbd/pyramid.cpp``):
color/intensity levels use the classic 5-tap Gaussian pyramid downsample
(cv::pyrDown's [1 4 6 4 1]/16 separable kernel with reflected borders), depth
levels use zero-aware 2×2 mean pooling (``pyramid.cpp:116-141``). Pyramids are
plain tuples of arrays; building is jittable per level.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.color import intensity as rgb_intensity

_KERNEL5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


def _sep_filter5(img):
    """Separable 5-tap filter with REFLECT_101 borders, matching cv::pyrDown."""
    k = jnp.asarray(_KERNEL5)

    def filt_axis(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (2, 2)
        ap = jnp.pad(a, pad, mode="reflect")
        out = jnp.zeros_like(a)
        for i in range(5):
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(i, i + a.shape[axis])
            out = out + ap[tuple(sl)] * k[i]
        return out

    return filt_axis(filt_axis(img, 0), 1)


def pyr_down(img):
    """Gaussian blur + decimate by 2 (even rows/cols), cv::pyrDown semantics."""
    blurred = _sep_filter5(img)
    return blurred[::2, ::2]


def depth_down(depth):
    """Zero-aware 2×2 mean pooling of a depth map (``pyramid.cpp:116-141``)."""
    h2, w2 = depth.shape[0] // 2, depth.shape[1] // 2
    d = depth[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2)
    vals = d.transpose(0, 2, 1, 3).reshape(h2, w2, 4)
    cnt = jnp.sum(vals > 0.0, axis=-1)
    s = jnp.sum(jnp.where(vals > 0.0, vals, 0.0), axis=-1)
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), 0.0)


@dataclasses.dataclass
class Pyramid:
    """Color (RGB [H,W,3] in [0,1]), intensity ([H,W] luma), depth ([H,W] m)
    pyramids, finest level first."""

    color: Tuple[jnp.ndarray, ...]
    intensity: Tuple[jnp.ndarray, ...]
    depth: Tuple[jnp.ndarray, ...]

    @classmethod
    def create(cls, num_levels: int, color, depth) -> "Pyramid":
        color = jnp.asarray(color, jnp.float32)
        depth = jnp.asarray(depth, jnp.float32)
        colors: List[jnp.ndarray] = [color]
        lums: List[jnp.ndarray] = [rgb_intensity(color)]
        depths: List[jnp.ndarray] = [depth]
        for _ in range(1, num_levels):
            colors.append(pyr_down(colors[-1]))
            lums.append(rgb_intensity(colors[-1]))
            depths.append(depth_down(depths[-1]))
        return cls(tuple(colors), tuple(lums), tuple(depths))

    @property
    def num_levels(self) -> int:
        return len(self.color)
