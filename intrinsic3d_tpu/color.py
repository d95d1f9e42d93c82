"""Color/intensity conversions (reference ``libintrinsic3d/src/color_util.cpp``).

Colors throughout this framework are float32 RGB. When interfacing with the
reference's byte formats (.tsdf, PLY) values are in [0, 255]; luminance helpers
take whatever scale is passed in, matching the reference's use of
``intensity(Vec3b)`` on 0..255 colors.
"""

from __future__ import annotations

import jax.numpy as jnp

# ITU-R BT.601 luma weights for RGB input (``color_util.cpp:41-58``)
LUMA_R = 0.299
LUMA_G = 0.587
LUMA_B = 0.114


def intensity(rgb):
    """Luma of RGB `[..., 3]` (same scale as input)."""
    return LUMA_R * rgb[..., 0] + LUMA_G * rgb[..., 1] + LUMA_B * rgb[..., 2]


def chromacity(rgb):
    """Per-channel color divided by luma (``color_util.cpp:61-67``)."""
    lum = intensity(rgb)
    return rgb / jnp.where(lum == 0.0, 1e-12, lum)[..., None]


def scalar_to_color(scalar, low=0.0, high=1.0):
    """Grayscale visualization mapping of a scalar field to [0,255] RGB
    (``color_util.cpp:70-80``)."""
    t = jnp.clip((scalar - low) / (high - low), 0.0, 1.0)
    g = (t * 255.0)
    return jnp.stack([g, g, g], axis=-1)
