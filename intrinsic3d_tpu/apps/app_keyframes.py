"""Keyframe selection CLI (the reference's AppKeyframes,
``apps/src/app_keyframes.cpp``): score all frames with the Crete blur metric on
device, pick the best per window, write keyframes.txt.

Usage: python -m intrinsic3d_tpu.apps.app_keyframes -s sensor.yml -c keyframes.yml
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.apps.common import ensure_parent, load_sensor, make_parser, setup_logging
from intrinsic3d_tpu.config import KeyframesConfig, Settings
from intrinsic3d_tpu.image.blur import blur_scores_batch
from intrinsic3d_tpu.keyframes import KeyframeSelection

log = logging.getLogger("intrinsic3d")


def run(sensor, cfg: KeyframesConfig, batch: int = 16) -> KeyframeSelection:
    sel = KeyframeSelection(window_size=cfg.window_size)
    n = sensor.num_frames
    for beg in range(0, n, batch):
        end = min(beg + batch, n)
        frames = np.stack([sensor.color(i) for i in range(beg, end)])
        if end - beg < batch and n > batch:
            # pad the ragged tail to the full batch shape: ONE compiled blur
            # graph serves every batch (a second shape costs a full remote
            # compile on a cold cache, ~250 s on the tunnel link)
            pad = np.zeros((batch - (end - beg),) + frames.shape[1:], frames.dtype)
            frames = np.concatenate([frames, pad])
        scores = np.asarray(blur_scores_batch(jnp.asarray(frames)))[: end - beg]
        sel.add_scores(scores.tolist())
        log.info("   scored frames %d..%d", beg, end - 1)
    sel.select()
    log.info("%d keyframes selected out of %d frames", sel.count(), n)
    return sel


def export_keyframes(sensor, sel: KeyframeSelection, out_dir: str) -> None:
    """Headless equivalent of the reference's interactive `show_keyframes`
    viewer (``app_keyframes.cpp:128-141`` + ``keyframe_selection.cpp:129-136``):
    export each selected keyframe with its blur score drawn, as PNGs."""
    import os

    from PIL import Image, ImageDraw

    os.makedirs(out_dir or ".", exist_ok=True)
    for i, is_kf in enumerate(sel.is_keyframe):
        if not is_kf:
            continue
        rgb = np.asarray(sensor.color(i))
        if rgb.dtype != np.uint8:
            rgb = (np.clip(rgb, 0.0, 1.0) * 255).astype(np.uint8)
        img = Image.fromarray(rgb)
        draw = ImageDraw.Draw(img)
        draw.text((10, 38), f"score: {sel.frame_scores[i]:.6f}", fill=(0, 255, 0))
        path = os.path.join(out_dir or ".", f"keyframe_{i:06d}.png")
        img.save(path)
        log.info("   exported %s", path)


def main(argv=None):
    args = make_parser("Blur-score keyframe selection").parse_args(argv)
    setup_logging(args.verbose)
    sensor = load_sensor(args.sensor)
    cfg = KeyframesConfig.from_settings(Settings.load(args.config))
    sel = run(sensor, cfg)
    if cfg.filename:
        ensure_parent(cfg.filename)
        sel.save(cfg.filename)
        log.info("saved %s", cfg.filename)
    if cfg.show_keyframes:
        import os

        export_keyframes(sensor, sel, os.path.dirname(cfg.filename))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
