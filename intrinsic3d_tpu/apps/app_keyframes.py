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
        scores = np.asarray(blur_scores_batch(jnp.asarray(frames)))
        sel.add_scores(scores.tolist())
        log.info("   scored frames %d..%d", beg, end - 1)
    sel.select()
    log.info("%d keyframes selected out of %d frames", sel.count(), n)
    return sel


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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
