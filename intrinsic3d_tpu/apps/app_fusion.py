"""TSDF fusion CLI (the reference's AppFusion, ``apps/src/app_fusion.cpp``):
fuse all (or keyframe-only) RGB-D frames into the sparse voxel grid, run the
distance-transform correction, save the `.tsdf` volume and a marching mesh.

Usage: python -m intrinsic3d_tpu.apps.app_fusion -s sensor.yml -c fusion.yml
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.apps.common import ensure_parent, load_sensor, make_parser, setup_logging
from intrinsic3d_tpu.config import FusionConfig, Settings
from intrinsic3d_tpu.grid import algorithms as alg
from intrinsic3d_tpu.grid.fusion import FusionVolume, compute_scene_voxel_bounds
from intrinsic3d_tpu.image.processing import compute_normals, erode_discontinuities
from intrinsic3d_tpu.io.ply import save_ply
from intrinsic3d_tpu.keyframes import KeyframeSelection
from intrinsic3d_tpu.mesh import extract_surface

log = logging.getLogger("intrinsic3d")


def run(sensor, cfg: FusionConfig):
    frame_ids = list(range(sensor.num_frames))
    if cfg.keyframes:
        try:
            sel = KeyframeSelection.load(cfg.keyframes)
            frame_ids = [i for i in frame_ids if i < len(sel.is_keyframe) and sel.is_keyframe[i]]
            log.info("fusing %d keyframes", len(frame_ids))
        except FileNotFoundError:
            log.warning("could not load keyframes %s — fusing all frames", cfg.keyframes)

    clip = cfg.clip_bounds if cfg.has_clip_bounds else None
    poses = [sensor.pose(i) for i in frame_ids]
    vlo, vhi = compute_scene_voxel_bounds(
        sensor.depth_cam, poses, sensor.depth_min, sensor.depth_max, cfg.voxel_size, clip
    )
    vol = FusionVolume(
        sensor.depth_cam,
        sensor.color_cam,
        cfg.voxel_size,
        vlo,
        vhi,
        sensor.depth_min,
        sensor.depth_max,
        clip_bounds=clip,
    )

    log.info("allocation pass over %d frames ...", len(frame_ids))
    eroded = {}
    for i in frame_ids:
        d = sensor.depth(i)
        if cfg.discont_window_size > 0:
            d = np.asarray(erode_discontinuities(jnp.asarray(d), cfg.discont_window_size))
        eroded[i] = d
        vol.allocate(d, sensor.pose(i))
    grid = vol.build_grid()
    log.info("allocated %d voxels (dims %s)", grid.num_voxels, vol.dims)

    log.info("integration pass ...")
    for k, i in enumerate(frame_ids):
        d = eroded[i]
        normals = np.asarray(compute_normals(sensor.depth_cam, jnp.asarray(d)))
        vol.integrate(d, normals, sensor.color(i), sensor.pose(i))
        if (k + 1) % 50 == 0:
            log.info("   integrated %d/%d frames", k + 1, len(frame_ids))
    grid = vol.finalize()

    log.info("correct SDF ...")
    grid = alg.correct_sdf(grid)
    log.info("clear invalid voxels ...")
    grid = alg.clear_invalid_voxels(grid)
    log.info("%d voxels after cleanup", grid.num_voxels)
    return grid


def main(argv=None):
    args = make_parser("TSDF volumetric fusion").parse_args(argv)
    setup_logging(args.verbose)
    sensor = load_sensor(args.sensor)
    cfg = FusionConfig.from_settings(Settings.load(args.config))
    grid = run(sensor, cfg)

    if cfg.output_sdf:
        ensure_parent(cfg.output_sdf)
        grid.save(cfg.output_sdf)
        log.info("saved %s", cfg.output_sdf)
    if cfg.output_mesh:
        ensure_parent(cfg.output_mesh)
        verts, faces, cols = extract_surface(grid)
        save_ply(cfg.output_mesh, verts, faces, cols)
        log.info("saved %s (%d verts, %d faces)", cfg.output_mesh, len(verts), len(faces))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
