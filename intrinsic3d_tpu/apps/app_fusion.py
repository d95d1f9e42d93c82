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
from intrinsic3d_tpu.image.processing import erode_discontinuities
from intrinsic3d_tpu.io.ply import save_ply

import functools

import jax


@functools.partial(jax.jit, static_argnames=("window",))
def _erode_batch(depths, window):
    return jax.vmap(lambda d: erode_discontinuities(d, window))(depths)
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

    # frames stream through in fixed-size STACKS: erosion is one vmapped
    # program per chunk, allocation/integration one scanned program each —
    # the per-frame path pays a dispatch round trip (and the first call a
    # program load) per frame on a remote link. The ragged tail is padded
    # with zero-depth frames (exact no-ops through the d > 0 gates).
    chunk = 10
    n = len(frame_ids)
    log.info("allocation pass over %d frames ...", n)
    eroded_chunks = []  # device-resident [chunk, H, W] stacks, reused below
    pose_chunks = []
    for beg in range(0, n, chunk):
        ids = frame_ids[beg : beg + chunk]
        d_np = np.stack([np.asarray(sensor.depth(i), np.float32) for i in ids])
        poses = np.stack([sensor.pose(i) for i in ids])
        if len(ids) < chunk and n > chunk:
            pad = chunk - len(ids)
            d_np = np.concatenate([d_np, np.zeros((pad,) + d_np.shape[1:], d_np.dtype)])
            poses = np.concatenate([poses, np.tile(np.eye(4)[None], (pad, 1, 1))])
        d = jnp.asarray(d_np)
        if cfg.discont_window_size > 0:
            d = _erode_batch(d, cfg.discont_window_size)
        eroded_chunks.append(d)
        pose_chunks.append(poses)
        vol.allocate_batch(d, poses)
    grid = vol.build_grid()
    log.info("allocated %d voxels (dims %s)", grid.num_voxels, vol.dims)

    log.info("integration pass ...")
    for beg, d, poses in zip(range(0, n, chunk), eroded_chunks, pose_chunks):
        ids = frame_ids[beg : beg + chunk]
        c_np = np.stack([np.asarray(sensor.color(i), np.float32) for i in ids])
        if len(ids) < poses.shape[0]:
            pad = poses.shape[0] - len(ids)
            c_np = np.concatenate([c_np, np.zeros((pad,) + c_np.shape[1:], c_np.dtype)])
        vol.integrate_batch(d, c_np, poses)
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
