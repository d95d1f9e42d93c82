"""TSDF fusion: allocation + projective integration on device.

TPU re-design of ``SparseVoxelGrid::integrate``/``alloc``
(``libintrinsic3d/src/sparse_voxel_grid.cpp:300-467``). The reference walks each
depth ray serially, hash-allocating voxels, then updates voxels with a running
weighted average under OpenMP. Two observations make this TPU-native:

1. The running average is **commutative** — the final SDF/color are plain
   weighted means over all (voxel, frame) contributions — so integration is a
   masked reduction over frames, not a sequential update.
2. Allocation is a set union — represented as a **dense occupancy bitmap** over
   the scene's voxel AABB (tens of MB even for room-scale scenes), scatter-set by
   ray samples on device and dilated with a 3³ morphological OR (the reference's
   per-voxel block dilation, ``sparse_voxel_grid.cpp:449-462``).

Both phases jit to pure gathers/scatters; frames are streamed host→device one at
a time (the accumulators are donated, so each frame is one fused kernel).

Intentional deviations (see ARCHITECTURE.md): allocate-all-then-integrate-all
(the reference's frame-ordered allocation starves late-allocated voxels of early
observations); color accumulates its own weight sum; the per-frame frustum-AABB
gate is dropped (the bitmap AABB + clip bounds subsume it).
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid
from intrinsic3d_tpu.mathutil import robust_kernel


# ---------------------------------------------------------------------------
# Scene bounds
# ---------------------------------------------------------------------------


def frustum_corners(cam: Camera, depth_min: float, depth_max: float) -> np.ndarray:
    """8 camera-frame frustum corner points (``math.cpp:131-148``)."""
    corners = []
    for d in (depth_min, depth_max):
        for x, y in ((0, 0), (cam.width - 1, 0), (cam.width - 1, cam.height - 1), (0, cam.height - 1)):
            px = (x - float(cam.cx)) / float(cam.fx)
            py = (y - float(cam.cy)) / float(cam.fy)
            corners.append((px * d, py * d, d))
    return np.array(corners, dtype=np.float64)


def compute_scene_voxel_bounds(
    cam: Camera,
    poses_cam_to_world: Iterable[np.ndarray],
    depth_min: float,
    depth_max: float,
    voxel_size: float,
    clip_bounds: Optional[Tuple[float, ...]] = None,
    truncation: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Voxel-coordinate AABB (lo, hi inclusive) covering all frame frustums
    (intersected with clip bounds when given)."""
    trunc = truncation if truncation is not None else voxel_size * 5.0
    corners = frustum_corners(cam, depth_min, depth_max)
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for T in poses_cam_to_world:
        w = corners @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
        lo = np.minimum(lo, w.min(axis=0))
        hi = np.maximum(hi, w.max(axis=0))
    lo -= trunc
    hi += trunc
    if clip_bounds is not None and any(abs(b) > 0 for b in clip_bounds):
        cb = np.asarray(clip_bounds, dtype=np.float64)
        lo = np.maximum(lo, cb[[0, 2, 4]])
        hi = np.minimum(hi, cb[[1, 3, 5]])
    vlo = np.floor(lo / voxel_size).astype(np.int64) - 1
    vhi = np.ceil(hi / voxel_size).astype(np.int64) + 1
    return vlo, vhi


# ---------------------------------------------------------------------------
# Allocation (dense occupancy bitmap)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("dims", "num_steps"), donate_argnums=(0,))
def _alloc_frame(
    occupancy: jnp.ndarray,  # [X*Y*Z] bool (flattened)
    depth: jnp.ndarray,  # [H, W]
    rays: jnp.ndarray,  # [H, W, 3] unit-z rays
    rot: jnp.ndarray,  # [3, 3] camera-to-world
    trans: jnp.ndarray,  # [3]
    lo: jnp.ndarray,  # [3] voxel AABB origin
    clip: jnp.ndarray,  # [6] world clip bounds (all-zero = disabled)
    voxel_size: float,
    truncation: float,
    dims: Tuple[int, int, int],
    num_steps: int,
):
    """Scatter ray samples at ±truncation around measured depth into the
    occupancy bitmap (``sparse_voxel_grid.cpp:398-447``)."""
    X, Y, Z = dims
    offs = jnp.linspace(-truncation, truncation, num_steps)

    # process ray steps in chunks with one big scatter each — a scan carrying
    # the (large) occupancy buffer makes XLA copy it per step
    chunk = 8
    pad_steps = (-num_steps) % chunk
    offs = jnp.concatenate([offs, jnp.full(pad_steps, jnp.nan)]) if pad_steps else offs

    for c in range(0, num_steps + pad_steps, chunk):
        off = offs[c : c + chunk]  # [C]
        d = depth[None, :, :] + off[:, None, None]  # [C, H, W]
        pts_cam = rays[None] * d[..., None]
        pts_w = pts_cam @ rot.T + trans
        vox = jnp.round(pts_w / voxel_size).astype(jnp.int32)
        idx = vox - lo.astype(jnp.int32)
        valid = (depth[None] > 0.0) & jnp.isfinite(d)
        valid &= jnp.all(idx >= 0, axis=-1)
        valid &= (idx[..., 0] < X) & (idx[..., 1] < Y) & (idx[..., 2] < Z)
        use_clip = jnp.any(clip != 0.0)
        pw = vox.astype(jnp.float32) * voxel_size
        in_clip = (
            (pw[..., 0] >= clip[0])
            & (pw[..., 0] <= clip[1])
            & (pw[..., 1] >= clip[2])
            & (pw[..., 1] <= clip[3])
            & (pw[..., 2] >= clip[4])
            & (pw[..., 2] <= clip[5])
        )
        valid &= jnp.where(use_clip, in_clip, True)
        flat = (idx[..., 0] * Y + idx[..., 1]) * Z + idx[..., 2]
        flat = jnp.where(valid, flat, X * Y * Z)  # out-of-range → dropped
        occupancy = occupancy.at[flat.reshape(-1)].set(True, mode="drop")
    return occupancy


def _dilate27(occ3d: jnp.ndarray) -> jnp.ndarray:
    """3³ morphological OR — the reference's block dilation around each
    allocated voxel (``sparse_voxel_grid.cpp:449-462``)."""
    p = jnp.pad(occ3d, 1)
    out = jnp.zeros_like(occ3d)
    X, Y, Z = occ3d.shape
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                out = out | p[dx : dx + X, dy : dy + Y, dz : dz + Z]
    return out


class FusionVolume:
    """Streaming TSDF fusion over a fixed scene AABB.

    Usage: construct, `allocate(frame)` for every frame, then `build_grid()`,
    then `integrate(frame)` for every frame, then `finalize()`.
    """

    def __init__(
        self,
        depth_cam: Camera,
        color_cam: Camera,
        voxel_size: float,
        vlo: np.ndarray,
        vhi: np.ndarray,
        depth_min: float,
        depth_max: float,
        clip_bounds: Optional[Tuple[float, ...]] = None,
        integration_weight_sample: float = 10.0,
        alloc_step_factor: float = 0.25,
        mesh=None,
    ):
        """`mesh` (a `jax.sharding.Mesh`) runs the integration pass sharded
        over the mesh's `data` axis: the per-voxel projective update is
        voxel-independent, so the accumulators and world points shard along
        the voxel axis (padded to a device multiple) with images replicated —
        XLA partitions the jitted update from the operand shardings alone
        (no collectives, no shard_map). Allocation (the dense occupancy
        bitmap scatter) stays single-device: it is a few fused scatters over
        a bitmap and is not a memory or time bottleneck."""
        self.depth_cam = depth_cam
        self.color_cam = color_cam
        self.voxel_size = float(voxel_size)
        self.truncation = self.voxel_size * 5.0
        self.depth_min = float(depth_min)
        self.depth_max = float(depth_max)
        self.weight_sample = float(integration_weight_sample)
        self.vlo = np.asarray(vlo, np.int64)
        self.dims = tuple(int(d) for d in (np.asarray(vhi) - self.vlo + 1))
        if np.prod(self.dims) > 1_500_000_000:
            raise MemoryError(f"scene AABB too large for occupancy bitmap: {self.dims}")
        self.clip = np.zeros(6, np.float32)
        if clip_bounds is not None:
            self.clip = np.asarray(clip_bounds, np.float32)
        step = self.voxel_size * alloc_step_factor
        self.num_steps = int(np.floor(2.0 * self.truncation / step)) + 1

        h, w = depth_cam.height, depth_cam.width
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        rays = np.stack(
            [
                (xs - float(depth_cam.cx)) / float(depth_cam.fx),
                (ys - float(depth_cam.cy)) / float(depth_cam.fy),
                np.ones_like(xs),
            ],
            axis=-1,
        )
        self._rays = jnp.asarray(rays)
        self._occ = jnp.zeros(int(np.prod(self.dims)) + 1, dtype=bool)
        self.grid: Optional[VoxelGrid] = None
        self._acc = None
        self._world_pts = None
        self.mesh = mesh
        self._pad = 0

    # -- phase 1: allocation ----------------------------------------------

    def allocate(self, depth: np.ndarray, pose_cam_to_world: np.ndarray) -> None:
        T = np.asarray(pose_cam_to_world, np.float64)
        self._occ = _alloc_frame(
            self._occ,
            jnp.asarray(depth, jnp.float32),
            self._rays,
            jnp.asarray(T[:3, :3], jnp.float32),
            jnp.asarray(T[:3, 3], jnp.float32),
            jnp.asarray(self.vlo, jnp.int32),
            jnp.asarray(self.clip),
            self.voxel_size,
            self.truncation,
            self.dims,
            self.num_steps,
        )

    def allocate_batch(self, depths, poses: np.ndarray) -> None:
        """Allocation pass over a STACK of frames (`[G, H, W]` depths,
        `[G, 4, 4]` camera-to-world poses) as one jitted scan — one program
        and one transfer instead of G dispatches (the per-frame path costs a
        round trip each on a remote link). `depths` may be a device array
        (e.g. the eroded stack reused by `integrate_batch`)."""
        T = np.asarray(poses, np.float64)
        self._occ = _alloc_frames(
            self._occ,
            jnp.asarray(depths, jnp.float32),
            self._rays,
            jnp.asarray(T[:, :3, :3], jnp.float32),
            jnp.asarray(T[:, :3, 3], jnp.float32),
            jnp.asarray(self.vlo, jnp.int32),
            jnp.asarray(self.clip),
            self.voxel_size,
            self.truncation,
            self.dims,
            self.num_steps,
        )

    def integrate_batch(self, depths, colors, poses: np.ndarray) -> None:
        """Integration pass over a STACK of frames; surface normals are
        computed inside the same program (no per-frame eager dispatches).
        Zero-depth padding frames contribute nothing (the `d > 0` gate)."""
        Tinv = np.linalg.inv(np.asarray(poses, np.float64))
        self._acc = _integrate_frames(
            self._acc,
            self._world_pts,
            self._replicated(depths),
            self._replicated(colors),
            jnp.asarray(Tinv[:, :3, :3], jnp.float32),
            jnp.asarray(Tinv[:, :3, 3], jnp.float32),
            self.depth_cam,
            self.color_cam,
            self.truncation,
            self.weight_sample,
            self.depth_min,
            self.depth_max,
        )

    def build_grid(self) -> VoxelGrid:
        occ = np.asarray(self._occ[:-1]).reshape(self.dims)
        occ = np.asarray(_dilate27(jnp.asarray(occ)))
        coords = np.argwhere(occ).astype(np.int64) + self.vlo
        self._occ = None
        self.grid = VoxelGrid.from_coords(
            self.voxel_size, coords, self.depth_min, self.depth_max
        )
        self.grid.integration_weight_sample = self.weight_sample
        n = self.grid.num_voxels
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from intrinsic3d_tpu.parallel.staging import stage_rows, stage_sliced

            ndev = int(self.mesh.devices.size)
            self._pad = (-n) % ndev
            npad = n + self._pad
            pts = np.pad(
                self.grid.voxel_to_world().astype(np.float32),
                ((0, self._pad), (0, 0)),
            )
            # process-local staging (parallel/staging.py): each addressable
            # device's voxel range only — multi-host-valid placement
            self._world_pts = stage_sliced(self.mesh, P("data", None), pts)
            zeros = lambda lo, hi: np.zeros(hi - lo, np.float32)  # noqa: E731
            zeros3 = lambda lo, hi: np.zeros((hi - lo, 3), np.float32)  # noqa: E731
            self._acc = (
                stage_rows(self.mesh, P("data"), (npad,), np.float32, zeros),
                stage_rows(self.mesh, P("data"), (npad,), np.float32, zeros),
                stage_rows(self.mesh, P("data", None), (npad, 3), np.float32, zeros3),
                stage_rows(self.mesh, P("data"), (npad,), np.float32, zeros),
            )
        else:
            self._world_pts = jnp.asarray(self.grid.voxel_to_world())
            self._acc = (
                jnp.zeros(n, jnp.float32),  # Σ w·sdf
                jnp.zeros(n, jnp.float32),  # Σ w
                jnp.zeros((n, 3), jnp.float32),  # Σ w·color (0..255)
                jnp.zeros(n, jnp.float32),  # Σ w (color-valid)
            )
        return self.grid

    # -- phase 2: integration ---------------------------------------------

    def integrate(
        self,
        depth: np.ndarray,
        normals: np.ndarray,
        color: np.ndarray,
        pose_cam_to_world: np.ndarray,
    ) -> None:
        """Accumulate one frame. `depth` should already be eroded; `color` is
        RGB float [0,1] at the color camera's resolution."""
        Tinv = np.linalg.inv(np.asarray(pose_cam_to_world, np.float64))
        self._acc = _integrate_frame(
            self._acc,
            self._world_pts,
            self._replicated(depth),
            self._replicated(normals),
            self._replicated(color),
            jnp.asarray(Tinv[:3, :3], jnp.float32),
            jnp.asarray(Tinv[:3, 3], jnp.float32),
            self.depth_cam,
            self.color_cam,
            self.truncation,
            self.weight_sample,
            self.depth_min,
            self.depth_max,
        )

    def _replicated(self, x):
        """Image stacks as mesh-replicated arrays (mesh mode) so the jitted
        integration has consistent operand placements — process-local
        placement (parallel/staging.py)."""
        if self.mesh is None:
            return jnp.asarray(x, jnp.float32)
        from intrinsic3d_tpu.parallel.staging import stage_replicated

        return stage_replicated(self.mesh, np.asarray(x, np.float32))

    def finalize(self) -> VoxelGrid:
        n = self.grid.num_voxels
        from intrinsic3d_tpu.parallel.staging import to_host_global

        wsdf, w, wc, cw = (to_host_global(a)[:n] for a in self._acc)
        g = self.grid
        seen = w > 0.0
        g.sdf = np.where(seen, wsdf / np.maximum(w, 1e-12), 0.0).astype(np.float32)
        g.weight = w.astype(np.float32)
        cseen = cw > 0.0
        g.color = np.where(
            cseen[:, None], wc / np.maximum(cw, 1e-12)[:, None], 0.0
        ).astype(np.float32)
        return g


@functools.partial(jax.jit, static_argnames=("dims", "num_steps"), donate_argnums=(0,))
def _alloc_frames(
    occupancy,
    depths,  # [G, H, W]
    rays,
    rots,  # [G, 3, 3]
    transs,  # [G, 3]
    lo,
    clip,
    voxel_size: float,
    truncation: float,
    dims,
    num_steps: int,
):
    """`_alloc_frame` scanned over a frame stack (one compiled program)."""

    def body(occ, x):
        d, rot, t = x
        occ = _alloc_frame.__wrapped__(
            occ, d, rays, rot, t, lo, clip, voxel_size, truncation, dims, num_steps
        )
        return occ, None

    occ, _ = jax.lax.scan(body, occupancy, (depths, rots, transs))
    return occ


@functools.partial(jax.jit, static_argnames=(), donate_argnums=(0,))
def _integrate_frames(
    acc,
    world_pts,
    depths,  # [G, H, W]
    colors,  # [G, Hc, Wc, 3]
    rots_w2c,  # [G, 3, 3]
    ts_w2c,  # [G, 3]
    depth_cam: Camera,
    color_cam: Camera,
    truncation: float,
    weight_sample: float,
    depth_min: float,
    depth_max: float,
):
    """`_integrate_frame` scanned over a frame stack, with the cross-product
    surface normals (``processing.cpp:74-126``) computed in-body."""
    from intrinsic3d_tpu.image.processing import compute_normals

    def body(acc, x):
        d, c, rot, t = x
        n = compute_normals(depth_cam, d)
        acc = _integrate_frame.__wrapped__(
            acc, world_pts, d, n, c, rot, t, depth_cam, color_cam,
            truncation, weight_sample, depth_min, depth_max,
        )
        return acc, None

    acc, _ = jax.lax.scan(body, acc, (depths, colors, rots_w2c, ts_w2c))
    return acc


@functools.partial(jax.jit, static_argnames=(), donate_argnums=(0,))
def _integrate_frame(
    acc,
    world_pts,  # [N, 3]
    depth,  # [H, W]
    normals,  # [H, W, 3]
    color,  # [Hc, Wc, 3] RGB in [0,1]
    rot_w2c,  # [3, 3]
    t_w2c,  # [3]
    depth_cam: Camera,
    color_cam: Camera,
    truncation: float,
    weight_sample: float,
    depth_min: float,
    depth_max: float,
):
    """Per-voxel projective TSDF update for one frame
    (``sparse_voxel_grid.cpp:315-391``)."""
    wsdf_acc, w_acc, wc_acc, cw_acc = acc
    h, w = depth.shape
    p = world_pts @ rot_w2c.T + t_w2c  # [N, 3] camera frame
    z = p[:, 2]
    valid = z > 0.0

    # nearest-pixel depth lookup (reference rounds project2)
    zs = jnp.where(z == 0.0, 1e-12, z)
    u = p[:, 0] * depth_cam.fx / zs + depth_cam.cx
    v = p[:, 1] * depth_cam.fy / zs + depth_cam.cy
    ui = jnp.floor(u + 0.5).astype(jnp.int32)
    vi = jnp.floor(v + 0.5).astype(jnp.int32)
    inb = (ui >= 0) & (vi >= 0) & (ui < w) & (vi < h)
    valid &= inb
    uic = jnp.clip(ui, 0, w - 1)
    vic = jnp.clip(vi, 0, h - 1)
    d = depth[vic, uic]
    valid &= d > 0.0

    sdf = d - z
    valid &= sdf > -truncation
    tsdf = jnp.clip(sdf, -truncation, truncation)

    # three-term integration weight (``sparse_voxel_grid.cpp:344-369``)
    n = normals[vic, uic]
    p_norm = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    w_normal = 1.0 - jnp.abs(jnp.sum(p_norm * n, axis=-1))
    w_normal = jnp.clip(w_normal, 0.0, 1.0)
    w_normal = jnp.maximum(weight_sample * robust_kernel(w_normal), 1.0)
    w_dist = jnp.maximum(
        weight_sample * robust_kernel(2.0 * jnp.abs(tsdf) / truncation), 1.0
    )
    d_norm = (d - depth_min) / (depth_max - depth_min)
    w_depth = jnp.maximum(weight_sample * (1.0 - d_norm), 1.0)
    weight_update = jnp.maximum((w_normal + w_dist + w_depth) / 3.0, 3.0)
    weight_update = jnp.where(weight_sample > 0.0, weight_update, 1.0)

    wu = jnp.where(valid, weight_update, 0.0)
    wsdf_acc = wsdf_acc + wu * sdf
    w_acc = w_acc + wu

    # color from the (differently sized) color camera (``:376-387``)
    hc, wc = color.shape[0], color.shape[1]
    uc = p[:, 0] * color_cam.fx / zs + color_cam.cx
    vc = p[:, 1] * color_cam.fy / zs + color_cam.cy
    uci = jnp.floor(uc + 0.5).astype(jnp.int32)
    vci = jnp.floor(vc + 0.5).astype(jnp.int32)
    cinb = (uci >= 0) & (vci >= 0) & (uci < wc) & (vci < hc)
    cval = valid & cinb
    c = color[jnp.clip(vci, 0, hc - 1), jnp.clip(uci, 0, wc - 1)] * 255.0
    cwu = jnp.where(cval, weight_update, 0.0)
    wc_acc = wc_acc + cwu[:, None] * c
    cw_acc = cw_acc + cwu

    return (wsdf_acc, w_acc, wc_acc, cw_acc)
