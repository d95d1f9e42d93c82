"""Pose-observability gate (ADVICE r4: starved pose blocks must not diverge).

A keyframe whose active E_g element count in an iteration falls below
``cfg.min_pose_obs`` has its pose block frozen for that iteration (and
intrinsics/distortion freeze when the TOTAL count is below it). This is a
robustness guard with no reference equivalent: a starved pose block is
rank-deficient, and the Schur-reduced global solve (the production default)
amplifies the rhs along small-Jacobian directions — measured as a 4.2 m pose
jump on the golden sphere scene, silently accepted because an out-of-frustum
camera zeroes its own residuals. See refine/device_assembly.py.
"""

import dataclasses

import numpy as np
import pytest

from intrinsic3d_tpu.config import RefinementConfig
from intrinsic3d_tpu.refine.assembly import build_assembly
from intrinsic3d_tpu.refine.optimizer import optimize_level
from intrinsic3d_tpu.synthetic import build_sphere_problem


@pytest.fixture(scope="module")
def prob():
    cfg = RefinementConfig(
        num_observations=2,
        occlusion_distance=0.04,
        fix_poses=False,
        fix_intrinsics=False,
        fix_distortion=False,
    )
    return build_sphere_problem(
        voxel_size=0.015,
        image_size=(64, 48),
        num_frames=3,
        num_observations=2,
        cfg=cfg,
        perturb_sdf=0.002,
        perturb_albedo=0.05,
    )


def _host_masks(prob, min_pose_obs):
    return build_assembly(
        prob.grid,
        prob.topo,
        prob.params,
        prob.cam,
        prob.depths,
        prob.images,
        prob.voxel_sh,
        prob.thres_shell,
        prob.cfg.occlusion_distance,
        prob.cfg.num_observations,
        prob.cfg.lambda_g,
        prob.cfg.lambda_r0,
        prob.cfg.lambda_s0,
        prob.cfg.lambda_a,
        1.0,
        prob.cfg.fix_poses,
        prob.cfg.fix_intrinsics,
        prob.cfg.fix_distortion,
        min_pose_obs=min_pose_obs,
    )


def test_host_gate_freezes_exactly_the_starved_frames(prob):
    asm, masks0 = _host_masks(prob, 0)
    w = np.asarray(asm.eg_w)
    fr = np.asarray(asm.eg_frame)
    k = prob.params.poses.shape[0]
    counts = np.array([int(((w > 0) & (fr == i)).sum()) for i in range(k)])
    assert counts.min() > 24, "fixture should be healthy at the default threshold"
    assert np.all(np.asarray(masks0.poses) == 1.0)

    # threshold between the min and max per-frame counts: only frames at or
    # above it stay free — pins the counting itself, not just on/off
    thr = int(counts.max())
    _, masks_t = _host_masks(prob, thr)
    expect = (counts >= thr).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(masks_t.poses)[:, 0], expect)
    # the shared camera block stays free: total count >= max(counts) >= thr
    assert np.asarray(masks_t.intr).all()

    # absurd threshold: every pose frozen AND the shared camera block frozen
    _, masks_inf = _host_masks(prob, 10**9)
    assert not np.asarray(masks_inf.poses).any()
    assert not np.asarray(masks_inf.intr).any()
    assert not np.asarray(masks_inf.dist).any()


@pytest.mark.parametrize("mode", ["never", "always"])
def test_device_gate_freezes_poses_in_production_path(prob, mode):
    """`optimize_level` (the fused device-assembly path, dense and bucketed
    layouts) keeps poses bit-identical under an absurd threshold while the
    voxel solve still decreases cost; with the gate off poses move."""
    base = dataclasses.replace(
        prob.cfg, iterations=2, lm_steps=6, frame_bucketing=mode,
        lambda_r0=20.0, lambda_r1=20.0, lambda_s0=20.0, lambda_s1=20.0,
    )
    args = (
        prob.grid, prob.topo, prob.params, None, prob.cam,
        prob.depths, prob.images, prob.voxel_sh, prob.thres_shell,
    )

    def run(min_obs):
        c = dataclasses.replace(base, min_pose_obs=min_obs)
        a = args[:3] + (c,) + args[4:]
        return optimize_level(*a, rgbd_level=0)

    p_gated, _, st_g = run(10**9)
    np.testing.assert_array_equal(
        np.asarray(p_gated.poses), np.asarray(prob.params.poses)
    )
    np.testing.assert_array_equal(
        np.asarray(p_gated.intr), np.asarray(prob.params.intr)
    )
    assert st_g.costs_after[-1] < st_g.costs_before[0]

    p_free, _, _ = run(0)
    assert np.abs(np.asarray(p_free.poses) - np.asarray(prob.params.poses)).max() > 0.0


def test_default_threshold_is_inert_on_healthy_problems(prob):
    """min_pose_obs=24 (the default) must not change a well-observed solve:
    identical trajectories with the gate at 24 and at 0."""
    base = dataclasses.replace(
        prob.cfg, iterations=2, lm_steps=6,
        lambda_r0=20.0, lambda_r1=20.0, lambda_s0=20.0, lambda_s1=20.0,
    )
    args = (
        prob.grid, prob.topo, prob.params, None, prob.cam,
        prob.depths, prob.images, prob.voxel_sh, prob.thres_shell,
    )

    def run(min_obs):
        c = dataclasses.replace(base, min_pose_obs=min_obs)
        a = args[:3] + (c,) + args[4:]
        return optimize_level(*a, rgbd_level=0)

    p24, _, st24 = run(24)
    p0, _, st0 = run(0)
    np.testing.assert_array_equal(np.asarray(p24.poses), np.asarray(p0.poses))
    np.testing.assert_array_equal(np.asarray(p24.sdf), np.asarray(p0.sdf))
    assert st24.costs_after == st0.costs_after
