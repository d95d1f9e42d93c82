"""Camera-parameter refinement tests: perturb poses/intrinsics, let the GN
solver recover them — end-to-end validation of the pose (angle-axis) and
intrinsics Jacobian chains through the shading cost."""

import numpy as np
import jax.numpy as jnp
import pytest

from intrinsic3d_tpu.config import RefinementConfig
from intrinsic3d_tpu.refine.solver import gn_iteration
from intrinsic3d_tpu.synthetic import build_sphere_problem


def run_iters(prob, params, iters=6, lm=8, cg=12, cameras_only=False):
    mu = jnp.float32(1e-4)
    prob.params = params
    for _ in range(iters):
        asm, masks = prob.assemble()
        if cameras_only:
            # isolate the camera-parameter Jacobians: freeze voxel params
            masks = masks._replace(
                sdf=jnp.zeros_like(masks.sdf), albedo=jnp.zeros_like(masks.albedo)
            )
        params, c0, c1, mu, _ = gn_iteration(params, asm, masks, mu, lm, cg)
        prob.params = params
    return params, float(c1)


@pytest.fixture(scope="module")
def base_problem():
    cfg = RefinementConfig(
        num_observations=3,
        occlusion_distance=0.03,
        lambda_r0=20.0,
        lambda_r1=20.0,
        lambda_s0=20.0,
        lambda_s1=20.0,
        lambda_a=0.1,
    )
    return cfg


def test_pose_recovery(base_problem):
    cfg = base_problem._replace() if hasattr(base_problem, "_replace") else base_problem
    import dataclasses

    cfg = dataclasses.replace(cfg, fix_poses=False, fix_intrinsics=True, fix_distortion=True)
    prob = build_sphere_problem(
        voxel_size=0.0075, image_size=(128, 96), num_frames=3, num_observations=3, cfg=cfg
    )
    true_poses = np.asarray(prob.params.poses).copy()
    rng = np.random.default_rng(0)
    # perturb rotations (~1 deg) and translations (~5 mm) — large relative to
    # the discretization bias floor; frame 0 stays fixed as gauge anchor
    bad = true_poses.copy()
    bad[1:, :3] += rng.normal(0, 0.05, bad[1:, :3].shape)
    bad[1:, 3:] += rng.normal(0, 0.01, bad[1:, 3:].shape)
    params = prob.params._replace(poses=jnp.asarray(bad, jnp.float32))

    err0_rot = np.abs(bad[1:, :3] - true_poses[1:, :3]).mean()
    err0_t = np.abs(bad[1:, 3:] - true_poses[1:, 3:]).mean()

    out, cost = run_iters(prob, params, iters=12, cameras_only=True)
    got = np.asarray(out.poses)
    err1_rot = np.abs(got[1:, :3] - true_poses[1:, :3]).mean()
    err1_t = np.abs(got[1:, 3:] - true_poses[1:, 3:]).mean()
    # The gradient-difference shading term is a low-frequency photometric
    # signal on a smooth synthetic sphere, and the frozen voxel-discretized
    # model biases the energy minimum a fraction of a voxel off the truth —
    # assert the optimizer moves the cameras toward the true poses and keeps
    # translations bounded (sub-voxel-scale drift is the model's bias floor).
    assert err1_rot < 0.9 * err0_rot
    assert err1_t < max(err0_t, 2.0 * prob.grid.voxel_size)


def test_distortion_recovery(base_problem):
    """End-to-end distortion recovery through ``gn_iteration``: the capture is
    rendered through a lens with nonzero k1/k2/p1 (``camera.h:92-126``,
    ``synthetic._pixel_ray_dirs`` inverts the model per pixel), the tangential
    coefficients start from zero with the distortion block free, and the
    solver must recover them — the distortion twin of the pose/intrinsics
    recovery tests above.

    What is asserted — and why only that — was MEASURED (round 4): the
    tangential (p1, p2) warp components are shift-like and recover end to end
    exactly like poses do. The radial (k1, k2, k3) components are NOT
    end-to-end identifiable on this energy from a standing start: their image
    effect is a radial magnification, and the gradient-difference data term
    carries a magnification-coupled sampling bias (bicubic-sampled image
    gradients vs voxel-discretized shading gradients differ systematically in
    magnitude, so the energy's slope in the k-direction at the true lens is
    nonzero — verified by direct cost-vs-t·k scans on both silhouette and
    full-frame captures, with the minimum displaced far from truth while the
    matched lens still beats same-size mismatches symmetrically for
    tangential/pose directions). Ceres faces the same landscape; the
    reference uses the distortion block as a local refinement around the
    calibrated lens (``data/intrinsic3d.yml`` fix_distortion: 0 with
    dataset-calibrated intrinsics). The radial Jacobian chain itself is
    validated against finite differences below."""
    import dataclasses

    cfg = dataclasses.replace(
        base_problem, fix_poses=True, fix_intrinsics=True, fix_distortion=False
    )
    true_dist = np.array([0.08, -0.04, 0.0, 0.10, -0.06], np.float32)
    prob = build_sphere_problem(
        voxel_size=0.0075,
        image_size=(128, 96),
        num_frames=3,
        num_observations=3,
        cfg=cfg,
        dist=true_dist,
    )
    assert np.allclose(np.asarray(prob.params.dist), true_dist)
    # start: true radial, ZERO tangential — radial frozen at calibration
    # (the identifiable-direction split measured above); the tangential
    # magnitudes give a multi-pixel warp, well above the sub-pixel
    # discretization-bias floor that swallows weaker lenses
    start = true_dist.copy()
    start[3:] = 0.0
    params = prob.params._replace(dist=jnp.asarray(start))

    mu = jnp.float32(1e-4)
    prob.params = params
    cost_first = cost_last = None
    for it in range(40):
        asm, masks = prob.assemble()
        masks = masks._replace(
            sdf=jnp.zeros_like(masks.sdf),
            albedo=jnp.zeros_like(masks.albedo),
            dist=jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0], jnp.float32),
        )
        params, c0, c1, mu, _ = gn_iteration(params, asm, masks, mu, 8, 12)
        prob.params = params
        if it == 0:
            cost_first = float(c0)
        cost_last = float(c1)
    got = np.asarray(params.dist)

    np.testing.assert_array_equal(got[:3], true_dist[:3])  # frozen radial
    assert cost_last < cost_first
    err0 = float(np.abs(true_dist[3:]).mean())
    err1 = float(np.abs(got[3:] - true_dist[3:]).mean())
    # measured on this scenario: ~54% of the tangential error recovered in 40
    # relinearizations (p1 0→0.041 of 0.10, p2 0→−0.032 of −0.06), still
    # converging — assert a margin below that
    assert err1 < 0.7 * err0, (got, true_dist)
    assert got[3] > 0.3 * true_dist[3], got  # correct sign + real progress
    assert got[4] < 0.3 * true_dist[4], got


def test_camera_gradients_match_finite_differences(base_problem):
    """Observability-free validation of the pose/intrinsics/distortion
    Jacobian chains: autodiff gradient of the total cost vs central finite
    differences."""
    import dataclasses
    import jax

    jax.config.update("jax_enable_x64", True)
    from intrinsic3d_tpu.refine.residuals import total_cost

    cfg = dataclasses.replace(
        base_problem, fix_poses=False, fix_intrinsics=False, fix_distortion=False
    )
    prob = build_sphere_problem(
        voxel_size=0.01, image_size=(100, 80), num_frames=3, num_observations=3, cfg=cfg,
        perturb_sdf=0.002, perturb_albedo=0.05,
    )
    asm, _ = prob.assemble()
    # f64 throughout: the f32 sum over ~10^5 squared residuals has enough
    # rounding noise to swamp central differences
    import jax.numpy as jnp2

    asm = jax.tree_util.tree_map(
        lambda a: a.astype(jnp2.float64) if a.dtype == jnp2.float32 else a, asm
    )
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp2.float64), prob.params
    )
    grad = jax.grad(lambda p: total_cost(p, asm))(params)

    def fd(update, eps):
        cp = float(total_cost(update(eps), asm))
        cm = float(total_cost(update(-eps), asm))
        return (cp - cm) / (2 * eps)

    checks = []
    for k in range(6):  # pose of frame 1
        e = np.zeros((3, 6), np.float32)
        e[1, k] = 1.0
        g_fd = fd(lambda s: params._replace(poses=params.poses + s * e), 1e-4)
        checks.append((float(grad.poses[1, k]), g_fd))
    for k in range(4):  # intrinsics
        e = np.zeros(4, np.float32)
        e[k] = 1.0
        g_fd = fd(lambda s: params._replace(intr=params.intr + s * e), 1e-2)
        checks.append((float(grad.intr[k]), g_fd))
    for k in range(5):  # distortion
        e = np.zeros(5, np.float32)
        e[k] = 1.0
        g_fd = fd(lambda s: params._replace(dist=params.dist + s * e), 1e-4)
        checks.append((float(grad.dist[k]), g_fd))

    try:
        for g_ad, g_fd in checks:
            scale = max(abs(g_ad), abs(g_fd), 1e-3)
            # 5% tolerance: the cost is only C⁰ where elements cross image-validity
            # borders, so a few entries carry O(eps) kink error
            assert abs(g_ad - g_fd) / scale < 0.05, (g_ad, g_fd)
    finally:
        jax.config.update("jax_enable_x64", False)
