"""A/B harness: exact-Jacobi vs block preconditioners for the GN-PCG solve.

Measures CG convergence (relative residual per step) of the damped normal
equations from `solver.gn_iteration`'s first try_step under three
preconditioners:

- exact Jacobi diag(JᵀJ) (production — ``nls_solver.cpp:305-307`` parity);
- full block: per-pose damped 6×6 JᵀJ blocks + intrinsics 4×4 + distortion
  5×5 + per-voxel 2×2 (sdf, albedo) with the exact E_g cross term over the 4
  matched stencil positions;
- the voxel 2×2 alone.

Result (recorded in BENCH_NOTES "Preconditioner A/B"): on a 36k-voxel,
5-frame sphere problem, none of the block variants moves the η=0.1
inexact-Newton exit (7 steps for Jacobi and full-block alike; voxel-2×2-only
is worse). The conditioning is dominated by long-range sdf stencil coupling,
so richer-than-Jacobi per-parameter-block inverses are a measured dead end —
kept here so the conclusion stays reproducible.

Run on CPU (a few minutes): ``python tools/bench_precond_ab.py``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from intrinsic3d_tpu.config import RefinementConfig
from intrinsic3d_tpu.refine import solver
from intrinsic3d_tpu.refine.residuals import eg_elem
from intrinsic3d_tpu.refine.solver import Params, _mask, _tdot, _tmap
from intrinsic3d_tpu.synthetic import build_sphere_problem

# (sdf10 stencil position, alb4 stencil position) pairs addressing the SAME
# voxel — sdf10 offsets (0,0,0),(0,1,0),…,(1,0,0),… vs alb4 offsets
# v,+x,+y,+z (``shading_cost.h:88-130``)
MATCHED_SDF_ALB = [(0, 0), (6, 1), (1, 2), (4, 3)]


def main(mu: float = 1e-4, iters: int = 16):
    cfg = RefinementConfig(num_observations=3, occlusion_distance=0.04)
    prob = build_sphere_problem(
        voxel_size=0.008,
        image_size=(128, 96),
        num_frames=5,
        num_observations=3,
        cfg=cfg,
        perturb_sdf=0.002,
        perturb_albedo=0.05,
    )
    asm, masks0 = prob.assemble()
    params = prob.params
    n = params.sdf.shape[0]
    k = params.poses.shape[0]
    print(f"problem: {n} voxels, {k} frames")

    r0, jlin = jax.linearize(lambda p: solver.residual_stack(p, asm), params)
    jt_raw = jax.linear_transpose(jlin, params)
    jt = lambda y: jt_raw(y)[0]  # noqa: E731
    grad = jt(r0)
    diag = solver.diag_of(params, asm)
    masks = Params(*(m * (d > 0.0) for m, d in zip(masks0, diag)))
    b = _mask(masks, _tmap(lambda g: -g, grad))

    # element Jacobians [M, 29] exactly as jtj_diag builds them
    local = jnp.concatenate(
        [
            params.sdf[asm.eg_sdf10_idx],
            params.albedo[asm.eg_alb4_idx],
            params.poses[asm.eg_frame],
            jnp.broadcast_to(params.intr, (asm.eg_frame.shape[0], 4)),
            jnp.broadcast_to(params.dist, (asm.eg_frame.shape[0], 5)),
        ],
        axis=-1,
    )
    sqrt_wlam = jnp.sqrt(asm.eg_w * asm.lam[0])
    jac = jax.vmap(
        jax.jacfwd(eg_elem, argnums=0), in_axes=(0, 0, 0, 0, None, None, None, 0)
    )(local, asm.eg_sh, asm.eg_vpos, asm.eg_frame, asm.images, asm.pyr_scale, asm.voxel_size, sqrt_wlam)

    pose_blk = jnp.zeros((k, 6, 6)).at[asm.eg_frame].add(
        jac[:, 14:20, None] * jac[:, None, 14:20]
    )
    intr_blk = jnp.sum(jac[:, 20:24, None] * jac[:, None, 20:24], axis=0)
    dist_blk = jnp.sum(jac[:, 24:29, None] * jac[:, None, 24:29], axis=0)
    cross = jnp.zeros(n)
    for sp, ap in MATCHED_SDF_ALB:
        cross = cross.at[asm.eg_sdf10_idx[:, sp]].add(jac[:, sp] * jac[:, 10 + ap])

    def matvec(v):
        vm = _mask(masks, v)
        jj = jt(jlin(vm))
        damped = _tmap(lambda h, d, vi: h + mu * d * vi, jj, diag, vm)
        return _tmap(lambda dm, mi, vi: mi * dm + (1.0 - mi) * vi, damped, masks, v)

    def run_pcg(precond):
        x = _tmap(jnp.zeros_like, b)
        r = b
        z = precond(r)
        p = z
        rz = _tdot(r, z)
        rr0 = _tdot(b, b)
        hist = []
        for _ in range(iters):
            ap_ = matvec(p)
            alpha = rz / jnp.maximum(_tdot(p, ap_), 1e-30)
            x = _tmap(lambda xi, pi: xi + alpha * pi, x, p)
            r = _tmap(lambda ri, api: ri - alpha * api, r, ap_)
            z = precond(r)
            rz_new = _tdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = _tmap(lambda zi, pi: zi + beta * pi, z, p)
            rz = rz_new
            hist.append(float(jnp.sqrt(_tdot(r, r) / rr0)))
        return hist

    def jacobi(r):
        return _tmap(
            lambda ri, di, mi: mi * ri / (di * (1.0 + mu) + 1e-12) + (1.0 - mi) * ri,
            r,
            diag,
            masks,
        )

    pose_solve = jnp.linalg.inv(
        pose_blk + 1e-12 * jnp.eye(6) + mu * jax.vmap(jnp.diag)(diag.poses)
    )
    intr_solve = jnp.linalg.inv(intr_blk + 1e-12 * jnp.eye(4) + mu * jnp.diag(diag.intr))
    dist_solve = jnp.linalg.inv(dist_blk + 1e-12 * jnp.eye(5) + mu * jnp.diag(diag.dist))
    dss = diag.sdf * (1.0 + mu) + 1e-12
    daa = diag.albedo * (1.0 + mu) + 1e-12
    det = dss * daa - cross * cross
    ok = jnp.abs(det) > 1e-20
    safe_det = jnp.where(ok, det, 1.0)

    def vox2x2(r):
        zs = jnp.where(ok, (daa * r.sdf - cross * r.albedo) / safe_det, r.sdf / dss)
        za = jnp.where(ok, (-cross * r.sdf + dss * r.albedo) / safe_det, r.albedo / daa)
        return zs, za

    def blockp(r):
        zs, za = vox2x2(r)
        z = Params(
            zs,
            za,
            jnp.einsum("kij,kj->ki", pose_solve, r.poses),
            intr_solve @ r.intr,
            dist_solve @ r.dist,
        )
        return _tmap(lambda zi, ri, mi: mi * zi + (1.0 - mi) * ri, z, r, masks)

    def vox_only(r):
        zs, za = vox2x2(r)
        z = Params(
            zs,
            za,
            r.poses / (diag.poses * (1 + mu) + 1e-12),
            r.intr / (diag.intr * (1 + mu) + 1e-12),
            r.dist / (diag.dist * (1 + mu) + 1e-12),
        )
        return _tmap(lambda zi, ri, mi: mi * zi + (1.0 - mi) * ri, z, r, masks)

    h1, h2, h3 = run_pcg(jacobi), run_pcg(blockp), run_pcg(vox_only)
    print("step  jacobi   block(2x2+pose6+intr+dist)   vox2x2-only")
    for i, (a, c, d) in enumerate(zip(h1, h2, h3)):
        print(f"{i + 1:4d}  {a:.4f}   {c:.4f}   {d:.4f}")


if __name__ == "__main__":
    main()
