"""A/B harness: two-grid (V-cycle) preconditioner vs exact Jacobi for the PCG.

Round 3's preconditioner A/B killed per-parameter-block preconditioners and
named multigrid over the voxel hierarchy as the remaining structural option
(BENCH_NOTES "Preconditioner A/B"); VERDICT r3 item 2 asks for the measured
answer. This probes a symmetric two-grid V(1,1) preconditioner for the SDF
block of the (Schur-reduced) voxel system:

- restriction R = 8-child aggregation onto the 2×-coarse voxel grid
  (prolongation P = Rᵀ);
- coarse operator: re-discretized bi-Laplacian λ̃_r·L_cᵀL_c on the coarse
  grid (the E_r Gram dominates the long-range coupling) + restricted
  diagonal remainder, with a tunable spectral scale α on the Laplacian term;
- coarse "solve": fixed-degree Chebyshev polynomial in A_c (linear AND
  symmetric — PCG-safe), eigenvalue bound from a few power iterations;
- smoother: damped Jacobi, symmetric pre/post arrangement;
- albedo block: plain Jacobi (its coupling is local chroma pairs).

Each V-cycle costs TWO extra fine matvecs (the pre/post residual updates),
so the two-grid PCG must cut steps ≳3× to win wall-clock — the probe
measures exactly that: relative residual + TRUE candidate cost per step for
both preconditioners on the same damped system, plus the per-step cost
multiple. Run on CPU at probe scale or TPU at bench scale:

    python tools/bench_twogrid_ab.py --cpu --voxel 0.008 --size 128x96 --frames 5
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--voxel", type=float, default=0.008)
    ap.add_argument("--size", default="128x96")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--mu", type=float, default=1e-4)
    ap.add_argument("--alpha", type=float, default=4.0,
                    help="spectral scale of the coarse bi-Laplacian term")
    ap.add_argument("--cheb", type=int, default=8, help="coarse Chebyshev degree")
    ap.add_argument("--omega", type=float, default=0.6, help="Jacobi smoother damping")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    import jax.numpy as jnp

    from intrinsic3d_tpu.config import RefinementConfig
    from intrinsic3d_tpu.grid.voxel_grid import RING6_OFFSETS, VoxelGrid
    from intrinsic3d_tpu.refine import solver
    from intrinsic3d_tpu.refine.solver import Params, _mask, _tmap
    from intrinsic3d_tpu.synthetic import build_sphere_problem

    cfg = RefinementConfig(
        num_observations=3,
        occlusion_distance=0.04,
        fix_poses=False,
        fix_intrinsics=False,
        fix_distortion=False,
    )
    prob = build_sphere_problem(
        voxel_size=args.voxel,
        image_size=(w, h),
        num_frames=args.frames,
        num_observations=3,
        cfg=cfg,
        perturb_sdf=0.002,
        perturb_albedo=0.05,
    )
    asm, masks0 = prob.assemble()
    params = prob.params
    n = params.sdf.shape[0]
    mu = float(args.mu)
    print(f"problem: {n} voxels, K={args.frames}, mu={mu}", file=sys.stderr)

    # --- joint linearization (flat path: matvec via jax.linearize) ----------
    r0, jlin = jax.linearize(lambda p: solver.residual_stack(p, asm), params)
    jt_raw = jax.linear_transpose(jlin, params)
    jt = lambda y: jt_raw(y)[0]  # noqa: E731
    grad = jt(r0)
    diag = solver.diag_of(params, asm)
    masks = Params(*(m * (d > 0.0) for m, d in zip(masks0, diag)))
    b = _mask(masks, _tmap(lambda g: -g, grad))

    def matvec(v):
        vm = _mask(masks, v)
        jj = jt(jlin(vm))
        damped = _tmap(lambda h_, d, vi: h_ + mu * d * vi, jj, diag, vm)
        return _tmap(lambda dm, mi, vi: mi * dm + (1.0 - mi) * vi, damped, masks, v)

    def tdot(a, bb):
        return sum(
            jnp.vdot(x, y)
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(bb))
        )

    # --- E_r weights / λ̃ for the model operator -----------------------------
    lam_r = float(asm.lam[1])
    er_w = np.asarray(asm.er_w)
    er_idx = np.asarray(asm.er_idx)
    wl_r = er_w * lam_r  # [N] per-residual weight λ̃·w

    # fine model diag remainder: exact Jacobi diag minus the E_r contribution
    dr = np.zeros(n)
    np.add.at(dr, er_idx[:, 0], 36.0 * wl_r)
    for j in range(1, 7):
        np.add.at(dr, er_idx[:, j], wl_r)
    d_sdf = np.asarray(diag.sdf)
    d_rest = np.maximum(d_sdf - dr, 1e-8) + mu * d_sdf

    # --- coarse grid + operators -------------------------------------------
    coords = prob.grid.coords.astype(np.int64)
    cc = coords // 2
    cgrid = VoxelGrid.from_coords(prob.grid.voxel_size * 2, np.unique(cc, axis=0))
    parent = cgrid.lookup(cc)  # [N] coarse index per fine voxel
    assert np.all(parent >= 0)
    nc = cgrid.num_voxels
    cring = cgrid.neighbor_table(RING6_OFFSETS.astype(np.int64))  # [Nc, 6]
    print(f"coarse grid: {nc} voxels", file=sys.stderr)

    free = np.asarray(masks.sdf) > 0.0
    # restriction: mean over FREE children (zero rows for parents w/o free kids)
    cnt = np.zeros(nc)
    np.add.at(cnt, parent[free], 1.0)
    rw = np.where(cnt[parent] > 0, 1.0 / np.maximum(cnt[parent], 1.0), 0.0) * free

    parent_j = jnp.asarray(parent)
    rw_j = jnp.asarray(rw, jnp.float32)

    def restrict(x):  # [N] → [Nc]
        return jnp.zeros(nc, x.dtype).at[parent_j].add(rw_j * x)

    def prolong(xc):  # [Nc] → [N]  (= Rᵀ)
        return rw_j * xc[parent_j]

    # coarse weights: child E_r weights aggregated to parents
    wl_c = np.zeros(nc)
    np.add.at(wl_c, parent, np.asarray(wl_r))
    d_rest_c = np.zeros(nc)
    np.add.at(d_rest_c, parent[free], d_rest[free])

    cring_j = jnp.asarray(np.where(cring >= 0, cring, nc))  # pad → extra row
    wl_c_j = jnp.asarray(wl_c, jnp.float32)
    d_rest_c_j = jnp.asarray(d_rest_c, jnp.float32)
    alpha = float(args.alpha)

    def lap_c(x):  # coarse Laplacian (absent neighbors contribute center)
        xp = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        nb = xp[cring_j]  # [Nc, 6]
        present = (cring_j < nc).astype(x.dtype)
        s = jnp.sum(nb * present + x[:, None] * (1.0 - present), axis=1)
        return s - 6.0 * x

    def a_coarse(x):  # model coarse operator (SPD)
        return alpha * wl_c_j * lap_c(lap_c(x)) * 1.0 + d_rest_c_j * x + 1e-10 * x

    # eigenvalue bound for Chebyshev: a few power iterations
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    for _ in range(12):
        v = a_coarse(v)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
    lmax = float(tdot(v, a_coarse(v))) * 1.1
    lmin = lmax / 30.0  # target the upper spectrum; smoother handles the rest
    print(f"coarse lambda_max ≈ {lmax:.3e}", file=sys.stderr)

    # coarse smoother: damped Jacobi on A_c with a MEASURED spectral step so
    # its polynomial stays positive on the whole spectrum (two earlier
    # variants made the V-cycle indefinite — Chebyshev outside its target
    # interval, and guessed-diagonal Jacobi with a divergent step; both
    # NaN'd the PCG at step 5 — kept in the round-4 notes)
    d_c = alpha * wl_c_j * 42.0 + d_rest_c_j + 1e-10
    vv = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    for _ in range(15):
        vv = a_coarse(vv) / d_c
        vv = vv / jnp.maximum(jnp.linalg.norm(vv), 1e-30)
    lmax_c = float(jnp.vdot(vv, a_coarse(vv) / d_c)) * 1.1
    om_c = 1.5 / max(lmax_c, 1e-6)
    print(f"coarse D^-1 A lambda_max ≈ {lmax_c:.2f} (omega_c {om_c:.3f})", file=sys.stderr)

    def cheb_solve(bc):
        x = jnp.zeros_like(bc)
        for _ in range(args.cheb):
            x = x + om_c * (bc - a_coarse(x)) / d_c
        return x

    # --- the two preconditioners -------------------------------------------
    # fine smoother step from a measured bound on D⁻¹A_ss — FREE rows only
    # (masked rows have ~zero diagonal and identity matvec rows; including
    # them returned λ ≈ 1e12 and killed the smoother entirely)
    free_jf = jnp.asarray(free, jnp.float32)
    dinv0 = free_jf / (jnp.asarray(d_sdf, jnp.float32) * (1.0 + mu) + 1e-12)
    zero_rest = lambda: (jnp.zeros_like(params.albedo), jnp.zeros_like(params.poses), jnp.zeros_like(params.intr), jnp.zeros_like(params.dist))  # noqa: E731

    def a_ss(x):  # free-masked sdf block of the damped operator
        return free_jf * matvec(Params(free_jf * x, *zero_rest())).sdf

    vf = jnp.asarray(rng.standard_normal(n), jnp.float32) * free_jf
    for _ in range(10):
        vf = dinv0 * a_ss(vf)
        vf = vf / jnp.maximum(jnp.linalg.norm(vf), 1e-30)
    lmax_f = float(jnp.vdot(vf, dinv0 * a_ss(vf))) * 1.1
    omega = min(float(args.omega), 1.5 / max(lmax_f, 1e-6))
    print(f"fine D^-1 A lambda_max ≈ {lmax_f:.2f} (omega {omega:.3f})", file=sys.stderr)

    def jacobi(r):
        return _tmap(
            lambda ri, di, mi: mi * ri / (di * (1.0 + mu) + 1e-12) + (1.0 - mi) * ri,
            r,
            diag,
            masks,
        )

    dinv = jnp.asarray(1.0 / (d_sdf * (1.0 + mu) + 1e-12), jnp.float32)
    free_j = jnp.asarray(free, jnp.float32)

    def twogrid(r):
        # SDF block: symmetric V(1,1) — pre-smooth, coarse correction,
        # post-smooth, all on the free-masked sdf sub-block
        rs = free_j * r.sdf
        z1 = omega * dinv0 * rs
        r2 = rs - a_ss(z1)
        z2 = z1 + prolong(cheb_solve(restrict(r2)))
        r3 = rs - a_ss(z2)
        zs = z2 + omega * dinv0 * r3
        others = jacobi(r)
        return Params(free_j * zs + (1.0 - free_j) * r.sdf, others.albedo, others.poses, others.intr, others.dist)

    # --- PCG runs ------------------------------------------------------------
    def run_pcg(precond, matvec_count_per_precond):
        x = _tmap(jnp.zeros_like, b)
        r = b
        z = precond(r)
        p = z
        rz = tdot(r, z)
        rr0 = tdot(b, b)
        hist = []
        for _ in range(args.steps):
            ap_ = matvec(p)
            alpha_ = rz / jnp.maximum(tdot(p, ap_), 1e-30)
            x = _tmap(lambda xi, pi: xi + alpha_ * pi, x, p)
            r = _tmap(lambda ri, api: ri - alpha_ * api, r, ap_)
            z = precond(r)
            rz_new = tdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = _tmap(lambda zi, pi: zi + beta * pi, z, p)
            rz = rz_new
            cand = _tmap(lambda pi, xi, mi: pi + mi * xi, params, x, masks)
            cost = 0.5 * float(jnp.sum(jnp.square(solver.residual_stack(cand, asm))))
            hist.append((float(jnp.sqrt(tdot(r, r) / rr0)), cost))
        return hist

    hist_j = run_pcg(jacobi, 1)
    hist_t = run_pcg(twogrid, 3)

    print("step   jacobi rel | cost      twogrid rel | cost", file=sys.stderr)
    for i, ((rj, cj), (rt, ct)) in enumerate(zip(hist_j, hist_t)):
        print(f"{i+1:4d}   {rj:.4f} | {cj:.6f}    {rt:.4f} | {ct:.6f}", file=sys.stderr)

    def exit_step(hist, eta):
        for i, (rel, _) in enumerate(hist):
            if rel <= eta:
                return i + 1
        return None

    result = {
        "voxels": n,
        "coarse_voxels": nc,
        "frames": args.frames,
        "mu": mu,
        "alpha": alpha,
        "cheb_degree": args.cheb,
        "matvecs_per_step": {"jacobi": 1, "twogrid": 3},
        "jacobi": {
            "exit_eta0.1": exit_step(hist_j, 0.1),
            "exit_eta0.01": exit_step(hist_j, 0.01),
            "cost_at_steps": [round(c, 6) for _, c in hist_j],
        },
        "twogrid": {
            "exit_eta0.1": exit_step(hist_t, 0.1),
            "exit_eta0.01": exit_step(hist_t, 0.01),
            "cost_at_steps": [round(c, 6) for _, c in hist_t],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
