"""Device-resident damped Gauss-Newton solver with matrix-free PCG.

Replaces Ceres (``libintrinsic3d/src/refinement/nls_solver.cpp``). The reference
runs Levenberg-Marquardt with a CGNR linear solver (CG on the normal equations,
Jacobi preconditioner, ``nls_solver.cpp:305-307``) and terminates after the
first successful LM step so the outer loop can re-collect observations
(``nls_solver.cpp:279-293``).

Here the same algorithm is one jitted function:

- `jax.linearize` gives J·v products of the stacked weighted residual function;
  `jax.linear_transpose` gives Jᵀ·y — so JᵀJ·v is exact and matrix-free, fully
  fused by XLA (no Jacobian ever materialized).
- the Jacobi preconditioner diag(JᵀJ) is exact: vmapped per-element `jacfwd`
  for E_g (29 local parameters), closed forms for E_r/E_s/E_a, scatter-added.
- LM damping `(JᵀJ + μ·diag(JᵀJ))δ = −g` with accept/retry on true cost and the
  reference's terminate-on-first-success semantics; μ (≈ 1/trust-radius) is
  warm-started across outer iterations like the reference's trust region
  (``nls_solver.cpp:322-323``).
- fixed parameters (`SetParameterBlockConstant`) are 0/1 masks applied inside
  the operator; parameters with empty Jacobian columns are auto-fixed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from intrinsic3d_tpu.refine import blockform
from intrinsic3d_tpu.refine.residuals import (
    Assembly,
    Params,
    all_residuals,
    eg_elem,
)


def residual_stack(params: "Params", asm) -> jnp.ndarray:
    """Layout dispatch: the weighted residual vector for either a flat-table
    `Assembly` or a `blockform.BlockAssembly` (same energy, different memory
    layout — see blockform's module docstring)."""
    if isinstance(asm, blockform.BlockAssembly):
        return blockform.block_all_residuals(params, asm)
    return all_residuals(params, asm)


def diag_of(params: "Params", asm) -> "Params":
    if isinstance(asm, blockform.BlockAssembly):
        # the block path derives the diagonal from its explicit linearization
        _, lin = blockform.linearize_block(params, asm)
        return blockform.diag_from_lin(lin, asm)
    return jtj_diag(params, asm)


class Masks(NamedTuple):
    """0/1 free-parameter masks, same structure as Params."""

    sdf: jnp.ndarray
    albedo: jnp.ndarray
    poses: jnp.ndarray
    intr: jnp.ndarray
    dist: jnp.ndarray


def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def _tdot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def _make_spmd(axis_name: Optional[str]):
    """SPMD reduction helpers for manual sharding (parallel/spmd.py): under
    shard_map the voxel-shaped Params leaves (sdf/albedo) are device-LOCAL
    bricks while poses/intr/dist are replicated — tree dots psum the local
    part only, global-parameter reductions psum, scalars psum. With
    `axis_name=None` every helper is the identity/single-device form."""
    if axis_name is None:
        return _tdot, lambda p: p, lambda x: x

    def tdot(a, b):
        local = jnp.vdot(a.sdf, b.sdf) + jnp.vdot(a.albedo, b.albedo)
        rep = (
            jnp.vdot(a.poses, b.poses)
            + jnp.vdot(a.intr, b.intr)
            + jnp.vdot(a.dist, b.dist)
        )
        return jax.lax.psum(local, axis_name) + rep

    def psum_globals(p: Params) -> Params:
        return p._replace(
            poses=jax.lax.psum(p.poses, axis_name),
            intr=jax.lax.psum(p.intr, axis_name),
            dist=jax.lax.psum(p.dist, axis_name),
        )

    def psum_scalar(x):
        return jax.lax.psum(x, axis_name)

    return tdot, psum_globals, psum_scalar


def _mask(m: Masks, v: Params) -> Params:
    return Params(*(mi * vi for mi, vi in zip(m, v)))


# ---------------------------------------------------------------------------
# Exact Jacobi preconditioner diag(JᵀJ)
# ---------------------------------------------------------------------------


def jtj_diag(params: Params, asm: Assembly) -> Params:
    """Exact diag(JᵀJ) of the weighted residual stack."""
    n = params.sdf.shape[0]
    k = params.poses.shape[0]

    # E_g via vmapped forward-mode element Jacobians [M, 29]
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
        jax.jacfwd(eg_elem, argnums=0),
        in_axes=(0, 0, 0, 0, None, None, None, 0),
    )(local, asm.eg_sh, asm.eg_vpos, asm.eg_frame, asm.images, asm.pyr_scale, asm.voxel_size, sqrt_wlam)
    j2 = jac * jac  # [M, 29]

    d_sdf = jnp.zeros(n, params.sdf.dtype).at[asm.eg_sdf10_idx].add(j2[:, :10])
    d_alb = jnp.zeros(n, params.albedo.dtype).at[asm.eg_alb4_idx].add(j2[:, 10:14])
    d_pose = jnp.zeros((k, 6), params.poses.dtype).at[asm.eg_frame].add(j2[:, 14:20])
    d_intr = jnp.sum(j2[:, 20:24], axis=0)
    d_dist = jnp.sum(j2[:, 24:29], axis=0)

    # E_r: ∂lap/∂center = −6, ∂lap/∂nbr = 1 (weighted)
    wl_r = asm.er_w * asm.lam[1]
    d_sdf = d_sdf.at[asm.er_idx[:, 0]].add(36.0 * wl_r)
    d_sdf = d_sdf.at[asm.er_idx[:, 1:]].add(jnp.broadcast_to(wl_r[:, None], asm.er_idx[:, 1:].shape))

    # E_s: ∂r/∂sdf = 1
    d_sdf = d_sdf.at[asm.es_idx].add(asm.es_w * asm.lam[2])

    # E_a: ∂r/∂a_i = 1, ∂r/∂a_j = −1
    wl_a = asm.ea_w * asm.lam[3]
    d_alb = d_alb.at[asm.ea_pairs[:, 0]].add(wl_a)
    d_alb = d_alb.at[asm.ea_pairs[:, 1]].add(wl_a)

    return Params(d_sdf, d_alb, d_pose, d_intr, d_dist)


# ---------------------------------------------------------------------------
# PCG on the damped normal equations
# ---------------------------------------------------------------------------


def _pcg(matvec, precond, b: Params, iters: int, eta: float = 0.1, tdot=_tdot):
    """Preconditioned CG with the inexact-Newton forcing-sequence exit the
    reference's CGNR uses (Ceres solves the Newton system only to a relative
    tolerance η per LM step): stop when ‖r‖ ≤ η·‖b‖ or after `iters`.
    `tdot` is the tree inner product (psum-reduced under manual SPMD).
    Returns (x, steps_taken)."""
    x = _tmap(jnp.zeros_like, b)
    r = b
    z = precond(r)
    p = z
    rz = tdot(r, z)
    rr0 = tdot(b, b)
    tol2 = (eta * eta) * rr0

    def cond(state):
        x, r, p, rz, i = state
        return (i < iters) & (tdot(r, r) > tol2)

    def body(state):
        x, r, p, rz, i = state
        ap = matvec(p)
        alpha = rz / jnp.maximum(tdot(p, ap), 1e-30)
        x = _tmap(lambda xi, pi: xi + alpha * pi, x, p)
        r = _tmap(lambda ri, api: ri - alpha * api, r, ap)
        z = precond(r)
        rz_new = tdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = _tmap(lambda zi, pi: zi + beta * pi, z, p)
        return x, r, p, rz_new, i + 1

    x, _, _, _, steps = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.int32(0)))
    return x, steps


# ---------------------------------------------------------------------------
# One Gauss-Newton relinearization: solve + accept/retry
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "lm_steps", "cg_iters", "cg_coeff_dtype", "axis_name", "schur_globals",
        "cg_eta", "eg_chunks",
    ),
)
def gn_iteration(
    params: Params,
    asm: Assembly,
    masks: Masks,
    mu: jnp.ndarray,
    lm_steps: int = 50,
    cg_iters: int = 12,
    cg_coeff_dtype: str = "bfloat16",
    axis_name: Optional[str] = None,
    schur_globals: bool = False,
    cg_eta: float = 0.1,
    eg_chunks: int = 1,
) -> Tuple[Params, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One relinearize→solve→accept cycle (the body of the reference's outer
    iteration, ``optimizer.cpp:119-173`` + ``nls_solver.cpp:296-337``).

    `cg_coeff_dtype` (block path only) is the storage dtype of the dense E_g
    coefficient fields INSIDE the PCG loop: the gradient, the exact Jacobi
    diagonal, the residuals, and every accumulation stay f32 — only the
    matvec's streamed J coefficients are rounded (see `blockform.cast_lin`;
    pass "float32" for exact products).

    `axis_name` enables manual-SPMD mode (called from inside shard_map —
    parallel/spmd.py): voxel-shaped leaves are device-local bricks, and the
    global reductions (cost scalars, pose/intrinsics/distortion gradients and
    GN products, PCG inner products) psum over the named axis.

    `eg_chunks > 1` (block path only) STREAMS the E_g linearization and the
    LM acceptance forward over frame chunks
    (`blockform.linearize_block_chunked` / `block_total_cost`): transients
    are bounded at `ceil(K/eg_chunks)` frames' worth of element temps while
    only the compact coefficient fields (in `cg_coeff_dtype`) persist
    through the PCG — the memory-forced finest level keeps the reference's
    exact per-voxel top-N over ALL frames (``colorization.cpp:357-370``)
    instead of trimming observation coverage. The gradient/diagonal/global
    Gram are then derived from the cast fields (f32-accumulated).

    Returns (params', cost_before, cost_after, mu', num_tries).
    """
    tdot, psum_globals, psum_scalar = _make_spmd(axis_name)
    chunked = eg_chunks > 1 and isinstance(asm, blockform.BlockAssembly)
    if isinstance(asm, blockform.BlockAssembly):
        # hand-rolled linearization: ONE reverse pass for the E_g element
        # Jacobian, dense frame-major (keyframe, slot) coefficient fields, and a matvec that is
        # pure dense math + one-hot matmuls (see blockform.BlockLin)
        if chunked:
            cost0, lin = blockform.linearize_block_chunked(
                params, asm, eg_chunks, jnp.dtype(cg_coeff_dtype)
            )
        else:
            cost0, lin = blockform.linearize_block(params, asm)
        cost0 = psum_scalar(cost0)
        grad = psum_globals(
            blockform.jtv_block(lin, asm, (lin.r0_g, lin.r0_r, lin.r0_s, lin.r0_a))
        )
        diag = psum_globals(blockform.diag_from_lin(lin, asm))
        if not chunked and cg_coeff_dtype != "float32":
            lin = blockform.cast_lin(lin, jnp.dtype(cg_coeff_dtype))
        jlin = lambda v: blockform.jv_block(lin, asm, v)  # noqa: E731
        jt = lambda y: (psum_globals(blockform.jtv_block(lin, asm, y)),)  # noqa: E731
    else:
        r0, jlin = jax.linearize(lambda p: residual_stack(p, asm), params)
        jt_raw = jax.linear_transpose(jlin, params)
        jt = lambda y: (psum_globals(jt_raw(y)[0]),)  # noqa: E731
        cost0 = psum_scalar(0.5 * jnp.sum(r0 * r0))
        grad = jt(r0)[0]
        diag = psum_globals(diag_of(params, asm))
    # auto-fix parameters that appear in no residual (zero Jacobian column);
    # convert to Params so tree_maps see one pytree type
    masks = Params(*(m * (d > 0.0) for m, d in zip(masks, diag)))
    b = _mask(masks, _tmap(lambda g: -g, grad))

    if chunked:
        cost_of = lambda cand: psum_scalar(  # noqa: E731
            blockform.block_total_cost(cand, asm, eg_chunks)
        )
    else:
        cost_of = lambda cand: psum_scalar(  # noqa: E731
            0.5 * jnp.sum(jnp.square(residual_stack(cand, asm)))
        )

    if schur_globals and isinstance(asm, blockform.BlockAssembly):
        # Schur-complement out the dense global block {poses, intr, dist}
        # (SURVEY §7.1/§5.8; Ceres runs joint CGNR instead,
        # nls_solver.cpp:305-307): PCG runs on the voxel space only, with the
        # global coupling eliminated EXACTLY through the damped [G, G] Gram
        # matrix. Folding −J_g·u into the cotangent before the stencil
        # transpose keeps the reduced matvec at ONE J/Jᵀ pair per CG step.
        k = params.poses.shape[0]
        C = psum_scalar(blockform.global_gram(lin))
        mg = blockform.flatten_globals(masks.poses, masks.intr, masks.dist)
        dg = blockform.flatten_globals(diag.poses, diag.intr, diag.dist)
        bg = blockform.flatten_globals(b.poses, b.intr, b.dist)
        zerog = (
            jnp.zeros_like(params.poses),
            jnp.zeros_like(params.intr),
            jnp.zeros_like(params.dist),
        )

        def tdot2(a, bb):
            return psum_scalar(jnp.vdot(a[0], bb[0]) + jnp.vdot(a[1], bb[1]))

        def psum_g3(gp, gi, gd):
            if axis_name is None:
                return gp, gi, gd
            return (
                jax.lax.psum(gp, axis_name),
                jax.lax.psum(gi, axis_name),
                jax.lax.psum(gd, axis_name),
            )

        def try_step(mu):
            # damped global Gram, fixed dims pinned to identity
            Ct = mg[:, None] * (C + mu * jnp.diag(dg)) * mg[None, :]
            Ct = Ct + jnp.diag(jnp.where(mg > 0.0, 1e-12, 1.0))
            chol_g = jnp.linalg.cholesky(Ct)

            def csolve(z):
                zc = (mg * z)[:, None]
                u = jax.scipy.linalg.solve_triangular(chol_g, zc, lower=True)
                u = jax.scipy.linalg.solve_triangular(chol_g.T, u, lower=False)
                return mg * u[:, 0]

            def reduced_apply(vs, va):
                y_g, y_r, y_s, y_a = blockform.jv_block(
                    lin, asm, Params(vs, va, *zerog), include_globals=False
                )
                z = blockform.flatten_globals(
                    *psum_g3(*blockform.jgt_apply(lin, y_g))
                )
                up, ui, ud = blockform.unflatten_globals(csolve(z), k)
                y_g2 = y_g - blockform.jg_apply(lin, up, ui, ud)
                out = blockform.jtv_block(
                    lin, asm, (y_g2, y_r, y_s, y_a), include_globals=False
                )
                return out.sdf, out.albedo

            # reduced rhs: bᵥ − B·C̃⁻¹·b_g   (B·y = Jᵥᵀ(J_g y), E_g rows only)
            y0 = blockform.jg_apply(
                lin, *blockform.unflatten_globals(csolve(bg), k)
            )
            corr = blockform.jtv_block(
                lin,
                asm,
                (
                    y0,
                    jnp.zeros_like(lin.r0_r),
                    jnp.zeros_like(lin.r0_s),
                    jnp.zeros_like(lin.r0_a),
                ),
                include_globals=False,
            )
            b2 = (
                masks.sdf * (b.sdf - corr.sdf),
                masks.albedo * (b.albedo - corr.albedo),
            )

            def matvec(v2):
                vs = masks.sdf * v2[0]
                va = masks.albedo * v2[1]
                hs, ha = reduced_apply(vs, va)
                hs = hs + mu * diag.sdf * vs
                ha = ha + mu * diag.albedo * va
                return (
                    masks.sdf * hs + (1.0 - masks.sdf) * v2[0],
                    masks.albedo * ha + (1.0 - masks.albedo) * v2[1],
                )

            def precond(r2):
                return tuple(
                    mi * ri / (di * (1.0 + mu) + 1e-12) + (1.0 - mi) * ri
                    for ri, di, mi in zip(
                        r2, (diag.sdf, diag.albedo), (masks.sdf, masks.albedo)
                    )
                )

            (ds, da), _ = _pcg(matvec, precond, b2, cg_iters, eta=cg_eta, tdot=tdot2)
            ds = masks.sdf * ds
            da = masks.albedo * da
            # back-substitution: δ_g = C̃⁻¹(b_g − J_gᵀ Jᵥ δᵥ)
            yv = blockform.jv_block(
                lin, asm, Params(ds, da, *zerog), include_globals=False
            )[0]
            zv = blockform.flatten_globals(
                *psum_g3(*blockform.jgt_apply(lin, yv))
            )
            dp, di_, dd = blockform.unflatten_globals(csolve(bg - zv), k)
            delta = Params(ds, da, dp, di_, dd)
            cand = _tmap(lambda p, d: p + d, params, delta)
            cost = cost_of(cand)
            # LM model reduction ½·δᵀ(μDδ − g) for the gain ratio (exact at
            # exact solves; the PCG's inexact-Newton residual only perturbs
            # the μ schedule, never correctness — acceptance stays on true
            # cost)
            pred = 0.5 * (
                tdot(delta, b) + mu * tdot(delta, _tmap(lambda d_, v: d_ * v, diag, delta))
            )
            return cand, cost, pred

    else:

        def try_step(mu):
            def matvec(v):
                vm = _mask(masks, v)
                jj = jt(jlin(vm))[0]
                damped = _tmap(lambda h, d, vi: h + mu * d * vi, jj, diag, vm)
                return _tmap(
                    lambda dm, mi, vi: mi * dm + (1.0 - mi) * vi, damped, masks, v
                )

            def precond(r):
                return _tmap(
                    lambda ri, di, mi: mi * ri / (di * (1.0 + mu) + 1e-12)
                    + (1.0 - mi) * ri,
                    r,
                    diag,
                    masks,
                )

            delta, _ = _pcg(matvec, precond, b, cg_iters, eta=cg_eta, tdot=tdot)
            delta = _mask(masks, delta)
            cand = _tmap(lambda p, d: p + d, params, delta)
            cost = cost_of(cand)
            pred = 0.5 * (
                tdot(delta, b) + mu * tdot(delta, _tmap(lambda d_, v: d_ * v, diag, delta))
            )
            return cand, cost, pred

    def cond(state):
        tries, accepted, mu, nu, _, _ = state
        return (~accepted) & (tries < lm_steps)

    def body(state):
        tries, _, mu, nu, best_params, best_cost = state
        cand, cost, pred = try_step(mu)
        accepted = cost < cost0
        new_params = jax.tree_util.tree_map(
            lambda c, b: jnp.where(accepted, c, b), cand, best_params
        )
        new_cost = jnp.where(accepted, cost, best_cost)
        # Ceres' Levenberg-Marquardt trust-region update
        # (``levenberg_marquardt_strategy.cc``): the damping decay is scaled
        # by the GAIN RATIO ρ = actual/model cost reduction — radius grows by
        # up to 3x only for near-perfect steps (ρ→1); mediocre accepted steps
        # keep μ, so the schedule stops oscillating around the acceptance
        # threshold (the previous unconditional μ/3 re-crossed it every
        # iteration and paid one rejected solve per relinearization —
        # measured mean tries 2.0 at pipeline scale). Rejection stiffens by
        # the doubling ν instead of a fixed 4x.
        rho = (cost0 - cost) / jnp.maximum(pred, 1e-30)
        # Ceres: radius /= max(1/3, 1−(2ρ−1)³) — i.e. μ shrinks by up to 3x
        # for near-perfect steps and GROWS by up to 2x for barely-accepted
        # ones (ρ < ½ gives a factor > 1)
        decay = jnp.clip(1.0 - (2.0 * rho - 1.0) ** 3, 1.0 / 3.0, 2.0)
        new_mu = jnp.where(
            accepted,
            jnp.maximum(mu * decay, 1e-10),
            jnp.minimum(mu * nu, 1e8),
        )
        new_nu = jnp.where(accepted, jnp.float32(2.0), jnp.minimum(nu * 2.0, 64.0))
        return tries + 1, accepted, new_mu, new_nu, new_params, new_cost

    tries, accepted, mu, _, out_params, cost1 = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False), mu, jnp.float32(2.0), params, cost0)
    )
    return out_params, cost0, cost1, mu, tries
