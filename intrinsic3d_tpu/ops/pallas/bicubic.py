"""Pallas TPU kernel: masked one-hot Catmull-Rom bicubic sampling.

The batched bicubic sampler (the per-element image taps of the E_g shading
cost, ``cost.h:108-127``) is MXU-flop-bound in its XLA one-hot form: every
(obs, slot) element pays a `[chunk, K·H] @ [K·H, W]` row-select matmul even
though only ~10-15% of dense elements are active (BENCH_NOTES.md). This
kernel keeps the one-hot-matmul formulation (the MXU does the row gathering;
a gather would run at ~71M rows/s) and adds what XLA cannot express:

- **chunk skipping** — a per-chunk any-active scalar (scalar-prefetch style
  input in SMEM) predicates the whole body with `@pl.when`; skipped chunks
  write zeros and spend no MXU cycles;
- **an analytic 2-dot backward** (custom_vjp): d/dx and d/dy re-use the same
  one-hot structure with derivative weights — no checkpoint replay and no
  saved `[nchunks, chunk, K·H]` residuals (73 GB OOM in the naive vjp).

The image stack stays resident in VMEM across the grid (a few MB for
keyframe batches; callers fall back to the XLA sampler when K·H is large).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512


def _catrom_w(t):
    t2 = t * t
    t3 = t2 * t
    return (
        -0.5 * t + t2 - 0.5 * t3,
        1.0 - 2.5 * t2 + 1.5 * t3,
        0.5 * t + 2.0 * t2 - 1.5 * t3,
        -0.5 * t2 + 0.5 * t3,
    )


def _catrom_dw(t):
    t2 = t * t
    return (
        -0.5 + 2.0 * t - 1.5 * t2,
        -5.0 * t + 4.5 * t2,
        0.5 + 4.0 * t - 4.5 * t2,
        -t + 1.5 * t2,
    )


def _onehot_rows(idx0, wts, width):
    """[chunk, width] one-hot: row e has wts[j][e] at column idx0[e]+j."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx0.shape[0], width), 1)
    sel = jnp.zeros((idx0.shape[0], width), jnp.float32)
    for j in range(4):
        sel = sel + jnp.where(iota == (idx0 + j)[:, None], wts[j][:, None], 0.0)
    return sel


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _row_mix(img_hi, img_lo, r0, wy4):
    """Σ_j wy4[j]·image_row[r0+j]: [chunk, W].

    Manual bf16x3 (Mosaic supports only DEFAULT/HIGHEST dot precision, and
    HIGHEST costs ~6 bf16 passes): split both operands into bf16 hi+lo and
    take the three dominant products with f32 accumulation — the same ~1e-7
    relative error as XLA's Precision.HIGH at half the HIGHEST cost."""
    sel = _onehot_rows(r0, wy4, img_hi.shape[0])
    s_hi, s_lo = _split_bf16(sel)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    return dot(s_hi, img_hi[:]) + dot(s_hi, img_lo[:]) + dot(s_lo, img_hi[:])


def _fwd_kernel(act_ref, r0_ref, ty_ref, c0_ref, tx_ref, img_hi_ref, img_lo_ref, out_ref):
    @pl.when(act_ref[pl.program_id(0)] > 0)
    def _():
        ty = ty_ref[0, 0, :]
        tx = tx_ref[0, 0, :]
        a = _row_mix(img_hi_ref, img_lo_ref, r0_ref[0, 0, :], _catrom_w(ty))  # [chunk, W]
        colw = _onehot_rows(c0_ref[0, 0, :], _catrom_w(tx), img_hi_ref.shape[1])
        out_ref[0, 0, :] = jnp.sum(a * colw, axis=-1)

    @pl.when(act_ref[pl.program_id(0)] == 0)
    def _():
        out_ref[0, 0, :] = jnp.zeros_like(out_ref[0, 0, :])


def _bwd_kernel(act_ref, r0_ref, ty_ref, c0_ref, tx_ref, g_ref, img_hi_ref, img_lo_ref, dx_ref, dy_ref):
    @pl.when(act_ref[pl.program_id(0)] > 0)
    def _():
        ty = ty_ref[0, 0, :]
        tx = tx_ref[0, 0, :]
        g = g_ref[0, 0, :]
        w = img_hi_ref.shape[1]
        # d/dty: derivative row weights, original column weights
        a_dy = _row_mix(img_hi_ref, img_lo_ref, r0_ref[0, 0, :], _catrom_dw(ty))
        colw = _onehot_rows(c0_ref[0, 0, :], _catrom_w(tx), w)
        dy_ref[0, 0, :] = g * jnp.sum(a_dy * colw, axis=-1)
        # d/dtx: original row weights, derivative column weights
        a = _row_mix(img_hi_ref, img_lo_ref, r0_ref[0, 0, :], _catrom_w(ty))
        dcolw = _onehot_rows(c0_ref[0, 0, :], _catrom_dw(tx), w)
        dx_ref[0, 0, :] = g * jnp.sum(a * dcolw, axis=-1)

    @pl.when(act_ref[pl.program_id(0)] == 0)
    def _():
        dx_ref[0, 0, :] = jnp.zeros_like(dx_ref[0, 0, :])
        dy_ref[0, 0, :] = jnp.zeros_like(dy_ref[0, 0, :])


def _prep(images, fid, x, y, active):
    """Clip/split the sample coordinates and chunk every per-element array."""
    k, h, w = images.shape
    xc = jnp.clip(x, 1.0, w - 2.001)
    yc = jnp.clip(y, 1.0, h - 2.001)
    x0 = jnp.floor(xc).astype(jnp.int32)
    y0 = jnp.floor(yc).astype(jnp.int32)
    tx = xc - x0
    ty = yc - y0
    r0 = fid * h + y0 - 1
    c0 = x0 - 1

    m = x.shape[0]
    nchunks = -(-m // CHUNK)
    pad = nchunks * CHUNK - m

    def chunked(a, fill=0):
        if pad:
            a = jnp.pad(a, (0, pad), constant_values=fill)
        return a.reshape(nchunks, 1, CHUNK)

    act = active if active is not None else jnp.ones(m, jnp.float32)
    if pad:
        act = jnp.pad(act, (0, pad))
    chunk_act = (
        jnp.max(act.reshape(nchunks, CHUNK), axis=1) > 0.0
    ).astype(jnp.int32)
    return (
        chunk_act,
        chunked(r0),
        chunked(ty.astype(jnp.float32)),
        chunked(c0),
        chunked(tx.astype(jnp.float32)),
        nchunks,
        pad,
    )


def _specs(nchunks):
    # (+1 shift of the index map args: scalar-prefetch refs precede grid ids)
    row_i = pl.BlockSpec((1, 1, CHUNK), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    img = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, 1, CHUNK), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    return row_i, img, out


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def bicubic_sample(images, fid, x, y, active):
    """Masked bicubic sampling: `images [K,H,W]`, per-element `fid/x/y [M]`,
    `active [M]` (0 ⇒ the output may be 0 and gradients are 0). Returns [M]."""
    out, _ = _fwd(images, fid, x, y, active)
    return out


def _fwd(images, fid, x, y, active):
    k, h, w = images.shape
    m = x.shape[0]
    chunk_act, r0, ty, c0, tx, nchunks, pad = _prep(images, fid, x, y, active)
    img_hi, img_lo = _split_bf16(images.reshape(k * h, w))
    row_i, img_s, out_s = _specs(nchunks)
    out = pl.pallas_call(
        _fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nchunks,),
            in_specs=[row_i, row_i, row_i, row_i, img_s, img_s],
            out_specs=out_s,
        ),
        out_shape=jax.ShapeDtypeStruct((nchunks, 1, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(chunk_act, r0, ty, c0, tx, img_hi, img_lo)
    out = out.reshape(-1)[:m]
    return out, (images, fid, x, y, active)


def _bwd(res, g):
    images, fid, x, y, active = res
    k, h, w = images.shape
    m = x.shape[0]
    chunk_act, r0, ty, c0, tx, nchunks, pad = _prep(images, fid, x, y, active)
    gc = (jnp.pad(g, (0, pad)) if pad else g).reshape(nchunks, 1, CHUNK)
    img_hi, img_lo = _split_bf16(images.reshape(k * h, w))
    row_i, img_s, out_s = _specs(nchunks)
    g_s = pl.BlockSpec((1, 1, CHUNK), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    dx, dy = pl.pallas_call(
        _bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nchunks,),
            in_specs=[row_i, row_i, row_i, row_i, g_s, img_s, img_s],
            out_specs=(out_s, out_s),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nchunks, 1, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((nchunks, 1, CHUNK), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(chunk_act, r0, ty, c0, tx, gc, img_hi, img_lo)
    dx = dx.reshape(-1)[:m]
    dy = dy.reshape(-1)[:m]
    # clip boundary: outside [1, W-2) the clipped coordinate is constant
    in_x = (x >= 1.0) & (x < w - 2.001)
    in_y = (y >= 1.0) & (y < h - 2.001)
    dx = jnp.where(in_x, dx, 0.0)
    dy = jnp.where(in_y, dy, 0.0)
    return (None, None, dx, dy, None)


def _fwd_rule(images, fid, x, y, active):
    return _fwd(images, fid, x, y, active)


bicubic_sample.defvjp(_fwd_rule, _bwd)
