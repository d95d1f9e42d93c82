"""Pallas TPU kernel: masked one-hot Catmull-Rom bicubic sampling.

The batched bicubic sampler (the per-element image taps of the E_g shading
cost, ``cost.h:108-127``) is MXU-flop-bound in its XLA one-hot form: every
dense element pays a `[chunk, K·H] @ [K·H, W]` row-select matmul even
though only ~10-15% of dense elements are active (BENCH_NOTES.md). The
kernels here keep the one-hot-matmul formulation (the MXU does the row
gathering; a gather would run at ~71M rows/s) and add what XLA cannot
express:

- **chunk skipping** — a per-chunk any-active scalar (scalar-prefetch
  input in SMEM) predicates the whole body with `@pl.when`; skipped chunks
  write zeros and spend no MXU cycles;
- **an analytic 2-dot backward** (custom_vjp): d/dx and d/dy re-use the same
  one-hot structure with derivative weights — no checkpoint replay and no
  saved `[nchunks, chunk, K·H]` residuals (73 GB OOM in the naive vjp);
- **narrow row windows** (`bicubic_sample_rows`, the production path for
  the frame-major block layout): the scalar-prefetch array also carries the
  chunk's 2·WG-row window base (derived from the chunk's minimum tap row),
  which the image BlockSpec index maps consume, so each chunk DMAs only a
  64-row band of its frame from the HBM stack — the row-select dots shrink
  from `[chunk, K·H]` to `[chunk, 2·WG]` (the window is 2·WG = 128 rows:
  ~1.9x fewer row-select MACs than a whole-frame window at H=240, ~15x
  fewer than the K·H full-stack form at K=8)
  and the stack never needs to fit in VMEM (a 64-row band always does).
  Chunks whose taps overflow the window resolve in fallback passes of the
  existing multi-pass loop (rare: a chunk is one compact (frame, 8³-voxel-
  block) projection).

`bicubic_sample` (full-width, VMEM-resident stack) remains for callers whose
fid patterns are not chunk-uniform; it requires K·H small enough for VMEM.
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
    """Σ_j wy4[j]·image_row[r0+j]: [chunk, W] (see `_bf16x3`)."""
    return _bf16x3(_onehot_rows(r0, wy4, img_hi.shape[0]), img_hi[:], img_lo[:])


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


# ---------------------------------------------------------------------------
# Row-windowed variant: frame-uniform chunks + narrow (2·WG-row) image windows
# ---------------------------------------------------------------------------
#
# When every CHUNK of elements samples a SINGLE keyframe (the frame-major
# block layout, refine/blockform.py), the row one-hot only needs a narrow
# band of that frame's rows: frames are padded to WG-row-multiple heights so
# they start on window-block boundaries, and each chunk's window is the TWO
# adjacent WG-row blocks starting at the block holding its minimum tap row,
# selected by scalar-prefetch-driven index maps (Pallas DMAs the band from
# HBM and skips the fetch when consecutive chunks share it). This cuts the
# dominant `[chunk, K·H] @ [K·H, W]` row-select dots to
# `[chunk, 2·WG] @ [2·WG, W]` — the image stack never needs to fit in VMEM,
# there is no K·H ceiling, and a chunk whose tap rows spread ≤ WG − taps + 1
# rows from its minimum tap row (the
# common case: one 8³ voxel block's projection) is in-window on the FIRST
# pass.
#
# CONTRACT: within each CHUNK-aligned run of elements all `fid` values must
# be equal (callers pad the slot axis of `[K, D]` element arrays to a CHUNK
# multiple). Violations are handled exactly but slowly: leftover elements
# resolve through while-loop fallback passes (one window per pass).
#
# The window is NARROW: two adjacent WG-row blocks (2·WG = 64 rows) chosen
# per chunk from the chunk's minimum tap row — a chunk is one (frame, voxel
# block) pair, and an 8³ voxel block projects to a compact image region, so
# nearly every chunk's taps fit the 64-row window on the first pass (the
# element holding the minimum row ALWAYS does: its local row is < WG, so
# each fallback pass strictly shrinks the remainder — termination is
# unconditional). Versus a whole-frame window this cuts the row-select dots
# and the row one-hot build from [chunk, hpad] to [chunk, 2·WG] (~1.9x
# fewer MACs at 240-row frames; the big win over the K·H full-stack form
# is ~15x at K=8).

WG = 64  # window granularity (rows); window = two adjacent WG-row blocks


def _win_specs(wg: int, w: int):
    # every data movement is driven by the scalar-prefetch meta so that runs
    # of SKIPPED chunks cost (almost) nothing: their per-element fetch maps
    # to block meta[2,i]=0 and their output to a shared trash block
    # meta[3,i]=nchunks — Pallas elides DMAs whose block index is unchanged
    # between consecutive grid steps. The image window is TWO operands (the
    # same array passed twice): WG-row blocks meta[1,i] and meta[1,i]+1.
    row_i = pl.BlockSpec(
        (1, 1, CHUNK), lambda i, meta: (meta[2, i], 0, 0), memory_space=pltpu.VMEM
    )
    img_specs = [
        pl.BlockSpec((wg, w), lambda i, meta: (meta[1, i], 0)),
        pl.BlockSpec((wg, w), lambda i, meta: (meta[1, i] + 1, 0)),
    ]
    out = pl.BlockSpec(
        (1, 1, CHUNK), lambda i, meta: (meta[3, i], 0, 0), memory_space=pltpu.VMEM
    )
    return row_i, img_specs, out


def _bf16x3(sel, wh, wl):
    """`sel @ (wh + wl)` in manual bf16x3: Mosaic supports only
    DEFAULT/HIGHEST dot precision and HIGHEST costs ~6 bf16 passes, so split
    the f32 `sel` into bf16 hi+lo and take the three dominant products with
    f32 accumulation — the same ~1e-7 relative error as XLA's
    Precision.HIGH at half the HIGHEST cost (the dropped lo·lo term is
    O(2^-16) relative)."""
    s_hi, s_lo = _split_bf16(sel)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    return dot(s_hi, wh) + dot(s_hi, wl) + dot(s_lo, wh)


def _win_fwd_kernel(meta_ref, rloc_ref, ty_ref, c0_ref, tx_ref, wh0, wh1, wl0, wl1, out_ref):
    @pl.when(meta_ref[0, pl.program_id(0)] > 0)
    def _():
        wh = jnp.concatenate([wh0[:], wh1[:]], axis=0)
        wl = jnp.concatenate([wl0[:], wl1[:]], axis=0)
        rloc = rloc_ref[0, 0, :]
        win = wh.shape[0]
        inw = ((rloc >= 0) & (rloc <= win - 4)).astype(jnp.float32)
        wy = tuple(v * inw for v in _catrom_w(ty_ref[0, 0, :]))
        a = _bf16x3(_onehot_rows(rloc, wy, win), wh[:], wl[:])
        colw = _onehot_rows(c0_ref[0, 0, :], _catrom_w(tx_ref[0, 0, :]), wh.shape[1])
        out_ref[0, 0, :] = jnp.sum(a * colw, axis=-1)
    # skipped chunks write NOTHING: their out block is the shared trash row
    # and the caller masks every lane it consumes with `hit`


def _win_fwdgrad_kernel(meta_ref, rloc_ref, ty_ref, c0_ref, tx_ref, *refs):
    """Value + BOTH directional derivatives in one pass. The custom_vjp
    forward rule uses this: ∂out/∂x and ∂out/∂y are per-element scalars, so
    emitting them here makes the backward a pure elementwise `g·ddx` with no
    kernel at all — 6 window dots total instead of 3 (fwd) + 6 (bwd), and
    the row selections are built once."""
    (wh0, wh1, wl0, wl1, out_ref, ddx_ref, ddy_ref) = refs

    @pl.when(meta_ref[0, pl.program_id(0)] > 0)
    def _():
        wh = jnp.concatenate([wh0[:], wh1[:]], axis=0)
        wl = jnp.concatenate([wl0[:], wl1[:]], axis=0)
        rloc = rloc_ref[0, 0, :]
        ty = ty_ref[0, 0, :]
        tx = tx_ref[0, 0, :]
        w = wh.shape[1]
        win = wh.shape[0]
        n = rloc.shape[0]
        inw = ((rloc >= 0) & (rloc <= win - 4)).astype(jnp.float32)
        wy = tuple(v * inw for v in _catrom_w(ty))
        dwy = tuple(v * inw for v in _catrom_dw(ty))
        # stack the value and d/dty row selections into ONE [2·chunk, win]
        # operand — half the dot dispatches of two separate row mixes
        sel2 = jnp.concatenate(
            [_onehot_rows(rloc, wy, win), _onehot_rows(rloc, dwy, win)], axis=0
        )
        a2 = _bf16x3(sel2, wh[:], wl[:])  # [2·chunk, W]
        a, a_dy = a2[:n], a2[n:]
        colw = _onehot_rows(c0_ref[0, 0, :], _catrom_w(tx), w)
        out_ref[0, 0, :] = jnp.sum(a * colw, axis=-1)
        ddy_ref[0, 0, :] = jnp.sum(a_dy * colw, axis=-1)
        dcolw = _onehot_rows(c0_ref[0, 0, :], _catrom_dw(tx), w)
        ddx_ref[0, 0, :] = jnp.sum(a * dcolw, axis=-1)
    # skipped chunks: no writes (trash out block, caller masks with `hit`)


def _win_prep(images, fid, x, y, active):
    """Shared fwd/bwd prep: pad the image stack to WG-multiple rows (bf16
    hi/lo split) and chunk the per-element sample data."""
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

    def padded(a, fill=0):
        return jnp.pad(a, (0, pad), constant_values=fill) if pad else a

    def chunked(a):
        return a.reshape(nchunks, 1, CHUNK)

    # pad each frame's rows to a WG-multiple so frames start on window-block
    # boundaries, plus one trailing zero block so the second window block
    # (meta[1,i]+1) is always in range
    hpad = -(-h // WG) * WG
    if hpad > h:
        images = jnp.pad(images, ((0, 0), (0, hpad - h), (0, 0)))
        r0 = fid * hpad + y0 - 1
    flat = jnp.pad(images.reshape(k * hpad, w), ((0, WG), (0, 0)))
    img_hi, img_lo = _split_bf16(flat)

    act = padded(active if active is not None else jnp.ones(m, jnp.float32))
    r0 = padded(r0)
    return (
        img_hi,
        img_lo,
        hpad,
        act > 0.0,
        r0,
        chunked(ty.astype(jnp.float32)),
        chunked(c0),
        chunked(tx.astype(jnp.float32)),
        nchunks,
        m,
        h,
        w,
    )


def _ffill(vals, valid):
    """Forward-fill `vals` over entries where `valid` is False (associative
    scan): keeps the window index of skipped chunks equal to the previous
    active chunk's, so skipped runs never trigger a window re-fetch."""

    def op(a, b):
        av, ax = a
        bv, bx = b
        return (av | bv, jnp.where(bv, bx, ax))

    _, filled = jax.lax.associative_scan(op, (valid, vals))
    return filled


def _pass_meta(r0, remaining, nchunks, wg, max_wb, taps=4):
    """Per-pass scalar-prefetch meta `[4, nchunks]`: (activity, window block
    index, per-element fetch index, output block index) per grid step.

    The window base is the WG-block holding the chunk's minimum remaining
    tap row; the fetched window spans blocks (wb, wb+1) = 2·wg rows.

    The grid walks all `nchunks` chunks — skipped steps are nearly free:
    their per-element fetches all map to block 0 and their output to the
    shared trash block, so Pallas elides the DMAs (measured ~1.3 ms for a
    21k-step all-skipped pass vs ~27 ms of active compute; compacting the
    grid to active chunks via `jnp.nonzero(size=...)` measured net-negative
    — the [M]-wide bookkeeping costs more than the skipped steps). Returns
    (meta, rloc chunks, hit_base [M]) where hit_base marks elements this
    pass definitely computed."""
    r0c = r0.reshape(nchunks, CHUNK)
    remc = remaining.reshape(nchunks, CHUNK)
    rmin = jnp.min(jnp.where(remc, r0c, jnp.int32(2**30)), axis=1)
    wb = jnp.clip(rmin // wg, 0, max_wb)
    anyrem = jnp.any(remc, axis=1)
    wb = _ffill(wb, anyrem)
    rloc = r0 - jnp.repeat(wb * wg, CHUNK)
    in_win = (rloc >= 0) & (rloc <= 2 * wg - taps)  # taps=1 for nearest lookup
    idx = jnp.arange(nchunks, dtype=jnp.int32)
    meta = jnp.stack(
        [
            anyrem.astype(jnp.int32),
            wb.astype(jnp.int32),
            jnp.where(anyrem, idx, 0),
            jnp.where(anyrem, idx, nchunks).astype(jnp.int32),
        ]
    )
    hit_base = in_win & jnp.repeat(anyrem, CHUNK)
    return meta, rloc.reshape(nchunks, 1, CHUNK), hit_base


def _call_fwd(meta, rloc, ty, c0, tx, img_hi, img_lo, grid_len, nchunks, wg, w):
    row_i, img_specs, out_s = _win_specs(wg, w)
    return pl.pallas_call(
        _win_fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid_len,),
            in_specs=[row_i, row_i, row_i, row_i] + img_specs * 2,
            out_specs=out_s,
        ),
        out_shape=jax.ShapeDtypeStruct((nchunks + 1, 1, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(meta, rloc, ty, c0, tx, img_hi, img_hi, img_lo, img_lo)


def _call_fwdgrad(meta, rloc, ty, c0, tx, img_hi, img_lo, grid_len, nchunks, wg, w):
    row_i, img_specs, out_s = _win_specs(wg, w)
    shp = jax.ShapeDtypeStruct((nchunks + 1, 1, CHUNK), jnp.float32)
    return pl.pallas_call(
        _win_fwdgrad_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid_len,),
            in_specs=[row_i, row_i, row_i, row_i] + img_specs * 2,
            out_specs=(out_s, out_s, out_s),
        ),
        out_shape=(shp, shp, shp),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(meta, rloc, ty, c0, tx, img_hi, img_hi, img_lo, img_lo)


# scalar-prefetch operands live in SMEM (~1 MB budget): the [4, nchunks]
# int32 meta caps a single pallas_call at ~65k chunks. Larger problems are
# processed in SEGMENTS of this many chunks, each with its own locally
# indexed meta (the bench's 21k chunks stay a single call).
SEG_CHUNKS = 24576


def _seg_run(call, outs_zero, r0, act, seg, wg, max_wb, taps=4):
    """Run the row-window pass machinery on one chunk segment.

    `call(meta, rloc, grid_len) -> tuple of [seg+1, 1, CHUNK]` wraps the
    kernel; `outs_zero` is a tuple of [seg·CHUNK] zeros that accumulates
    selected lanes. A chunk whose tap rows spread ≤ (WG − taps + 1) rows
    from its minimum tap row
    resolves on the first pass (the common case: a chunk is one compact
    (frame, voxel-block) projection); wider spreads and mixed-frame chunks
    resolve through while-loop fallback passes — each pass always resolves
    at least the minimum-row element (its window-local row is < WG), so the
    loop terminates unconditionally."""

    def merge(state, meta, rloc, hit_base):
        outs, remaining = state
        res = call(meta, rloc, seg)
        hit = remaining & hit_base
        outs = tuple(
            jnp.where(hit, r[:seg].reshape(-1), o) for o, r in zip(outs, res)
        )
        return outs, remaining & ~hit_base

    state = merge((outs_zero, act), *_pass_meta(r0, act, seg, wg, max_wb, taps))

    def body(state):
        return merge(state, *_pass_meta(r0, state[1], seg, wg, max_wb, taps))

    (outs, _) = jax.lax.while_loop(lambda s: jnp.any(s[1]), body, state)
    return outs


def _segments(nchunks):
    return [(s, min(s + SEG_CHUNKS, nchunks)) for s in range(0, nchunks, SEG_CHUNKS)]


@jax.custom_vjp
def bicubic_sample_rows(images, fid, x, y, active):
    """Masked bicubic sampling for FRAME-UNIFORM chunks (see module note):
    `images [K,H,W]`, flat `fid/x/y/active [M]` where every CHUNK-aligned run
    shares one fid. Images stream from HBM per-window — no K·H ceiling."""
    out, _ = _rows_fwd(images, fid, x, y, active)
    return out


def _rows_fwd(images, fid, x, y, active):
    img_hi, img_lo, hpad, act, r0, ty, c0, tx, nchunks, m, h, w = _win_prep(
        images, fid, x, y, active
    )
    max_wb = (img_hi.shape[0] - WG) // WG - 1
    pieces = []
    for s0, s1 in _segments(nchunks):
        seg = s1 - s0
        e0, e1 = s0 * CHUNK, s1 * CHUNK

        def call(meta, rloc, grid_len, s0=s0, s1=s1, seg=seg):
            return (
                _call_fwd(
                    meta, rloc, ty[s0:s1], c0[s0:s1], tx[s0:s1],
                    img_hi, img_lo, grid_len, seg, WG, w,
                ),
            )

        (seg_out,) = _seg_run(
            call,
            (jnp.zeros(seg * CHUNK, jnp.float32),),
            r0[e0:e1], act[e0:e1], seg, WG, max_wb,
        )
        pieces.append(seg_out)
    out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
    return out[:m], (images, fid, x, y, active)


def _rows_fwd_rule(images, fid, x, y, active):
    """vjp forward: the fwdgrad kernel emits the value AND the per-element
    directional derivatives, so the backward is pure elementwise math."""
    img_hi, img_lo, hpad, act, r0, ty, c0, tx, nchunks, m, h, w = _win_prep(
        images, fid, x, y, active
    )
    max_wb = (img_hi.shape[0] - WG) // WG - 1
    pieces = []
    for s0, s1 in _segments(nchunks):
        seg = s1 - s0
        e0, e1 = s0 * CHUNK, s1 * CHUNK

        def call(meta, rloc, grid_len, s0=s0, s1=s1, seg=seg):
            return _call_fwdgrad(
                meta, rloc, ty[s0:s1], c0[s0:s1], tx[s0:s1],
                img_hi, img_lo, grid_len, seg, WG, w,
            )

        z = jnp.zeros(seg * CHUNK, jnp.float32)
        pieces.append(
            _seg_run(
                call, (z, z, z),
                r0[e0:e1], act[e0:e1], seg, WG, max_wb,
            )
        )
    if len(pieces) == 1:
        out, ddx, ddy = pieces[0]
    else:
        out, ddx, ddy = (jnp.concatenate(p) for p in zip(*pieces))
    in_x = (x >= 1.0) & (x < w - 2.001)
    in_y = (y >= 1.0) & (y < h - 2.001)
    ddx = jnp.where(in_x, ddx[:m], 0.0)
    ddy = jnp.where(in_y, ddy[:m], 0.0)
    return out[:m], (ddx, ddy)


def _rows_bwd(res, g):
    ddx, ddy = res
    return (None, None, g * ddx, g * ddy, None)


bicubic_sample_rows.defvjp(_rows_fwd_rule, _rows_bwd)


# ---------------------------------------------------------------------------
# Nearest-pixel lookup (frame-windowed): the depth visibility probe
# ---------------------------------------------------------------------------
#
# Observation collection reads depth[fid, yi, xi] per (keyframe, voxel)
# element — a scattered gather at the ~130M elements/s ceiling (≈27 ms per
# assembly at bench scale). Single-tap one-hot weights are exact in bf16,
# so the frame-window machinery does the same lookup on the MXU with just
# hi+lo dots; only the hi+lo image split's O(2^-16) relative error remains
# (~0.1 mm at 5 m depth — far below the 0.02 m occlusion threshold). Same frame-uniformity contract as
# `bicubic_sample_rows`; not differentiable (the visibility probe is data).


def _nearest_kernel(meta_ref, rloc_ref, c0_ref, wh0, wh1, wl0, wl1, out_ref):
    @pl.when(meta_ref[0, pl.program_id(0)] > 0)
    def _():
        wh = jnp.concatenate([wh0[:], wh1[:]], axis=0)
        wl = jnp.concatenate([wl0[:], wl1[:]], axis=0)
        rloc = rloc_ref[0, 0, :]
        win = wh.shape[0]
        n = rloc.shape[0]
        inw = ((rloc >= 0) & (rloc < win)).astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, win), 1)
        sel = jnp.where(iota == rloc[:, None], inw[:, None], 0.0).astype(jnp.bfloat16)

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        a = dot(sel, wh[:]) + dot(sel, wl[:])  # sel entries are exactly 0/1
        c0 = c0_ref[0, 0, :]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (n, wh.shape[1]), 1)
        colw = jnp.where(iota_w == c0[:, None], 1.0, 0.0)
        out_ref[0, 0, :] = jnp.sum(a * colw, axis=-1)
    # skipped chunks: no writes (trash out block, caller masks with `hit`)


def nearest_sample_rows(images, fid, yi, xi, active):
    """`images[fid, yi, xi]` per element (frame-uniform chunks): `images
    [K,H,W]`, int32 `fid/yi/xi [M]` pre-clipped to bounds, `active [M]`
    (0 ⇒ output 0). Images stream from HBM one 2·WG-row band per chunk."""
    k, h, w = images.shape
    m = yi.shape[0]
    nchunks = -(-m // CHUNK)
    pad = nchunks * CHUNK - m

    def padded(a, fill=0):
        return jnp.pad(a, (0, pad), constant_values=fill) if pad else a

    hpad = -(-h // WG) * WG
    if hpad > h:
        images = jnp.pad(images, ((0, 0), (0, hpad - h), (0, 0)))
    flat = jnp.pad(images.reshape(k * hpad, w), ((0, WG), (0, 0)))
    img_hi, img_lo = _split_bf16(flat)
    max_wb = (k * hpad) // WG - 1

    r0 = padded(fid * hpad + yi)
    c0 = padded(xi).reshape(nchunks, 1, CHUNK)
    act = padded(active) > 0.0
    out = jnp.zeros(nchunks * CHUNK, jnp.float32)

    row_i, img_specs, out_s = _win_specs(WG, w)

    def call(meta, rloc, s0, s1, seg):
        return pl.pallas_call(
            _nearest_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(seg,),
                in_specs=[row_i, row_i] + img_specs * 2,
                out_specs=out_s,
            ),
            out_shape=jax.ShapeDtypeStruct((seg + 1, 1, CHUNK), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_interpret(),
        )(meta, rloc, c0[s0:s1], img_hi, img_hi, img_lo, img_lo)

    pieces = []
    for s0, s1 in _segments(nchunks):
        seg = s1 - s0
        e0, e1 = s0 * CHUNK, s1 * CHUNK

        def seg_call(meta, rloc, grid_len, s0=s0, s1=s1, seg=seg):
            return (call(meta, rloc, s0, s1, seg),)

        (seg_out,) = _seg_run(
            seg_call,
            (jnp.zeros(seg * CHUNK, jnp.float32),),
            r0[e0:e1], act[e0:e1], seg, WG, max_wb, taps=1,
        )
        pieces.append(seg_out)
    out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
    return out[:m]
