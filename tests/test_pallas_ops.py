"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from intrinsic3d_tpu.grid.voxel_grid import VoxelGrid
from intrinsic3d_tpu.grid.algorithms import correct_sdf, _correct_sdf_via_dense
from intrinsic3d_tpu.ops.pallas.distance_transform import correct_sdf_dense


def _random_grid(shape, density=0.6, seed=0):
    rng = np.random.default_rng(seed)
    sdf = rng.normal(0, 0.05, shape).astype(np.float32)
    w = (rng.uniform(size=shape) < density).astype(np.float32)
    return sdf, w


def _table_reference(dense_sdf, dense_w, voxel_size, iters):
    shape = dense_sdf.shape
    cc = np.argwhere(np.ones(shape, bool))
    g = VoxelGrid.from_coords(voxel_size, cc)
    g.sdf = dense_sdf[cc[:, 0], cc[:, 1], cc[:, 2]].astype(np.float32)
    g.weight = dense_w[cc[:, 0], cc[:, 1], cc[:, 2]].astype(np.float32)
    correct_sdf(g, num_iter=iters, dense=False)
    out = np.zeros(shape, np.float32)
    out[g.coords[:, 0], g.coords[:, 1], g.coords[:, 2]] = g.sdf
    wout = np.zeros(shape, np.float32)
    wout[g.coords[:, 0], g.coords[:, 1], g.coords[:, 2]] = g.weight
    return out, wout


def test_pallas_distance_transform_matches_table():
    sdf, w = _random_grid((20, 20, 20))
    ref_s, ref_w = _table_reference(sdf, w, 0.01, 10)
    out_s, out_w = correct_sdf_dense(
        jnp.asarray(sdf), jnp.asarray(w), 0.01, tile=8, iters=10, interpret=True
    )
    seen = w > 0
    np.testing.assert_allclose(np.asarray(out_s)[seen], ref_s[seen], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_w)[seen], ref_w[seen])


def test_pallas_distance_transform_slab_path():
    # Z > 128 exercises the overlapping-slab stitching
    sdf, w = _random_grid((8, 8, 140), density=0.5, seed=1)
    ref_s, _ = _table_reference(sdf, w, 0.01, 4)
    out_s, _ = correct_sdf_dense(
        jnp.asarray(sdf), jnp.asarray(w), 0.01, tile=8, iters=4, interpret=True
    )
    seen = w > 0
    np.testing.assert_allclose(np.asarray(out_s)[seen], ref_s[seen], atol=1e-6)


def test_correct_sdf_dense_wrapper_on_sparse_grid():
    rng = np.random.default_rng(2)
    cc = np.unique(rng.integers(0, 14, size=(600, 3)), axis=0)
    g = VoxelGrid.from_coords(0.01, cc)
    g.sdf = rng.normal(0, 0.05, g.num_voxels).astype(np.float32)
    g.weight = (rng.uniform(size=g.num_voxels) < 0.7).astype(np.float32)
    g2 = g.clone()
    correct_sdf(g, num_iter=6, dense=False)
    _correct_sdf_via_dense(g2, num_iter=6, interpret=True)
    np.testing.assert_allclose(g2.sdf, g.sdf, atol=1e-6)
    np.testing.assert_array_equal(g2.weight, g.weight)


# ---- masked bicubic sampler (ops/pallas/bicubic.py) ----

def _bicubic_problem(m=1500, k=3, h=24, w=40, seed=3):
    import jax

    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.normal(0, 1, (k, h, w)).astype(np.float32))
    fid = jnp.asarray(rng.integers(0, k, m).astype(np.int32))
    x = jnp.asarray(rng.uniform(1.0, w - 2.01, m).astype(np.float32))
    y = jnp.asarray(rng.uniform(1.0, h - 2.01, m).astype(np.float32))
    active = jnp.asarray((rng.uniform(size=m) < 0.3).astype(np.float32))
    return images, fid, x, y, active


def test_pallas_bicubic_matches_xla_sampler():
    from intrinsic3d_tpu.ops.pallas.bicubic import bicubic_sample
    from intrinsic3d_tpu.refine.residuals import catrom_sample_frames

    images, fid, x, y, active = _bicubic_problem()
    got = np.asarray(bicubic_sample(images, fid, x, y, active))
    want = np.asarray(catrom_sample_frames(images, fid, x, y))
    act = np.asarray(active) > 0
    # bf16x3 vs f32: ~1e-7 relative on O(1) image values
    np.testing.assert_allclose(got[act], want[act], atol=5e-5)


def test_pallas_bicubic_skips_inactive_chunks():
    from intrinsic3d_tpu.ops.pallas.bicubic import CHUNK, bicubic_sample

    images, fid, x, y, _ = _bicubic_problem(m=3 * CHUNK)
    # middle chunk fully inactive -> must come back exactly zero
    active = np.ones(3 * CHUNK, np.float32)
    active[CHUNK : 2 * CHUNK] = 0.0
    out = np.asarray(bicubic_sample(images, fid, x, y, jnp.asarray(active)))
    assert np.all(out[CHUNK : 2 * CHUNK] == 0.0)
    assert np.all(out[:CHUNK] != 0.0)


def test_pallas_bicubic_analytic_grad():
    import jax

    from intrinsic3d_tpu.ops.pallas.bicubic import bicubic_sample
    from intrinsic3d_tpu.refine.residuals import catrom_sample_frames

    images, fid, x, y, active = _bicubic_problem(m=1200, seed=4)

    def f_pallas(x, y):
        return jnp.sum(jnp.sin(bicubic_sample(images, fid, x, y, active)))

    def f_xla(x, y):
        r = catrom_sample_frames(images, fid, x, y)
        return jnp.sum(jnp.sin(r) * (active > 0))

    gx, gy = jax.grad(f_pallas, argnums=(0, 1))(x, y)
    wx, wy = jax.grad(f_xla, argnums=(0, 1))(x, y)
    act = np.asarray(active) > 0
    np.testing.assert_allclose(np.asarray(gx)[act], np.asarray(wx)[act], rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(gy)[act], np.asarray(wy)[act], rtol=2e-3, atol=5e-4)


def test_pallas_bicubic_inactive_chunk_zero_grad():
    # masking is per-CHUNK: a fully-inactive chunk spends no MXU cycles and
    # its backward is exactly zero (per-element zeroing is the caller's job
    # via weight-0 rows)
    import jax

    from intrinsic3d_tpu.ops.pallas.bicubic import CHUNK, bicubic_sample

    images, fid, x, y, _ = _bicubic_problem(m=2 * CHUNK, seed=5)
    active = np.ones(2 * CHUNK, np.float32)
    active[CHUNK:] = 0.0

    def f(x, y):
        return jnp.sum(bicubic_sample(images, fid, x, y, jnp.asarray(active)))

    gx, gy = jax.grad(f, argnums=(0, 1))(x, y)
    assert np.all(np.asarray(gx)[CHUNK:] == 0.0)
    assert np.all(np.asarray(gy)[CHUNK:] == 0.0)
    assert np.any(np.asarray(gx)[:CHUNK] != 0.0)


# ---- row-windowed sampler (bicubic_sample_rows) ----

def _frame_major_problem(k, h, w, d, seed=4):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.random((k, h, w), dtype=np.float32))
    x = jnp.asarray(rng.uniform(0.0, w, (k, d)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.0, h, (k, d)).astype(np.float32))
    fid = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[:, None], (k, d))
    act = jnp.asarray((rng.random((k, d)) < 0.3).astype(np.float32))
    return images, fid, x, y, act


@pytest.mark.parametrize("k,h,w", [(3, 48, 64), (2, 480, 96)])
def test_windowed_sampler_matches_xla(k, h, w):
    """Forward + analytic backward of the row-windowed kernel vs the XLA
    sampler; h=480 exercises the multi-pass (window taller than one pass)
    path, and d is NOT a CHUNK multiple to exercise the slot padding."""
    import jax

    from intrinsic3d_tpu.ops.pallas.bicubic import CHUNK
    from intrinsic3d_tpu.refine.residuals import catrom_sample_frames

    d = 2 * CHUNK + 7
    images, fid, x, y, act = _frame_major_problem(k, h, w, d)
    ref = catrom_sample_frames(images, fid, x, y)
    got = catrom_sample_frames(images, fid, x, y, active=act, frame_major=True)
    a = np.asarray(act) > 0
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(ref)[a], atol=5e-3)

    def loss(sampler_kwargs):
        def f(xy):
            xx, yy = xy
            out = catrom_sample_frames(images, fid, xx, yy, **sampler_kwargs)
            return jnp.sum(jnp.sin(out) * act)

        return f

    gw = jax.grad(loss(dict(active=act, frame_major=True)))((x, y))
    gr = jax.grad(loss({}))((x, y))
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gr[0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gr[1]), atol=2e-2)


def test_windowed_sampler_inactive_rows_are_zero():
    from intrinsic3d_tpu.ops.pallas.bicubic import CHUNK
    from intrinsic3d_tpu.refine.residuals import catrom_sample_frames

    images, fid, x, y, act = _frame_major_problem(2, 32, 48, 2 * CHUNK)
    act = act.at[1].set(0.0)  # whole frame row inactive -> chunks skipped
    got = catrom_sample_frames(images, fid, x, y, active=act, frame_major=True)
    np.testing.assert_array_equal(np.asarray(got)[1], 0.0)


def test_windowed_sampler_segmented(monkeypatch):
    """Chunk segmentation (SMEM meta budget): force tiny segments and check
    forward + gradient still match the XLA sampler across segment seams."""
    import jax
    from intrinsic3d_tpu.ops.pallas import bicubic
    from intrinsic3d_tpu.refine.residuals import catrom_sample_frames

    monkeypatch.setattr(bicubic, "SEG_CHUNKS", 2)
    images, fid, x, y, act = _frame_major_problem(3, 40, 48, 5 * bicubic.CHUNK + 11)
    ref = catrom_sample_frames(images, fid, x, y)
    got = catrom_sample_frames(images, fid, x, y, active=act, frame_major=True)
    a = np.asarray(act) > 0
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(ref)[a], atol=5e-3)

    def loss(kw):
        return lambda xy: jnp.sum(
            jnp.sin(catrom_sample_frames(images, fid, xy[0], xy[1], **kw)) * act
        )

    gw = jax.grad(loss(dict(active=act, frame_major=True)))((x, y))
    gr = jax.grad(loss({}))((x, y))
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gr[0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gr[1]), atol=2e-2)


def test_windowed_sampler_mixed_frame_fallback():
    """Contract-violating chunks (mixed fids within one CHUNK) must still
    produce exact values through the while-loop fallback passes."""
    from intrinsic3d_tpu.ops.pallas.bicubic import CHUNK, bicubic_sample_rows
    from intrinsic3d_tpu.refine.residuals import catrom_sample_frames

    rng = np.random.default_rng(7)
    k, h, w = 4, 40, 48
    m = 3 * CHUNK
    images = jnp.asarray(rng.random((k, h, w), dtype=np.float32))
    # deliberately interleave frames WITHIN chunks
    fid = jnp.asarray(rng.integers(0, k, m).astype(np.int32))
    x = jnp.asarray(rng.uniform(0.0, w, m).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.0, h, m).astype(np.float32))
    act = jnp.asarray((rng.random(m) < 0.5).astype(np.float32))

    got = np.asarray(bicubic_sample_rows(images, fid, x, y, act))
    ref = np.asarray(catrom_sample_frames(images, fid, x, y))
    a = np.asarray(act) > 0
    np.testing.assert_allclose(got[a], ref[a], atol=5e-3)
    np.testing.assert_array_equal(got[~a], 0.0)


def test_nearest_lookup_and_batched_observations():
    """nearest_sample_rows == direct indexing, and compute_observations_batch
    == vmapped per-frame compute_observation (the reference semantics)."""
    import jax
    from intrinsic3d_tpu.camera import Camera
    from intrinsic3d_tpu.observations import (
        compute_observation,
        compute_observations_batch,
    )
    from intrinsic3d_tpu.ops.pallas.bicubic import CHUNK, nearest_sample_rows

    rng = np.random.default_rng(11)
    k, h, w = 3, 37, 53  # h not a 16-multiple: exercises per-frame row padding
    m = 2 * CHUNK + 5
    images = jnp.asarray(rng.random((k, h, w), dtype=np.float32))
    d_per = m // k
    fid = jnp.repeat(jnp.arange(k, dtype=jnp.int32), d_per)[:m]
    fid = jnp.pad(fid, (0, m - fid.shape[0]))
    yi = jnp.asarray(rng.integers(0, h, m).astype(np.int32))
    xi = jnp.asarray(rng.integers(0, w, m).astype(np.int32))
    act = jnp.asarray((rng.random(m) < 0.6).astype(np.float32))
    got = np.asarray(nearest_sample_rows(images, fid, yi, xi, act))
    ref = np.asarray(images)[np.asarray(fid), np.asarray(yi), np.asarray(xi)]
    a = np.asarray(act) > 0
    # hi+lo bf16 reconstruction carries O(2^-16) relative error — far below
    # the 0.02 m occlusion threshold this lookup feeds
    np.testing.assert_allclose(got[a], ref[a], atol=1e-4)
    np.testing.assert_array_equal(got[~a], 0.0)

    # batched observations vs the per-frame oracle
    cam = Camera.create(60.0, 60.0, 31.5, 23.5, 64, 48)
    nvox = 700
    iso = jnp.asarray(rng.uniform(-0.2, 0.2, (nvox, 3)).astype(np.float32))
    iso = iso.at[:, 2].add(0.6)
    normals = rng.normal(size=(nvox, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    normals = jnp.asarray(normals)
    poses = jnp.asarray(rng.normal(0, 0.05, (3, 6)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.3, 1.0, (3, 48, 64)).astype(np.float32))
    got_w = compute_observations_batch(cam, poses, depths, iso, normals, 0.5)
    want_w = jnp.stack(
        [
            compute_observation(cam, poses[i], depths[i], iso, normals, 0.5)[0]
            for i in range(3)
        ]
    )
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w), atol=1e-5)
