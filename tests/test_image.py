"""Image subsystem tests: interpolation, processing, pyramid, blur."""

import numpy as np
import jax.numpy as jnp
import pytest

from intrinsic3d_tpu.camera import Camera
from intrinsic3d_tpu.image.interp import bilinear, bicubic
from intrinsic3d_tpu.image import processing as proc
from intrinsic3d_tpu.image.pyramid import Pyramid, pyr_down, depth_down
from intrinsic3d_tpu.image.blur import blur_score_gray, blur_scores_batch


def test_bilinear_exact_at_integers():
    img = jnp.arange(12.0).reshape(3, 4)
    assert float(bilinear(img, jnp.array(2.0), jnp.array(1.0))) == pytest.approx(6.0)


def test_bilinear_midpoint():
    img = jnp.array([[0.0, 1.0], [2.0, 3.0]])
    assert float(bilinear(img, jnp.array(0.5), jnp.array(0.5))) == pytest.approx(1.5)


def test_bilinear_boundary_renormalizes():
    img = jnp.array([[2.0, 2.0], [2.0, 2.0]])
    # sample just outside: one column of taps invalid → renormalized
    assert float(bilinear(img, jnp.array(-0.5), jnp.array(0.5))) == pytest.approx(2.0)
    # fully outside → 0
    assert float(bilinear(img, jnp.array(-5.0), jnp.array(0.5))) == pytest.approx(0.0)


def test_bilinear_channels():
    img = jnp.stack([jnp.ones((3, 3)), 2 * jnp.ones((3, 3))], axis=-1)
    v = bilinear(img, jnp.array(1.3), jnp.array(1.7))
    np.testing.assert_allclose(np.asarray(v), [1.0, 2.0], rtol=1e-6)


def test_bicubic_reproduces_linear_functions():
    # cubic convolution reproduces degree-1 polynomials exactly (away from edges)
    h, w = 16, 16
    ys, xs = np.mgrid[0:h, 0:w]
    img = jnp.asarray(0.5 * xs + 0.25 * ys, jnp.float32)
    x = jnp.array([4.3, 7.8, 9.1])
    y = jnp.array([5.6, 3.2, 10.9])
    got = np.asarray(bicubic(img, x, y))
    np.testing.assert_allclose(got, 0.5 * np.asarray(x) + 0.25 * np.asarray(y), rtol=1e-5)


def test_bicubic_differentiable():
    import jax

    img = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)), jnp.float32)
    g = jax.grad(lambda x: bicubic(img, x, jnp.array(3.3)))(jnp.array(4.2))
    assert np.isfinite(float(g))


def test_vertex_map_and_normals_plane():
    cam = Camera.create(100.0, 100.0, 16.0, 12.0, 32, 24)
    depth = jnp.full((24, 32), 1.5)
    vm = proc.compute_vertex_map(cam, depth)
    assert vm.shape == (24, 32, 3)
    np.testing.assert_allclose(np.asarray(vm[..., 2]), 1.5)
    n = proc.compute_normals_from_vertex_map(vm)
    inner = np.asarray(n[2:-2, 2:-2])
    # plane at constant z → normal = (0, 0, -1) (towards camera)
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-5)


def test_normals_zero_at_discontinuity():
    cam = Camera.create(100.0, 100.0, 16.0, 12.0, 32, 24)
    depth = np.full((24, 32), 1.0, np.float32)
    depth[:, 16:] = 2.0  # depth jump
    n = np.asarray(proc.compute_normals(cam, jnp.asarray(depth), depth_threshold=0.05))
    assert np.all(n[5, 16] == 0.0)
    assert abs(n[5, 5, 2]) > 0.9


def test_threshold_depth():
    d = jnp.array([0.05, 0.5, 3.0])
    out = np.asarray(proc.threshold_depth(d, 0.1, 2.0))
    np.testing.assert_allclose(out, [0.0, 0.5, 0.0])


def test_resize_depth_identity():
    cam = Camera.create(100.0, 100.0, 16.0, 12.0, 32, 24)
    d = jnp.full((24, 32), 1.0)
    out = proc.resize_depth(cam, d, cam)
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_resize_depth_upscale_constant():
    small = Camera.create(50.0, 50.0, 15.5, 11.5, 32, 24)
    big = Camera.create(100.0, 100.0, 31.5, 23.5, 64, 48)
    d = jnp.full((24, 32), 1.25)
    out = np.asarray(proc.resize_depth(small, d, big))
    assert out.shape == (48, 64)
    # interior should be the constant depth
    np.testing.assert_allclose(out[10:-10, 10:-10], 1.25, rtol=1e-5)


def test_erode_discontinuities():
    d = np.full((10, 10), 1.0, np.float32)
    d[5, 5] = 0.0
    out = np.asarray(proc.erode_discontinuities(jnp.asarray(d), window_size=1, max_depth_diff=0.1))
    # pixels adjacent to the hole are invalidated
    assert out[5, 5] == 0.0
    assert out[4, 5] == 0.0
    assert out[5, 4] == 0.0
    assert out[2, 2] == 1.0


def test_erode_window_zero_is_noop():
    d = jnp.asarray(np.random.default_rng(0).uniform(0.5, 1.0, (6, 6)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(proc.erode_discontinuities(d, 0)), np.asarray(d))


def test_pyr_down_constant():
    img = jnp.full((16, 16), 3.0)
    out = np.asarray(pyr_down(img))
    assert out.shape == (8, 8)
    np.testing.assert_allclose(out, 3.0, rtol=1e-6)


def test_depth_down_zero_aware():
    d = np.zeros((4, 4), np.float32)
    d[0, 0] = 2.0  # one valid of four in the top-left 2x2 block
    out = np.asarray(depth_down(jnp.asarray(d)))
    assert out.shape == (2, 2)
    assert out[0, 0] == pytest.approx(2.0)
    assert out[1, 1] == pytest.approx(0.0)


def test_pyramid_shapes():
    color = jnp.asarray(np.random.default_rng(0).uniform(size=(48, 64, 3)).astype(np.float32))
    depth = jnp.full((48, 64), 1.0)
    p = Pyramid.create(3, color, depth)
    assert p.num_levels == 3
    assert p.color[1].shape == (24, 32, 3)
    assert p.intensity[2].shape == (12, 16)
    assert p.depth[2].shape == (12, 16)


def test_blur_score_sharp_vs_blurred():
    rng = np.random.default_rng(0)
    sharp = rng.uniform(size=(64, 64)).astype(np.float32)
    # strong blur via repeated box filtering
    blurred = sharp.copy()
    for _ in range(6):
        blurred = (
            np.roll(blurred, 1, 0) + blurred + np.roll(blurred, -1, 0)
        ) / 3.0
        blurred = (
            np.roll(blurred, 1, 1) + blurred + np.roll(blurred, -1, 1)
        ) / 3.0
    s_sharp = float(blur_score_gray(jnp.asarray(sharp)))
    s_blur = float(blur_score_gray(jnp.asarray(blurred)))
    assert 0.0 <= s_blur < s_sharp <= 1.0


def test_blur_scores_batch():
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.uniform(size=(3, 32, 32, 3)).astype(np.float32))
    s = np.asarray(blur_scores_batch(frames))
    assert s.shape == (3,)
    assert np.all((s >= 0) & (s <= 1))


def test_keyframe_selection_window():
    from intrinsic3d_tpu.keyframes import KeyframeSelection

    sel = KeyframeSelection(window_size=3)
    sel.add_scores([0.1, 0.9, 0.2, 0.5, 0.4, 0.6, 0.3])
    sel.select()
    assert sel.keyframe_ids() == [1, 5, 6]


def test_keyframe_save_load(tmp_path):
    from intrinsic3d_tpu.keyframes import KeyframeSelection

    sel = KeyframeSelection(window_size=2)
    sel.add_scores([0.5, 0.7, 0.2])
    sel.select()
    p = tmp_path / "keyframes.txt"
    sel.save(str(p))
    sel2 = KeyframeSelection.load(str(p))
    assert sel2.window_size == 2
    assert sel2.is_keyframe == sel.is_keyframe
    np.testing.assert_allclose(sel2.frame_scores, sel.frame_scores, atol=1e-6)
