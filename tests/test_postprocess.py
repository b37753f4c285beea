"""Tests for fused post-processing epilogues vs reference (torch CPU) math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.models import postprocess as pp


def _rand_mask(rng, shape):
    return (rng.random(shape) > 0.5).astype(np.float32)


def test_dilation_boost_noop_when_zero():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(np.float32))
    out = pp.mask_dilation_logit_boost(logits, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits))


def test_dilation_boost_expands_target():
    # single hot pixel of class 1 -> after dilation, neighbours get boosted
    logits = np.zeros((1, 9, 9, 3), np.float32)
    logits[..., 0] = 2.0  # bg wins everywhere
    logits[0, 4, 4, 1] = 6.0  # target wins at the centre
    out = np.asarray(pp.mask_dilation_logit_boost(jnp.asarray(logits), 1))
    # neighbours of (4,4) must get a +2.0 boost on channel 1
    assert out[0, 4, 5, 1] == pytest.approx(2.0)
    assert out[0, 3, 4, 1] == pytest.approx(2.0)
    # far away unchanged
    assert out[0, 0, 0, 1] == pytest.approx(0.0)
    # centre keeps its logit (already high prob, diff <= 0.1)
    assert out[0, 4, 4, 1] == pytest.approx(6.0)


def test_edge_smoothing_matches_torch_reference():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    m = _rand_mask(rng, (1, 16, 16, 1))

    ours = np.asarray(pp.edge_smooth_binary_mask(jnp.asarray(m), 0.5, 3.0))

    lap = torch.tensor([[-1., -1, -1], [-1, 8, -1], [-1, -1, -1]]).view(1, 1, 3, 3)
    gau = torch.tensor([[1., 2, 1], [2, 4, 2], [1, 2, 1]]).view(1, 1, 3, 3) / 16
    t = torch.from_numpy(m.transpose(0, 3, 1, 2))
    edges = torch.sigmoid(torch.abs(F.conv2d(t, lap, padding=1)) * 3.0)
    blur = F.conv2d(t, gau, padding=1)
    sm = t * (1 - edges) + blur * edges
    ref = (sm > 0.5).float().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, ref)


def test_directional_edge_smoothing_matches_torch_reference():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    m = _rand_mask(rng, (1, 16, 16, 1))
    ours = np.asarray(pp.directional_edge_smooth(jnp.asarray(m)))

    t = torch.from_numpy(m.transpose(0, 3, 1, 2))
    sx = torch.tensor([[-1., 0, 1], [-2, 0, 2], [-1, 0, 1]]).view(1, 1, 3, 3)
    sy = torch.tensor([[-1., -2, -1], [0, 0, 0], [1, 2, 1]]).view(1, 1, 3, 3)
    hb = torch.tensor([[0.1, 0.2, 0.4, 0.2, 0.1]]).view(1, 1, 1, 5)
    vb = torch.tensor([[0.1], [0.2], [0.4], [0.2], [0.1]]).view(1, 1, 5, 1)
    d1 = torch.tensor([[0.1, 0, 0], [0, 0.8, 0], [0, 0, 0.1]]).view(1, 1, 3, 3)
    d2 = torch.tensor([[0, 0, 0.1], [0, 0.8, 0], [0.1, 0, 0.]]).view(1, 1, 3, 3)
    ex = F.conv2d(t, sx, padding=1)
    ey = F.conv2d(t, sy, padding=1)
    mag = torch.sqrt(ex ** 2 + ey ** 2 + 1e-8)
    ang = torch.atan2(ey, ex)
    bh = F.conv2d(t, hb, padding=(0, 2))
    bv = F.conv2d(t, vb, padding=(2, 0))
    bd1 = F.conv2d(t, d1, padding=1)
    bd2 = F.conv2d(t, d2, padding=1)
    wh, wv = torch.cos(ang) ** 2, torch.sin(ang) ** 2
    wd1 = torch.cos(ang - np.pi / 4) ** 2 * 0.5
    wd2 = torch.cos(ang + np.pi / 4) ** 2 * 0.5
    s = wh + wv + wd1 + wd2 + 1e-8
    blurred = (bh * wh + bv * wv + bd1 * wd1 + bd2 * wd2) / s
    ew = torch.sigmoid(mag * 3.0)
    ref = ((t * (1 - ew) + blurred * ew) > 0.5).float()
    np.testing.assert_array_equal(ours, ref.numpy().transpose(0, 2, 3, 1))


def test_adaptive_edge_smoothing_parameters_matter():
    rng = np.random.default_rng(4)
    m = jnp.asarray(_rand_mask(rng, (2, 16, 16, 1)))
    lo = pp.adaptive_edge_smooth(m, jnp.asarray([1.0, 1.0]),
                                 jnp.asarray([2.0, 2.0]), jnp.asarray([0.5, 0.5]))
    hi = pp.adaptive_edge_smooth(m, jnp.asarray([5.0, 5.0]),
                                 jnp.asarray([0.5, 0.5]), jnp.asarray([0.3, 0.3]))
    assert lo.shape == m.shape and hi.shape == m.shape
    assert set(np.unique(np.asarray(lo))) <= {0.0, 1.0}
    assert np.abs(np.asarray(lo) - np.asarray(hi)).sum() > 0


def test_optimized_edge_smooth_tracks_basic():
    # structured mask (a blob with a jagged corner) — on real masks, unlike
    # dense noise, the fast-sigmoid approximation tracks the basic variant
    m = np.zeros((1, 24, 24, 1), np.float32)
    m[0, 6:18, 6:18, 0] = 1.0
    m[0, 6, 6, 0] = 0.0
    m[0, 17, 17, 0] = 0.0
    m = jnp.asarray(m)
    fast = np.asarray(pp.optimized_edge_smooth(m, dtype="float32"))
    base = np.asarray(pp.edge_smooth_binary_mask(m))
    assert fast.shape == base.shape
    assert (fast == base).mean() > 0.95


def test_multiclass_edge_smooth_planes():
    rng = np.random.default_rng(6)
    logits = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    for variant in ("basic", "directional", "optimized"):
        out = np.asarray(pp.multiclass_edge_smooth(logits, variant=variant))
        assert out.shape == (1, 16, 16, 3)
        assert set(np.unique(out)) <= {0.0, 1.0}


def test_bilateral_filter_matches_dense_reference():
    # brute-force reference at a few positions
    rng = np.random.default_rng(2)
    x = rng.random((1, 8, 8, 1)).astype(np.float32)
    out = np.asarray(pp.bilateral_filter(jnp.asarray(x), 3, 1.0, 0.2))

    xp = np.pad(x[0, :, :, 0], 1, mode="reflect")
    coords = np.arange(3) - 1
    sk = np.exp(-(coords[:, None] ** 2 + coords[None, :] ** 2) / 2.0)
    for (i, j) in [(0, 0), (3, 4), (7, 7)]:
        patch = xp[i:i + 3, j:j + 3]
        c = x[0, i, j, 0]
        w = sk * np.exp(-((patch - c) ** 2) / (2 * 0.2 ** 2))
        ref = (patch * w).sum() / (w.sum() + 1e-8)
        assert out[0, i, j, 0] == pytest.approx(ref, rel=1e-4)


def test_fast_bilateral_and_guided_smooth():
    rng = np.random.default_rng(3)
    x = rng.random((1, 16, 16, 1)).astype(np.float32)
    fb = np.asarray(pp.fast_bilateral_filter(jnp.asarray(x)))
    gf = np.asarray(pp.guided_filter(jnp.asarray(x)))
    assert fb.shape == x.shape and gf.shape == x.shape
    # smoothing reduces total variation
    def tv(a):
        return np.abs(np.diff(a[0, :, :, 0], axis=0)).sum() + np.abs(np.diff(a[0, :, :, 0], axis=1)).sum()
    assert tv(fb) < tv(x)


def test_binary_and_morphological_bilateral_binary_output():
    rng = np.random.default_rng(4)
    m = _rand_mask(rng, (1, 16, 16, 1))
    b1 = np.asarray(pp.binary_mask_bilateral(jnp.asarray(m)))
    b2 = np.asarray(pp.morphological_bilateral(jnp.asarray(m)))
    assert set(np.unique(b1)).issubset({0.0, 1.0})
    assert set(np.unique(b2)).issubset({0.0, 1.0})


def test_morphological_removes_speckle():
    m = np.zeros((1, 16, 16, 1), np.float32)
    m[0, 8, 8, 0] = 1.0  # isolated pixel -> opening removes it
    out = np.asarray(pp.morphological_bilateral(jnp.asarray(m)))
    assert out.sum() == 0.0


def _to_n4(x_plain):
    from human_instance_segmentation_tpu.ops.s2d import (
        space_to_depth, space_to_depth_blocks)

    return space_to_depth_blocks(space_to_depth(x_plain, 2))


def _from_n4(x_n4):
    from human_instance_segmentation_tpu.ops.s2d import n4_to_plain

    return n4_to_plain(x_n4, 1)


def test_n4_depthwise_conv_and_shift_exact(rng):
    from human_instance_segmentation_tpu.ops.s2d import (
        conv_dw_n4, maxpool_n4, shift_n4)

    x = jnp.asarray(rng.random((2, 16, 24, 1)).astype(np.float32))
    xn4 = _to_n4(x)
    # k7 Gaussian depthwise conv
    g = np.asarray(pp._gaussian_kernel_2d(7, 1.5))
    want = pp._depthwise_conv2d(x, jnp.asarray(g))
    got = _from_n4(conv_dw_n4(xn4, g))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # full-res shifts incl. across-cell offsets
    for dy, dx in ((1, 0), (0, -3), (5, 2), (-4, -1)):
        w = np.zeros_like(np.asarray(x))
        H, W = 16, 24
        ys = slice(max(0, -dy), min(H, H - dy))
        xs = slice(max(0, -dx), min(W, W - dx))
        w[:, ys, xs] = np.asarray(x)[:, max(0, dy):min(H, H + dy) or None,
                                     max(0, dx):min(W, W + dx) or None]
        got_s = _from_n4(shift_n4(xn4, dy, dx))
        # build expected with simple indexing
        exp = np.zeros_like(np.asarray(x))
        for r in range(H):
            for c in range(W):
                rr, cc = r + dy, c + dx
                if 0 <= rr < H and 0 <= cc < W:
                    exp[:, r, c] = np.asarray(x)[:, rr, cc]
        np.testing.assert_allclose(np.asarray(got_s), exp, atol=1e-6)
    # max-pool 3x3 (1px dilation)
    want_mp = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                    (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    got_mp = _from_n4(maxpool_n4(xn4, 3))
    np.testing.assert_allclose(np.asarray(got_mp), np.asarray(want_mp),
                               atol=1e-6)


def test_n4_binary_epilogues_exact(rng):
    prob = jnp.asarray(rng.random((2, 16, 24, 1)).astype(np.float32))
    n4 = _to_n4(prob)

    want = pp.binary_mask_bilateral(prob, kernel_size=7, num_iterations=2)
    got = _from_n4(pp.binary_mask_bilateral_n4(n4, kernel_size=7,
                                               num_iterations=2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    binary = (prob > 0.5).astype(jnp.float32)
    want_s = pp.edge_smooth_binary_mask(binary)
    got_s = _from_n4(pp.edge_smooth_binary_mask_n4(_to_n4(binary)))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))

    want_d = jax.lax.reduce_window(binary, -jnp.inf, jax.lax.max,
                                   (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    got_d = _from_n4(pp.dilate_binary_n4(_to_n4(binary), pixels=1))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))
