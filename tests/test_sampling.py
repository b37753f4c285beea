"""Parity tests: separable-matmul RoIAlign / resize vs torch grid_sample /
F.interpolate (the exact ops the reference delegates to)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from human_instance_segmentation_tpu.ops import roi_align, resize_bilinear


def torch_dynamic_roi_align(feat_nchw, rois, oh, ow, spatial_scale, aligned):
    """Re-statement of the reference DynamicRoIAlign math
    (dynamic_roi_align.py:77-171) on top of torch grid_sample, used as the
    golden oracle."""
    if isinstance(spatial_scale, (tuple, list)):
        ssh, ssw = spatial_scale
    else:
        ssh = ssw = spatial_scale
    n = rois.shape[0]
    bidx = rois[:, 0].long()
    x1, y1, x2, y2 = (rois[:, 1] * ssw, rois[:, 2] * ssh, rois[:, 3] * ssw, rois[:, 4] * ssh)
    gx = torch.linspace(0, 1, ow)
    gy = torch.linspace(0, 1, oh)
    gy2, gx2 = torch.meshgrid(gy, gx, indexing="ij")
    fx = x1[:, None, None] + gx2[None] * (x2 - x1)[:, None, None]
    fy = y1[:, None, None] + gy2[None] * (y2 - y1)[:, None, None]
    H, W = feat_nchw.shape[2], feat_nchw.shape[3]
    if aligned:
        nx = (fx / (W - 1)) * 2 - 1
        ny = (fy / (H - 1)) * 2 - 1
    else:
        nx = (fx / W) * 2 - 1
        ny = (fy / H) * 2 - 1
    grid = torch.stack([nx, ny], dim=-1)
    sel = torch.index_select(feat_nchw, 0, bidx)
    return F.grid_sample(sel, grid, mode="bilinear", padding_mode="zeros", align_corners=aligned)


@pytest.mark.parametrize("aligned", [True, False])
@pytest.mark.parametrize("oh,ow", [(7, 7), (64, 48), (5, 9)])
def test_roi_align_matches_grid_sample(rng, aligned, oh, ow):
    B, H, W, C = 2, 40, 52, 6
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    rois = np.array(
        [
            [0, 0.10, 0.05, 0.80, 0.90],
            [0, 0.00, 0.00, 1.00, 1.00],
            [1, 0.30, 0.40, 0.55, 0.95],
            [1, -0.05, 0.20, 0.40, 1.10],  # partially out of bounds
            [0, 0.50, 0.50, 0.50, 0.50],  # degenerate box
        ],
        dtype=np.float32,
    )
    scale = (float(H), float(W))

    got = roi_align(jnp.asarray(feat), jnp.asarray(rois), oh, ow, scale, aligned)
    want = torch_dynamic_roi_align(
        torch.from_numpy(feat).permute(0, 3, 1, 2), torch.from_numpy(rois), oh, ow, scale, aligned
    ).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_roi_align_nonsquare_scale(rng):
    # images 480x640, rois normalised, spatial_scale = (480, 640) like the
    # deployed B0 config
    B, H, W, C = 1, 48, 64, 3
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    rois = np.array([[0, 0.2, 0.1, 0.9, 0.8]], dtype=np.float32)
    got = roi_align(jnp.asarray(feat), jnp.asarray(rois), 16, 12, (H, W), True)
    want = torch_dynamic_roi_align(
        torch.from_numpy(feat).permute(0, 3, 1, 2), torch.from_numpy(rois), 16, 12, (H, W), True
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape_out", [(56, 56), (14, 14), (128, 96), (3, 200)])
def test_resize_matches_torch_interpolate(rng, shape_out):
    B, H, W, C = 2, 28, 28, 4
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    got = resize_bilinear(jnp.asarray(x), *shape_out)
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=shape_out, mode="bilinear", align_corners=False
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_resize_identity(rng):
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    out = resize_bilinear(jnp.asarray(x), 8, 8)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_roi_align_grad_flows(rng):
    import jax

    feat = jnp.asarray(rng.standard_normal((1, 16, 16, 2)).astype(np.float32))
    rois = jnp.asarray(np.array([[0, 0.1, 0.1, 0.9, 0.9]], dtype=np.float32))
    g = jax.grad(lambda f: roi_align(f, rois, 4, 4, (16.0, 16.0), False).sum())(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_upsample_2x_matches_dense_and_torch(rng):
    import jax.numpy as jnp
    from human_instance_segmentation_tpu.ops.sampling import (
        bilinear_weight_matrix, upsample_2x_bilinear, resize_bilinear)

    x = rng.random((2, 7, 5, 3)).astype(np.float32)
    fast = np.asarray(upsample_2x_bilinear(jnp.asarray(x)))
    # resize_bilinear dispatches to the fast path at exactly 2x
    via_resize = np.asarray(resize_bilinear(jnp.asarray(x), 14, 10))
    np.testing.assert_allclose(fast, via_resize, atol=1e-6)

    try:
        import torch
        import torch.nn.functional as F
    except ImportError:
        return
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
                        mode="bilinear", align_corners=False)
    np.testing.assert_allclose(fast, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)
