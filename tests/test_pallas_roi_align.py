"""Pallas gather RoIAlign vs the separable-matmul reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.ops.pallas_roi_align import roi_align_pallas
from human_instance_segmentation_tpu.ops.sampling import roi_align


@pytest.mark.parametrize("aligned", [True, False])
def test_matches_matmul_path(rng, aligned):
    feats = jnp.asarray(rng.random((2, 24, 32, 3)).astype(np.float32))
    rois = jnp.asarray([
        [0.0, 0.1, 0.2, 0.7, 0.9],
        [1.0, 0.0, 0.0, 1.0, 1.0],
        [0.0, 0.4, 0.4, 0.5, 0.6],
    ], jnp.float32)
    ref = roi_align(feats, rois, 8, 6, spatial_scale=(24.0, 32.0), aligned=aligned)
    out = roi_align_pallas(feats, rois, 8, 6, spatial_scale=(24.0, 32.0),
                           aligned=aligned, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_batch_index_routing(rng):
    feats = jnp.asarray(np.stack([np.zeros((16, 16, 2)),
                                  np.ones((16, 16, 2))]).astype(np.float32))
    rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8],
                        [1.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
    out = np.asarray(roi_align_pallas(feats, rois, 4, 4,
                                      spatial_scale=(16.0, 16.0), aligned=True,
                                      interpret=True))
    assert out[0].max() == 0.0
    assert out[1].min() == pytest.approx(1.0)


def test_oob_zero_padding(rng):
    feats = jnp.asarray(np.ones((1, 8, 8, 1)).astype(np.float32))
    # box hanging past the right/bottom edge: OOB taps contribute zeros
    rois = jnp.asarray([[0.0, 0.5, 0.5, 1.5, 1.5]], jnp.float32)
    ref = roi_align(feats, rois, 6, 6, spatial_scale=(8.0, 8.0), aligned=False)
    out = roi_align_pallas(feats, rois, 6, 6, spatial_scale=(8.0, 8.0),
                           aligned=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert np.asarray(out)[0, -1, -1, 0] == 0.0  # fully outside corner


@pytest.mark.slow
def test_flagship_pallas_roi_align_flag_matches(rng):
    """HierarchicalInstanceSegmenter(pallas_roi_align=True) serves the same
    outputs as the separable-matmul crop (interpret mode on CPU)."""
    import jax

    from human_instance_segmentation_tpu.models.assembly import (
        HierarchicalInstanceSegmenter)

    kw = dict(encoder_variant="tiny", roi_size=(16, 12), mask_size=(32, 24),
              image_size=(64, 64), base_channels=16, depth=2, mid_channels=32,
              feature_dim=32, unet_decoder_channels=(32, 24, 16, 16, 8))
    plain = HierarchicalInstanceSegmenter(**kw)
    proi = HierarchicalInstanceSegmenter(**kw, pallas_roi_align=True)
    images = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8],
                        [1.0, 0.1, 0.05, 0.6, 0.9]], jnp.float32)
    variables = jax.jit(lambda r: plain.init(r, images, rois, train=False))(
        jax.random.PRNGKey(0))
    lp, _ = plain.apply(variables, images, rois, train=False)
    lf, _ = proi.apply(variables, images, rois, train=False)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lp),
                               atol=1e-4, rtol=1e-4)
