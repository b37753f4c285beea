"""Pallas fused stage-1 tail (ops/pallas_tail.py): exactness vs the plain path.

The kernel replaces the last decoder stage + seg head of the people-seg UNet
for serving (interpret mode here; the real kernel runs on TPU). It must match
the plain upsample->conv0->bn->relu->conv1->bn->relu->seg-head chain exactly,
including the edge-clamped-upsample borders (corrected by strip recompute).

Reference semantics: smp UnetDecoder final block + seg head
(/root/reference/src/human_edge_detection/advanced/
hierarchical_segmentation_unet.py:1708-1916).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.ops.pallas_tail import (
    TR, tail_reference, tail_with_borders)
from human_instance_segmentation_tpu.ops.s2d import depth_to_space, space_to_depth


def _weights(rng, ci, c):
    k0 = jnp.asarray(rng.standard_normal((3, 3, ci, c)) * 0.2, jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)
    kh = jnp.asarray(rng.standard_normal((3, 3, c, 1)) * 0.2, jnp.float32)
    bh = jnp.asarray(rng.standard_normal((1,)), jnp.float32)
    mkbn = lambda: tuple(jnp.asarray(v, jnp.float32) for v in (
        rng.uniform(0.5, 1.5, c), rng.standard_normal(c) * 0.1,
        rng.standard_normal(c) * 0.1, rng.uniform(0.5, 1.5, c)))
    return k0, mkbn(), k1, mkbn(), kh, bh


@pytest.mark.parametrize("hc,wc", [(2 * TR, 24), (3 * TR, 16)])
def test_tail_matches_plain_path(rng, hc, wc):
    ci, c = 8, 8
    x = jnp.asarray(rng.standard_normal((2, hc, wc, 4 * ci)), jnp.float32)
    k0, bn0, k1, bn1, kh, bh = _weights(rng, ci, c)
    ref = tail_reference(depth_to_space(x, 2), k0, bn0, k1, bn1, kh, bh)
    out = tail_with_borders(x, k0, bn0, k1, bn1, kh, bh, interpret=True)
    assert out.shape == (2, 4 * hc, 4 * wc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_tail_unet_integration(rng):
    """PeopleSegmentationUNet(pallas_tail=True) == the fused XLA path, with
    an identical parameter tree (checkpoints swap between the two freely).

    Slow tier: ~160 s of CPU compile on the 1-core host; the parametrized
    test_tail_matches_plain_path above keeps the kernel exactness in the
    fast tier."""
    from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet

    images = jnp.asarray(rng.random((1, 64, 96, 3)), jnp.float32)
    base = PeopleSegmentationUNet(encoder_variant="b0", fused_tail=3)
    fast = PeopleSegmentationUNet(encoder_variant="b0", fused_tail=3,
                                  pallas_tail=True)
    params = base.init(jax.random.PRNGKey(0), images, train=False)
    ptree = jax.tree_util.tree_structure(params)
    assert ptree == jax.tree_util.tree_structure(
        fast.init(jax.random.PRNGKey(0), images, train=False))

    y_base = base.apply(params, images, train=False)
    form, y_fast = fast.apply(params, images, train=False, raw=True)
    assert form == "dense" and y_fast.shape == (1, 64, 96)
    np.testing.assert_allclose(np.asarray(y_fast),
                               np.asarray(y_base[..., 0]), atol=2e-4)


def test_roi_align_dense_matches_channel_form(rng):
    from human_instance_segmentation_tpu.ops.sampling import (
        roi_align, roi_align_dense)

    fmap = jnp.asarray(rng.standard_normal((2, 32, 48)), jnp.float32)
    rois = jnp.asarray([[0, 0.1, 0.2, 0.9, 0.8], [1, 0.0, 0.0, 1.0, 1.0]],
                       jnp.float32)
    a = roi_align(fmap[..., None], rois, 16, 12, spatial_scale=(32.0, 48.0),
                  aligned=True)
    b = roi_align_dense(fmap, rois, 16, 12, spatial_scale=(32.0, 48.0),
                        aligned=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
