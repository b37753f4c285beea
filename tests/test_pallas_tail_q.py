"""Int8 Pallas fused tail (ops/pallas_tail_q.py): accuracy + routing.

The s8 kernel computes the same decoder4+seg-head chain as
ops/pallas_tail.py with calibrated static int8 scales (interpret mode
here; the real kernel runs on TPU). It is int8-APPROXIMATE in the
interior (like the XLA qscale tail) and exact at the borders, so the
tests bound relative error instead of asserting bit equality.

Reference semantics: smp UnetDecoder final block + seg head
(/root/reference/src/human_edge_detection/advanced/
hierarchical_segmentation_unet.py:1708-1916); deployment analogue: the
reference's TensorRT int8 engines (README.md:553-624).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.ops.pallas_tail import TR, tail_reference
from human_instance_segmentation_tpu.ops.pallas_tail_q import (
    build_tail_weights_q, tail_with_borders_q)
from human_instance_segmentation_tpu.ops.s2d import depth_to_space
from tests.test_pallas_tail import _weights


def _scales(x, k0, bn0, k1, bn1):
    from jax import lax
    from human_instance_segmentation_tpu.ops.sampling import (
        upsample_2x_bilinear)

    conv = lambda t, k: lax.conv_general_dilated(
        t, k.astype(t.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bnr = lambda t, p: jnp.maximum(
        (t - p[2]) * lax.rsqrt(p[3] + 1e-5) * p[0] + p[1], 0)
    y0 = bnr(conv(upsample_2x_bilinear(depth_to_space(x, 2)), k0), bn0)
    y1 = bnr(conv(y0, k1), bn1)
    amax = lambda t: max(float(jnp.max(jnp.abs(t))), 1e-6) / 127.0
    return amax(x), amax(y0), amax(y1)


def test_q_tail_close_to_oracle(rng):
    ci, c, hc, wc = 8, 8, 2 * TR, 16
    x = jnp.asarray(rng.standard_normal((2, hc, wc, 4 * ci)), jnp.float32)
    k0, bn0, k1, bn1, kh, bh = _weights(rng, ci, c)
    sx, sm, sh = _scales(x, k0, bn0, k1, bn1)
    ref = np.asarray(tail_reference(depth_to_space(x, 2),
                                    k0, bn0, k1, bn1, kh, bh))
    out = tail_with_borders_q(x, k0, bn0, k1, bn1, kh, bh, sx, sm, sh,
                              interpret=True)
    assert out.shape == (2, 4 * hc, 4 * wc)
    err = np.abs(np.asarray(out) - ref) / max(np.abs(ref).max(), 1e-6)
    # interior int8-approximate; three chained quantization points
    assert err[:, 6:-6, 6:-6].max() < 0.06, err[:, 6:-6, 6:-6].max()
    assert err.mean() < 0.01, err.mean()


def test_q_tail_accepts_prequantized_s8_input(rng):
    ci, c, hc, wc = 4, 8, 2 * TR, 16
    x = jnp.asarray(rng.standard_normal((1, hc, wc, 4 * ci)), jnp.float32)
    k0, bn0, k1, bn1, kh, bh = _weights(rng, ci, c)
    sx, sm, sh = _scales(x, k0, bn0, k1, bn1)
    # quantize exactly as the kernel wrapper does, then feed s8 directly
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / sx)),
                  -127, 127).astype(jnp.int8)
    a = tail_with_borders_q(x, k0, bn0, k1, bn1, kh, bh, sx, sm, sh,
                            interpret=True)
    b = tail_with_borders_q(xq, k0, bn0, k1, bn1, kh, bh, sx, sm, sh,
                            interpret=True, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(b, np.float32),
                               np.asarray(a, np.float32), atol=1e-4)


def test_q_weight_builder_shapes(rng):
    ci, c = 8, 8
    _, k0, bn0, k1, bn1, kh, bh = (None, *_weights(rng, ci, c))
    K22q, B0, G0, K1Pq, B1, G1, KHq, BH, GH, inv = build_tail_weights_q(
        k0, bn0, k1, bn1, kh, bh, 0.01, 0.02, 0.03)
    assert K22q.dtype == jnp.int8 and K22q.shape == (2, 2, 4 * ci, 16 * c)
    assert K1Pq.dtype == jnp.int8 and K1Pq.shape == (64 * c, 16 * c)
    assert KHq.dtype == jnp.int8 and KHq.shape == (3, 3, 16 * c, 16)
    assert G0.shape == (1, 16 * c) and GH.shape == (1, 16)
    assert np.allclose(np.asarray(inv), [[1 / 0.02, 1 / 0.03]])


@pytest.mark.slow
def test_q_tail_unet_routing(rng):
    """PeopleSegmentationUNet(pallas_tail=True) under calibrated int8
    serving routes decoder4+head through the s8 kernel: calibration (plain
    path) sows the #x/#mid/#head points, and the int8 output stays close
    to the bf16 plain-path logits. Slow tier: full-UNet CPU compiles."""
    from human_instance_segmentation_tpu.models.unet import (
        PeopleSegmentationUNet)
    from human_instance_segmentation_tpu.ops.quant import (
        calibration, collect_scales, int8_serving)

    images = jnp.asarray(rng.random((1, 64, 96, 3)), jnp.float32)
    base = PeopleSegmentationUNet(encoder_variant="b0", fused_tail=3)
    fast = PeopleSegmentationUNet(encoder_variant="b0", fused_tail=3,
                                  pallas_tail=True)
    params = base.init(jax.random.PRNGKey(0), images, train=False)

    with calibration():
        _, cv = fast.apply(params, images, train=False, mutable=["calib"])
    scales = collect_scales(jax.tree.map(float, cv["calib"]))
    assert "decoder4#x" in scales and "decoder4#mid" in scales
    assert "#head" in scales

    y_base = base.apply(params, images, train=False)
    with int8_serving(True, scales):
        form, y_q = fast.apply(params, images, train=False, raw=True)
    assert form == "dense" and y_q.shape == (1, 64, 96)
    ref = np.asarray(y_base[..., 0])
    err = np.abs(np.asarray(y_q) - ref) / max(np.abs(ref).max(), 1e-6)
    assert err.max() < 0.08, err.max()
