"""Fused conv+LayerNorm2d+act kernel (ops/pallas_head.py) vs the unfused
op chain, and the ConvNormAct/ResidualBlock wiring under head_fusion().

Interpret mode on CPU; shapes are tiny because interpreted Pallas is slow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.models.blocks import ConvNormAct, ResidualBlock
from human_instance_segmentation_tpu.ops import pallas_head
from human_instance_segmentation_tpu.ops.pallas_head import conv_ln_act, head_fusion


def _ref(x, w, b, g, beta, res=None, k=3, act="relu", eps=1e-5):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    m = y.mean(axis=(1, 2, 3), keepdims=True)
    v = ((y - m) ** 2).mean(axis=(1, 2, 3), keepdims=True)
    y = (y - m) * jax.lax.rsqrt(v + eps) * g + beta
    if res is not None:
        y = y + res
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    return y


@pytest.fixture()
def tiny(rng):
    n, h, w, ci, co = 2, 4, 3, 8, 8
    return dict(
        x=jnp.asarray(rng.standard_normal((n, h, w, ci)), jnp.float32),
        w=jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.2, jnp.float32),
        b=jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32),
        g=jnp.asarray(1 + rng.standard_normal(co) * 0.2, jnp.float32),
        beta=jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32),
        res=jnp.asarray(rng.standard_normal((n, h, w, co)), jnp.float32),
    )


def test_conv3_ln_relu(tiny):
    out = conv_ln_act(tiny["x"], tiny["w"], tiny["b"], tiny["g"], tiny["beta"],
                      height=4, width=3)
    ref = _ref(tiny["x"], tiny["w"], tiny["b"], tiny["g"], tiny["beta"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_conv3_residual(tiny):
    out = conv_ln_act(tiny["x"], tiny["w"], tiny["b"], tiny["g"], tiny["beta"],
                      tiny["res"], height=4, width=3)
    ref = _ref(tiny["x"], tiny["w"], tiny["b"], tiny["g"], tiny["beta"],
               tiny["res"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_conv1(tiny):
    w1 = tiny["w"][1:2, 1:2]
    out = conv_ln_act(tiny["x"], w1, tiny["b"], tiny["g"], tiny["beta"],
                      height=4, width=3, kernel=1)
    ref = _ref(tiny["x"], w1, tiny["b"], tiny["g"], tiny["beta"], k=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_conv3_int8(tiny):
    """xscale switches the matmuls to int8; result tracks the f32 oracle
    within quantization noise."""
    xs = float(np.abs(np.asarray(tiny["x"])).max() / 127.0)
    out = conv_ln_act(tiny["x"], tiny["w"], tiny["b"], tiny["g"], tiny["beta"],
                      height=4, width=3, xscale=xs)
    ref = _ref(tiny["x"], tiny["w"], tiny["b"], tiny["g"], tiny["beta"])
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 0.15, err
    # and it must NOT be bit-identical (proves the int8 path actually ran)
    assert err > 1e-6


def test_fusion_context_is_scoped():
    assert not pallas_head.fusion_enabled()
    with head_fusion():
        assert pallas_head.fusion_enabled()
        with head_fusion(False):
            assert not pallas_head.fusion_enabled()
        assert pallas_head.fusion_enabled()
    assert not pallas_head.fusion_enabled()


@pytest.mark.slow
def test_head_v2_mask_branch_fusion(rng):
    """The S2D-form fused upsample path (deconv2x -> LayerNorm2d -> relu as
    one k=1 kernel on the ROI grid) matches the plain path exactly."""
    from human_instance_segmentation_tpu.models.heads import HierarchicalHeadV2

    head = HierarchicalHeadV2(mid_channels=32, mask_size=(8, 6),
                              base_channels=16, depth=2)
    x = jnp.asarray(rng.standard_normal((2, 4, 3, 24)), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x, train=False)
    base, aux_b = head.apply(params, x, train=False)
    with head_fusion(s2d_upsample=True):
        fused, aux_f = head.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=1e-5)
    for k in aux_b:
        np.testing.assert_allclose(
            np.asarray(aux_f[k]), np.asarray(aux_b[k]), atol=1e-5)


@pytest.mark.slow
def test_blocks_match_under_fusion(rng, monkeypatch):
    # drop the channel floor so the tiny test shapes take the fused path
    monkeypatch.setattr(pallas_head, "_MIN_FUSED_CH", 8)
    x = jnp.asarray(rng.standard_normal((2, 4, 3, 16)), jnp.float32)
    for mod in (ConvNormAct(16), ResidualBlock(16)):
        params = mod.init(jax.random.PRNGKey(0), x, train=False)
        base = mod.apply(params, x, train=False)
        with head_fusion():
            fused = mod.apply(params, x, train=False)
        assert not jnp.allclose(base, 0)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(base), atol=1e-4)
