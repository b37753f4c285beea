"""Int8 serving mode (ops/quant.py): parity, calibration, engine wiring.

The reference deploys TensorRT engines whose int8 tactics are likewise
post-training quantized (README.md:553-563 context); here the contract is:
disabled == exactly nn.Conv, enabled == bounded error + intact mask
semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from human_instance_segmentation_tpu.inference import InferenceEngine, create_flagship
from human_instance_segmentation_tpu.ops.quant import (
    QConv, calibration, collect_scales, int8_serving, merge_scales)


def test_qconv_matches_nn_conv_when_disabled():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 7)), jnp.float32)
    q = QConv(5, (3, 3), strides=(1, 1), padding=1)
    c = nn.Conv(5, (3, 3), strides=(1, 1), padding=1)
    vq = q.init(jax.random.PRNGKey(1), x)
    yq = q.apply(vq, x)
    yc = c.apply(vq, x)  # identical param tree by construction
    np.testing.assert_array_equal(np.asarray(yq), np.asarray(yc))


def test_qconv_int8_bounded_error():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    q = QConv(16, (3, 3), padding=1)
    v = q.init(jax.random.PRNGKey(0), x)
    y = q.apply(v, x)
    with int8_serving():
        y8 = q.apply(v, x)
    err = float(jnp.max(jnp.abs(y - y8)))
    rel = err / float(jnp.max(jnp.abs(y)))
    assert rel < 0.05, rel


def test_qconv_denylist_stays_exact():
    """Path substrings in int8_serving(deny=...) compute exactly bf16/f32 —
    the serving engine denies the stage-1 encoder by default (XLA s8 conv
    lowering is a measured loss there, scripts/exp_r3_enc_d4.py)."""
    import flax.linen as fnn

    class Wrap(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            a = QConv(16, (3, 3), padding=1, name="encoder_conv")(x)
            b = QConv(16, (3, 3), padding=1, name="head_conv")(x)
            return a, b

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32)
    m = Wrap()
    v = m.init(jax.random.PRNGKey(0), x)
    a_exact, b_exact = m.apply(v, x)
    with int8_serving(deny=("encoder_",)):
        a_deny, b_deny = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(a_deny), np.asarray(a_exact))
    assert float(jnp.max(jnp.abs(b_deny - b_exact))) > 0  # head quantized


def test_qconv_small_contraction_skipped():
    # 1x1 conv on 2 channels: below threshold, must stay exact even enabled
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    q = QConv(4, (1, 1))
    v = q.init(jax.random.PRNGKey(0), x)
    with int8_serving():
        y8 = q.apply(v, x)
    np.testing.assert_array_equal(np.asarray(y8), np.asarray(q.apply(v, x)))


@pytest.mark.slow
def test_calibration_and_static_scales_flagship():
    m, p = create_flagship(variant="tiny", roi_size=(16, 12), mask_size=(32, 24),
                           image_size=(64, 64))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    rois = jnp.asarray([[0, .2, .1, .8, .9], [1, .1, .2, .9, .8]], jnp.float32)
    with calibration():
        (lg, _), cv = m.apply(p, x, rois, train=False, mutable=["calib"])
    scales = collect_scales(cv["calib"])
    assert len(scales) > 20
    assert all(s > 0 for s in scales.values())
    with int8_serving(scales=scales):
        lgq, _ = m.apply(p, x, rois, train=False)
    rel = float(jnp.max(jnp.abs(lg - lgq))) / float(jnp.max(jnp.abs(lg)))
    assert rel < 0.15, rel
    # class decisions mostly unchanged at random init
    agree = float(jnp.mean((jnp.argmax(lg, -1) == jnp.argmax(lgq, -1))
                           .astype(jnp.float32)))
    assert agree > 0.95, agree


def test_merge_scales():
    assert merge_scales({"a": 1.0, "b": 2.0}, {"b": 3.0, "c": 4.0}) == {
        "a": 1.0, "b": 3.0, "c": 4.0}


@pytest.mark.slow
def test_engine_int8_mode():
    m, p = create_flagship(variant="tiny", roi_size=(16, 12), mask_size=(32, 24),
                           image_size=(64, 64))
    rng = np.random.default_rng(4)
    imgs = rng.random((1, 64, 64, 3)).astype(np.float32)
    rois = np.asarray([[0, .2, .1, .8, .9]], np.float32)
    eng = InferenceEngine(m, p, dilation_pixels=1, quantize="int8")
    inst, binary = eng(imgs, rois)
    assert eng._scales is not None and len(eng._scales) > 0
    assert inst.shape == (1, 32, 24, 1)
    assert set(np.unique(inst)) <= {0.0, 1.0}
    ref = InferenceEngine(m, p, dilation_pixels=1)
    inst_f, _ = ref(imgs, rois)
    agree = float((inst == inst_f).mean())
    assert agree > 0.93, agree


def test_default_denylist_denies_encoder_only():
    """The engine's default int8 denylist keeps the WHOLE stage-1 encoder
    bf16 and nothing else — the r5 measured-best default across serving
    configs (per-stage/per-config table in
    scripts/results/serving_matrix.jsonl: stages 4-6 are neutral at mid256
    but a 0.6 ms loss at the served mid128)."""
    from human_instance_segmentation_tpu.inference import ENCODER_INT8_DENY
    from human_instance_segmentation_tpu.ops.quant import int8_denied, int8_serving

    with int8_serving(True, scales=None, deny=ENCODER_INT8_DENY):
        denied = lambda p: int8_denied(tuple(p.split("/")))
        for s in range(7):
            assert denied(f"pretrained_unet/encoder/stage{s}_block0/expand_conv")
        assert not denied("pretrained_unet/decoder4/conv0")
        assert not denied("head/shared_in/conv")
