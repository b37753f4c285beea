"""Int8 (static calibrated scales) path of the fused S2D decoder tail.

The reference deploys TensorRT engines whose int8 tactics quantize the
deployed graph (/root/reference/README.md:553-563); the TPU analogue here
runs the composed S2D decoder convs s8xs8->s32 on the MXU with scales
calibrated through ops/quant.py. These tests pin:
  - collect_scales' ``amax_<tag>`` suffix keys (multi-point modules),
  - closeness of each quantized composed conv to its float form,
  - end-to-end closeness of the int8 fused tail through a real UNet.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet
from human_instance_segmentation_tpu.ops.quant import (calibration,
                                                       collect_scales,
                                                       int8_serving)
from human_instance_segmentation_tpu.ops.s2d import (conv3x3_s2d,
                                                     conv3x3_strided_s2d,
                                                     conv_up_s2d,
                                                     quantize_static)


def test_collect_scales_amax_suffix_keys():
    tree = {
        "decoder4": {"amax_x": (jnp.float32(12.7),),
                     "amax_mid": (jnp.float32(2.54), jnp.float32(1.0))},
        "head": {"conv": {"amax": (jnp.float32(127.0),)}},
    }
    flat = collect_scales(tree)
    assert flat["decoder4#x"] == pytest.approx(0.1)
    assert flat["decoder4#mid"] == pytest.approx(0.02)  # max over calls
    assert flat["head/conv"] == pytest.approx(1.0)


@pytest.mark.parametrize("fn,xshape,wshape", [
    (conv3x3_s2d, (2, 8, 8, 12), (3, 3, 3, 5)),
    (conv_up_s2d, (2, 8, 8, 6), (3, 3, 6, 5)),
    (conv3x3_strided_s2d, (2, 16, 16, 6), (3, 3, 6, 5)),
])
def test_quantized_composed_conv_close_to_float(fn, xshape, wshape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(xshape), jnp.float32)
    w = jnp.asarray(rng.standard_normal(wshape) * 0.1, jnp.float32)
    scale = float(jnp.max(jnp.abs(x))) / 127.0
    y_f = fn(x, w)
    y_q = fn(x, w, qscale=scale)
    assert y_q.dtype == y_f.dtype
    err = float(jnp.max(jnp.abs(y_q - y_f)))
    ref = float(jnp.max(jnp.abs(y_f)))
    assert err < 0.05 * ref, (err, ref)


def test_quantized_conv_accepts_prequantized_int8_input():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)) * 0.1, jnp.bfloat16)
    scale = float(jnp.max(jnp.abs(x))) / 127.0
    xq = quantize_static(x, scale)
    assert xq.dtype == jnp.int8
    y_inline = conv_up_s2d(x.astype(jnp.bfloat16), w, qscale=scale)
    y_pre = conv_up_s2d(xq, w, qscale=scale)
    # pre-quantized and inline-quantized inputs give the same int8 program
    np.testing.assert_allclose(np.asarray(y_pre, np.float32),
                               np.asarray(y_inline, np.float32),
                               rtol=0.05, atol=0.02)
    assert y_pre.dtype == jnp.bfloat16


@pytest.mark.slow
def test_int8_fused_tail_end_to_end_close(monkeypatch):
    """Calibrate a real fused-tail UNet, serve int8, compare to float."""
    from human_instance_segmentation_tpu.ops import quant as quant_mod
    # tiny-model channels sit below the measured MXU-friendliness gate;
    # drop it so the quantized composed-conv path is exercised
    monkeypatch.setattr(quant_mod, "TAIL_QUANT_MIN_FEATURES", 0)
    m = PeopleSegmentationUNet(encoder_variant="tiny", fused_tail=3,
                               encoder_s2d_front=True)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3), np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    y_f = m.apply(v, x, train=False)

    def run_cal(v, x):
        with calibration():
            return m.apply(v, x, train=False, mutable=["calib"])

    _, cv = jax.jit(run_cal)(v, x)
    scales = collect_scales(jax.tree.map(float, cv["calib"]))
    # decoder tail (x/skip/mid per fused stage) + seg head scales present
    assert any(k.endswith("#x") for k in scales)
    assert any(k.endswith("#mid") for k in scales)
    assert any(k.endswith("#head") for k in scales)

    def run_q(v, x):
        with int8_serving(True, scales):
            return m.apply(v, x, train=False)

    y_q = jax.jit(run_q)(v, x)
    ref = float(jnp.max(jnp.abs(y_f)))
    err = float(jnp.max(jnp.abs(y_q - y_f)))
    assert err < 0.1 * ref, (err, ref)
