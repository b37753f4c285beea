"""Real-YOLO-feature contract: converter, golden fixture, multi-scale train
step on the fixture (VERDICT r3 ask #8 — the supported real-feature path is
an explicit, tested contract, not an implicit one)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from human_instance_segmentation_tpu.data.yolo_features import (
    ONNX_TENSOR_NAMES,
    convert_onnx_feature_dump,
    load_feature_pyramid,
    write_golden_fixture,
)
from human_instance_segmentation_tpu.models.multiscale import FEATURE_SPECS


def test_tensor_names_match_reference_specs():
    # one ONNX output name per FEATURE_SPECS layer, reference naming scheme
    assert set(ONNX_TENSOR_NAMES) == set(FEATURE_SPECS)
    for layer_id, name in ONNX_TENSOR_NAMES.items():
        n = layer_id.split("_")[1]
        assert name == f"segmentation_model_{n}_Concat_output_0"


def test_converter_validates_and_transposes(tmp_path):
    rng = np.random.default_rng(0)
    images = rng.random((2, 64, 64, 3), np.float32)
    nchw = rng.standard_normal((2, 1024, 8, 8)).astype(np.float32)
    out = convert_onnx_feature_dump(
        images, {ONNX_TENSOR_NAMES["layer_34"]: nchw,
                 "unrelated_output": np.zeros((2, 4))},
        str(tmp_path / "dump.npz"))
    feats, imgs, masks = load_feature_pyramid(out)
    assert masks is None
    np.testing.assert_array_equal(imgs, images)
    np.testing.assert_array_equal(feats["layer_34"],
                                  np.transpose(nchw, (0, 2, 3, 1)))
    # yolo_features alias for the single-layer distillation path
    with np.load(out) as z:
        np.testing.assert_array_equal(z["yolo_features"], feats["layer_34"])

    # wrong channel count is rejected, not silently accepted
    bad = rng.standard_normal((2, 512, 8, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="layer_34"):
        convert_onnx_feature_dump(
            images, {ONNX_TENSOR_NAMES["layer_34"]: bad},
            str(tmp_path / "bad.npz"))
    # wrong stride (spatial extent) is rejected
    bad2 = rng.standard_normal((2, 1024, 16, 16)).astype(np.float32)
    with pytest.raises(ValueError, match="layer_34"):
        convert_onnx_feature_dump(
            images, {ONNX_TENSOR_NAMES["layer_34"]: bad2},
            str(tmp_path / "bad2.npz"))
    # a dump with no known tensors is an error
    with pytest.raises(ValueError, match="no known"):
        convert_onnx_feature_dump(images, {"x": np.zeros((2, 4))},
                                  str(tmp_path / "none.npz"))


@pytest.mark.slow
def test_multiscale_trains_one_step_on_fixture(tmp_path):
    """The multi-scale family runs a real gradient step against the golden
    fixture's feature pyramid — the schema IS what the model consumes.

    Slow tier: the grad-of-apply trace costs ~70 s on the CPU backend; the
    fast tier still covers the fixture schema (tests above) and the model
    forward (test_model_families.py)."""
    from human_instance_segmentation_tpu.models.multiscale import (
        MultiScaleSegmentationModel)

    path = write_golden_fixture(str(tmp_path / "golden.npz"), batch=1,
                                image_hw=(32, 32))
    feats, images, masks = load_feature_pyramid(path)
    assert set(feats) == {"layer_3", "layer_22", "layer_34"}
    assert masks is not None and masks.max() == 1.0

    model = MultiScaleSegmentationModel(
        roi_size=(8, 8), mask_size=(8, 8), mid_channels=16, norm_groups=4)
    rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
    imgs = jnp.asarray(images)
    feats_j = {k: jnp.asarray(v) for k, v in feats.items()}
    params = model.init(jax.random.PRNGKey(0), imgs, rois, train=False,
                        features=feats_j)
    assert "pyramid" not in params["params"]  # head-only: external features

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    target = jnp.zeros((1, 8, 8), jnp.int32)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, _ = model.apply(p, imgs, rois, train=False,
                                    features=feats_j)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, target).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params1, opt_state, l0 = step(params, opt_state)
    _, _, l1 = step(params1, opt_state)
    assert np.isfinite(float(l0)) and float(l1) < float(l0)
