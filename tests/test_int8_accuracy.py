"""Serving-form accuracy gate (slow tier): train the tiny flagship, then
assert plain-f32 / fused-tail / calibrated-int8 deployed outputs agree
within a mask-IoU bound. A future fusion or quantization change that
breaks numerics fails THIS test, not just the eval script
(scripts/eval_int8_accuracy.py, which this formalises — VERDICT r2 item 4)."""

import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                                reason="slow tier")


@pytest.fixture(scope="module")
def trained():
    import jax
    import jax.numpy as jnp
    import optax

    from human_instance_segmentation_tpu.data import (
        COCOInstanceSegmentationDataset, DatasetConfig, batch_iterator)
    from human_instance_segmentation_tpu.data.synthetic import (
        generate_synthetic_coco)
    from human_instance_segmentation_tpu.losses.hierarchical import (
        RefinedLossConfig)
    from human_instance_segmentation_tpu.models.assembly import (
        HierarchicalInstanceSegmenter)
    from human_instance_segmentation_tpu.training.state import TrainState
    from human_instance_segmentation_tpu.training.steps import (
        make_train_step, rois_from_boxes)

    tmp = tempfile.mkdtemp()
    ann, img_dir = generate_synthetic_coco(
        tmp, n_images=16, image_size=(64, 64), max_instances=2)
    cfg = DatasetConfig(image_size=(64, 64), mask_size=(32, 24),
                        rois_per_image=2, min_roi_size=4)
    ds = COCOInstanceSegmentationDataset(ann, img_dir, cfg)

    model = HierarchicalInstanceSegmenter(
        encoder_variant="tiny", roi_size=(16, 12), mask_size=(32, 24),
        image_size=(64, 64), base_channels=16, depth=2, mid_channels=32,
        feature_dim=32, unet_decoder_channels=(32, 24, 16, 16, 8),
        freeze_pretrained=False)
    imgs0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rois0 = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
    variables = jax.jit(lambda r: model.init(r, imgs0, rois0, train=False))(
        jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-3))
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, RefinedLossConfig(), donate=False)
    for epoch in range(20):
        for batch in batch_iterator(ds, batch_size=4, shuffle=True, seed=epoch):
            state, _ = step(state, batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def target_miou(m, ctx=None):
        import contextlib

        inter = union = 0.0
        for batch in batch_iterator(ds, batch_size=4, shuffle=False, seed=0):
            rois = rois_from_boxes(batch["boxes"])
            with (ctx() if ctx else contextlib.nullcontext()):
                logits, _ = m.apply(variables, batch["images"], rois, train=False)
            b, k = batch["boxes"].shape[:2]
            mh, mw = batch["masks"].shape[-2:]
            targets = batch["masks"].reshape(b * k, mh, mw)
            valid = batch["valid"].reshape(b * k).astype(bool)
            pred = (jnp.argmax(logits, -1) == 1) & valid[:, None, None]
            gt = (targets == 1) & valid[:, None, None]
            inter += float(jnp.sum(pred & gt))
            union += float(jnp.sum(pred | gt))
        return inter / max(union, 1.0)

    def calibrate(m):
        from human_instance_segmentation_tpu.ops.quant import (
            calibration, collect_scales, merge_scales)

        scales = None
        for i, batch in enumerate(batch_iterator(ds, batch_size=4,
                                                 shuffle=False, seed=0)):
            with calibration():
                _, cv = m.apply(variables, batch["images"],
                                rois_from_boxes(batch["boxes"]),
                                train=False, mutable=["calib"])
            s = collect_scales(jax.tree.map(float, cv["calib"]))
            scales = s if scales is None else merge_scales(scales, s)
            if i >= 1:
                break
        return scales

    return model, target_miou, calibrate


def test_serving_forms_agree_on_trained_model(trained):
    from human_instance_segmentation_tpu.ops.quant import int8_serving

    model, target_miou, calibrate = trained
    miou_f = target_miou(model)
    assert miou_f > 0.6, f"tiny flagship failed to train (mIoU {miou_f:.3f})"

    # fused-tail serving form must be EXACT vs the plain form
    serve = model.clone(fused_tail=3)
    miou_sf = target_miou(serve)
    assert abs(miou_sf - miou_f) < 1e-4, (miou_sf, miou_f)

    # calibrated int8 (plain + fused tail incl. boundary int8 flow):
    # mask-IoU delta bound from the north star (<0.2pt)
    miou_q = target_miou(model, lambda: int8_serving(scales=calibrate(model)))
    assert abs(miou_q - miou_f) < 0.002, (miou_q, miou_f)

    miou_sq = target_miou(serve, lambda: int8_serving(scales=calibrate(serve)))
    assert abs(miou_sq - miou_f) < 0.002, (miou_sq, miou_f)
