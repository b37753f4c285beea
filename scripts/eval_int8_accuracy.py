"""Int8 serving accuracy on a TRAINED model: train the tiny flagship on
synthetic COCO, then compare val target-mIoU between bf16 and calibrated
int8 serving (the evidence behind the README int8 row).

Run: PYTHONPATH=/root/repo python -u scripts/eval_int8_accuracy.py
"""

from __future__ import annotations

import tempfile

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from human_instance_segmentation_tpu.data import (
    COCOInstanceSegmentationDataset, DatasetConfig, batch_iterator)
from human_instance_segmentation_tpu.data.synthetic import generate_synthetic_coco
from human_instance_segmentation_tpu.losses.hierarchical import RefinedLossConfig
from human_instance_segmentation_tpu.models.assembly import HierarchicalInstanceSegmenter
from human_instance_segmentation_tpu.ops.quant import (
    calibration, collect_scales, int8_serving)
from human_instance_segmentation_tpu.training.state import TrainState
from human_instance_segmentation_tpu.training.steps import make_train_step, rois_from_boxes


def main():
    tmp = tempfile.mkdtemp()
    ann, img_dir = generate_synthetic_coco(tmp, n_images=16, image_size=(64, 64),
                                           max_instances=2)
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

    for epoch in range(30):
        for batch in batch_iterator(ds, batch_size=4, shuffle=True, seed=epoch):
            state, metrics = step(state, batch)
    print(f"final train loss {float(metrics['total_loss']):.3f}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def target_miou(apply_ctx, m=model):
        inter = union = 0.0
        for batch in batch_iterator(ds, batch_size=4, shuffle=False, seed=0):
            rois = rois_from_boxes(batch["boxes"])
            with apply_ctx() if apply_ctx else _null():
                logits, _ = m.apply(variables, batch["images"], rois,
                                    train=False)
            b, k = batch["boxes"].shape[:2]
            mh, mw = batch["masks"].shape[-2:]
            targets = batch["masks"].reshape(b * k, mh, mw)
            valid = batch["valid"].reshape(b * k).astype(bool)
            pred = (jnp.argmax(logits, -1) == 1) & valid[:, None, None]
            gt = (targets == 1) & valid[:, None, None]
            inter += float(jnp.sum(pred & gt))
            union += float(jnp.sum(pred | gt))
        return inter / max(union, 1.0)

    class _null:
        def __enter__(self):
            return self

        def __exit__(self, *e):
            return False

    miou_f = target_miou(None)

    # calibrate on two train batches
    scales = None
    from human_instance_segmentation_tpu.ops.quant import merge_scales
    for i, batch in enumerate(batch_iterator(ds, batch_size=4, shuffle=False, seed=0)):
        with calibration():
            _, cv = model.apply(variables, batch["images"],
                                rois_from_boxes(batch["boxes"]),
                                train=False, mutable=["calib"])
        s = collect_scales(jax.tree.map(float, cv["calib"]))
        scales = s if scales is None else merge_scales(scales, s)
        if i >= 1:
            break

    miou_q = target_miou(lambda: int8_serving(scales=scales))
    print(f"target IoU  f32 serving:  {miou_f:.4f}")
    print(f"target IoU  int8 serving: {miou_q:.4f}")
    print(f"delta: {miou_q - miou_f:+.4f}")

    # Serving-form model (fused S2D tail): same parameter tree, and its
    # int8 path additionally quantizes the composed decoder-tail convs
    # (ops/s2d.py) — calibrate THROUGH the fused form so the tail's
    # amax_<tag> points are recorded.
    serve = model.clone(fused_tail=3)
    miou_sf = target_miou(None, m=serve)
    tail_scales = None
    for i, batch in enumerate(batch_iterator(ds, batch_size=4, shuffle=False, seed=0)):
        with calibration():
            _, cv = serve.apply(variables, batch["images"],
                                rois_from_boxes(batch["boxes"]),
                                train=False, mutable=["calib"])
        s = collect_scales(jax.tree.map(float, cv["calib"]))
        tail_scales = s if tail_scales is None else merge_scales(tail_scales, s)
        if i >= 1:
            break
    miou_sq = target_miou(lambda: int8_serving(scales=tail_scales), m=serve)
    print(f"target IoU  f32 fused-tail serving:  {miou_sf:.4f} "
          f"(exactness check vs plain: {miou_sf - miou_f:+.5f})")
    print(f"target IoU  int8 fused-tail serving: {miou_sq:.4f}")
    print(f"delta vs f32: {miou_sq - miou_f:+.4f}")


if __name__ == "__main__":
    main()
