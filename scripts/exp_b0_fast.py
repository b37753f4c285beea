"""b0-fast: distill the 256-wide flagship head into a 128-wide one.

Stage-2 (RGB extractor + refined head) carries 59.6 GFLOP/ROI — 68% of
the deployed program's FLOPs (README profile table) — and the head stack
scales ~quadratically in mid_channels. This runs the full recipe at tiny
scale (the image ships no real COCO): train a flagship teacher on
synthetic COCO, distill a half-width student with the hierarchical KD
step (training/distill.py:make_hierarchical_distill_step — the
DistillationLoss analogue, reference knowledge_distillation.py:10-207),
and record target-mIoU for teacher / KD student / from-scratch student.

Gate (VERDICT r3 #2): the KD student must land within 0.5 pt of the
teacher's mIoU for the fast config to be a legitimate serving row.

Run: PYTHONPATH=/root/repo python -u scripts/exp_b0_fast.py
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
from human_instance_segmentation_tpu.training.distill import (
    make_hierarchical_distill_step)
from human_instance_segmentation_tpu.training.state import TrainState
from human_instance_segmentation_tpu.training.steps import (
    make_train_step, rois_from_boxes)


def tiny_model(mid: int):
    return HierarchicalInstanceSegmenter(
        encoder_variant="tiny", roi_size=(16, 12), mask_size=(32, 24),
        image_size=(64, 64), base_channels=16, depth=2, mid_channels=mid,
        feature_dim=32, unet_decoder_channels=(32, 24, 16, 16, 8),
        freeze_pretrained=False)


def init_state(model, tx, seed):
    imgs0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rois0 = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
    variables = jax.jit(lambda r: model.init(r, imgs0, rois0, train=False))(
        jax.random.PRNGKey(seed))
    return TrainState.create(variables, tx, jax.random.PRNGKey(seed + 1))


def target_miou(model, variables, ds):
    inter = union = 0.0
    for batch in batch_iterator(ds, batch_size=4, shuffle=False, seed=0):
        rois = rois_from_boxes(batch["boxes"])
        logits, _ = model.apply(variables, batch["images"], rois, train=False)
        b, k = batch["boxes"].shape[:2]
        mh, mw = batch["masks"].shape[-2:]
        targets = batch["masks"].reshape(b * k, mh, mw)
        valid = batch["valid"].reshape(b * k).astype(bool)
        pred = (jnp.argmax(logits, -1) == 1) & valid[:, None, None]
        gt = (targets == 1) & valid[:, None, None]
        inter += float(jnp.sum(pred & gt))
        union += float(jnp.sum(pred | gt))
    return inter / max(union, 1.0)


def main():
    tmp = tempfile.mkdtemp()
    ann, img_dir = generate_synthetic_coco(tmp, n_images=16, image_size=(64, 64),
                                           max_instances=2)
    cfg = DatasetConfig(image_size=(64, 64), mask_size=(32, 24),
                        rois_per_image=2, min_roi_size=4)
    ds = COCOInstanceSegmentationDataset(ann, img_dir, cfg)
    tx = lambda: optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-3))

    # --- teacher: full-width head, task-only training
    teacher = tiny_model(mid=32)
    tstate = init_state(teacher, tx(), 0)
    tstep = make_train_step(teacher, tx(), RefinedLossConfig(), donate=False)
    for epoch in range(30):
        for batch in batch_iterator(ds, batch_size=4, shuffle=True, seed=epoch):
            tstate, tm = tstep(tstate, batch)
    tvars = {"params": tstate.params, "batch_stats": tstate.batch_stats}
    miou_t = target_miou(teacher, tvars, ds)
    print(f"teacher (mid 32) loss {float(tm['total_loss']):.3f} "
          f"target mIoU {miou_t:.4f}", flush=True)

    # --- student A: half-width head, task-only (the no-KD control)
    student = tiny_model(mid=16)
    sstate = init_state(student, tx(), 10)
    sstep = make_train_step(student, tx(), RefinedLossConfig(), donate=False)
    for epoch in range(30):
        for batch in batch_iterator(ds, batch_size=4, shuffle=True, seed=epoch):
            sstate, sm = sstep(sstate, batch)
    svars = {"params": sstate.params, "batch_stats": sstate.batch_stats}
    miou_s = target_miou(student, svars, ds)
    print(f"student scratch (mid 16) target mIoU {miou_s:.4f}", flush=True)

    # --- student B: same architecture, hierarchical KD from the teacher
    kstate = init_state(student, tx(), 20)
    kstep = make_hierarchical_distill_step(
        student, teacher, tvars, tx(), RefinedLossConfig(),
        temperature=2.0, alpha=0.5, aux_weight=0.3)
    for epoch in range(30):
        for batch in batch_iterator(ds, batch_size=4, shuffle=True, seed=epoch):
            kstate, km = kstep(kstate, batch)
    kvars = {"params": kstate.params, "batch_stats": kstate.batch_stats}
    miou_k = target_miou(student, kvars, ds)
    print(f"student KD      (mid 16) target mIoU {miou_k:.4f}", flush=True)

    print(f"KD delta vs teacher: {miou_k - miou_t:+.4f} "
          f"(gate: >= -0.005); KD vs scratch: {miou_k - miou_s:+.4f}",
          flush=True)


if __name__ == "__main__":
    main()
