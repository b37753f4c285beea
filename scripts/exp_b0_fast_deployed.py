"""b0-fast at DEPLOYED scale: teacher -> 128-wide-head KD student, measured.

The round-4 version of this experiment (scripts/exp_b0_fast.py) validated
the hierarchical-KD plumbing at 64x64/tiny-encoder scale; VERDICT r4 #1
asks for the real thing: the B0 encoder at 480x640 / roi 64x48 / mask
128x96 (the bench.py deployment shape), a flagship 256-wide teacher
trained to convergence on synthetic COCO, and mid-128 students trained
(a) from scratch and (b) by hierarchical KD from the teacher
(training/distill.py:make_hierarchical_distill_step — the reference
DistillationLoss analogue, knowledge_distillation.py:10-134).

Gate: the KD student must land within 0.5 pt of the teacher's val
target-mIoU for the *_fast config family (config.py) to be a legitimate
serving default. Results append to scripts/results/b0_fast_deployed.jsonl
either way.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_b0_fast_deployed.py [--mid 128] [--steps 360]
"""

from __future__ import annotations

import argparse
import tempfile

import jax
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

IH, IW = 480, 640
ROI = (64, 48)
MASK = (128, 96)
BATCH = 4
K = 2  # rois per image


def flagship(mid: int, fd: int = 256,
             dec=(256, 128, 64, 32, 16)) -> HierarchicalInstanceSegmenter:
    return HierarchicalInstanceSegmenter(
        encoder_variant="b0", roi_size=ROI, mask_size=MASK,
        image_size=(IH, IW), mid_channels=mid, feature_dim=fd,
        unet_decoder_channels=tuple(dec), freeze_pretrained=False)


def init_state(model, tx, seed):
    imgs0 = jnp.zeros((1, IH, IW, 3), jnp.float32)
    rois0 = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
    variables = jax.jit(lambda r: model.init(r, imgs0, rois0, train=False))(
        jax.random.PRNGKey(seed))
    return TrainState.create(variables, tx, jax.random.PRNGKey(seed + 1))


def val_miou(model, variables, ds, infer=None):
    """Target-class mIoU over a dataset (jitted apply, bucketed batches)."""
    if infer is None:
        infer = jax.jit(lambda v, im, r: model.apply(v, im, r, train=False)[0])
    inter = union = 0.0
    for batch in batch_iterator(ds, batch_size=BATCH, shuffle=False, seed=0,
                                drop_last=True):
        rois = rois_from_boxes(batch["boxes"])
        logits = infer(variables, batch["images"], rois)
        b, k = batch["boxes"].shape[:2]
        mh, mw = batch["masks"].shape[-2:]
        targets = batch["masks"].reshape(b * k, mh, mw)
        valid = batch["valid"].reshape(b * k).astype(bool)
        pred = np.asarray(jnp.argmax(logits, -1) == 1) & valid[:, None, None]
        gt = (np.asarray(targets) == 1) & valid[:, None, None]
        inter += float(np.sum(pred & gt))
        union += float(np.sum(pred | gt))
    return inter / max(union, 1.0)


def train(model, state, step_fn, ds, n_steps, tag):
    import time
    seen = 0
    epoch = 0
    t0 = time.time()
    while seen < n_steps:
        for batch in batch_iterator(ds, batch_size=BATCH, shuffle=True,
                                    seed=epoch, drop_last=True):
            state, metrics = step_fn(state, batch)
            seen += 1
            if seen % 60 == 0:
                print(f"  {tag} step {seen}/{n_steps} "
                      f"loss {float(metrics['total_loss']):.4f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
            if seen >= n_steps:
                break
        epoch += 1
    return state, float(metrics["total_loss"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mid", type=int, default=128)
    ap.add_argument("--fd", type=int, default=256,
                    help="student RGB-extractor/feature dim (fast-family axis)")
    ap.add_argument("--dechalf", action="store_true",
                    help="student stage-1 decoder at half width (dhalf row)")
    ap.add_argument("--steps", type=int, default=360)
    ap.add_argument("--skip-scratch", action="store_true")
    args = ap.parse_args()
    student_dec = (128, 64, 32, 16, 16) if args.dechalf else (256, 128, 64, 32, 16)

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    tmp = tempfile.mkdtemp()
    ann_tr, dir_tr = generate_synthetic_coco(
        tmp + "/train", n_images=48, image_size=(IH, IW), max_instances=3, seed=0)
    ann_va, dir_va = generate_synthetic_coco(
        tmp + "/val", n_images=16, image_size=(IH, IW), max_instances=3, seed=100)
    cfg = DatasetConfig(image_size=(IH, IW), mask_size=MASK,
                        rois_per_image=K, min_roi_size=8)
    ds_tr = COCOInstanceSegmentationDataset(ann_tr, dir_tr, cfg)
    ds_va = COCOInstanceSegmentationDataset(ann_va, dir_va, cfg)
    print(f"synthetic COCO: {len(ds_tr)} train / {len(ds_va)} val samples",
          flush=True)

    tx = lambda: optax.chain(optax.clip_by_global_norm(1.0),
                             optax.adamw(1e-3, weight_decay=1e-4))

    # --- teacher: 256-wide head
    teacher = flagship(256)
    tstate = init_state(teacher, tx(), 0)
    tstep = make_train_step(teacher, tx(), RefinedLossConfig())
    tstate, tloss = train(teacher, tstate, tstep, ds_tr, args.steps, "teacher")
    tvars = {"params": tstate.params, "batch_stats": tstate.batch_stats}
    miou_t = val_miou(teacher, tvars, ds_va)
    print(f"teacher mid256: loss {tloss:.4f}  val target-mIoU {miou_t:.4f}",
          flush=True)

    rows = {"teacher_mid256": miou_t}

    student = flagship(args.mid, fd=args.fd, dec=student_dec)
    if not args.skip_scratch:
        # --- student, from scratch (the no-KD control)
        sstate = init_state(student, tx(), 10)
        sstep = make_train_step(student, tx(), RefinedLossConfig())
        sstate, sloss = train(student, sstate, sstep, ds_tr, args.steps,
                              f"scratch{args.mid}")
        svars = {"params": sstate.params, "batch_stats": sstate.batch_stats}
        miou_s = val_miou(student, svars, ds_va)
        print(f"student mid{args.mid} scratch: val target-mIoU {miou_s:.4f}",
              flush=True)
        rows[f"scratch_mid{args.mid}"] = miou_s

    # --- student, hierarchical KD from the converged teacher
    kstate = init_state(student, tx(), 20)
    kstep = make_hierarchical_distill_step(
        student, teacher, tvars, tx(), RefinedLossConfig(),
        temperature=2.0, alpha=0.5, aux_weight=0.3)
    kstate, kloss = train(student, kstate, kstep, ds_tr, args.steps,
                          f"kd{args.mid}")
    kvars = {"params": kstate.params, "batch_stats": kstate.batch_stats}
    miou_k = val_miou(student, kvars, ds_va)
    rows[f"kd_mid{args.mid}"] = miou_k
    delta = miou_k - miou_t
    gate = delta >= -0.005
    print(f"student mid{args.mid} KD: val target-mIoU {miou_k:.4f}  "
          f"delta vs teacher {delta:+.4f}  gate(<=0.5pt loss): "
          f"{'PASS' if gate else 'FAIL'}", flush=True)

    # --- the SERVED form: same KD student under calibrated int8 (the
    # bench.py config: static scales, encoder denied). This is the
    # accuracy of what actually ships, not just the bf16 apply.
    from human_instance_segmentation_tpu.inference import ENCODER_INT8_DENY
    from human_instance_segmentation_tpu.ops.quant import (
        calibration, collect_scales, int8_serving)

    cal_batch = next(iter(batch_iterator(ds_tr, batch_size=BATCH,
                                         shuffle=False, seed=0)))
    cal_rois = rois_from_boxes(cal_batch["boxes"])

    @jax.jit
    def calib_run(v, im, r):
        with calibration():
            return student.apply(v, im, r, train=False, mutable=["calib"])

    _, cv = calib_run(kvars, jnp.asarray(cal_batch["images"]), cal_rois)
    scales = collect_scales(jax.tree.map(float, jax.device_get(cv["calib"])))

    def int8_infer(v, im, r):
        with int8_serving(True, scales, deny=ENCODER_INT8_DENY):
            return student.apply(v, im, r, train=False)[0]

    miou_q = val_miou(student, kvars, ds_va, infer=jax.jit(int8_infer))
    rows[f"kd_mid{args.mid}_int8"] = miou_q
    print(f"student mid{args.mid} KD under int8 serving: val target-mIoU "
          f"{miou_q:.4f}  delta vs bf16 {miou_q - miou_k:+.4f}", flush=True)

    from bench_serving_matrix import record_result
    record_result("b0_fast_deployed", {
        "image": [IH, IW], "roi": list(ROI), "mask": list(MASK),
        "batch": BATCH, "rois_per_image": K, "steps": args.steps,
        "mid": args.mid, "fd": args.fd, "dec": list(student_dec),
        "miou": rows, "kd_delta_vs_teacher": round(delta, 4),
        "gate_half_point": gate,
    })


if __name__ == "__main__":
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    main()
