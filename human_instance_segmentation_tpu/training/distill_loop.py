"""Temperature-progression distillation training CLI.

TPU-native rebuild of /root/reference/train_distillation_staged.py (1739
LoC): B0/B1 student UNets trained from a frozen B7/B3 teacher on full-image
binary person masks, with

- cosine/linear/exponential temperature schedule (10 -> 1)
- adaptive alpha with permanent elimination once the student beats the
  teacher by 3% (validation mIoU)
- teacher-mIoU caching (teacher is frozen; evaluated once)
- progressive encoder unfreezing with discriminative LR (optax masks —
  no optimizer rebuilds)
- checkpoints carrying the full distillation state for exact resume
  (the reference persists loss_fn_state/teacher_miou_cache/unfreeze state,
  train_distillation_staged.py:1352-1446; here it's all in TrainState).

Usage:
    python -m human_instance_segmentation_tpu.training.distill_loop \
        --config rgb_hierarchical_unet_v2_distillation_b0_from_b7_temp_prog \
        --epochs 2 --steps-per-epoch 4 --synthetic --tiny [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict, Iterator, Optional

import numpy as np


def synthetic_binary_batches(batch: int, image_hw, seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.default_rng(seed)
    ih, iw = image_hw
    while True:
        masks = np.zeros((batch, ih, iw, 1), np.float32)
        for b in range(batch):
            x1, y1 = rng.integers(0, iw // 2), rng.integers(0, ih // 2)
            masks[b, y1:y1 + ih // 2, x1:x1 + iw // 2, 0] = 1.0
        yield {"images": rng.random((batch, ih, iw, 3), np.float32), "masks": masks}


def run_distillation(
    config_name: str = "rgb_hierarchical_unet_v2_distillation_b0_from_b7_temp_prog",
    epochs: Optional[int] = None,
    steps_per_epoch: int = 0,
    synthetic: bool = False,
    tiny: bool = False,
    devices: Optional[int] = None,
    output_dir: Optional[str] = None,
    resume: bool = False,
    platform: Optional[str] = None,
    config_modifications: Optional[Dict] = None,
) -> Dict[str, float]:
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    import jax
    import jax.numpy as jnp
    import optax

    from ..config import ConfigManager, _as_hw
    from ..losses.distillation import DistillationConfig, DistillationState
    from ..models.unet import PeopleSegmentationUNet
    from ..parallel.mesh import create_mesh, replicate, shard_batch
    from ..training.metrics import binary_miou
    from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
    from .distill import epoch_update, make_distill_train_step
    from .logging import TrainLogger
    from .optim import build_schedule, distillation_optimizer
    from .state import TrainState

    cfg = ConfigManager.get_config(config_name)
    if config_modifications:
        # the reference's --config_modifications JSON deep-merge
        # (train_advanced.py:936-938, config_manager.py:5033-5054)
        from ..config import _deep_merge

        cfg = _deep_merge(cfg, config_modifications)
    dc = cfg.distillation
    kd_cfg = DistillationConfig(
        initial_temperature=dc.initial_temperature if dc.use_temperature_scheduling else dc.temperature,
        final_temperature=dc.final_temperature,
        schedule_type=dc.temperature_schedule,
        initial_alpha=dc.alpha,
        initial_task_weight=dc.task_weight,
        adaptive_distillation=dc.adaptive_distillation,
        amplification_factor=dc.amplification_factor,
        min_alpha=dc.min_alpha,
        zero_distillation_threshold=dc.zero_distillation_threshold,
    )

    ih, iw = (64, 64) if tiny else _as_hw(cfg.model.image_size)
    batch = max(devices or 1, 2) if tiny else cfg.training.batch_size
    n_epochs = epochs if epochs is not None else cfg.training.num_epochs
    spe = steps_per_epoch or (10 if synthetic else 1000)

    s_variant = "tiny" if tiny else dc.student_encoder
    t_variant = "tiny" if tiny else dc.teacher_encoder
    dec = (32, 24, 16, 16, 8) if tiny else (256, 128, 64, 32, 16)
    student = PeopleSegmentationUNet(encoder_variant=s_variant, decoder_channels=dec)
    teacher = PeopleSegmentationUNet(encoder_variant=t_variant, decoder_channels=dec)

    rng = jax.random.PRNGKey(0)
    init_img = jnp.zeros((1, ih, iw, 3), jnp.float32)
    s_vars = jax.jit(lambda r: student.init(r, init_img, train=False))(rng)
    t_vars = jax.jit(lambda r: teacher.init(r, init_img, train=False))(
        jax.random.PRNGKey(42))
    if dc.teacher_checkpoint:
        from .checkpoint import restore_checkpoint as rc

        t_state, _ = rc(dc.teacher_checkpoint, None)
        t_vars = {"params": t_state["params"], "batch_stats": t_state.get("batch_stats", {})}

    out_dir = output_dir or f"{cfg.output_dir}/{cfg.name}"
    logger = TrainLogger(f"{out_dir}/logs", cfg.name)
    logger.config(cfg.to_dict())

    schedule = build_schedule(cfg.training.learning_rate, n_epochs, spe,
                              cfg.training.scheduler, cfg.training.min_lr)

    def optimizer_for(num_unfrozen: int):
        if dc.progressive_unfreeze:
            return distillation_optimizer(
                s_vars["params"], schedule, num_unfrozen,
                encoder_lr_scale=dc.unfreeze_encoder_lr_scale,
                weight_decay=cfg.training.weight_decay,
                gradient_clip=cfg.training.gradient_clip)
        return optax.chain(optax.clip_by_global_norm(cfg.training.gradient_clip),
                           optax.adamw(schedule, weight_decay=cfg.training.weight_decay))

    num_unfrozen = 0
    tx = optimizer_for(num_unfrozen)
    state = TrainState.create(
        s_vars, tx, jax.random.PRNGKey(1),
        distill_state=DistillationState.create(
            temperature=kd_cfg.initial_temperature, alpha=kd_cfg.initial_alpha,
            task_weight=kd_cfg.initial_task_weight))

    mesh = create_mesh(devices) if devices and devices > 1 else None
    if mesh is not None:
        state = replicate(mesh, state)
        t_vars = replicate(mesh, t_vars)

    ckpt_dir = f"{out_dir}/checkpoints"
    start_epoch = 0
    if resume:
        prev = latest_step(ckpt_dir)
        if prev is not None:
            state, prev_step = restore_checkpoint(ckpt_dir, jax.device_get(state))
            start_epoch = prev_step
            # Replay the unfreeze schedule up to the resume point: entries at
            # epochs < start_epoch only fire on exact match in the loop, so
            # without this a resumed run silently re-freezes encoder stages.
            past = [v for e, v in dc.unfreeze_schedule.items() if e <= start_epoch]
            if dc.progressive_unfreeze and past:
                num_unfrozen = max(past)
                tx = optimizer_for(num_unfrozen)
                opt0 = tx.init(jax.device_get(state.params))
                state = state.replace(
                    opt_state=opt0 if mesh is None else replicate(mesh, opt0))
                logger.text(f"resume: replayed unfreeze -> {num_unfrozen} stages")
            if mesh is not None:
                state = replicate(mesh, state)
            logger.text(f"resumed from epoch {prev_step}")

    train_step = make_distill_train_step(
        student, teacher, t_vars, tx, kd_cfg, mesh=mesh,
        compute_dtype=cfg.training.compute_dtype)

    @jax.jit
    def eval_miou(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        s = student.apply(variables, batch["images"], train=False)
        t = teacher.apply(t_vars, batch["images"], train=False)
        return binary_miou(s, batch["masks"]), binary_miou(t, batch["masks"])

    if synthetic:
        batches = synthetic_binary_batches(batch, (ih, iw))
        # held-out batches from a distinct seed stand in for the val set
        _vgen = synthetic_binary_batches(batch, (ih, iw), seed=1234)
        val_batches = [next(_vgen) for _ in range(2)]
    else:
        from ..data import COCOPersonBinaryDataset, batch_iterator

        ds = COCOPersonBinaryDataset(cfg.data.train_annotation, cfg.data.train_img_dir,
                                     image_size=(ih, iw))
        spe = max(len(ds) // batch, 1)

        def forever():
            e = 0
            while True:
                yield from batch_iterator(ds, batch, shuffle=True, seed=e)
                e += 1

        batches = forever()
        val_ds = COCOPersonBinaryDataset(cfg.data.val_annotation, cfg.data.val_img_dir,
                                         image_size=(ih, iw))
        val_batches = list(batch_iterator(val_ds, batch, shuffle=False, drop_last=True))
        if not val_batches:  # val set smaller than one batch
            val_batches = [next(batches)]

    teacher_miou_cache: Optional[float] = None
    best_student = 0.0
    metrics: Dict[str, float] = {}
    for epoch in range(start_epoch, n_epochs):
        # schedule transitions (temperature; progressive unfreezing)
        state = epoch_update(state, kd_cfg, epoch, n_epochs)
        if dc.progressive_unfreeze and epoch in dc.unfreeze_schedule:
            num_unfrozen = dc.unfreeze_schedule[epoch]
            tx = optimizer_for(num_unfrozen)
            state = state.replace(opt_state=tx.init(jax.device_get(state.params))
                                  if mesh is None else
                                  replicate(mesh, tx.init(jax.device_get(state.params))))
            train_step = make_distill_train_step(
                student, teacher, t_vars, tx, kd_cfg, mesh=mesh,
                compute_dtype=cfg.training.compute_dtype)
            logger.text(f"epoch {epoch}: unfroze last {num_unfrozen} encoder stages")

        t0 = time.perf_counter()
        for _ in range(spe):
            host_batch = next(batches)
            db = shard_batch(mesh, host_batch) if mesh is not None else host_batch
            state, m = train_step(state, db)
        metrics = {k: float(v) for k, v in jax.device_get(m).items()}
        logger.metrics(epoch, metrics)

        # validation: sweep the held-out set; adaptive elimination is
        # permanent, so it must be driven by val mIoU averaged over the whole
        # sweep (reference: full val-set mIoU,
        # train_distillation_staged.py:369-583), never a single train batch.
        s_sum = t_sum = 0.0
        for vb in val_batches:
            s_i, t_i = jax.device_get(eval_miou(state.params, state.batch_stats, vb))
            s_sum += float(s_i)
            t_sum += float(t_i)
        s_iou = s_sum / len(val_batches)
        if teacher_miou_cache is None:
            # frozen teacher: evaluate once over the same sweep and cache
            teacher_miou_cache = t_sum / len(val_batches)
        state = epoch_update(state, kd_cfg, epoch, n_epochs,
                             student_iou=float(s_iou), teacher_iou=teacher_miou_cache)
        logger.text(
            f"epoch {epoch}: loss {metrics.get('total_loss', float('nan')):.4f} "
            f"T {metrics.get('temperature', 0):.2f} alpha {float(state.distill_state.alpha):.3f} "
            f"student mIoU {float(s_iou):.4f} teacher {teacher_miou_cache:.4f} "
            f"({spe * batch / (time.perf_counter() - t0):.1f} img/s)")

        if float(s_iou) > best_student:
            best_student = float(s_iou)
            save_checkpoint(ckpt_dir, jax.device_get(state), epoch + 1,
                            metadata={"student_miou": best_student,
                                      "teacher_miou": teacher_miou_cache,
                                      "num_unfrozen": num_unfrozen})
            logger.text(f"new best student mIoU {best_student:.4f} (checkpointed)")

    metrics["best_student_miou"] = best_student
    metrics["teacher_miou"] = teacher_miou_cache or 0.0
    metrics["eliminated"] = float(bool(jax.device_get(state.distill_state.eliminated)))
    logger.close()
    return metrics


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="rgb_hierarchical_unet_v2_distillation_b0_from_b7_temp_prog")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--platform", default=None)
    p.add_argument("--config_modifications", default=None,
                   help="JSON deep-merged into the named config")
    args = p.parse_args()
    mods = json.loads(args.config_modifications) if args.config_modifications else None
    m = run_distillation(args.config, args.epochs, args.steps_per_epoch,
                         args.synthetic, args.tiny, args.devices,
                         args.output_dir, args.resume, args.platform,
                         config_modifications=mods)
    print(json.dumps({k: v for k, v in m.items() if isinstance(v, float)}, indent=2))


if __name__ == "__main__":
    main()
