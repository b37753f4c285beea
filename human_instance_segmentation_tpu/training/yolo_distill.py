"""YOLO feature-distillation training CLI.

TPU-native rebuild of /root/reference/train_yolo_feature_distillation.py +
advanced/unet_yolo_feature_distillation.py: a B0 student UNet learns from

- a frozen teacher UNet's output logits (binary KD: sigmoid-KL at
  temperature T + MSE), and
- YOLOv9's intermediate stride-8 features (1024ch layer_34) via a
  projection head on the student's stride-8 encoder feature,

plus BCE + Dice against ground truth. The reference pulls YOLO features from
an ONNX Runtime session inside the training loop (a Python<->ORT device
boundary per batch, feature_extractor.py:143-146); here they arrive
precomputed through the data pipeline so the whole step stays one fused XLA
program. The encoder is frozen (reference freeze_encoder=True,
unet_yolo_feature_distillation.py:53-56) via an optax multi_transform mask —
no requires_grad mutation, no optimizer rebuilds.

Usage:
    python -m human_instance_segmentation_tpu.training.yolo_distill \
        --epochs 2 --steps-per-epoch 4 --synthetic --tiny [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict, Iterator, Optional

import numpy as np


def synthetic_yolo_batches(batch: int, image_hw, yolo_dim: int = 1024,
                           seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Synthetic {images, masks, yolo_features}; features at stride 8."""
    rng = np.random.default_rng(seed)
    ih, iw = image_hw
    fh, fw = ih // 8, iw // 8
    while True:
        masks = np.zeros((batch, ih, iw, 1), np.float32)
        for b in range(batch):
            x1, y1 = rng.integers(0, iw // 2), rng.integers(0, ih // 2)
            masks[b, y1:y1 + ih // 2, x1:x1 + iw // 2, 0] = 1.0
        yield {
            "images": rng.random((batch, ih, iw, 3), np.float32),
            "masks": masks,
            "yolo_features": rng.standard_normal((batch, fh, fw, yolo_dim)).astype(np.float32) * 0.1,
        }


def npz_feature_batches(feature_dir: str, batch: int,
                        seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Batches from PRECOMPUTED feature files — the honest path to real
    YOLOv9 activations: dump them offline with the reference's ORT
    extractor (feature_extractor.py:123, e.g.
    ``np.savez(f, images=..., masks=..., yolo_features=...)`` per batch,
    NHWC, features at stride 8) and train against them here. No ORT
    session ever enters the TPU training loop. Files are rebatched to
    ``batch`` and cycled forever (shuffled per pass)."""
    from pathlib import Path

    files = sorted(Path(feature_dir).glob("*.npz"))
    if not files:
        raise FileNotFoundError(f"no .npz feature files under {feature_dir}")
    rng = np.random.default_rng(seed)
    buf: Dict[str, list] = {"images": [], "masks": [], "yolo_features": []}
    while True:
        order = rng.permutation(len(files))
        for fi in order:
            with np.load(files[fi]) as z:
                for k in buf:
                    buf[k].extend(np.asarray(z[k], np.float32))
            while len(buf["images"]) >= batch:
                yield {k: np.stack(v[:batch]) for k, v in buf.items()}
                buf = {k: v[batch:] for k, v in buf.items()}


def run_yolo_feature_distillation(
    student_variant: str = "b0",
    teacher_variant: str = "b7",
    epochs: int = 2,
    steps_per_epoch: int = 10,
    batch: int = 4,
    image_hw=(640, 640),
    synthetic: bool = True,
    tiny: bool = False,
    learning_rate: float = 1e-3,
    temperature: float = 3.0,
    final_temperature: float = 1.0,
    feature_weight: float = 0.5,
    feature_loss_type: str = "mse",
    freeze_encoder: bool = True,
    teacher_checkpoint: Optional[str] = None,
    output_dir: Optional[str] = None,
    platform: Optional[str] = None,
    feature_dir: Optional[str] = None,
) -> Dict[str, float]:
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    import jax
    import jax.numpy as jnp
    import optax

    from ..losses.distillation import (DistillationConfig, scheduled_temperature,
                                       yolo_distillation_loss)
    from ..models.unet import PeopleSegmentationUNet
    from ..models.yolo_distill import YOLOFeatureDistillStudent
    from ..training.metrics import binary_miou
    from .checkpoint import save_checkpoint
    from .logging import TrainLogger

    if tiny:
        image_hw = (64, 64)
        student_variant = teacher_variant = "tiny"
        dec = (32, 24, 16, 16, 8)
        yolo_dim = 32
        hidden = 16
    else:
        dec = (256, 128, 64, 32, 16)
        yolo_dim = 1024
        hidden = 768
    ih, iw = image_hw

    student = YOLOFeatureDistillStudent(
        encoder_variant=student_variant, decoder_channels=dec,
        projection_hidden_dim=hidden, yolo_feature_dim=yolo_dim)
    teacher = PeopleSegmentationUNet(encoder_variant=teacher_variant, decoder_channels=dec)

    rng = jax.random.PRNGKey(0)
    init_img = jnp.zeros((1, ih, iw, 3), jnp.float32)
    s_vars = jax.jit(lambda r: student.init(r, init_img, train=False, return_features=True))(rng)
    t_vars = jax.jit(lambda r: teacher.init(r, init_img, train=False))(jax.random.PRNGKey(42))
    if teacher_checkpoint:
        from .checkpoint import restore_checkpoint

        t_state, _ = restore_checkpoint(teacher_checkpoint, None)
        t_vars = {"params": t_state["params"], "batch_stats": t_state.get("batch_stats", {})}

    # Freeze the encoder: decoder/head/projector train (reference
    # get_decoder_parameters, unet_yolo_feature_distillation.py:119-125).
    def label(path, _):
        return "frozen" if (freeze_encoder and path[0].key == "encoder") else "train"

    labels = jax.tree_util.tree_map_with_path(label, s_vars["params"])
    tx = optax.multi_transform(
        {"train": optax.chain(optax.clip_by_global_norm(1.0),
                              optax.adamw(learning_rate, weight_decay=1e-4)),
         "frozen": optax.set_to_zero()},
        labels)

    params = s_vars["params"]
    batch_stats = s_vars.get("batch_stats", {})
    opt_state = tx.init(params)

    kd_cfg = DistillationConfig(initial_temperature=temperature,
                                final_temperature=final_temperature,
                                schedule_type="cosine")

    def make_step(T: float):
        @jax.jit
        def step(params, batch_stats, opt_state, b):
            t_logits = teacher.apply(t_vars, b["images"], train=False)

            def loss_fn(p):
                (s_logits, s_proj), updates = student.apply(
                    {"params": p, "batch_stats": batch_stats}, b["images"],
                    train=True, return_features=True, mutable=["batch_stats"])
                loss, mdict = yolo_distillation_loss(
                    s_logits, t_logits, b["masks"], s_proj, b["yolo_features"],
                    temperature=T, feature_weight=feature_weight,
                    feature_loss_type=feature_loss_type)
                return loss, (mdict, updates["batch_stats"])

            (loss, (mdict, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_stats, new_opt, mdict

        return step

    @jax.jit
    def eval_step(params, batch_stats, b):
        s = student.apply({"params": params, "batch_stats": batch_stats},
                          b["images"], train=False)
        return binary_miou(s, b["masks"])

    out_dir = output_dir or "experiments/yolo_feature_distillation"
    logger = TrainLogger(f"{out_dir}/logs", "yolo_feature_distillation")

    if feature_dir:
        batches = npz_feature_batches(feature_dir, batch)
        first = next(batches)
        assert first["images"].shape[1:3] == (ih, iw), (
            f"feature files are {first['images'].shape[1:3]}, model expects "
            f"{(ih, iw)} — pass matching --image sizes / --tiny")
        assert first["yolo_features"].shape[-1] == yolo_dim, (
            first["yolo_features"].shape, yolo_dim)
        import itertools

        batches = itertools.chain([first], batches)
        vgen = npz_feature_batches(feature_dir, batch, seed=99)
        val_batches = [next(vgen) for _ in range(2)]
    else:
        batches = synthetic_yolo_batches(batch, (ih, iw), yolo_dim=yolo_dim)
        vgen = synthetic_yolo_batches(batch, (ih, iw), yolo_dim=yolo_dim, seed=99)
        val_batches = [next(vgen) for _ in range(2)]

    best = 0.0
    metrics: Dict[str, float] = {}
    for epoch in range(epochs):
        T = scheduled_temperature(kd_cfg, epoch, epochs)
        step = make_step(T)
        t0 = time.perf_counter()
        for _ in range(steps_per_epoch):
            params, batch_stats, opt_state, m = step(
                params, batch_stats, opt_state, next(batches))
        metrics = {k: float(v) for k, v in jax.device_get(m).items()}
        metrics["temperature"] = T
        logger.metrics(epoch, metrics)

        miou = float(np.mean([float(jax.device_get(eval_step(params, batch_stats, vb)))
                              for vb in val_batches]))
        logger.text(f"epoch {epoch}: loss {metrics['total_loss']:.4f} "
                    f"feat {metrics['feature_loss']:.4f} T {T:.2f} "
                    f"val mIoU {miou:.4f} "
                    f"({steps_per_epoch * batch / (time.perf_counter() - t0):.1f} img/s)")
        if miou > best:
            best = miou
            save_checkpoint(f"{out_dir}/checkpoints",
                            {"params": jax.device_get(params),
                             "batch_stats": jax.device_get(batch_stats)},
                            epoch + 1, metadata={"student_miou": best})

    metrics["best_student_miou"] = best
    logger.close()
    return metrics


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--student", default="b0")
    p.add_argument("--teacher", default="b7")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--steps-per-epoch", type=int, default=10)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--feature-weight", type=float, default=0.5)
    p.add_argument("--feature-loss", default="mse", choices=["mse", "cosine"])
    p.add_argument("--teacher-checkpoint", default=None)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--feature-dir", default=None,
                   help=".npz files with precomputed real YOLO features "
                        "(images/masks/yolo_features per file)")
    args = p.parse_args()
    m = run_yolo_feature_distillation(
        student_variant=args.student, teacher_variant=args.teacher,
        epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
        batch=args.batch, synthetic=args.synthetic, tiny=args.tiny,
        feature_weight=args.feature_weight, feature_loss_type=args.feature_loss,
        teacher_checkpoint=args.teacher_checkpoint, output_dir=args.output_dir,
        platform=args.platform, feature_dir=args.feature_dir)
    print(json.dumps({k: v for k, v in m.items() if isinstance(v, float)}, indent=2))


if __name__ == "__main__":
    main()
