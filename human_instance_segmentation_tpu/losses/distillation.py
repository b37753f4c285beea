"""Knowledge-distillation losses: hierarchical KD and binary UNet KD with
temperature progression + adaptive weight elimination.

Re-designs:
- DistillationLoss (hierarchical KD):
  /root/reference/src/human_edge_detection/advanced/knowledge_distillation.py:10-134 —
  alpha * [T^2 * KL(student/T || teacher/T) + 0.3 KL(bg_fg aux) +
  0.3 KL(tnt aux)] + (1 - alpha) * base loss.
- UNetDistillationLoss (binary KD, the temperature-progression path):
  advanced/unet_decoder_distillation.py:316-663 — binary sigmoid-KL
  (eps-clamped, clamp [0, 5]) + MSE(logits) + task loss
  (0.7 BCE(pos_weight=sqrt(bg/fg)) + 0.3 Dice); cosine/linear/exponential
  temperature schedule; adaptive alpha decay exp(-20 * delta) with permanent
  elimination once the student beats the teacher by 3%.

TPU-first: the reference mutates loss-object attributes between epochs; here
schedule/adaptive state is an explicit `DistillationState` pytree stored in
the train state and checkpointed (the reference persists the same fields as
`loss_fn_state`, train_distillation_staged.py:1352-1446).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class DistillationState:
    temperature: jnp.ndarray
    alpha: jnp.ndarray
    task_weight: jnp.ndarray
    performance_ratio: jnp.ndarray
    eliminated: jnp.ndarray  # bool

    @classmethod
    def create(cls, temperature: float = 3.0, alpha: float = 0.5,
               task_weight: float = 0.3) -> "DistillationState":
        return cls(
            temperature=jnp.asarray(temperature, jnp.float32),
            alpha=jnp.asarray(alpha, jnp.float32),
            task_weight=jnp.asarray(task_weight, jnp.float32),
            performance_ratio=jnp.asarray(1.0, jnp.float32),
            eliminated=jnp.asarray(False),
        )


@dataclass(frozen=True)
class DistillationConfig:
    initial_temperature: float = 10.0
    final_temperature: float = 1.0
    schedule_type: str = "cosine"  # linear | cosine | exponential
    initial_alpha: float = 0.5
    initial_task_weight: float = 0.3
    fg_ratio: float = 0.162
    use_dice_loss: bool = True
    adaptive_distillation: bool = True
    amplification_factor: float = 20.0
    zero_distillation_threshold: float = 0.03
    min_alpha: float = 0.0

    @property
    def pos_weight(self) -> float:
        return math.sqrt((1.0 - self.fg_ratio) / self.fg_ratio)


def scheduled_temperature(cfg: DistillationConfig, epoch: int, total_epochs: int) -> float:
    """Temperature schedule (unet_decoder_distillation.py:366-408); host-side
    pure function of the epoch index."""
    if total_epochs <= 1:
        return cfg.final_temperature
    progress = epoch / (total_epochs - 1)
    t0, t1 = cfg.initial_temperature, cfg.final_temperature
    if cfg.schedule_type == "linear":
        return t0 + (t1 - t0) * progress
    if cfg.schedule_type == "cosine":
        return t1 + (t0 - t1) * 0.5 * (1.0 + math.cos(math.pi * progress))
    if cfg.schedule_type == "exponential":
        return t0 * math.exp(math.log(t1 / t0) * progress)
    return t0


def update_adaptive_weights(
    state: DistillationState,
    cfg: DistillationConfig,
    student_iou: jnp.ndarray,
    teacher_iou: jnp.ndarray,
) -> DistillationState:
    """Adaptive alpha / task-weight update with permanent elimination
    (unet_decoder_distillation.py:414-472), as a pure state transition."""
    if not cfg.adaptive_distillation:
        return state

    ratio = student_iou / (teacher_iou + 1e-6)
    beats = ratio > (1.0 + cfg.zero_distillation_threshold)
    eliminated = jnp.logical_or(state.eliminated, beats)

    amplified = (ratio - 1.0) * cfg.amplification_factor
    decayed_alpha = jnp.maximum(cfg.min_alpha, cfg.initial_alpha * jnp.exp(-amplified))
    tw_target = 1.0 - jnp.exp(-amplified * 2.0)
    raised_tw = jnp.minimum(
        1.0, cfg.initial_task_weight + (1.0 - cfg.initial_task_weight) * tw_target)

    better = ratio > 1.0
    alpha = jnp.where(better, decayed_alpha, cfg.initial_alpha)
    tw = jnp.where(better, raised_tw, cfg.initial_task_weight)
    alpha = jnp.where(eliminated, 0.0, alpha)
    tw = jnp.where(eliminated, 1.0, tw)
    return state.replace(alpha=alpha, task_weight=tw,
                         performance_ratio=ratio, eliminated=eliminated)


def binary_dice_loss(logits: jnp.ndarray, targets: jnp.ndarray, smooth: float = 1e-5) -> jnp.ndarray:
    """Per-sample binary dice on sigmoid probabilities
    (unet_decoder_distillation.py:474-508)."""
    p = jax.nn.sigmoid(logits)
    n = logits.shape[0]
    pf = p.reshape(n, -1)
    tf = targets.reshape(n, -1).astype(p.dtype)
    inter = jnp.sum(pf * tf, axis=1)
    dice = (2.0 * inter + smooth) / (jnp.sum(pf, axis=1) + jnp.sum(tf, axis=1) + smooth)
    return 1.0 - jnp.mean(dice)


def unet_distillation_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    target_masks: Optional[jnp.ndarray],
    state: DistillationState,
    cfg: DistillationConfig = DistillationConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Binary UNet KD loss (unet_decoder_distillation.py:510-663).

    All branches are computed and blended with `where` — on TPU the
    "skip distillation when eliminated" optimisation is a multiply by zero
    that XLA handles; control flow would force recompilation.
    """
    T = state.temperature
    eps = 1e-5
    sc = jnp.clip(student_logits, -10.0, 10.0)
    tc = jnp.clip(teacher_logits, -10.0, 10.0)
    s = jnp.clip(jax.nn.sigmoid(sc / T), eps, 1.0 - eps)
    t = jnp.clip(jax.nn.sigmoid(tc / T), eps, 1.0 - eps)
    term1 = t * (jnp.log(t + eps) - jnp.log(s + eps))
    term2 = (1.0 - t) * (jnp.log(1.0 - t + eps) - jnp.log(1.0 - s + eps))
    kl = jnp.clip(jnp.mean(term1 + term2), 0.0, 5.0)
    mse = jnp.mean((student_logits - teacher_logits) ** 2)

    disabled = jnp.logical_or(state.eliminated,
                              jnp.logical_or(state.alpha == 0.0, state.task_weight >= 0.99))

    effective_alpha = jnp.where(
        state.performance_ratio > 1.0,
        state.alpha * jnp.maximum(0.1, 2.0 - state.performance_ratio),
        state.alpha,
    ) if cfg.adaptive_distillation else state.alpha
    kl_weight = jnp.minimum(effective_alpha, 0.1)
    distill = jnp.where(disabled, 0.0, kl_weight * kl + (1.0 - kl_weight) * mse)

    metrics = {"kl_loss": jnp.where(disabled, 0.0, kl),
               "mse_loss": jnp.where(disabled, 0.0, mse),
               "temperature": T, "alpha": state.alpha,
               "task_weight": state.task_weight}

    if target_masks is not None:
        tm = target_masks.astype(student_logits.dtype)
        pw = cfg.pos_weight
        logp = jax.nn.log_sigmoid(student_logits)
        lognp = jax.nn.log_sigmoid(-student_logits)
        bce = -(pw * tm * logp + (1.0 - tm) * lognp)
        bce = jnp.mean(bce)
        metrics["bce_loss"] = bce
        if cfg.use_dice_loss:
            dl = binary_dice_loss(student_logits, tm)
            metrics["dice_loss"] = dl
            task = 0.7 * bce + 0.3 * dl
        else:
            metrics["dice_loss"] = jnp.asarray(0.0)
            task = bce
        total = state.task_weight * task + (1.0 - state.task_weight) * distill
    else:
        total = distill

    metrics["total_loss"] = total
    return total, metrics


def feature_matching_loss(
    student_features: Dict[str, jnp.ndarray],
    teacher_features: Dict[str, jnp.ndarray],
    normalize: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Intermediate-feature matching KD (the YOLO-feature distillation
    experiment, advanced/unet_yolo_feature_distillation.py): per-layer MSE
    between (optionally channel-normalised) student and teacher feature
    maps; spatial sizes are matched by bilinear resize."""
    from ..ops.sampling import resize_bilinear

    total = 0.0
    metrics = {}
    n = 0
    for key, t in teacher_features.items():
        if key not in student_features:
            continue
        s = student_features[key]
        t = jax.lax.stop_gradient(t)
        if s.shape[1:3] != t.shape[1:3]:
            s = resize_bilinear(s, t.shape[1], t.shape[2])
        if s.shape[-1] != t.shape[-1]:
            continue  # caller should project channels first
        if normalize:
            s = s / (jnp.linalg.norm(s, axis=-1, keepdims=True) + 1e-6)
            t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-6)
        l = jnp.mean((s - t) ** 2)
        metrics[f"fm_{key}"] = l
        total = total + l
        n += 1
    total = total / max(n, 1)
    metrics["feature_matching_loss"] = total
    return total, metrics


def hierarchical_distillation_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    student_aux: Dict[str, jnp.ndarray],
    teacher_aux: Dict[str, jnp.ndarray],
    base_loss: jnp.ndarray,
    temperature: float = 4.0,
    alpha: float = 0.7,
    aux_weight: float = 0.3,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Hierarchical (3-class) KD (knowledge_distillation.py:10-134):
    T^2-scaled softmax KL on final logits + KL on the bg/fg and
    target/non-target auxiliary logits, blended with the base task loss."""
    T = temperature

    def kd_kl(s_logits, t_logits):
        s_logp = jax.nn.log_softmax(s_logits / T, axis=-1)
        t_p = jax.nn.softmax(t_logits / T, axis=-1)
        return jnp.mean(jnp.sum(t_p * (jnp.log(t_p + 1e-10) - s_logp), axis=-1))

    kd = kd_kl(student_logits, teacher_logits) * (T * T)
    aux_kd = 0.0
    metrics = {"kd_final": kd}
    for key in ("bg_fg_logits", "target_nontarget_logits"):
        if key in student_aux and key in teacher_aux:
            k = kd_kl(student_aux[key], jax.lax.stop_gradient(teacher_aux[key]))
            aux_kd = aux_kd + aux_weight * k
            metrics[f"kd_{key}"] = k
    total = alpha * (kd + aux_kd) + (1.0 - alpha) * base_loss
    metrics["total_loss"] = total
    return total, metrics


def yolo_distillation_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    target_masks: jnp.ndarray,
    student_features: Optional[jnp.ndarray] = None,
    yolo_features: Optional[jnp.ndarray] = None,
    temperature: float = 3.0,
    kl_weight: float = 1.0,
    mse_weight: float = 0.5,
    bce_weight: float = 0.5,
    dice_weight: float = 1.0,
    feature_weight: float = 0.5,
    feature_loss_type: str = "mse",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined YOLO-feature distillation loss
    (advanced/unet_yolo_feature_distillation.py:300-533):
    binary sigmoid-KL at temperature T (scaled by T, clamped), MSE vs the
    teacher logits, BCE + Dice vs ground truth, and an intermediate-feature
    alignment term (MSE clamped to 10, or 1 - cosine) between the student's
    projected stride-8 encoder feature and the YOLO feature target.

    All inputs NHWC; ``yolo_features`` is the (B, h8, w8, 1024) target that
    the reference fetched from the YOLOv9 ONNX session — here it arrives
    precomputed from the data pipeline (TPU-native: no in-loop ORT hop).
    """
    eps = 1e-7
    T = temperature
    t_logits = jax.lax.stop_gradient(teacher_logits)
    p = jnp.clip(jax.nn.sigmoid(t_logits / T), eps, 1.0 - eps)
    q = jnp.clip(jax.nn.sigmoid(student_logits / T), eps, 1.0 - eps)
    kl_pos = jnp.clip(p * jnp.log(p / q), -10.0, 10.0)
    kl_neg = jnp.clip((1.0 - p) * jnp.log((1.0 - p) / (1.0 - q)), -10.0, 10.0)
    kl = jnp.clip(jnp.mean(kl_pos + kl_neg) * T, 0.0, 100.0)

    mse = jnp.mean((student_logits - t_logits) ** 2)

    tm = target_masks.astype(student_logits.dtype)
    if tm.ndim == student_logits.ndim - 1:
        tm = tm[..., None]
    bce = jnp.mean(
        jnp.maximum(student_logits, 0.0) - student_logits * tm
        + jnp.log1p(jnp.exp(-jnp.abs(student_logits))))
    dice = jnp.clip(binary_dice_loss(student_logits, tm), 0.0, 2.0)

    feat = jnp.asarray(0.0, student_logits.dtype)
    if student_features is not None and yolo_features is not None:
        yf = jax.lax.stop_gradient(yolo_features)
        if feature_loss_type == "mse":
            feat = jnp.clip(jnp.mean((student_features - yf) ** 2), 0.0, 10.0)
        elif feature_loss_type == "cosine":
            sf = student_features.reshape(student_features.shape[0], -1, student_features.shape[-1])
            tf = yf.reshape(yf.shape[0], -1, yf.shape[-1])
            sn = sf / (jnp.linalg.norm(sf, axis=-1, keepdims=True) + 1e-6)
            tn = tf / (jnp.linalg.norm(tf, axis=-1, keepdims=True) + 1e-6)
            feat = 1.0 - jnp.mean(jnp.sum(sn * tn, axis=-1))
        else:
            raise ValueError(f"unknown feature loss type: {feature_loss_type}")

    total = (kl_weight * kl + mse_weight * mse + bce_weight * bce
             + dice_weight * dice + feature_weight * feat)
    return total, {"kl_loss": kl, "mse_loss": mse, "bce_loss": bce,
                   "dice_loss": dice, "feature_loss": feat, "total_loss": total}
