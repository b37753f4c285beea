"""Optimizers, LR schedules, staged freezing.

Redesigns the reference's optimizer plumbing:
- AdamW + cosine / warm-restart schedules (train_advanced.py:1111-1143,
  config_manager.py:91-102) as optax schedules.
- Name-based staged freezing (staged_training.py:10-242) and progressive
  encoder unfreezing with discriminative LRs
  (train_distillation_staged.py:1512+) — rebuilt as optax.multi_transform
  masks over parameter paths. No optimizer rebuilds, no requires_grad
  flipping: the mask schedule is data, and switching stages swaps the label
  pytree only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import optax


def build_schedule(
    learning_rate: float,
    num_epochs: int,
    steps_per_epoch: int,
    scheduler: str = "cosine",
    min_lr: float = 1e-6,
    warmup_epochs: int = 0,
    t0_epochs: int = 10,
    t_mult: int = 2,
) -> optax.Schedule:
    """cosine / cosine_warm_restarts / step / exponential / constant."""
    total = max(num_epochs * steps_per_epoch, 1)
    warmup = warmup_epochs * steps_per_epoch
    if scheduler == "cosine":
        if warmup > 0:
            return optax.warmup_cosine_decay_schedule(
                init_value=min_lr, peak_value=learning_rate,
                warmup_steps=warmup, decay_steps=total, end_value=min_lr)
        return optax.cosine_decay_schedule(learning_rate, total, alpha=min_lr / learning_rate)
    if scheduler == "cosine_warm_restarts":
        schedules = []
        boundaries = []
        t = t0_epochs * steps_per_epoch
        elapsed = 0
        while elapsed < total:
            schedules.append(optax.cosine_decay_schedule(
                learning_rate, t, alpha=min_lr / learning_rate))
            elapsed += t
            boundaries.append(elapsed)
            t *= t_mult
        return optax.join_schedules(schedules, boundaries[:-1])
    if scheduler == "step":
        return optax.exponential_decay(
            learning_rate, decay_rate=0.1, transition_steps=30 * steps_per_epoch,
            staircase=True, end_value=min_lr)
    if scheduler == "exponential":
        return optax.exponential_decay(
            learning_rate, decay_rate=0.95, transition_steps=steps_per_epoch,
            end_value=min_lr)
    return optax.constant_schedule(learning_rate)


def build_optimizer(
    schedule: optax.Schedule,
    optimizer: str = "adamw",
    weight_decay: float = 1e-4,
    gradient_clip: float = 5.0,
) -> optax.GradientTransformation:
    if optimizer == "adamw":
        tx = optax.adamw(schedule, weight_decay=weight_decay)
    elif optimizer == "adam":
        tx = optax.adam(schedule)
    elif optimizer == "sgd":
        tx = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {optimizer}")
    if gradient_clip and gradient_clip > 0:
        return optax.chain(optax.clip_by_global_norm(gradient_clip), tx)
    return tx


# ---------------------------------------------------------------------------
# Staged freezing via parameter-path labels
# ---------------------------------------------------------------------------


def label_params(params: Any, rules: Sequence[Tuple[str, str]], default: str = "train") -> Any:
    """Label every param leaf by the first matching path-substring rule.

    rules: [(substring, label), ...] matched against the '/'-joined path.
    Mirrors the reference's name-based module matching
    (staged_training.py:72-120: 'pretrained_unet', 'rgb_feature_extractor',
    'segmentation_head').
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_for(path) -> str:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        for sub, lab in rules:
            if sub in p:
                return lab
        return default

    labels = {tuple(path): label_for(path) for path, _ in flat}
    return jax.tree_util.tree_map_with_path(lambda path, _: labels[tuple(path)], params)


def staged_optimizer(
    base_tx_for: Dict[str, optax.GradientTransformation],
    params: Any,
    rules: Sequence[Tuple[str, str]],
    default: str = "train",
) -> optax.GradientTransformation:
    """multi_transform over path labels; use label 'frozen' ->
    optax.set_to_zero() to freeze a module group."""
    labels = label_params(params, rules, default)
    return optax.multi_transform(base_tx_for, labels)


@dataclass(frozen=True)
class StageConfig:
    """One freezing stage (staged_training.py:10-40)."""

    name: str
    freeze_pretrained: bool = True
    freeze_rgb_extractor: bool = False
    freeze_head: bool = False
    lr_scale: float = 1.0


def stage_rules(stage: StageConfig) -> Sequence[Tuple[str, str]]:
    rules = []
    rules.append(("pretrained_unet", "frozen" if stage.freeze_pretrained else "train"))
    rules.append(("unet_wrapper", "frozen" if stage.freeze_pretrained else "train"))
    rules.append(("rgb_extractor", "frozen" if stage.freeze_rgb_extractor else "train"))
    rules.append(("head", "frozen" if stage.freeze_head else "train"))
    return rules


def progressive_unfreeze_rules(num_unfrozen_blocks: int, total_stages: int = 7,
                               encoder_path: str = "encoder") -> Sequence[Tuple[str, str]]:
    """Unfreeze the last-k encoder stages (the distillation path's
    progressive unfreezing, train_distillation_staged.py:1512+). Encoder
    stage params are named stage{i}_block{j}; deeper stages unfreeze first.
    """
    rules: list = []
    first_trainable = total_stages - num_unfrozen_blocks
    for s in range(total_stages):
        label = "encoder_train" if s >= first_trainable else "frozen"
        rules.append((f"{encoder_path}/stage{s}_", label))
    # stem follows the earliest block's state
    rules.append((f"{encoder_path}/stem", "encoder_train" if num_unfrozen_blocks >= total_stages else "frozen"))
    return rules


def distillation_optimizer(
    params: Any,
    schedule: optax.Schedule,
    num_unfrozen_blocks: int,
    encoder_lr_scale: float = 0.3,
    weight_decay: float = 1e-4,
    gradient_clip: float = 5.0,
) -> optax.GradientTransformation:
    """Decoder always trains at full LR; encoder blocks train at
    ``encoder_lr_scale`` * LR once unfrozen (discriminative LR rebuild,
    train_distillation_staged.py:1352-1446 — here just a relabel)."""
    tx_full = optax.adamw(schedule, weight_decay=weight_decay)
    tx_enc = optax.adamw(
        lambda step: schedule(step) * encoder_lr_scale, weight_decay=weight_decay)
    mapping = {
        "train": tx_full,
        "encoder_train": tx_enc,
        "frozen": optax.set_to_zero(),
    }
    rules = progressive_unfreeze_rules(num_unfrozen_blocks)
    tx = staged_optimizer(mapping, params, rules, default="train")
    if gradient_clip and gradient_clip > 0:
        return optax.chain(optax.clip_by_global_norm(gradient_clip), tx)
    return tx
