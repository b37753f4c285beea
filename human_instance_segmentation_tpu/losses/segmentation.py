"""Core segmentation losses: Dice, focal, weighted CE.

Re-designs /root/reference/src/human_edge_detection/losses.py:9-277 as pure
jittable functions over NHWC logits. Every loss accepts an optional
``valid`` (N,) mask so padded ROI buckets (the TPU static-shape contract)
contribute zero — the reference has no padding because ONNX uses dynamic
axes.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _valid_weights(valid: Optional[jnp.ndarray], n: int, dtype) -> jnp.ndarray:
    if valid is None:
        return jnp.ones((n,), dtype)
    return valid.astype(dtype)


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Weighted softmax cross-entropy (torch F.cross_entropy semantics:
    with class weights, the mean is normalised by the summed weights).

    Args:
      logits: (N, H, W, C); targets: (N, H, W) int in [0, C).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = class_weights[targets]
    else:
        w = jnp.ones_like(nll)
    vw = _valid_weights(valid, logits.shape[0], nll.dtype)[:, None, None]
    w = w * vw
    if reduction == "none":
        return nll * w
    if reduction == "sum":
        return jnp.sum(nll * w)
    return jnp.sum(nll * w) / jnp.clip(jnp.sum(w), 1e-8, None)


def dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_indices: Sequence[int] = (1, 2),
    smooth: float = 1e-6,
    apply_softmax: bool = True,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-class Dice (losses.py:9-88): per-sample dice over (H, W), mean
    over samples, mean over the selected classes."""
    probs = jax.nn.softmax(logits, axis=-1) if apply_softmax else logits
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(targets, num_classes, dtype=probs.dtype)
    vw = _valid_weights(valid, logits.shape[0], probs.dtype)
    losses = []
    for c in class_indices:
        p = probs[..., c]
        t = onehot[..., c]
        inter = jnp.sum(p * t, axis=(1, 2))
        denom = jnp.sum(p, axis=(1, 2)) + jnp.sum(t, axis=(1, 2))
        dice = (2.0 * inter + smooth) / (denom + smooth)
        per_sample = 1.0 - dice
        losses.append(jnp.sum(per_sample * vw) / jnp.clip(jnp.sum(vw), 1.0, None))
    return jnp.mean(jnp.stack(losses))


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    alpha: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal loss (losses.py:91-127)."""
    ce = cross_entropy(logits, targets, reduction="none")
    pt = jnp.exp(-ce)
    fl = (1.0 - pt) ** gamma * ce
    if alpha is not None:
        fl = alpha[targets] * fl
    vw = _valid_weights(valid, logits.shape[0], fl.dtype)[:, None, None]
    return jnp.sum(fl * vw) / jnp.clip(jnp.sum(vw * jnp.ones_like(fl)), 1.0, None)


def segmentation_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    ce_weight: float = 1.0,
    dice_weight: float = 1.0,
    dice_classes: Sequence[int] = (1,),
    use_focal: bool = False,
    focal_gamma: float = 2.0,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted CE + Dice combo (SegmentationLoss, losses.py:130-201)."""
    if use_focal:
        ce = focal_loss(logits, targets, gamma=focal_gamma, alpha=class_weights, valid=valid)
    else:
        ce = cross_entropy(logits, targets, class_weights=class_weights, valid=valid)
    dl = dice_loss(logits, targets, class_indices=dice_classes, valid=valid)
    total = ce_weight * ce + dice_weight * dl
    return total, {"total_loss": total, "ce_loss": ce, "dice_loss": dl}


def class_weights_from_pixel_ratios(
    pixel_ratios: Dict[str, float], use_log_weights: bool = True
):
    """Derive [bg, target, non_target] class weights from dataset pixel
    ratios (create_loss_function, losses.py:204-277): log-inverse (or plain
    inverse) frequency, normalised to sum to 3.

    Returns a plain tuple of floats (callable at config-build time without
    initialising the JAX backend)."""
    import math

    eps = 1e-3
    keys = ("background", "target", "non_target")
    if use_log_weights:
        w = [math.log(1.0 / (pixel_ratios[k] + eps)) for k in keys]
    else:
        w = [1.0 / (pixel_ratios[k] + eps) for k in keys]
    s = sum(w)
    return tuple(v / s * 3.0 for v in w)
