"""Distance-aware segmentation loss with an on-device distance transform.

Re-designs DistanceAwareSegmentationLoss
(/root/reference/src/human_edge_detection/advanced/distance_aware_loss.py:10-504).
The reference computes exact Euclidean distance transforms with scipy on the
CPU *per sample inside the training loop* — a host round-trip in the hot
path. Here the boundary-distance weights use a chamfer-style iterative
erosion count computed with `lax.reduce_window`, fully on device and
jittable. The weighting semantics are preserved: pixels near class
boundaries get up-weighted, and pixels between distinct instances
(target vs non-target adjacency) get an extra separation boost.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.morphology import dilate, erode
from .segmentation import cross_entropy, dice_loss


def approximate_distance_transform(mask: jnp.ndarray, max_distance: int = 10) -> jnp.ndarray:
    """Chamfer-style distance of each foreground pixel to the mask boundary.

    mask: (N, H, W, 1) binary {0,1}. Returns float distances clipped at
    ``max_distance`` (pixels further inside than max_distance saturate).
    Each erosion peels one boundary layer; the count of survivals is the
    L-inf distance to the boundary — a jittable stand-in for scipy's EDT
    (distance_aware_loss.py:27-50).
    """
    d = jnp.zeros_like(mask)
    cur = mask
    for _ in range(max_distance):
        d = d + cur
        cur = erode(cur, 1)
    return d


def boundary_distance_weights(
    targets: jnp.ndarray,
    num_classes: int = 3,
    boundary_weight: float = 3.0,
    decay: float = 0.5,
    max_distance: int = 8,
) -> jnp.ndarray:
    """Per-pixel weights that decay exponentially with distance from any
    class boundary: w = 1 + (boundary_weight - 1) * exp(-decay * dist)."""
    onehot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    # boundary band: dilate - erode over each class plane, any class
    band = jnp.zeros(targets.shape + (1,), jnp.float32)
    inside = jnp.zeros_like(band)
    for c in range(num_classes):
        m = onehot[..., c : c + 1]
        band = jnp.maximum(band, dilate(m, 1) - erode(m, 1))
    dist_to_boundary = approximate_distance_transform(1.0 - band, max_distance)
    w = 1.0 + (boundary_weight - 1.0) * jnp.exp(-decay * dist_to_boundary)
    return w[..., 0]


def instance_separation_weights(
    targets: jnp.ndarray,
    separation_weight: float = 2.0,
    radius: int = 2,
) -> jnp.ndarray:
    """Extra weight where target (1) and non-target (2) instances are within
    ``radius`` pixels of each other — the contested pixels the reference's
    centroid-separation weights emphasise (distance_aware_loss.py:100-180)."""
    t = (targets == 1).astype(jnp.float32)[..., None]
    nt = (targets == 2).astype(jnp.float32)[..., None]
    near_both = dilate(t, radius) * dilate(nt, radius)
    return 1.0 + (separation_weight - 1.0) * near_both[..., 0]


@dataclass(frozen=True)
class DistanceAwareLossConfig:
    boundary_weight: float = 3.0
    separation_weight: float = 2.0
    decay: float = 0.5
    max_distance: int = 8
    dice_weight: float = 1.0
    ce_weight: float = 1.0


def distance_aware_loss(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: DistanceAwareLossConfig = DistanceAwareLossConfig(),
    class_weights: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Distance-weighted CE + Dice (distance_aware_loss.py:200-380)."""
    w = boundary_distance_weights(
        targets, predictions.shape[-1], cfg.boundary_weight, cfg.decay, cfg.max_distance)
    w = w * instance_separation_weights(targets, cfg.separation_weight)
    if valid is not None:
        w = w * valid.astype(w.dtype)[:, None, None]
    ce_map = cross_entropy(predictions, targets, class_weights=class_weights, reduction="none")
    ce = jnp.sum(ce_map * w) / jnp.clip(jnp.sum(w), 1.0, None)
    dl = dice_loss(predictions, targets, class_indices=(1,), valid=valid)
    total = cfg.ce_weight * ce + cfg.dice_weight * dl
    return total, {"total_loss": total, "weighted_ce": ce, "dice_loss": dl}
