"""Hierarchical + refined hierarchical losses with explicit EMA state.

Re-designs:
- HierarchicalLoss
  (/root/reference/src/human_edge_detection/advanced/hierarchical_segmentation.py:151-395)
- RefinedHierarchicalLoss + active-contour / boundary-aware terms and the
  contour / distance target generators
  (advanced/hierarchical_segmentation_refinement.py:347-431, 807-1068)

TPU-first: the reference updates its dynamic class-balancing EMA weights via
``.item()`` — a host sync inside the hot loop. Here the EMA lives in an
explicit ``HierarchicalLossState`` pytree threaded through the jitted train
step, so the whole loss (and its state update) stays on device.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.morphology import dilate, erode, max_pool2d
from .distance_aware import DistanceAwareLossConfig, distance_aware_loss
from .segmentation import cross_entropy, dice_loss, focal_loss


@flax.struct.dataclass
class HierarchicalLossState:
    """Device-resident EMA of the dynamic class-balance weights
    (reference keeps these as python floats, hierarchical_segmentation.py:184-195)."""

    ema_bg: jnp.ndarray
    ema_fg: jnp.ndarray
    ema_target: jnp.ndarray
    ema_nontarget: jnp.ndarray
    initialized: jnp.ndarray  # bool scalar

    @classmethod
    def create(cls) -> "HierarchicalLossState":
        # Distinct arrays per field: sharing one buffer across fields breaks
        # donation ("attempt to donate the same buffer twice").
        one = lambda: jnp.asarray(1.0, jnp.float32)
        return cls(ema_bg=one(), ema_fg=one(), ema_target=one(), ema_nontarget=one(),
                   initialized=jnp.asarray(False))


@dataclass(frozen=True)
class HierarchicalLossConfig:
    bg_weight: float = 1.0
    fg_weight: float = 1.0
    target_weight: float = 1.0
    consistency_weight: float = 0.1
    use_dynamic_weights: bool = True
    dice_weight: float = 1.0
    ce_weight: float = 1.0
    ema_alpha: float = 0.9
    # Final 3-class term options (losses.py:204-277 via TrainingConfig):
    use_focal: bool = False
    focal_gamma: float = 2.0
    # data_stats-derived [bg, target, non_target] weights
    # (train_advanced.py:999-1003 -> build_loss_function)
    final_class_weights: Optional[Tuple[float, float, float]] = None


def hierarchical_loss(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    aux: Dict[str, jnp.ndarray],
    state: HierarchicalLossState,
    cfg: HierarchicalLossConfig = HierarchicalLossConfig(),
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, HierarchicalLossState, Dict[str, jnp.ndarray]]:
    """4-term hierarchical loss (hierarchical_segmentation.py:201-395).

    Args:
      predictions: (N, H, W, 3) final logits.
      targets: (N, H, W) int labels {0 bg, 1 target, 2 non-target}.
      aux: needs 'bg_fg_logits' (N, H, W, 2) and
           'target_nontarget_logits' (N, H, W, 2).
      valid: optional (N,) validity mask for padded ROI buckets.
    Returns: (total_loss, new_state, metrics).
    """
    f32 = predictions.dtype
    vw = jnp.ones((targets.shape[0],), f32) if valid is None else valid.astype(f32)
    pix_w = vw[:, None, None]

    bg_mask = (targets == 0).astype(f32) * pix_w
    fg_mask = (targets > 0).astype(f32) * pix_w
    target_mask = (targets == 1).astype(f32) * pix_w
    nontarget_mask = (targets == 2).astype(f32) * pix_w
    bg_fg_targets = (targets > 0).astype(jnp.int32)

    # ---- dynamic bg/fg class weights with on-device EMA ----
    if cfg.use_dynamic_weights:
        bg_count = jnp.sum(bg_mask)
        fg_count = jnp.sum(fg_mask)
        total = bg_count + fg_count
        bg_w = jnp.clip(total / (2.0 * jnp.clip(bg_count, 1.0, None)), 0.5, 3.0)
        fg_w = jnp.clip(
            total / (2.0 * jnp.clip(fg_count, 1.0, None)) * cfg.target_weight, 0.5, 3.0)
        a = cfg.ema_alpha
        ema_bg = jnp.where(state.initialized, a * state.ema_bg + (1 - a) * bg_w, bg_w)
        ema_fg = jnp.where(state.initialized, a * state.ema_fg + (1 - a) * fg_w, fg_w)
        bgfg_weights = jnp.stack([ema_bg, ema_fg])
    else:
        ema_bg, ema_fg = jnp.asarray(1.0), jnp.asarray(cfg.target_weight)
        bgfg_weights = jnp.stack([jnp.asarray(1.0, f32), jnp.asarray(cfg.target_weight, f32)])

    bg_fg_loss = cross_entropy(
        aux["bg_fg_logits"], bg_fg_targets, class_weights=bgfg_weights, valid=valid)

    # ---- target vs non-target on foreground pixels ----
    tn_targets = jnp.where(targets == 2, 1, 0)
    t_count = jnp.sum(target_mask)
    nt_count = jnp.sum(nontarget_mask)
    fg_total = t_count + nt_count
    if cfg.use_dynamic_weights:
        t_w = jnp.clip(fg_total / (2.0 * jnp.clip(t_count, 1.0, None)), 0.5, 3.0)
        nt_w = jnp.clip(fg_total / (2.0 * jnp.clip(nt_count, 1.0, None)), 0.5, 3.0)
        a = cfg.ema_alpha
        ema_t = jnp.where(state.initialized, a * state.ema_target + (1 - a) * t_w, t_w)
        ema_nt = jnp.where(state.initialized, a * state.ema_nontarget + (1 - a) * nt_w, nt_w)
        tn_weights = jnp.stack([ema_t, ema_nt])
    else:
        ema_t = jnp.asarray(1.0)
        ema_nt = jnp.asarray(1.0)
        tn_weights = jnp.ones((2,), f32)

    tn_ce = cross_entropy(
        aux["target_nontarget_logits"], tn_targets, class_weights=tn_weights,
        reduction="none")
    target_nontarget_loss = jnp.sum(tn_ce * fg_mask) / jnp.clip(jnp.sum(fg_mask), 1.0, None)
    target_nontarget_loss = jnp.where(fg_total > 0, target_nontarget_loss, 0.0)

    # ---- final 3-class CE (or focal) + consistency + Dice(target) ----
    fcw = (jnp.asarray(cfg.final_class_weights, f32)
           if cfg.final_class_weights is not None else None)
    if cfg.use_focal:
        final_loss = focal_loss(predictions, targets, gamma=cfg.focal_gamma,
                                alpha=fcw, valid=valid)
    else:
        final_loss = cross_entropy(predictions, targets, class_weights=fcw,
                                   valid=valid)

    bg_fg_probs = jax.nn.softmax(aux["bg_fg_logits"], axis=-1)
    final_probs = jax.nn.softmax(predictions, axis=-1)
    fg_from_final = final_probs[..., 1] + final_probs[..., 2]
    fg_from_branch = bg_fg_probs[..., 1]
    sq = (fg_from_branch - fg_from_final) ** 2 * pix_w
    consistency_loss = jnp.sum(sq) / jnp.clip(
        jnp.sum(pix_w * jnp.ones_like(sq)), 1.0, None)

    dice = dice_loss(predictions, targets, class_indices=(1,), valid=valid)

    total = (cfg.bg_weight * bg_fg_loss
             + cfg.fg_weight * target_nontarget_loss
             + cfg.ce_weight * final_loss
             + cfg.dice_weight * dice
             + cfg.consistency_weight * consistency_loss)

    # ---- aux metrics (hierarchical_segmentation.py:358-373) ----
    bg_fg_preds = jnp.argmax(aux["bg_fg_logits"], axis=-1)
    correct = (bg_fg_preds == bg_fg_targets).astype(f32) * pix_w
    aux_fg_accuracy = jnp.sum(correct) / jnp.clip(jnp.sum(pix_w * jnp.ones_like(correct)), 1.0, None)
    fg_pred = (bg_fg_preds == 1).astype(f32) * pix_w
    fg_true = bg_fg_targets.astype(f32) * pix_w
    inter = jnp.sum(fg_pred * fg_true)
    union = jnp.sum(jnp.clip(fg_pred + fg_true, None, 1.0))
    aux_fg_iou = inter / jnp.clip(union, 1.0, None)

    new_state = HierarchicalLossState(
        ema_bg=ema_bg, ema_fg=ema_fg, ema_target=ema_t, ema_nontarget=ema_nt,
        initialized=jnp.asarray(True),
    ) if cfg.use_dynamic_weights else state

    metrics = {
        "bg_fg_loss": bg_fg_loss,
        "target_nontarget_loss": target_nontarget_loss,
        "final_loss": final_loss,
        "consistency_loss": consistency_loss,
        "ce_loss": final_loss,
        "dice_loss": dice,
        "total_loss": total,
        "aux_fg_bg_loss": bg_fg_loss,
        "aux_fg_accuracy": aux_fg_accuracy,
        "aux_fg_iou": aux_fg_iou,
        "bg_weight": ema_bg,
        "fg_weight": ema_fg,
        "target_weight": ema_t,
        "nontarget_weight": ema_nt,
    }
    return total, new_state, metrics


# ---------------------------------------------------------------------------
# Refinement terms (hierarchical_segmentation_refinement.py:347-431, 986-1068)
# ---------------------------------------------------------------------------


def active_contour_loss(probs: jnp.ndarray, smoothness_weight: float = 0.01) -> jnp.ndarray:
    """Boundary length + curvature of the target-class probability
    (refinement.py:347-386). probs: (N, H, W, C) post-softmax."""
    p = probs[..., 1:2] if probs.shape[-1] > 1 else probs
    dy = p[:, 1:, :, :] - p[:, :-1, :, :]
    dx = p[:, :, 1:, :] - p[:, :, :-1, :]
    boundary = jnp.mean(jnp.clip(jnp.abs(dy), None, 10.0)) + jnp.mean(jnp.clip(jnp.abs(dx), None, 10.0))
    curvature = 0.0
    if dy.shape[1] > 1:
        curvature += jnp.mean(jnp.abs(dy[:, 1:, :, :] - dy[:, :-1, :, :]))
    if dx.shape[2] > 1:
        curvature += jnp.mean(jnp.abs(dx[:, :, 1:, :] - dx[:, :, :-1, :]))
    return boundary + smoothness_weight * curvature


def boundary_aware_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    boundary_width: int = 3,
    boundary_weight: float = 5.0,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CE up-weighted in a morphological boundary band (refinement.py:389-431):
    band = dilate(onehot) - erode(onehot) via +/- maxpool."""
    c = pred.shape[-1]
    onehot = jax.nn.one_hot(target, c, dtype=pred.dtype)
    k = boundary_width
    pad = k // 2
    dil = max_pool2d(onehot, k, 1, pad)
    ero = 1.0 - max_pool2d(1.0 - onehot, k, 1, pad)
    band = jnp.sum(dil - ero, axis=-1) > 0
    weights = jnp.where(band, boundary_weight, 1.0)
    if valid is not None:
        weights = weights * valid.astype(pred.dtype)[:, None, None]
    ce = cross_entropy(pred, target, reduction="none")
    return jnp.mean(ce * weights)


def generate_contour_targets(masks: jnp.ndarray, num_classes: int = 3) -> jnp.ndarray:
    """Gradient-derived binary contour targets with resolution-adaptive edge
    width (refinement.py:986-1040). masks: (N, H, W) int."""
    h, w = masks.shape[1], masks.shape[2]
    t = (masks == 1).astype(jnp.float32)[..., None]
    dy = jnp.abs(t[:, 1:, :, :] - t[:, :-1, :, :])
    dx = jnp.abs(t[:, :, 1:, :] - t[:, :, :-1, :])
    dy = jnp.pad(dy, ((0, 0), (0, 1), (0, 0), (0, 0)), mode="edge")
    dx = jnp.pad(dx, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
    contours = jnp.maximum(dy, dx)

    base_resolution = 64 * 48
    ratio = (h * w) / base_resolution
    edge_width = max(1, int(math.sqrt(ratio) * 1.5))
    if edge_width > 1:
        k = 2 * edge_width - 1
        avg = max_pool2d(contours, k, 1, k // 2)  # any hit within k -> edge
        # reference uses a box-filter + >0.1 threshold; maxpool is the
        # equivalent binary dilation for {0,1} inputs
        contours = (avg > 0.1).astype(jnp.float32)
    return contours


def generate_distance_targets(masks: jnp.ndarray, iterations: int = 5) -> jnp.ndarray:
    """Maxpool-cascade distance-to-boundary approximation
    (refinement.py:1042-1068). masks: (N, H, W) int -> (N, H, W, 1)."""
    d = (masks == 1).astype(jnp.float32)[..., None]
    for _ in range(iterations):
        dil = max_pool2d(d, 3, 1, 1)
        d = d + (1.0 - d) * dil * 0.5
    return d


@dataclass(frozen=True)
class RefinedLossConfig:
    base: HierarchicalLossConfig = field(default_factory=lambda: HierarchicalLossConfig(
        bg_weight=1.5, fg_weight=1.5, target_weight=1.2, consistency_weight=0.3))
    active_contour_weight: float = 0.01
    boundary_aware_weight: float = 0.01
    contour_loss_weight: float = 0.01
    distance_loss_weight: float = 0.01
    use_active_contour_loss: bool = False
    use_boundary_aware_loss: bool = False
    use_contour_detection: bool = True
    use_distance_transform: bool = True
    base_mask_size: Tuple[int, int] = (64, 48)
    auto_adjust_contour_weight: bool = True
    # Optional distance-aware CE/Dice term (DistanceLossConfig group,
    # advanced/distance_aware_loss.py:200-380)
    distance_aware: Optional[DistanceAwareLossConfig] = None
    distance_aware_weight: float = 1.0


def refined_hierarchical_loss(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    aux: Dict[str, jnp.ndarray],
    state: HierarchicalLossState,
    cfg: RefinedLossConfig = RefinedLossConfig(),
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, HierarchicalLossState, Dict[str, jnp.ndarray]]:
    """RefinedHierarchicalLoss (refinement.py:895-984): base hierarchical
    loss + clamped refinement terms."""
    total, new_state, metrics = hierarchical_loss(
        predictions, targets, aux, state, cfg.base, valid=valid)

    if cfg.use_active_contour_loss:
        ac = jnp.clip(active_contour_loss(jax.nn.softmax(predictions, axis=-1)), None, 10.0)
        total = total + cfg.active_contour_weight * ac
        metrics["active_contour"] = ac

    if cfg.use_boundary_aware_loss:
        ba = jnp.clip(boundary_aware_loss(predictions, targets, 3, 2.0, valid=valid), None, 10.0)
        total = total + cfg.boundary_aware_weight * ba
        metrics["boundary_aware"] = ba

    if cfg.use_contour_detection and "contours" in aux:
        ct = generate_contour_targets(targets)
        # contours aux is post-sigmoid; BCE on probabilities (eps-clamped)
        p = jnp.clip(aux["contours"], 1e-7, 1.0 - 1e-7)
        bce = -(ct * jnp.log(p) + (1.0 - ct) * jnp.log(1.0 - p))
        if valid is not None:
            vw = valid.astype(p.dtype)[:, None, None, None]
            closs = jnp.sum(bce * vw) / jnp.clip(jnp.sum(vw * jnp.ones_like(bce)), 1.0, None)
        else:
            closs = jnp.mean(bce)
        closs = jnp.clip(closs, None, 10.0)
        h, w = targets.shape[1], targets.shape[2]
        if cfg.auto_adjust_contour_weight:
            base_res = cfg.base_mask_size[0] * cfg.base_mask_size[1]
            adj = math.sqrt(base_res / (h * w))
            weight = min(max(cfg.contour_loss_weight * adj, 0.001), 0.5)
        else:
            weight = cfg.contour_loss_weight
        total = total + weight * closs
        metrics["contour"] = closs
        metrics["contour_weight"] = jnp.asarray(weight)

    if cfg.use_distance_transform and "distance_map" in aux:
        dt = generate_distance_targets(targets)
        l1 = jnp.abs(aux["distance_map"] - dt)
        if valid is not None:
            vw = valid.astype(l1.dtype)[:, None, None, None]
            dloss = jnp.sum(l1 * vw) / jnp.clip(jnp.sum(vw * jnp.ones_like(l1)), 1.0, None)
        else:
            dloss = jnp.mean(l1)
        dloss = jnp.clip(dloss, None, 10.0)
        total = total + cfg.distance_loss_weight * dloss
        metrics["distance_transform"] = dloss

    if cfg.distance_aware is not None:
        da, da_metrics = distance_aware_loss(
            predictions, targets, cfg.distance_aware, valid=valid)
        total = total + cfg.distance_aware_weight * da
        metrics["distance_aware"] = da
        metrics["distance_aware_weighted_ce"] = da_metrics["weighted_ce"]

    metrics["total_loss"] = total
    return total, new_state, metrics
