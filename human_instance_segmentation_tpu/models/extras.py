"""Experimental model families: cascade, class-specific decoder, auxiliary
fg/bg multi-task.

Redesigns of:
- Cascade segmentation (3 progressive stages + stage-weighted loss):
  /root/reference/src/human_edge_detection/advanced/cascade_segmentation.py:12-489
- Class-specific decoders + class-balanced head:
  advanced/class_specific_decoder.py:11-293
- Auxiliary fg/bg binary task + multi-task loss:
  advanced/auxiliary_fg_bg_task.py:9-296
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..losses.segmentation import cross_entropy, dice_loss
from ..ops.norms import get_normalization
from .blocks import ConvNormAct, ResidualBlock


class CascadeBoundaryRefinement(nn.Module):
    """Stage 2: residual boundary refinement over [features, softmax(coarse)]
    (cascade_segmentation.py:12-76)."""

    feature_channels: int = 128
    num_classes: int = 3
    norm: str = "layernorm2d"
    norm_groups: int = 8

    @nn.compact
    def __call__(self, features: jnp.ndarray, coarse: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups)
        x = jnp.concatenate([features, jax.nn.softmax(coarse, axis=-1)], axis=-1)
        x = ConvNormAct(self.feature_channels, name="edge0", **kw)(x, train=train)
        x = ConvNormAct(self.feature_channels, name="edge1", **kw)(x, train=train)
        x = ResidualBlock(self.feature_channels, name="ref0", **kw)(x, train=train)
        x = ResidualBlock(self.feature_channels, name="ref1", **kw)(x, train=train)
        residual = nn.Conv(self.num_classes, (1, 1), name="out")(x)
        return coarse + residual


class InstanceSeparationModule(nn.Module):
    """Stage 3: dilated-context instance separation
    (cascade_segmentation.py:79-157)."""

    feature_channels: int = 128
    num_classes: int = 3
    norm: str = "layernorm2d"
    norm_groups: int = 8

    @nn.compact
    def __call__(self, features: jnp.ndarray, refined: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fc = self.feature_channels
        x = jnp.concatenate([features, jax.nn.softmax(refined, axis=-1)], axis=-1)
        x = nn.Conv(fc, (5, 5), padding=2, name="inst_conv")(x)
        x = jax.nn.relu(get_normalization(self.norm, fc, self.norm_groups, name="inst_norm")(x, train=train))
        c1 = nn.Conv(fc, (3, 3), padding=2, kernel_dilation=(2, 2), name="ctx1")(x)
        c1 = jax.nn.relu(get_normalization(self.norm, fc, self.norm_groups, name="ctx1_norm")(c1, train=train))
        c2 = nn.Conv(fc, (3, 3), padding=4, kernel_dilation=(4, 4), name="ctx2")(c1)
        c2 = jax.nn.relu(get_normalization(self.norm, fc, self.norm_groups, name="ctx2_norm")(c2, train=train))
        s = ResidualBlock(fc, name="sep0", norm=self.norm, norm_groups=self.norm_groups)(c2, train=train)
        s = ResidualBlock(fc, name="sep1", norm=self.norm, norm_groups=self.norm_groups)(s, train=train)
        residual = nn.Conv(self.num_classes, (1, 1), name="out")(s)
        return refined + residual


class CascadeSegmentationHead(nn.Module):
    """Coarse decode -> boundary refine -> instance separate; returns all
    three stage outputs (cascade_segmentation.py:159-357)."""

    mid_channels: int = 256
    num_classes: int = 3
    norm: str = "layernorm2d"
    norm_groups: int = 8

    @nn.compact
    def __call__(self, roi_features: jnp.ndarray, train: bool = False):
        kw = dict(norm=self.norm, norm_groups=self.norm_groups)
        x = ConvNormAct(self.mid_channels, name="coarse_in", **kw)(roi_features, train=train)
        x = ResidualBlock(self.mid_channels, name="coarse_res", **kw)(x, train=train)
        coarse = nn.Conv(self.num_classes, (1, 1), name="coarse_out")(x)
        refined = CascadeBoundaryRefinement(
            num_classes=self.num_classes, name="boundary", **kw)(x, coarse, train=train)
        separated = InstanceSeparationModule(
            num_classes=self.num_classes, name="separation", **kw)(x, refined, train=train)
        aux = {"stage_outputs": (coarse, refined, separated)}
        return separated, aux


def cascade_loss(
    stage_outputs: Sequence[jnp.ndarray],
    targets: jnp.ndarray,
    stage_weights: Sequence[float] = (0.3, 0.3, 0.4),
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Stage-weighted CE+Dice (CascadeLoss, cascade_segmentation.py:359-489)."""
    total = 0.0
    metrics = {}
    for i, (out, w) in enumerate(zip(stage_outputs, stage_weights)):
        ce = cross_entropy(out, targets, valid=valid)
        dl = dice_loss(out, targets, class_indices=(1,), valid=valid)
        stage = ce + dl
        metrics[f"stage{i}_loss"] = stage
        total = total + w * stage
    metrics["total_loss"] = total
    return total, metrics


class ClassSpecificDecoder(nn.Module):
    """Per-class decoder pathways with cross-class 1x1 interaction
    (class_specific_decoder.py:11-109)."""

    mid_channels: int = 128
    num_classes: int = 3
    norm: str = "layernorm2d"
    norm_groups: int = 8

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups)
        outs = []
        for c in range(self.num_classes):
            x = ConvNormAct(self.mid_channels, name=f"class{c}_in", **kw)(features, train=train)
            x = ResidualBlock(self.mid_channels, name=f"class{c}_res", **kw)(x, train=train)
            outs.append(nn.Conv(1, (1, 1), name=f"class{c}_out")(x))
        stacked = jnp.concatenate(outs, axis=-1)  # (N, H, W, C)
        # cross-class interaction prevents complete isolation
        inter = nn.Conv(self.num_classes, (1, 1), name="cross_class")(stacked)
        return stacked + inter


class AuxiliaryFgBgHead(nn.Module):
    """Lightweight binary fg/bg head on ROI features
    (auxiliary_fg_bg_task.py:9-53)."""

    mid_channels: int = 128
    norm: str = "layernorm2d"
    norm_groups: int = 8

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups)
        x = ConvNormAct(self.mid_channels, name="c0", **kw)(features, train=train)
        x = ConvNormAct(self.mid_channels // 2, name="c1", **kw)(x, train=train)
        return nn.Conv(1, (1, 1), name="out")(x)  # binary logit


def multi_task_loss(
    main_loss: jnp.ndarray,
    aux_logits: jnp.ndarray,
    targets: jnp.ndarray,
    aux_weight: float = 0.3,
    pos_weight: Optional[float] = None,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Main loss + weighted-BCE auxiliary fg/bg loss
    (MultiTaskLoss, auxiliary_fg_bg_task.py:173-296). aux_logits (N, h, w, 1)
    may be lower-resolution than targets (N, H, W) — targets are pooled."""
    fg = (targets > 0).astype(aux_logits.dtype)[..., None]
    if fg.shape[1:3] != aux_logits.shape[1:3]:
        from ..ops.sampling import resize_bilinear

        fg = resize_bilinear(fg, aux_logits.shape[1], aux_logits.shape[2])
        fg = (fg > 0.5).astype(aux_logits.dtype)
    pw = 1.0 if pos_weight is None else pos_weight
    bce = -(pw * fg * jax.nn.log_sigmoid(aux_logits)
            + (1.0 - fg) * jax.nn.log_sigmoid(-aux_logits))
    if valid is not None:
        vw = valid.astype(bce.dtype)[:, None, None, None]
        aux = jnp.sum(bce * vw) / jnp.clip(jnp.sum(vw * jnp.ones_like(bce)), 1.0, None)
    else:
        aux = jnp.mean(bce)
    total = main_loss + aux_weight * aux
    return total, {"total_loss": total, "aux_fg_bg_loss": aux, "main_loss": main_loss}
