"""Baseline single-scale ROI segmentation model.

Redesign of the reference's original model
(/root/reference/src/human_edge_detection/model.py:61-351): RoIAlign 28^2 ->
1x1 in-proj -> 2 residual blocks -> progressive deconv to 112^2 ->
fuse 56^2 with downsampled 112^2 -> 3-class 56^2 logits. Feature input is a
single (B, H, W, C) map (the reference uses the external YOLO layer_34 map;
here any backbone output, e.g. ConvFeaturePyramid's layer_34).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.sampling import resize_bilinear, roi_align
from .blocks import ConvNormAct, ResidualBlock


class ROISegmentationHead(nn.Module):
    """Baseline head (model.py:61-223)."""

    mid_channels: int = 256
    num_classes: int = 3
    roi_size: Tuple[int, int] = (28, 28)
    mask_size: Tuple[int, int] = (56, 56)
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, features: jnp.ndarray, rois: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        mc = self.mid_channels
        rh, rw = self.roi_size
        mh, mw = self.mask_size
        h, w = features.shape[1:3]

        x = roi_align(features, rois, rh, rw, spatial_scale=(float(h), float(w)), aligned=True)
        x = ConvNormAct(mc, kernel=1, name="conv_in", **kw)(x, train=train)
        x = ResidualBlock(mc, name="res1", **kw)(x, train=train)
        x = ResidualBlock(mc, name="res2", **kw)(x, train=train)

        x56 = nn.ConvTranspose(mc, (4, 4), strides=(2, 2), padding="SAME", name="up1")(x)
        x56 = ConvNormAct(mc, kernel=1, name="up1_na", **kw)(x56, train=train)
        x56 = ResidualBlock(mc, name="refine1", **kw)(x56, train=train)

        x112 = nn.ConvTranspose(mc // 2, (4, 4), strides=(2, 2), padding="SAME", name="up2")(x56)
        x112 = ConvNormAct(mc // 2, kernel=1, name="up2_na", **kw)(x112, train=train)
        x112 = ConvNormAct(mc // 2, name="refine2a", **kw)(x112, train=train)
        x112 = ConvNormAct(mc // 2, name="refine2b", **kw)(x112, train=train)
        x112 = ConvNormAct(mc // 4, name="final_conv", **kw)(x112, train=train)

        x112_down = resize_bilinear(x112, x56.shape[1], x56.shape[2])
        fused = jnp.concatenate([x56, x112_down], axis=-1)
        fused = nn.Conv(mc // 2, (1, 1), name="fusion")(fused)
        logits = nn.Conv(self.num_classes, (1, 1), name="classifier")(fused)
        if logits.shape[1:3] != (mh, mw):
            logits = resize_bilinear(logits, mh, mw)
        return logits


class ROISegmentationModel(nn.Module):
    """Baseline assembly (model.py:226-351): optional in-graph feature
    extractor + head; features may also be supplied pre-extracted."""

    feature_channels: int = 1024
    roi_size: Tuple[int, int] = (28, 28)
    mask_size: Tuple[int, int] = (56, 56)
    norm: str = "layernorm2d"
    norm_groups: int = 8

    @nn.compact
    def __call__(self, images: jnp.ndarray, rois: jnp.ndarray, train: bool = False,
                 features: Optional[jnp.ndarray] = None):
        if features is None:
            from .multiscale import ConvFeaturePyramid

            feats = ConvFeaturePyramid(layers=("layer_34",), norm=self.norm,
                                       norm_groups=self.norm_groups, name="pyramid")(
                images, train=train)
            features = feats["layer_34"]
        logits = ROISegmentationHead(
            roi_size=self.roi_size, mask_size=self.mask_size, norm=self.norm,
            norm_groups=self.norm_groups, name="head")(features, rois, train=train)
        return logits, {"features": features}
