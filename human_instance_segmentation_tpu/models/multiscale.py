"""Multi-scale & variable-ROI model families (the YOLO-feature lineage).

The reference's multi-scale path feeds intermediate features from an
*external* ONNX YOLOv9 run through ONNX Runtime
(/root/reference/src/human_edge_detection/advanced/multi_scale_extractor.py:10-216
with FEATURE_SPECS layer_3/19: 256ch stride 4, layer_5/22: 512ch stride 8,
layer_34: 1024ch stride 8). TPU-native redesign: the extractor is a protocol
— any dict of {layer_id: (B, H, W, C)} feature maps — plus
:class:`ConvFeaturePyramid`, a Flax backbone producing the same
(channels, stride) pyramid in-graph so the whole model compiles as one XLA
program (no Python<->ORT boundary inside the hot loop, the reference's
biggest deployment wart — feature_extractor.py:143-146).

Also here:
- MultiScaleRoIAlign + MultiScaleFeatureFusion + MultiScaleSegmentationModel
  (advanced/multi_scale_model.py:12-465)
- VariableROIAlign + HierarchicalFeatureFusion + VariableROISegmentationHead
  + LightweightRGBEncoder + RGBEnhancedVariableROISegmentationHead
  (advanced/variable_roi_model.py:12-647)
- head-only wrappers taking pre-extracted features
  (multi_scale_head_only.py / variable_roi_head_only.py)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sampling import resize_bilinear, roi_align
from .blocks import ConvNormAct, ResidualBlock, max_pool_2x
from .heads import HierarchicalHeadV2

# (channels, stride) of the reference YOLOv9 taps (multi_scale_extractor.py:30-60)
FEATURE_SPECS: Dict[str, Tuple[int, int]] = {
    "layer_3": (256, 4),
    "layer_19": (256, 4),
    "layer_5": (512, 8),
    "layer_22": (512, 8),
    "layer_34": (1024, 8),
}


class ConvFeaturePyramid(nn.Module):
    """Native in-graph replacement for the external YOLOv9 feature extractor:
    a strided conv backbone emitting the FEATURE_SPECS-compatible pyramid."""

    layers: Tuple[str, ...] = ("layer_3", "layer_22", "layer_34")
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        # stride 4 trunk
        x = ConvNormAct(64, stride=2, name="stem0", **kw)(images, train=train)
        x = ConvNormAct(128, stride=2, name="stem1", **kw)(x, train=train)
        s4 = ResidualBlock(128, name="s4_res", **kw)(x, train=train)
        s8 = ConvNormAct(256, stride=2, name="down8", **kw)(s4, train=train)
        s8 = ResidualBlock(256, name="s8_res", **kw)(s8, train=train)

        out: Dict[str, jnp.ndarray] = {}
        for layer in self.layers:
            ch, stride = FEATURE_SPECS[layer]
            src = s4 if stride == 4 else s8
            out[layer] = ConvNormAct(ch, kernel=1, name=f"proj_{layer}", **kw)(src, train=train)
        return out


class FeaturePyramidFusion(nn.Module):
    """FPN-style top-down fusion of a feature pyramid
    (multi_scale_extractor.py:217-360): 1x1 lateral convs to a common width,
    top-down upsample+add across resolutions, 3x3 smoothing convs.
    fusion_method 'fpn' | 'concat' | 'sum' — 'concat'/'sum' fuse only layers
    sharing a resolution."""

    out_channels: int = 256
    fusion_method: str = "fpn"

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        lateral = {l: nn.Conv(self.out_channels, (1, 1), name=f"lateral_{l}")(f)
                   for l, f in features.items()}
        if self.fusion_method == "sum":
            return {l: f for l, f in lateral.items()}
        if self.fusion_method == "concat":
            return lateral
        # fpn: order fine -> coarse by spatial extent; top-down add
        order = sorted(lateral.keys(), key=lambda l: -lateral[l].shape[1])
        out: Dict[str, jnp.ndarray] = {}
        prev = None
        for l in reversed(order):  # coarse -> fine
            f = lateral[l]
            if prev is not None and prev.shape[1:3] != f.shape[1:3]:
                prev = resize_bilinear(prev, f.shape[1], f.shape[2])
            f = f if prev is None else f + prev
            out[l] = nn.Conv(self.out_channels, (3, 3), padding=1, name=f"smooth_{l}")(f)
            prev = f
        return out


class MultiScaleRoIAlign(nn.Module):
    """Per-layer RoIAlign at the layer's stride-scaled spatial scale
    (multi_scale_model.py:12-120). Normalised [0,1] rois; spatial_scale per
    layer = feature extent (so scale-invariant wrt stride)."""

    roi_size: Tuple[int, int] = (28, 28)

    def __call__(self, features: Dict[str, jnp.ndarray], rois: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        rh, rw = self.roi_size
        out = {}
        for layer, feat in features.items():
            h, w = feat.shape[1:3]
            out[layer] = roi_align(feat, rois, rh, rw, spatial_scale=(float(h), float(w)),
                                   aligned=True)
        return out


class MultiScaleFeatureFusion(nn.Module):
    """concat / sum / adaptive-softmax fusion of per-layer ROI features
    (multi_scale_model.py:123-240)."""

    out_channels: int = 256
    method: str = "adaptive"
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, roi_feats: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        layers = sorted(roi_feats.keys())
        reduced = [
            ConvNormAct(self.out_channels, kernel=1, name=f"reduce_{l}", **kw)(
                roi_feats[l], train=train)
            for l in layers
        ]
        if self.method == "concat":
            fused = jnp.concatenate(reduced, axis=-1)
        elif self.method == "sum":
            fused = sum(reduced)
        elif self.method == "adaptive":
            w = self.param("fusion_weights", nn.initializers.ones, (len(reduced),))
            w = jax.nn.softmax(w)
            fused = sum(wi * f for wi, f in zip(w, reduced))
        else:
            raise ValueError(f"unknown fusion method {self.method}")
        return ConvNormAct(self.out_channels, kernel=1, name="proj", **kw)(fused, train=train)


class MultiScaleSegmentationModel(nn.Module):
    """Full multi-scale model: pyramid (or provided features) -> per-layer
    RoIAlign -> fusion -> hierarchical head (multi_scale_model.py:243-465,
    head swap per create_hierarchical_model_unet_v2,
    hierarchical_segmentation_unet.py:538-667)."""

    layers: Tuple[str, ...] = ("layer_3", "layer_22", "layer_34")
    roi_size: Tuple[int, int] = (28, 28)
    mask_size: Tuple[int, int] = (56, 56)
    mid_channels: int = 256
    fusion_method: str = "adaptive"
    use_attention_module: bool = False
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, images: jnp.ndarray, rois: jnp.ndarray, train: bool = False,
                 features: Optional[Dict[str, jnp.ndarray]] = None):
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        if features is None:
            features = ConvFeaturePyramid(layers=self.layers, name="pyramid", **kw)(
                images, train=train)
        roi_feats = MultiScaleRoIAlign(roi_size=self.roi_size, name="roi_align")(features, rois)
        fused = MultiScaleFeatureFusion(
            out_channels=self.mid_channels, method=self.fusion_method, name="fusion", **kw
        )(roi_feats, train=train)
        logits, aux = HierarchicalHeadV2(
            mid_channels=self.mid_channels, mask_size=self.mask_size,
            use_attention_module=self.use_attention_module, name="head", **kw
        )(fused, train=train)
        aux["roi_features"] = fused
        return logits, aux


class HierarchicalFeatureFusion(nn.Module):
    """Variable-ROI fusion (variable_roi_model.py:69-197): channel-reduce
    each layer, learned size adjusters to the 28x28 target (strided conv for
    56->28, learned-interp for 42->28, plain interp otherwise), softmax
    weights, fusion conv + residual block."""

    roi_sizes: Dict[str, int]
    out_channels: int = 256
    target_size: int = 28
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, roi_feats: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        ts = self.target_size
        adjusted = []
        for layer in sorted(roi_feats.keys()):
            f = ConvNormAct(self.out_channels, kernel=1, name=f"reduce_{layer}", **kw)(
                roi_feats[layer], train=train)
            rs = self.roi_sizes.get(layer, ts)
            if rs == ts:
                pass
            elif rs == 2 * ts:
                f = ConvNormAct(self.out_channels, stride=2, name=f"adj_{layer}_a", **kw)(f, train=train)
                f = ConvNormAct(self.out_channels, name=f"adj_{layer}_b", **kw)(f, train=train)
            elif rs > ts:
                f = ConvNormAct(self.out_channels * 2 if rs == 42 else self.out_channels,
                                name=f"adj_{layer}_a", **kw)(f, train=train)
                f = resize_bilinear(f, ts, ts)
                f = ConvNormAct(self.out_channels, name=f"adj_{layer}_b", **kw)(f, train=train)
            else:
                f = resize_bilinear(f, ts, ts)
                f = ConvNormAct(self.out_channels, name=f"adj_{layer}_up", **kw)(f, train=train)
            adjusted.append(f)

        w = self.param("fusion_weights", nn.initializers.ones, (len(adjusted),))
        w = jax.nn.softmax(w)
        fused = sum(wi * f for wi, f in zip(w, adjusted))
        fused = ConvNormAct(self.out_channels, name="fusion_conv", **kw)(fused, train=train)
        return ResidualBlock(self.out_channels, name="fusion_res", **kw)(fused, train=train)


class LightweightRGBEncoder(nn.Module):
    """Small RGB encoder enhancing a feature layer with appearance cues
    (variable_roi_model.py:380-470)."""

    out_channels: int = 64
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, patches: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        x = ConvNormAct(32, name="c0", **kw)(patches, train=train)
        x = ConvNormAct(self.out_channels, name="c1", **kw)(x, train=train)
        return ResidualBlock(self.out_channels, name="res", **kw)(x, train=train)


class VariableROISegmentationModel(nn.Module):
    """Variable per-layer ROI sizes -> hierarchical fusion -> V2 head
    (variable_roi_model.py:200-647), with optional RGB enhancement of the
    configured layers (RGBEnhancedVariableROISegmentationHead)."""

    roi_sizes: Dict[str, int]  # e.g. {layer_3: 56, layer_22: 42, layer_34: 28}
    mask_size: Tuple[int, int] = (56, 56)
    mid_channels: int = 256
    use_rgb_enhancement: bool = False
    rgb_enhanced_layers: Tuple[str, ...] = ("layer_34",)
    use_attention_module: bool = False
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, images: jnp.ndarray, rois: jnp.ndarray, train: bool = False,
                 features: Optional[Dict[str, jnp.ndarray]] = None):
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        layers = tuple(sorted(self.roi_sizes.keys()))
        if features is None:
            features = ConvFeaturePyramid(layers=layers, name="pyramid", **kw)(
                images, train=train)

        roi_feats = {}
        for layer in layers:
            rs = self.roi_sizes[layer]
            feat = features[layer]
            h, w = feat.shape[1:3]
            roi_feats[layer] = roi_align(feat, rois, rs, rs,
                                         spatial_scale=(float(h), float(w)), aligned=True)

        if self.use_rgb_enhancement:
            for layer in self.rgb_enhanced_layers:
                if layer not in roi_feats:
                    continue
                rs = self.roi_sizes[layer]
                ih, iw = images.shape[1:3]
                patches = roi_align(images, rois, rs, rs,
                                    spatial_scale=(float(ih), float(iw)), aligned=True)
                rgb = LightweightRGBEncoder(name=f"rgb_enc_{layer}", **kw)(patches, train=train)
                enhanced = jnp.concatenate([roi_feats[layer], rgb], axis=-1)
                roi_feats[layer] = ConvNormAct(
                    roi_feats[layer].shape[-1], kernel=1, name=f"rgb_fuse_{layer}", **kw
                )(enhanced, train=train)

        fused = HierarchicalFeatureFusion(
            roi_sizes=dict(self.roi_sizes), out_channels=self.mid_channels,
            name="fusion", **kw)(roi_feats, train=train)
        logits, aux = HierarchicalHeadV2(
            mid_channels=self.mid_channels, mask_size=self.mask_size,
            use_attention_module=self.use_attention_module, name="head", **kw
        )(fused, train=train)
        aux["roi_features"] = fused
        return logits, aux
