"""Model assemblies: full pipelines from images+rois to hierarchical masks.

Flagship: ``HierarchicalInstanceSegmenter`` — the TPU-native re-design of
``HierarchicalRGBSegmentationModelWithFullImagePretrainedUNet``
(/root/reference/src/human_edge_detection/advanced/hierarchical_segmentation_rgb.py:564-774):

    stage 1: full-image people-seg UNet (EfficientNet encoder) -> 2ch logits
    stage 2: per ROI — separable-matmul RoIAlign crops of both the logit map
             and the RGB image -> RGB feature stack -> hierarchical head

The whole forward is one jittable function of (params, images, rois);
ROI count is static per bucket (padding handled by the caller), so XLA fuses
stage 2 across all ROIs with no host sync.

Also here: the pure-RGB model (no pretrained stage,
hierarchical_segmentation_rgb.py:298-439) and the multi-scale RGB variant
(:777-922).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import get_activation
from ..ops.quant import QConv
from ..ops.s2d import n4_to_plain
from ..ops.sampling import (resize_bilinear, roi_align, roi_align_dense,
                            roi_align_n4)
from .blocks import ConvNormAct, ResidualBlock
from .heads import HierarchicalHeadV2, PretrainedUNetGuidedHead, RefinedHierarchicalHead
from .unet import PeopleSegUNetWrapper, PeopleSegmentationUNet


class RGBPatchFeatureExtractor(nn.Module):
    """Stride-1 conv stack over ROI RGB patches.

    Matches the flagship's inline extractor
    (hierarchical_segmentation_rgb.py:657-673): 3->64->128->256 with a
    residual block after each conv, then a 1x1 projection to feature_dim.
    """

    feature_dim: int = 256
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from .blocks import prequantize_for

        kw = dict(norm=self.norm, activation=self.activation, activation_beta=self.activation_beta)
        for i, ch in enumerate((64, 128, 256)):
            if i > 0:  # res{i-1} output is single-use: flow int8 (serving)
                x = prequantize_for(self, f"conv{i}/conv", x)
            x = ConvNormAct(ch, norm_groups=min(self.norm_groups, ch), name=f"conv{i}", **kw)(x, train=train)
            x = ResidualBlock(ch, norm_groups=min(self.norm_groups, ch), name=f"res{i}", **kw)(x, train=train)
        x = prequantize_for(self, "proj/conv", x, k=1)
        return ConvNormAct(
            self.feature_dim, kernel=1, norm_groups=min(self.norm_groups, self.feature_dim), name="proj", **kw
        )(x, train=train)


class RGBFeatureExtractor(nn.Module):
    """Standalone N-layer extractor (hierarchical_segmentation_rgb.py:221-295):
    3->64->128->192->out, stride 1, residual blocks from layer 2 on."""

    out_channels: int = 256
    num_layers: int = 4
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, activation=self.activation, activation_beta=self.activation_beta)
        channels = [64, 128, 192, self.out_channels][: self.num_layers]
        for i, ch in enumerate(channels):
            x = ConvNormAct(ch, norm_groups=min(self.norm_groups, ch), name=f"conv{i}", **kw)(x, train=train)
            if i >= 1:
                x = ResidualBlock(ch, norm_groups=min(self.norm_groups, ch), name=f"res{i}", **kw)(x, train=train)
        return x


class HierarchicalInstanceSegmenter(nn.Module):
    """Flagship two-stage model.

    ``__call__(images (B,H,W,3) in [0,1], rois (N,5)) ->
    (logits (N, mh, mw, 3), aux)`` where rois rows are
    [batch_idx, x1, y1, x2, y2] normalised to [0, 1].
    """

    encoder_variant: str = "b0"
    roi_size: Tuple[int, int] = (64, 48)     # (h, w)
    mask_size: Tuple[int, int] = (128, 96)   # (h, w)
    image_size: Tuple[int, int] = (480, 640)  # (h, w) — spatial scale for RoIAlign
    feature_dim: int = 256
    mid_channels: int = 256
    use_attention_module: bool = False
    use_contour_detection: bool = True
    use_distance_transform: bool = True
    use_boundary_refinement: bool = False
    use_progressive_upsampling: bool = False
    use_subpixel_conv: bool = False
    use_guided_head: bool = False  # True -> PretrainedUNetGuidedHead instead
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0
    base_channels: int = 96
    depth: int = 3
    freeze_pretrained: bool = True
    unet_decoder_channels: Tuple[int, ...] = (256, 128, 64, 32, 16)
    # Serving: run the last N stage-1 decoder stages in space-to-depth form
    # (exact math, see ops/s2d.py) — the flagship's dominant cost otherwise.
    fused_tail: int = 0
    # Serving: first N encoder MBConv blocks via the fused Pallas kernel.
    encoder_fused_blocks: int = 0
    # Serving: last stage-1 decoder stage + seg head as one Pallas kernel
    # (ops/pallas_tail.py); stage-1 logits then flow DENSE rank-3.
    pallas_tail: bool = False
    # Serving: encoder stem/stage-0/stage-1-entry in S2D(2) composed form.
    encoder_s2d_front: bool = False
    # Serving: chain consecutive fused skip-free decoder stages in nested
    # S2D form (ops/s2d.py::conv_up_s2d_nested) — measurable A/B switch.
    nested_tail: bool = False
    # Serving: last stage-1 decoder stage + seg head entirely in N4 phase
    # form (ops/s2d.py::conv3x3_n4) — no depth_to_space, no regroup.
    n4_tail: bool = False
    # Stage-1 decoder upsample stencil: "bilinear" (repo-trained weights) or
    # "nearest" (smp parity for converted reference checkpoints).
    stage1_upsample_mode: str = "bilinear"
    # Serving: RGB ROI crop through the Pallas bilinear-gather kernel
    # (ops/pallas_roi_align.py — 4x the separable-matmul path standalone at
    # deployment shapes, 0.17 vs 0.68 ms). The crop is ~1% of the deployed
    # batch, so this is measured opt-in via the serving matrix.
    pallas_roi_align: bool = False

    def setup(self):
        self.pretrained_unet = PeopleSegmentationUNet(
            encoder_variant=self.encoder_variant,
            decoder_channels=self.unet_decoder_channels,
            fused_tail=self.fused_tail,
            encoder_fused_blocks=self.encoder_fused_blocks,
            pallas_tail=self.pallas_tail,
            encoder_s2d_front=self.encoder_s2d_front,
            nested_tail=self.nested_tail,
            n4_tail=self.n4_tail,
            upsample_mode=self.stage1_upsample_mode,
            name="pretrained_unet")
        self.unet_wrapper = PeopleSegUNetWrapper(name="unet_wrapper")
        self.rgb_extractor = RGBPatchFeatureExtractor(
            feature_dim=self.feature_dim, norm=self.norm, norm_groups=self.norm_groups,
            activation=self.activation, activation_beta=self.activation_beta, name="rgb_extractor",
        )
        use_refinement = any([
            self.use_boundary_refinement, self.use_progressive_upsampling,
            self.use_subpixel_conv, self.use_contour_detection, self.use_distance_transform,
        ]) and not self.use_guided_head
        self.use_refinement = use_refinement
        head_kw = dict(
            mid_channels=self.mid_channels, mask_size=self.mask_size,
            use_attention_module=self.use_attention_module,
            norm=self.norm, norm_groups=self.norm_groups,
            activation=self.activation, activation_beta=self.activation_beta,
        )
        if use_refinement:
            self.feature_combiner = QConv(self.feature_dim, (1, 1), name="feature_combiner")
            self.head = RefinedHierarchicalHead(
                use_boundary_refinement=self.use_boundary_refinement,
                use_progressive_upsampling=self.use_progressive_upsampling,
                use_subpixel_conv=self.use_subpixel_conv,
                use_contour_detection=self.use_contour_detection,
                use_distance_transform=self.use_distance_transform,
                base_channels=self.base_channels, depth=self.depth,
                name="head", **head_kw,
            )
        else:
            self.head = PretrainedUNetGuidedHead(name="head", **head_kw)

    def stage1(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Full-image 2-channel person logits ([fg, bg] = [+x, -x])."""
        # The pretrained stage is frozen in the flagship configs
        # (train_advanced.py build path); stop_gradient keeps XLA free to
        # skip the backward graph entirely.
        x1 = self.pretrained_unet(images, train=False if self.freeze_pretrained else train)
        logits2 = self.unet_wrapper(x1)
        if self.freeze_pretrained:
            logits2 = jax.lax.stop_gradient(logits2)
        return logits2

    def __call__(
        self,
        images: jnp.ndarray,
        rois: jnp.ndarray,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        ih, iw = self.image_size
        rh, rw = self.roi_size
        assert images.shape[1] == ih and images.shape[2] == iw, (
            f"model compiled for {self.image_size}, got {images.shape[1:3]}")

        scale = (float(ih), float(iw))
        form, x1 = self.pretrained_unet(
            images, train=False if self.freeze_pretrained else train, raw=True)
        if self.freeze_pretrained:
            x1 = jax.lax.stop_gradient(x1)

        aux_extra: Dict[str, jnp.ndarray] = {}

        def person_prob(x):
            # softmax(wrapper(x), -1)[..., 0] == sigmoid((w0-w1)x + (b0-b1))
            # for the 1->2 channel 1x1 wrapper; the weights come from a
            # 2-point probe so the identity holds for ANY trained wrapper.
            # This keeps the full-res probability map a pure elementwise
            # function of the phase-form logits — no reshape/conv pass.
            probe = self.unet_wrapper(
                jnp.asarray([0.0, 1.0], x.dtype).reshape(2, 1, 1, 1))
            bias = probe[0, 0, 0]
            wvec = probe[1, 0, 0] - bias
            return jax.nn.sigmoid(x * (wvec[0] - wvec[1])
                                  + (bias[0] - bias[1]))

        if form == "n4":
            # Nested-S2D(4) serving path: the stage-1 logit map stays in its
            # (B, H/4, W/4, 16) phase form end to end. RoIAlign is linear, so
            # the 1ch crop + the wrapper's 1x1 conv commute with sampling —
            # the full-res 1-2 channel tensors (8-32x lane-padded on TPU) are
            # never materialised unless a consumer asks for
            # aux["full_image_logits"] (then XLA materialises it for that
            # consumer only; in the deployed graph it is dead code).
            b, hg, wg, _ = x1.shape
            x2_n4 = self.unet_wrapper(x1.reshape(b, hg, wg * 16, 1)).reshape(b, hg, wg, 16, 2)
            roi1 = roi_align_n4(x1, rois, rh, rw, spatial_scale=scale, aligned=True)
            roi_bg_fg = self.unet_wrapper(roi1)
            if self.freeze_pretrained:
                x2_n4 = jax.lax.stop_gradient(x2_n4)
                roi_bg_fg = jax.lax.stop_gradient(roi_bg_fg)
            full_image_logits = n4_to_plain(x2_n4.reshape(b, hg, wg, 32), 2)
            aux_extra["person_prob_n4"] = person_prob(x1)
        elif form == "dense":
            # Pallas fused-tail serving: x1 is the rank-3 (B, H, W) person
            # logit map — dense 128-lane layout, no channel padding. The
            # wrapper (1x1 conv) and softmax are elementwise maps XLA fuses;
            # the lane-padded (B, H, W, 2) tensor only materialises for
            # consumers that ask for aux["full_image_logits"].
            roi_bg_fg = self.unet_wrapper(
                roi_align_dense(x1, rois, rh, rw, spatial_scale=scale, aligned=True))
            o2 = self.unet_wrapper(x1[..., None])
            if self.freeze_pretrained:
                roi_bg_fg = jax.lax.stop_gradient(roi_bg_fg)
                o2 = jax.lax.stop_gradient(o2)
            full_image_logits = o2
            aux_extra["person_prob_dense"] = person_prob(x1)
        else:
            full_image_logits = self.unet_wrapper(x1)
            if self.freeze_pretrained:
                full_image_logits = jax.lax.stop_gradient(full_image_logits)
            roi_bg_fg = roi_align(full_image_logits, rois, rh, rw, spatial_scale=scale, aligned=True)
        if self.pallas_roi_align and not train:
            from ..ops.pallas_roi_align import roi_align_pallas

            roi_rgb = roi_align_pallas(
                images, rois, rh, rw, spatial_scale=scale, aligned=True,
                interpret=jax.default_backend() == "cpu")
        else:
            roi_rgb = roi_align(images, rois, rh, rw, spatial_scale=scale, aligned=True)

        rgb_features = self.rgb_extractor(roi_rgb, train=train)

        if self.use_refinement:
            combined = jnp.concatenate([rgb_features, roi_bg_fg], axis=-1)
            combined = self.feature_combiner(combined)
            logits, aux = self.head(combined, train=train)
        else:
            logits, aux = self.head(rgb_features, roi_bg_fg, train=train)

        aux["full_image_logits"] = full_image_logits
        aux.update(aux_extra)
        aux["roi_bg_fg"] = roi_bg_fg
        aux["roi_patches"] = roi_rgb
        return logits, aux


class ROIPretrainedHierarchicalModel(nn.Module):
    """ROI-cropped pretrained-UNet model
    (``HierarchicalRGBSegmentationModelWithPretrainedUNet``,
    hierarchical_segmentation_rgb.py:442-561).

    Unlike the flagship, the pretrained people-seg UNet runs on each *ROI
    crop* (not the full image): RoIAlign RGB patch -> frozen/unfrozen UNet
    -> 2ch bg/fg logits -> feature processor (2->64->128->256 with residual
    blocks) -> HierarchicalHeadV2.
    """

    encoder_variant: str = "b3"
    roi_size: Tuple[int, int] = (64, 48)
    mask_size: Tuple[int, int] = (64, 48)
    image_size: Tuple[int, int] = (640, 640)
    feature_dim: int = 256
    use_attention_module: bool = False
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0
    freeze_pretrained: bool = False
    unet_decoder_channels: Tuple[int, ...] = (256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, images, rois, train: bool = False):
        ih, iw = self.image_size
        rh, rw = self.roi_size
        patches = roi_align(images, rois, rh, rw,
                            spatial_scale=(float(ih), float(iw)), aligned=True)

        unet = PeopleSegmentationUNet(
            encoder_variant=self.encoder_variant,
            decoder_channels=self.unet_decoder_channels, name="pretrained_unet")
        x1 = unet(patches, train=False if self.freeze_pretrained else train)
        bg_fg_logits = PeopleSegUNetWrapper(name="unet_wrapper")(x1)
        if self.freeze_pretrained:
            bg_fg_logits = jax.lax.stop_gradient(bg_fg_logits)

        # feature processor (rgb.py:504-521): 2->64 (+res) ->128 (+res) ->256
        kw = dict(norm=self.norm, activation=self.activation,
                  activation_beta=self.activation_beta)
        x = bg_fg_logits
        for i, ch in enumerate((64, 128)):
            x = ConvNormAct(ch, norm_groups=min(self.norm_groups, ch),
                            name=f"proc_conv{i}", **kw)(x, train=train)
            x = ResidualBlock(ch, norm_groups=min(self.norm_groups, ch),
                              name=f"proc_res{i}", **kw)(x, train=train)
        feats = ConvNormAct(self.feature_dim,
                            norm_groups=min(self.norm_groups, self.feature_dim),
                            name="proc_out", **kw)(x, train=train)

        logits, aux = HierarchicalHeadV2(
            mid_channels=256, mask_size=self.mask_size,
            use_attention_module=self.use_attention_module,
            norm=self.norm, norm_groups=self.norm_groups,
            activation=self.activation, activation_beta=self.activation_beta,
            name="head",
        )(feats, train=train)
        aux["pretrained_bg_fg_logits"] = bg_fg_logits
        aux["roi_patches"] = patches
        return logits, aux


class PureRGBHierarchicalModel(nn.Module):
    """RGB-only hierarchical model (no pretrained stage)
    (hierarchical_segmentation_rgb.py:298-439)."""

    roi_size: Tuple[int, int] = (28, 28)
    mask_size: Tuple[int, int] = (56, 56)
    image_size: Tuple[int, int] = (640, 640)
    feature_dim: int = 256
    use_attention_module: bool = False
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, images, rois, train: bool = False):
        ih, iw = self.image_size
        rh, rw = self.roi_size
        patches = roi_align(images, rois, rh, rw, spatial_scale=(float(ih), float(iw)), aligned=False)
        feats = RGBFeatureExtractor(
            out_channels=self.feature_dim, norm=self.norm, norm_groups=self.norm_groups,
            activation=self.activation, activation_beta=self.activation_beta, name="rgb_extractor",
        )(patches, train=train)
        logits, aux = HierarchicalHeadV2(
            mid_channels=256, mask_size=self.mask_size,
            use_attention_module=self.use_attention_module,
            norm=self.norm, norm_groups=self.norm_groups,
            activation=self.activation, activation_beta=self.activation_beta, name="head",
        )(feats, train=train)
        aux["roi_patches"] = patches
        return logits, aux


class MultiScaleRGBHierarchicalModel(nn.Module):
    """Three-scale RGB crops fused before the hierarchical head
    (hierarchical_segmentation_rgb.py:777-922)."""

    roi_sizes: Tuple[int, ...] = (56, 42, 28)
    mask_size: Tuple[int, int] = (56, 56)
    image_size: Tuple[int, int] = (640, 640)
    feature_dim: int = 256
    fusion_method: str = "concat"  # concat | sum | adaptive
    use_attention_module: bool = False
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, images, rois, train: bool = False):
        ih, iw = self.image_size
        scale_feats = []
        patches0 = None
        for i, rs in enumerate(self.roi_sizes):
            patches = roi_align(images, rois, rs, rs, spatial_scale=(float(ih), float(iw)), aligned=False)
            if i == 0:
                patches0 = patches
            f = RGBFeatureExtractor(
                out_channels=self.feature_dim, norm=self.norm, norm_groups=self.norm_groups,
                activation=self.activation, activation_beta=self.activation_beta, name=f"rgb_extractor{i}",
            )(patches, train=train)
            if f.shape[1:3] != (28, 28):
                f = resize_bilinear(f, 28, 28)
            scale_feats.append(f)

        if self.fusion_method == "concat":
            fused = jnp.concatenate(scale_feats, axis=-1)
        elif self.fusion_method == "sum":
            fused = sum(scale_feats)
        elif self.fusion_method == "adaptive":
            w = self.param("fusion_weights", nn.initializers.ones, (len(scale_feats),))
            w = jax.nn.softmax(w)
            fused = sum(wi * f for wi, f in zip(w, scale_feats))
        else:
            raise ValueError(f"unknown fusion method {self.fusion_method}")

        fused = ConvNormAct(
            self.feature_dim, kernel=1, norm=self.norm,
            norm_groups=min(self.norm_groups, self.feature_dim),
            activation=self.activation, activation_beta=self.activation_beta, name="fusion_proj",
        )(fused, train=train)

        logits, aux = HierarchicalHeadV2(
            mid_channels=256, mask_size=self.mask_size,
            use_attention_module=self.use_attention_module,
            norm=self.norm, norm_groups=self.norm_groups,
            activation=self.activation, activation_beta=self.activation_beta, name="head",
        )(fused, train=train)
        aux["roi_patches"] = patches0
        return logits, aux
