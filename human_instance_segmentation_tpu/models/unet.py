"""Full-image binary people-segmentation UNet (stage 1 of the pipeline).

TPU-native equivalent of the reference's frozen smp.Unet with
timm-EfficientNet encoder (`PreTrainedPeopleSegmentationUNet`,
/root/reference/src/human_edge_detection/advanced/hierarchical_segmentation_unet.py:1708-1916)
and its 1ch->2ch fixed-conv wrapper
(`PreTrainedPeopleSegmentationUNetWrapper`, same file :1919-1993).

Decoder follows the smp UnetDecoder recipe: five 2x-upsample stages with
skip concatenation and (conv3x3-BN-ReLU)x2 blocks, decoder channels
(256, 128, 64, 32, 16), then a 3x3 segmentation head to `classes` logits.
All NHWC; upsampling is the shared separable-matmul bilinear resize so the
whole stage compiles to one fused XLA program.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sampling import resize_bilinear
from .efficientnet import EfficientNetEncoder


class DecoderBlock(nn.Module):
    """2x upsample -> concat skip -> (conv-BN-ReLU) x 2."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray | None, train: bool = False) -> jnp.ndarray:
        b, h, w, _ = x.shape
        x = resize_bilinear(x, h * 2, w * 2)
        if skip is not None:
            # Guard odd input sizes: match the skip's spatial extent.
            if x.shape[1:3] != skip.shape[1:3]:
                x = resize_bilinear(x, skip.shape[1], skip.shape[2])
            x = jnp.concatenate([x, skip], axis=-1)
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"bn{i}")(x)
            x = jax.nn.relu(x)
        return x


class PeopleSegmentationUNet(nn.Module):
    """EfficientNet-UNet producing single-channel person/background logits.

    ``apply(params, images)`` -> logits (B, H, W, 1); images in [0, 1] are
    normalised inside the model (ImageNet mean/std by default, matching the
    reference's auto-detected normalisation for distilled checkpoints,
    hierarchical_segmentation_unet.py:1754-1792).
    """

    encoder_variant: str = "b0"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    classes: int = 1
    normalize_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    normalize_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mean = jnp.asarray(self.normalize_mean, images.dtype)
        std = jnp.asarray(self.normalize_std, images.dtype)
        x = (images - mean) / std

        feats = EfficientNetEncoder(
            variant=self.encoder_variant, drop_path_rate=self.drop_path_rate, name="encoder"
        )(x, train=train)
        # feats: (s2, s4, s8, s16, s32)
        skips = list(feats[:-1])[::-1]  # s16, s8, s4, s2
        h = feats[-1]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            h = DecoderBlock(features=ch, name=f"decoder{i}")(h, skip, train=train)
        return nn.Conv(self.classes, (3, 3), padding=1, name="seg_head")(h)


class PeopleSegUNetWrapper(nn.Module):
    """1ch -> 2ch fixed linear map: [+x, -x] (wrapper :1961-1971).

    Channel 0 carries the person/foreground logit (x > 0 == person), channel 1
    its negation; ``softmax(...)[..., 0] == sigmoid(2x)`` is the deployed
    ``binary_masks`` output (export_onnx_advanced.py:386-387).
    The 1x1 conv is a real parameter (initialised to [[+1], [-1]], bias 0) so
    checkpoints that perturbed it stay loadable, mirroring the reference's
    post-load repair of output_conv (train_advanced.py:1204-1246).
    """

    @nn.compact
    def __call__(self, x1: jnp.ndarray) -> jnp.ndarray:
        def winit(key, shape, dtype=jnp.float32):
            del key
            return jnp.array([[[[1.0, -1.0]]]], dtype=dtype).reshape(shape)

        return nn.Conv(2, (1, 1), kernel_init=winit, bias_init=nn.initializers.zeros, name="output_conv")(x1)
