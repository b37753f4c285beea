"""Student UNet with a projected stride-8 encoder feature for YOLO-feature
distillation.

TPU-native rebuild of ``UNetWithYOLOFeatureDistillation``
(/root/reference/src/human_edge_detection/advanced/unet_yolo_feature_distillation.py:17-129):
the student is the standard people-seg UNet, plus a projection head
(1x1 -> hidden 768 -> BN -> ReLU -> 1x1 -> 1024) on the stride-8 encoder
feature (the reference's encoder index 3: 40ch at 80x80 for 640^2 B0) that
maps it into the space of the YOLOv9 layer_34 feature (1024ch, stride 8 —
FEATURE_SPECS in models/multiscale.py).

Submodule names match ``PeopleSegmentationUNet`` exactly (encoder,
decoder{i}, seg_head), so a distilled student's params minus the
``feature_projector`` subtree load straight into the deployment model.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .efficientnet import EfficientNetEncoder
from .unet import DecoderBlock


class YOLOFeatureDistillStudent(nn.Module):
    encoder_variant: str = "b0"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    classes: int = 1
    projection_hidden_dim: Optional[int] = 768
    yolo_feature_dim: int = 1024
    normalize_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    normalize_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 return_features: bool = False):
        mean = jnp.asarray(self.normalize_mean, images.dtype)
        std = jnp.asarray(self.normalize_std, images.dtype)
        x = (images - mean) / std

        feats = EfficientNetEncoder(variant=self.encoder_variant, name="encoder")(x, train=train)

        projected = None
        if return_features:
            f8 = feats[2]  # stride-8 feature (reference feature_index=3 in smp terms)
            if self.projection_hidden_dim:
                h = nn.Conv(self.projection_hidden_dim, (1, 1), name="proj_conv0")(f8)
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="proj_bn")(h)
                h = jax.nn.relu(h)
            else:
                h = f8
            projected = nn.Conv(self.yolo_feature_dim, (1, 1), name="proj_conv1")(h)

        skips = list(feats[:-1])[::-1]
        h = feats[-1]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            h = DecoderBlock(features=ch, name=f"decoder{i}")(h, skip, train=train)
        logits = nn.Conv(self.classes, (3, 3), padding=1, name="seg_head")(h)

        if return_features:
            return logits, projected
        return logits


def strip_projector(variables):
    """Drop the feature_projector params/stats so the trained student loads
    into PeopleSegmentationUNet (the projector is train-time only,
    unet_yolo_feature_distillation.py:92-117)."""
    import flax

    out = flax.core.unfreeze(variables) if hasattr(flax.core, "unfreeze") else dict(variables)

    def clean(tree):
        return {k: v for k, v in tree.items()
                if not k.startswith("proj_")}

    result = {}
    for col, tree in out.items():
        result[col] = clean(tree)
    return result
