"""Model zoo: encoders, UNets, hierarchical heads, assemblies, post-processing."""

from .efficientnet import EfficientNetEncoder, encoder_feature_channels
from .unet import PeopleSegmentationUNet, PeopleSegUNetWrapper
from .heads import (
    EnhancedUNet,
    ShallowUNet,
    HierarchicalHeadV2,
    RefinedHierarchicalHead,
    PretrainedUNetGuidedHead,
)
from .assembly import (
    HierarchicalInstanceSegmenter,
    PureRGBHierarchicalModel,
    MultiScaleRGBHierarchicalModel,
    RGBFeatureExtractor,
    RGBPatchFeatureExtractor,
)
from . import postprocess

__all__ = [
    "EfficientNetEncoder",
    "encoder_feature_channels",
    "PeopleSegmentationUNet",
    "PeopleSegUNetWrapper",
    "EnhancedUNet",
    "ShallowUNet",
    "HierarchicalHeadV2",
    "RefinedHierarchicalHead",
    "PretrainedUNetGuidedHead",
    "HierarchicalInstanceSegmenter",
    "PureRGBHierarchicalModel",
    "MultiScaleRGBHierarchicalModel",
    "RGBFeatureExtractor",
    "RGBPatchFeatureExtractor",
    "postprocess",
]
