"""Model zoo: encoders, UNets, hierarchical heads, assemblies, post-processing."""

from .efficientnet import EfficientNetEncoder, encoder_feature_channels
from .unet import PeopleSegmentationUNet, PeopleSegUNetWrapper
from .heads import (
    EnhancedUNet,
    ShallowUNet,
    HierarchicalHeadV1,
    HierarchicalHeadV2,
    HierarchicalHeadV3,
    HierarchicalHeadV4,
    RefinedHierarchicalHead,
    PretrainedUNetGuidedHead,
)
from .baseline import ROISegmentationHead, ROISegmentationModel
from .multiscale import (
    FEATURE_SPECS,
    FeaturePyramidFusion,
    ConvFeaturePyramid,
    MultiScaleRoIAlign,
    MultiScaleFeatureFusion,
    MultiScaleSegmentationModel,
    VariableROISegmentationModel,
    HierarchicalFeatureFusion,
    LightweightRGBEncoder,
)
from .extras import (
    CascadeSegmentationHead,
    ClassSpecificDecoder,
    AuxiliaryFgBgHead,
    cascade_loss,
    multi_task_loss,
)
from .assembly import (
    HierarchicalInstanceSegmenter,
    ROIPretrainedHierarchicalModel,
    PureRGBHierarchicalModel,
    MultiScaleRGBHierarchicalModel,
    RGBFeatureExtractor,
    RGBPatchFeatureExtractor,
)
from .yolo_distill import YOLOFeatureDistillStudent, strip_projector
from . import postprocess

__all__ = [
    "EfficientNetEncoder",
    "encoder_feature_channels",
    "PeopleSegmentationUNet",
    "PeopleSegUNetWrapper",
    "EnhancedUNet",
    "ShallowUNet",
    "HierarchicalHeadV1",
    "HierarchicalHeadV2",
    "HierarchicalHeadV3",
    "HierarchicalHeadV4",
    "RefinedHierarchicalHead",
    "PretrainedUNetGuidedHead",
    "ROISegmentationHead",
    "ROISegmentationModel",
    "FEATURE_SPECS",
    "ConvFeaturePyramid",
    "FeaturePyramidFusion",
    "MultiScaleRoIAlign",
    "MultiScaleFeatureFusion",
    "MultiScaleSegmentationModel",
    "VariableROISegmentationModel",
    "HierarchicalFeatureFusion",
    "LightweightRGBEncoder",
    "CascadeSegmentationHead",
    "ClassSpecificDecoder",
    "AuxiliaryFgBgHead",
    "cascade_loss",
    "multi_task_loss",
    "HierarchicalInstanceSegmenter",
    "ROIPretrainedHierarchicalModel",
    "PureRGBHierarchicalModel",
    "MultiScaleRGBHierarchicalModel",
    "RGBFeatureExtractor",
    "RGBPatchFeatureExtractor",
    "YOLOFeatureDistillStudent",
    "strip_projector",
    "postprocess",
]
