"""Loss registry: segmentation, hierarchical, refinement, distance, KD."""

from .segmentation import (
    cross_entropy,
    dice_loss,
    focal_loss,
    segmentation_loss,
    class_weights_from_pixel_ratios,
)
from .hierarchical import (
    HierarchicalLossState,
    HierarchicalLossConfig,
    RefinedLossConfig,
    hierarchical_loss,
    refined_hierarchical_loss,
    active_contour_loss,
    boundary_aware_loss,
    generate_contour_targets,
    generate_distance_targets,
)
from .distillation import (
    DistillationState,
    DistillationConfig,
    scheduled_temperature,
    update_adaptive_weights,
    unet_distillation_loss,
    hierarchical_distillation_loss,
    binary_dice_loss,
    feature_matching_loss,
    yolo_distillation_loss,
)
from .distance_aware import (
    DistanceAwareLossConfig,
    distance_aware_loss,
    boundary_distance_weights,
    instance_separation_weights,
    approximate_distance_transform,
)

__all__ = [
    "cross_entropy", "dice_loss", "focal_loss", "segmentation_loss",
    "class_weights_from_pixel_ratios",
    "HierarchicalLossState", "HierarchicalLossConfig", "RefinedLossConfig",
    "hierarchical_loss", "refined_hierarchical_loss",
    "active_contour_loss", "boundary_aware_loss",
    "generate_contour_targets", "generate_distance_targets",
    "DistillationState", "DistillationConfig", "scheduled_temperature",
    "update_adaptive_weights", "unet_distillation_loss",
    "hierarchical_distillation_loss", "binary_dice_loss",
    "feature_matching_loss", "yolo_distillation_loss",
    "DistanceAwareLossConfig", "distance_aware_loss",
    "boundary_distance_weights", "instance_separation_weights",
    "approximate_distance_transform",
]
