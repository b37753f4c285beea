"""Core TPU-native ops: separable bilinear sampling, RoIAlign, resize, morphology."""

from .sampling import (
    bilinear_weight_matrix,
    roi_align,
    resize_bilinear,
    upsample_2x_bilinear,
    grid_sample_positions,
)
from .morphology import max_pool2d, dilate, erode
from .activations import get_activation
from .norms import get_normalization
from .pallas_kernels import bilateral_filter_pallas, edge_smooth_pallas
from .pallas_roi_align import roi_align_pallas

__all__ = [
    "bilinear_weight_matrix",
    "roi_align",
    "resize_bilinear",
    "upsample_2x_bilinear",
    "grid_sample_positions",
    "max_pool2d",
    "dilate",
    "erode",
    "get_activation",
    "get_normalization",
    "bilateral_filter_pallas",
    "edge_smooth_pallas",
    "roi_align_pallas",
]
