"""Fused post-processing epilogues: dilation, edge smoothing, bilateral.

The reference ships these as *separate exported ONNX graphs*
(/root/reference/export_edge_smoothing_onnx.py, export_bilateral_filter.py)
plus a deploy-time dilation wrapper
(export_hierarchical_instance_peopleseg_onnx.py:85-141). Here they are pure
jittable functions composed into the inference graph as in-graph epilogues,
so XLA fuses them with the head's final convs — no extra launches, no
host round-trips.

TPU-first notes:
- the reference's naive bilateral filter is a per-pixel Python double loop
  (bilateral_filter.py:80-111, O(HW) graph nodes!); here it is k^2 shifted
  whole-image fused multiply-adds on the VPU.
- morphology is `lax.reduce_window` (see ops/morphology.py).
All tensors NHWC; channels are processed together (vectorised over C).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.morphology import dilate, erode, max_pool2d


@partial(jax.jit, static_argnames=("dilation_pixels",))
def mask_dilation_logit_boost(logits: jnp.ndarray, dilation_pixels: int = 1) -> jnp.ndarray:
    """Deploy-time mask dilation (MaskDilationModule semantics,
    export_hierarchical_instance_peopleseg_onnx.py:108-141).

    softmax -> dilate target-class probability by maxpool(2d+1) -> +2.0 logit
    boost wherever the dilated probability exceeds the original by > 0.1.

    Args:
      logits: (N, H, W, 3) hierarchical class logits.
    """
    if dilation_pixels <= 0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    target = probs[..., 1:2]
    dilated = dilate(target, dilation_pixels)
    boost = jnp.where(dilated - target > 0.1, 2.0, 0.0)
    return logits.at[..., 1:2].add(boost)


# numpy, not jnp: module-level jnp constants would initialise the JAX
# backend at import time (breaking CPU-platform forcing in dry runs).
import numpy as _np

_LAPLACIAN = _np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], _np.float32)
_GAUSS3 = _np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], _np.float32) / 16.0


def _depthwise_conv3x3(x: jnp.ndarray, kernel2d: jnp.ndarray) -> jnp.ndarray:
    """Same-padding depthwise 3x3 conv of an NHWC tensor with one shared 2D kernel."""
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel2d[:, :, None, None], (3, 3, 1, c)).astype(x.dtype)
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


@partial(jax.jit, static_argnames=("threshold", "blur_strength"))
def edge_smooth_binary_mask(mask: jnp.ndarray, threshold: float = 0.5, blur_strength: float = 3.0) -> jnp.ndarray:
    """Binary-mask edge smoothing (edge_smoothing.py:10-90).

    Laplacian edge map -> sigmoid edge weight -> blend 3x3 Gaussian blur at
    edges -> re-binarise.

    Args:
      mask: (B, H, W, C) binary mask in {0, 1} (float).
    """
    m = mask.astype(jnp.float32)
    edges = jnp.abs(_depthwise_conv3x3(m, _LAPLACIAN))
    edge_w = jax.nn.sigmoid(edges * blur_strength)
    blurred = _depthwise_conv3x3(m, _GAUSS3)
    smoothed = m * (1.0 - edge_w) + blurred * edge_w
    return (smoothed > threshold).astype(mask.dtype)


_SOBEL_X = _np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], _np.float32)
_SOBEL_Y = _np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], _np.float32)
_BLUR5_1D = _np.array([0.1, 0.2, 0.4, 0.2, 0.1], _np.float32)
_DIAG1 = _np.array([[0.1, 0, 0], [0, 0.8, 0], [0, 0, 0.1]], _np.float32)
_DIAG2 = _np.array([[0, 0, 0.1], [0, 0.8, 0], [0.1, 0, 0]], _np.float32)


def _depthwise(x: jnp.ndarray, kernel2d) -> jnp.ndarray:
    k2 = jnp.asarray(kernel2d, x.dtype)
    c = x.shape[-1]
    kh, kw = k2.shape
    k = jnp.broadcast_to(k2[:, :, None, None], (kh, kw, 1, c))
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


@jax.jit
def directional_edge_smooth(mask: jnp.ndarray) -> jnp.ndarray:
    """Direction-aware edge smoothing (DirectionalEdgeSmoothing,
    export_edge_smoothing_onnx.py:63-154): Sobel orientation -> blend of
    horizontal / vertical / diagonal blur kernels weighted by cos^2/sin^2 of
    the edge angle -> sigmoid(3*magnitude) blend -> re-binarise.

    mask: (B, H, W, C) binary float.
    """
    m = mask.astype(jnp.float32)
    ex = _depthwise(m, _SOBEL_X)
    ey = _depthwise(m, _SOBEL_Y)
    mag = jnp.sqrt(ex ** 2 + ey ** 2 + 1e-8)
    ang = jnp.arctan2(ey, ex)

    blur_h = _depthwise(m, _BLUR5_1D[None, :])
    blur_v = _depthwise(m, _BLUR5_1D[:, None])
    blur_d1 = _depthwise(m, _DIAG1)
    blur_d2 = _depthwise(m, _DIAG2)

    wh = jnp.cos(ang) ** 2
    wv = jnp.sin(ang) ** 2
    wd1 = jnp.cos(ang - jnp.pi / 4) ** 2 * 0.5
    wd2 = jnp.cos(ang + jnp.pi / 4) ** 2 * 0.5
    s = wh + wv + wd1 + wd2 + 1e-8
    blurred = (blur_h * wh + blur_v * wv + blur_d1 * wd1 + blur_d2 * wd2) / s

    ew = jax.nn.sigmoid(mag * 3.0)
    smoothed = m * (1.0 - ew) + blurred * ew
    return (smoothed > 0.5).astype(mask.dtype)


@jax.jit
def adaptive_edge_smooth(mask: jnp.ndarray, blur_strength: jnp.ndarray,
                         edge_sensitivity: jnp.ndarray,
                         final_threshold: jnp.ndarray) -> jnp.ndarray:
    """Per-sample parameterised smoothing (AdaptiveEdgeSmoothing,
    export_edge_smoothing_onnx.py:158-213): runtime blur_strength (1-5),
    edge_sensitivity (0.5-2), final_threshold (0.3-0.7), each (B,) or (B,1).

    mask: (B, H, W, C) binary float.
    """
    m = mask.astype(jnp.float32)
    b = m.shape[0]
    bs = blur_strength.reshape(b, 1, 1, 1).astype(jnp.float32)
    es = edge_sensitivity.reshape(b, 1, 1, 1).astype(jnp.float32)
    ft = final_threshold.reshape(b, 1, 1, 1).astype(jnp.float32)

    edges = jnp.abs(_depthwise(m, _LAPLACIAN))
    edge_mask = (edges > 0.5 * es).astype(jnp.float32)
    box5 = jnp.full((5, 5), 1.0 / 25.0, jnp.float32)
    smoothed_base = _depthwise(m, box5)
    blur_factor = bs / 3.0
    smoothed = m * (1.0 - blur_factor) + smoothed_base * blur_factor
    result = m * (1.0 - edge_mask) + smoothed * edge_mask
    return (result > ft).astype(mask.dtype)


_GAUSS5_1D = _np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], _np.float32)


@partial(jax.jit, static_argnames=("dtype",))
def optimized_edge_smooth(mask: jnp.ndarray, dtype: str = "bfloat16") -> jnp.ndarray:
    """Throughput variant (OptimizedEdgeSmoothing,
    export_edge_smoothing_onnx.py:216-318): separable 5-tap Gaussian,
    fused-multiply-add blend, and the fast sigmoid approximation
    clip((x+0.5)*0.5, 0, 1), computed in reduced precision (the reference's
    fp16 flag; bf16 is the TPU-native equivalent)."""
    cdt = jnp.dtype(dtype)
    m = mask.astype(cdt)
    edges = _depthwise(m, _LAPLACIAN)
    edge_abs_scaled = jnp.abs(edges) * jnp.asarray(3.0, cdt)
    blurred = _depthwise(_depthwise(m, _GAUSS5_1D[None, :]), _GAUSS5_1D[:, None])
    edge_w = jnp.clip((edge_abs_scaled + 0.5) * 0.5, 0.0, 1.0)
    smoothed = m * (1.0 - edge_w) + blurred * edge_w
    return (smoothed > 0.5).astype(mask.dtype)


@partial(jax.jit, static_argnames=("iterations", "variant"))
def multiclass_edge_smooth(logits: jnp.ndarray, iterations: int = 1,
                           variant: str = "basic") -> jnp.ndarray:
    """Smooth each argmax class plane and return per-class binary masks
    (MultiClassEdgeSmoothing, edge_smoothing.py:95-172).

    logits: (B, H, W, C) -> (B, H, W, C) smoothed {0,1} per-class masks.
    """
    c = logits.shape[-1]
    pred = jnp.argmax(logits, axis=-1)
    planes = jax.nn.one_hot(pred, c, dtype=logits.dtype)
    fn = {"basic": edge_smooth_binary_mask,
          "directional": directional_edge_smooth,
          "optimized": optimized_edge_smooth}[variant]
    for _ in range(iterations):
        planes = fn(planes)
    return planes


def _gaussian_kernel_1d(kernel_size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2
    k = jnp.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    return k / jnp.sum(k)


def _gaussian_kernel_2d(kernel_size: int, sigma: float, normalized: bool = True) -> jnp.ndarray:
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2
    d2 = coords[:, None] ** 2 + coords[None, :] ** 2
    k = jnp.exp(-d2 / (2.0 * sigma ** 2))
    return k / jnp.sum(k) if normalized else k


def _depthwise_conv2d(x: jnp.ndarray, kernel2d: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1]
    kh, kw = kernel2d.shape
    k = jnp.broadcast_to(kernel2d[:, :, None, None], (kh, kw, 1, c)).astype(x.dtype)
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


@partial(jax.jit, static_argnames=("kernel_size", "sigma_spatial", "sigma_range"))
def bilateral_filter(
    x: jnp.ndarray, kernel_size: int = 5, sigma_spatial: float = 1.0, sigma_range: float = 0.1
) -> jnp.ndarray:
    """Exact bilateral filter (BilateralFilter, bilateral_filter.py:9-113).

    The reference computes this with a per-pixel Python loop; here it is a
    sum over the k^2 window offsets, each a whole-image shifted fused
    multiply-add — same math, ~10^5x fewer graph nodes.

    Reflect padding matches the reference's F.pad(mode='reflect').
    """
    pad = kernel_size // 2
    spatial = _gaussian_kernel_2d(kernel_size, sigma_spatial, normalized=False)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    h, w = x.shape[1], x.shape[2]
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    for di in range(kernel_size):
        for dj in range(kernel_size):
            shifted = lax.dynamic_slice_in_dim(lax.dynamic_slice_in_dim(xp, di, h, 1), dj, w, 2)
            wgt = spatial[di, dj] * jnp.exp(-((shifted - x) ** 2) / (2.0 * sigma_range ** 2))
            num = num + wgt * shifted
            den = den + wgt
    return num / (den + 1e-8)


@partial(jax.jit, static_argnames=("kernel_size", "sigma_spatial", "sigma_range", "num_iterations"))
def fast_bilateral_filter(
    x: jnp.ndarray, kernel_size: int = 5, sigma_spatial: float = 1.0,
    sigma_range: float = 0.1, num_iterations: int = 2,
) -> jnp.ndarray:
    """Separable-Gaussian + variance-gated blend (FastBilateralFilter,
    bilateral_filter.py:116-216)."""
    k1 = _gaussian_kernel_1d(kernel_size, sigma_spatial)
    kh = k1[None, :]
    kv = k1[:, None]

    def body(_, c):
        filtered = _depthwise_conv2d(_depthwise_conv2d(c, kh), kv)
        sq = _depthwise_conv2d(_depthwise_conv2d(c ** 2, kh), kv)
        var = jnp.clip(sq - filtered ** 2, 0.0, None)
        ew = jnp.exp(-var / (2.0 * sigma_range ** 2))
        return ew * filtered + (1.0 - ew) * c

    return lax.fori_loop(0, num_iterations, body, x) if num_iterations > 1 else body(0, x)


@partial(jax.jit, static_argnames=("radius", "eps"))
def guided_filter(x: jnp.ndarray, guide: jnp.ndarray | None = None,
                  radius: int = 2, eps: float = 0.01) -> jnp.ndarray:
    """Edge-preserving guided filter (EdgePreservingFilter,
    bilateral_filter.py:219-296)."""
    if guide is None:
        guide = x
    k = 2 * radius + 1
    box = jnp.ones((k, k), jnp.float32) / (k * k)

    def bf(t):
        return _depthwise_conv2d(t, box)

    mean_x, mean_g = bf(x), bf(guide)
    cov = bf(x * guide) - mean_x * mean_g
    var = bf(guide * guide) - mean_g * mean_g
    a = cov / (var + eps)
    b = mean_x - a * mean_g
    return bf(a) * guide + bf(b)


@partial(jax.jit, static_argnames=("kernel_size", "sigma_spatial", "threshold", "num_iterations"))
def binary_mask_bilateral(
    x: jnp.ndarray, kernel_size: int = 7, sigma_spatial: float = 1.5,
    threshold: float = 0.5, num_iterations: int = 2,
) -> jnp.ndarray:
    """Iterative edge-aware smoothing + threshold for binary masks
    (BinaryMaskBilateralFilter, bilateral_filter.py:299-406)."""
    g = _gaussian_kernel_2d(kernel_size, sigma_spatial)
    m = jnp.clip(x, 0.0, 1.0)

    def body(_, m):
        filtered = _depthwise_conv2d(m, g)
        var = jnp.clip(_depthwise_conv2d(m ** 2, g) - filtered ** 2, 0.0, None)
        ew = jnp.exp(-var * 10.0)
        return ew * filtered + (1.0 - ew) * m

    m = lax.fori_loop(0, num_iterations, body, m)
    return (m > threshold).astype(x.dtype)


@partial(jax.jit, static_argnames=("kernel_size", "sigma", "morph_size"))
def morphological_bilateral(
    x: jnp.ndarray, kernel_size: int = 5, sigma: float = 1.0, morph_size: int = 3
) -> jnp.ndarray:
    """Open -> Gaussian blur -> close -> threshold
    (MorphologicalBilateralFilter, bilateral_filter.py:409-501)."""
    p = morph_size // 2
    m = jnp.clip(x, 0.0, 1.0)
    opened = max_pool2d(-max_pool2d(-m, morph_size, 1, p), morph_size, 1, p)
    g = _gaussian_kernel_2d(kernel_size, sigma)
    blurred = _depthwise_conv2d(opened, g)
    closed = -max_pool2d(-max_pool2d(blurred, morph_size, 1, p), morph_size, 1, p)
    return (closed > 0.5).astype(x.dtype)


# --- N4 phase-form binary epilogues ----------------------------------------
#
# The stage-1 serving path emits its logits in nested-S2D(4) ("N4") form
# (B, H/4, W/4, 16); these variants run the deployed binary-mask epilogues
# directly on that form. Exact same math as the plain versions (the N4
# conv kernels are phase expansions, ops/s2d.py::dw_kernel_n4), but the
# C=1 full-resolution map — which pads 128x in TPU lanes and made the
# plain epilogue cost ~21 ms/batch-32 at 480x640 — never exists; only the
# final output converts with one n4_to_plain.

def edge_smooth_binary_mask_n4(mask_n4: jnp.ndarray, threshold: float = 0.5,
                               blur_strength: float = 3.0) -> jnp.ndarray:
    """N4-form :func:`edge_smooth_binary_mask` (exact)."""
    from ..ops.s2d import conv_dw_n4

    m = mask_n4.astype(jnp.float32)
    edges = jnp.abs(conv_dw_n4(m, _LAPLACIAN))
    edge_w = jax.nn.sigmoid(edges * blur_strength)
    blurred = conv_dw_n4(m, _GAUSS3)
    smoothed = m * (1.0 - edge_w) + blurred * edge_w
    return (smoothed > threshold).astype(mask_n4.dtype)


def binary_mask_bilateral_n4(
    x_n4: jnp.ndarray, kernel_size: int = 7, sigma_spatial: float = 1.5,
    threshold: float = 0.5, num_iterations: int = 2,
) -> jnp.ndarray:
    """N4-form :func:`binary_mask_bilateral` (exact)."""
    from ..ops.s2d import conv_dw_n4

    g = _gaussian_kernel_2d(kernel_size, sigma_spatial)
    m = jnp.clip(x_n4.astype(jnp.float32), 0.0, 1.0)

    def body(_, m):
        filtered = conv_dw_n4(m, g)
        var = jnp.clip(conv_dw_n4(m ** 2, g) - filtered ** 2, 0.0, None)
        ew = jnp.exp(-var * 10.0)
        return ew * filtered + (1.0 - ew) * m

    m = lax.fori_loop(0, num_iterations, body, m)
    return (m > threshold).astype(x_n4.dtype)


def dilate_binary_n4(mask_n4: jnp.ndarray, pixels: int = 1) -> jnp.ndarray:
    """N4-form binary dilation: full-res (2p+1)-square max."""
    from ..ops.s2d import maxpool_n4

    return maxpool_n4(mask_n4, 2 * pixels + 1)
