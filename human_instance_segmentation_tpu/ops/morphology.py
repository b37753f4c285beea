"""Morphology / pooling helpers used by losses and post-processing.

Replaces the reference's ``nn.MaxPool2d``-based dilation/erosion tricks
(e.g. boundary bands in hierarchical_segmentation_refinement.py:389-431 and
the deploy-time MaskDilationModule in
export_hierarchical_instance_peopleseg_onnx.py:85-141) with
``lax.reduce_window`` which XLA fuses into neighbouring elementwise work.

All tensors NHWC.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("kernel", "stride", "padding"))
def max_pool2d(x: jnp.ndarray, kernel: int, stride: int = 1, padding: int | None = None) -> jnp.ndarray:
    """Max pool over H, W of an NHWC tensor (torch MaxPool2d semantics:
    implicit -inf padding)."""
    if padding is None:
        padding = 0
    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )


def dilate(x: jnp.ndarray, pixels: int) -> jnp.ndarray:
    """Binary/probability dilation by `pixels` via max pooling (stride 1)."""
    if pixels <= 0:
        return x
    k = 2 * pixels + 1
    return max_pool2d(x, k, 1, pixels)


def erode(x: jnp.ndarray, pixels: int) -> jnp.ndarray:
    """Binary/probability erosion: 1 - dilate(1 - x)."""
    if pixels <= 0:
        return x
    return 1.0 - dilate(1.0 - x, pixels)


@partial(jax.jit, static_argnames=("kernel", "stride", "padding"))
def avg_pool2d(x: jnp.ndarray, kernel: int, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """Average pool (count_include_pad=True, torch default)."""
    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    s = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
    return s / float(kernel * kernel)
