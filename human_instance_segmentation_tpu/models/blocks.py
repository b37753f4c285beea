"""Shared conv building blocks for all heads and extractors.

The reference keeps three near-identical copies of its ResidualBlock
(/root/reference/src/human_edge_detection/model.py:41-58,
advanced/hierarchical_segmentation_unet.py:35-58,
advanced/hierarchical_segmentation_refinement.py:31-56); here there is
exactly one, parameterised over normalisation and activation. All NHWC.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import get_activation
from ..ops.quant import QConv
from ..ops.norms import get_normalization


class ConvNormAct(nn.Module):
    """3x3 (or kxk) conv -> norm -> activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel
        x = QConv(
            self.features, (k, k), strides=(self.stride, self.stride),
            padding=k // 2, use_bias=self.use_bias, name="conv",
        )(x)
        x = get_normalization(self.norm, self.features, min(self.norm_groups, self.features), name="norm")(x, train=train)
        return get_activation(self.activation, self.activation_beta)(x)


class ResidualBlock(nn.Module):
    """conv3-norm-act-conv3-norm + skip -> act (the single canonical copy)."""

    features: int
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = get_activation(self.activation, self.activation_beta)
        g = min(self.norm_groups, self.features)
        h = QConv(self.features, (3, 3), padding=1, name="conv1")(x)
        h = get_normalization(self.norm, self.features, g, name="norm1")(h, train=train)
        h = act(h)
        h = QConv(self.features, (3, 3), padding=1, name="conv2")(h)
        h = get_normalization(self.norm, self.features, g, name="norm2")(h, train=train)
        return act(h + x)


class Dropout2d(nn.Module):
    """Channel-wise spatial dropout (torch nn.Dropout2d semantics): whole
    feature maps are dropped, implemented as a (H, W)-broadcast mask."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2))(x, deterministic=not train)


class ConvTranspose2x(nn.Module):
    """2x upsampling transposed conv (torch ConvTranspose2d(k=2, s=2))."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.ConvTranspose(self.features, (2, 2), strides=(2, 2), padding="VALID", name="deconv")(x)


def max_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC pixel shuffle: (B, H, W, C*r^2) -> (B, H*r, W*r, C).

    Matches torch nn.PixelShuffle channel ordering (C, r, r) major-to-minor.
    """
    b, h, w, cr2 = x.shape
    r = factor
    c = cr2 // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c
    return x.reshape(b, h * r, w * r, c)
