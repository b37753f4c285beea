"""Attention modules (SE-style channel, spatial, CBAM, additive gate).

TPU-native redesign of the reference attention zoo
(/root/reference/src/human_edge_detection/advanced/attention_modules.py:10-237).
All tensors NHWC; the 1x1 "conv" squeeze/excite paths are dense matmuls that
map straight onto the MXU, and global pooling reductions fuse into them.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .activations import get_activation


class ChannelAttention(nn.Module):
    """SE-block channel attention (attention_modules.py:10-64)."""

    reduction_ratio: int = 8
    min_channels: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        bottleneck = max(c // self.reduction_ratio, self.min_channels)
        act = get_activation(self.activation, self.activation_beta)
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)  # (N, 1, 1, C)
        a = nn.Conv(bottleneck, (1, 1), use_bias=False, name="fc1")(pooled)
        a = act(a)
        a = nn.Conv(c, (1, 1), use_bias=False, name="fc2")(a)
        return x * jax.nn.sigmoid(a)


class SpatialAttention(nn.Module):
    """Spatial attention: avg+max channel stats -> kxk conv -> sigmoid
    (attention_modules.py:67-113)."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        stats = jnp.concatenate([avg, mx], axis=-1)  # (N, H, W, 2)
        k = self.kernel_size
        a = nn.Conv(1, (k, k), padding=k // 2, use_bias=False, name="conv")(stats)
        return x * jax.nn.sigmoid(a)


class CBAM(nn.Module):
    """Channel then spatial attention (attention_modules.py:116-162)."""

    reduction_ratio: int = 8
    kernel_size: int = 7
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ChannelAttention(
            reduction_ratio=self.reduction_ratio,
            activation=self.activation,
            activation_beta=self.activation_beta,
            name="channel",
        )(x)
        return SpatialAttention(kernel_size=self.kernel_size, name="spatial")(x)


class AttentionGate(nn.Module):
    """Additive attention gate (attention_modules.py:165-237): gate signal g
    and features x are projected, summed, squashed to a single-channel mask."""

    inter_channels: int | None = None
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
        from .sampling import resize_bilinear

        inter = self.inter_channels or max(x.shape[-1] // 2, 1)
        if g.shape[1:3] != x.shape[1:3]:
            g = resize_bilinear(g, x.shape[1], x.shape[2])
        act = get_activation(self.activation, self.activation_beta)
        g1 = nn.Conv(inter, (1, 1), name="W_g")(g)
        x1 = nn.Conv(inter, (1, 1), name="W_x")(x)
        psi = nn.Conv(1, (1, 1), name="psi")(act(g1 + x1))
        return x * jax.nn.sigmoid(psi)
