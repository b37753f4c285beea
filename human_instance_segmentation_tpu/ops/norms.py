"""Normalisation zoo (Flax/linen, NHWC).

Re-designs the reference factory
(advanced/normalization_comparison.py:12-206) plus the channel-only
LayerNorm2d (model.py:18-38). Every module exposes a uniform
``__call__(x, train: bool = False)`` so heads can be norm-agnostic; modules
that track running statistics store them in the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class LayerNorm2d(nn.Module):
    """LayerNorm over (H, W, C) jointly per sample, with per-channel affine.

    Matches the reference LayerNorm2d (model.py:18-38): mean/var over all of
    (C, H, W) for each sample, eps 1e-5, biased variance, per-channel
    weight/bias. (This is what every head's ``layernorm2d`` resolves to via
    normalization_comparison.py:159-206.)
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 mode: str | None = None) -> jnp.ndarray:
        del train
        c = x.shape[-1]
        if mode == "params":
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return scale, bias
        # statistics in f32 for bf16 activations (TPU mixed-precision rule:
        # accumulate in f32, store in bf16)
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * scale + bias


class BatchNorm2d(nn.Module):
    """BatchNorm over (B, H, W) with running stats (torch defaults:
    momentum 0.1, eps 1e-5)."""

    momentum: float = 0.9  # flax convention: ra = m*ra + (1-m)*batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=None,
        )(x)


class GroupNorm2d(nn.Module):
    num_groups: int = 8
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon)(x)


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel normalisation over (H, W), optional affine."""

    affine: bool = True
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train
        c = x.shape[-1]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y


class AdaptiveInstanceNorm2d(nn.Module):
    """Instance norm + affine, tracking running batch statistics
    (normalization_comparison.py:12-59). Forward always uses instance
    statistics; running stats are tracked for observability/export parity."""

    epsilon: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)

        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        if train and not self.is_initializing():
            bm = jnp.mean(mean, axis=0).reshape(c)
            bv = jnp.mean(var, axis=0).reshape(c)
            ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * bm
            ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * bv

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * scale + bias


class ForegroundAwareNorm(nn.Module):
    """Instance norm whose affine params are gated by a learned foreground
    detector (normalization_comparison.py:84-132)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train
        c = x.shape[-1]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)

        h = nn.Conv(max(c // 4, 1), (1, 1))(jax.lax.stop_gradient(x))
        h = jax.nn.relu(h)
        fg = jax.nn.sigmoid(nn.Conv(1, (1, 1))(h))  # (B, H, W, 1)
        bg = 1.0 - fg

        fg_scale = self.param("fg_scale", nn.initializers.ones, (c,))
        fg_bias = self.param("fg_bias", nn.initializers.zeros, (c,))
        bg_scale = self.param("bg_scale", nn.initializers.ones, (c,))
        bg_bias = self.param("bg_bias", nn.initializers.zeros, (c,))
        scale = fg * fg_scale + bg * bg_scale
        bias = fg * fg_bias + bg * bg_bias
        return y * scale + bias


class MixedNormalization(nn.Module):
    """Blend of BatchNorm and InstanceNorm during training, BatchNorm at
    eval (normalization_comparison.py:135-156)."""

    mix_ratio: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = BatchNorm2d()(x, train=train)
        if train:
            inn = InstanceNorm2d()(x)
            return self.mix_ratio * bn + (1.0 - self.mix_ratio) * inn
        return bn


def _group_fallback(channels: int, groups: int) -> int:
    if channels % groups == 0:
        return groups
    for g in (8, 4, 2, 1):
        if channels % g == 0:
            return g
    return 1


def get_normalization(norm_type: str, channels: int, num_groups: int = 8, name: str | None = None) -> Any:
    """Factory mirroring get_normalization_layer
    (normalization_comparison.py:159-206), including the GroupNorm
    8->4->2->1 divisor fallback."""
    t = norm_type.lower()
    if t in ("layer", "layernorm", "layernorm2d"):
        return LayerNorm2d(name=name)
    if t in ("batch", "batchnorm", "batchnorm2d"):
        return BatchNorm2d(name=name)
    if t in ("instance", "instancenorm", "instancenorm2d"):
        return InstanceNorm2d(name=name)
    if t in ("group", "groupnorm"):
        return GroupNorm2d(num_groups=_group_fallback(channels, num_groups), name=name)
    if t == "adaptive_instance":
        return AdaptiveInstanceNorm2d(name=name)
    if t == "spatial_group":
        return GroupNorm2d(num_groups=_group_fallback(channels, num_groups), name=name)
    if t == "foreground_aware":
        return ForegroundAwareNorm(name=name)
    if t == "mixed":
        return MixedNormalization(name=name)
    raise ValueError(f"Unknown normalization type: {norm_type}")
