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
import jax
import jax.numpy as jnp

from ..ops.activations import get_activation
from ..ops.quant import QConv, quant_enabled, static_scales
from ..ops.norms import get_normalization
from ..ops import pallas_head


def _fusable(module, x, train: bool) -> bool:
    """True when this conv->LayerNorm2d->relu unit should trace the fused
    Pallas kernel (ops/pallas_head.py) instead of the unfused op chain."""
    if train or not pallas_head.fusion_enabled():
        return False
    if x.dtype == jnp.int8:  # pre-quantized boundary: XLA qconv path owns it
        return False
    if module.norm != "layernorm2d" or module.activation != "relu":
        return False
    n, h, w, ci = x.shape
    return pallas_head.fusable_shape(h, w, ci, module.features)


_NO_FUSE = object()


def prequantize_for(parent, child: str, x: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Quantize x to int8 in the PRODUCER's epilogue, using the calibrated
    input scale of the single consumer conv it feeds (``child`` is that
    conv's path relative to ``parent``).

    Int8 serving only. The round/clip/convert chain fuses into whatever
    produced x (a norm/act epilogue), so the bf16 boundary tensor never
    reaches HBM and the consumer QConv — which detects the int8 dtype and
    skips its own quantize — reads HALF the bytes. Numerically identical to
    letting the consumer quantize: same scale, same round-to-nearest.
    Returns x unchanged whenever the consumer conv would not run int8
    (disabled/denied/ineligible/uncalibrated), keeping producer and
    consumer decisions in lockstep."""
    from ..ops.quant import int8_denied, quant_enabled, static_scales
    from ..ops.s2d import quantize_static

    if not quant_enabled() or x.dtype == jnp.int8:
        return x
    path = parent.path + tuple(child.split("/"))
    if int8_denied(path) or k * k * x.shape[-1] < 48:
        return x
    scales = static_scales()
    if not scales:
        return x
    s = scales.get("/".join(path))
    if s is None:
        return x
    return quantize_static(x, s)


def _fused_xscale_for(parent, conv_name: str, x, k: int):
    """Activation scale for the fused kernel's int8 path.

    Returns None outside int8 serving (-> fused kernel runs bf16), a
    calibrated float scale when available, or the _NO_FUSE sentinel when
    int8 serving is on but this conv has no calibrated scale — then the
    unfused QConv (dynamic-scale) path keeps its current behavior."""
    from ..ops.quant import int8_denied

    if not quant_enabled() or int8_denied(parent.path + (conv_name,)):
        return None
    scales = static_scales()
    if scales is None or k * k * x.shape[-1] < 48:
        return _NO_FUSE
    xs = scales.get("/".join(parent.path + (conv_name,)))
    return _NO_FUSE if xs is None else xs


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
        conv = QConv(
            self.features, (k, k), strides=(self.stride, self.stride),
            padding=k // 2, use_bias=self.use_bias, name="conv",
        )
        norm = get_normalization(self.norm, self.features,
                                 min(self.norm_groups, self.features), name="norm")
        if (self.stride == 1 and k in (1, 3) and self.use_bias
                and _fusable(self, x, train)):
            xs = _fused_xscale_for(self, "conv", x, k)
            if xs is not _NO_FUSE:
                w, b = conv(x, mode="params")
                g, beta = norm(jnp.zeros((1, 1, 1, self.features), x.dtype), mode="params")
                return pallas_head.conv_ln_act(
                    x, w.astype(x.dtype), b, g, beta,
                    height=x.shape[1], width=x.shape[2], kernel=k, xscale=xs)
        x = conv(x)
        x = norm(x, train=train)
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
        conv1 = QConv(self.features, (3, 3), padding=1, name="conv1")
        norm1 = get_normalization(self.norm, self.features, g, name="norm1")
        conv2 = QConv(self.features, (3, 3), padding=1, name="conv2")
        norm2 = get_normalization(self.norm, self.features, g, name="norm2")
        if x.shape[-1] == self.features and _fusable(self, x, train):
            xs1 = _fused_xscale_for(self, "conv1", x, 3)
            xs2 = _fused_xscale_for(self, "conv2", x, 3)
            if xs1 is not _NO_FUSE and xs2 is not _NO_FUSE:
                zc = jnp.zeros((1, 1, 1, self.features), x.dtype)
                w1, b1 = conv1(x, mode="params")
                g1, be1 = norm1(zc, mode="params")
                w2, b2 = conv2(x, mode="params")
                g2, be2 = norm2(zc, mode="params")
                hh, ww = x.shape[1], x.shape[2]
                h = pallas_head.conv_ln_act(
                    x, w1.astype(x.dtype), b1, g1, be1, height=hh, width=ww,
                    xscale=xs1)
                return pallas_head.conv_ln_act(
                    h, w2.astype(x.dtype), b2, g2, be2, residual=x,
                    height=hh, width=ww, xscale=xs2)
        h = conv1(x)
        h = norm1(h, train=train)
        h = act(h)
        # single-use internal boundary: flow int8 into conv2 (serving)
        h = prequantize_for(self, "conv2", h)
        h = conv2(h)
        h = norm2(h, train=train)
        return act(h + x)


class Dropout2d(nn.Module):
    """Channel-wise spatial dropout (torch nn.Dropout2d semantics): whole
    feature maps are dropped, implemented as a (H, W)-broadcast mask."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2))(x, deterministic=not train)


class _TConv2x(nn.Module):
    """k=2 s=2 VALID transposed conv with nn.ConvTranspose's exact parameter
    tree and math (kernel (2, 2, Ci, Co), spatial taps flipped), plus a
    ``mode="params"`` path so fused serving kernels can read the params."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: Optional[str] = None):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (2, 2, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if mode == "params":
            return kernel, bias
        return jax.lax.conv_transpose(
            x, kernel.astype(x.dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias.astype(x.dtype)


class ConvTranspose2x(nn.Module):
    """2x upsampling transposed conv (torch ConvTranspose2d(k=2, s=2))."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: Optional[str] = None):
        return _TConv2x(self.features, name="deconv")(x, mode=mode)


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
