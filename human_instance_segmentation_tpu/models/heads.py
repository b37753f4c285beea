"""Hierarchical ROI segmentation heads (stage 2).

TPU-native redesign of the reference head zoo:
- EnhancedUNet               (hierarchical_segmentation_unet.py:277-417)
- HierarchicalHeadV2         (hierarchical_segmentation_unet.py:670-845) --
  the production head: shared trunk -> EnhancedUNet bg/fg branch ->
  fg-gated target/non-target branch -> hierarchical logit combine.
- Refinement modules + RefinedHierarchicalHead
  (hierarchical_segmentation_refinement.py:58-344, 434-804)
- PretrainedUNetGuidedHead   (hierarchical_segmentation_rgb.py:43-218)

All heads share one functional contract:
    apply(params, features, ...) -> (final_logits (N, mh, mw, 3), aux dict)
NHWC; every upsample is the separable-matmul bilinear resize; the whole head
is one fused XLA program per ROI batch.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import get_activation
from ..ops.attention import ChannelAttention, SpatialAttention
from ..ops.norms import get_normalization
from ..ops.sampling import resize_bilinear
from ..ops.quant import QConv, quant_enabled
from ..ops import pallas_head
from ..ops.s2d import (conv1x1_kernel_s2d, deconv2x_kernel_s2d,
                       depth_to_space, tile_channel_params)
from .blocks import (ConvNormAct, ConvTranspose2x, Dropout2d, ResidualBlock,
                     max_pool_2x, pixel_shuffle, prequantize_for)


def _fused_upsample(x, deconv_mod, norm_mod, features: int):
    """deconv2x -> LayerNorm2d -> relu computed on x's OWN grid in S2D(2)
    form with one fused Pallas kernel (ops/pallas_head.py): the k=2 s=2
    transposed conv is exactly a 1x1 conv to 4 phase-channel blocks
    (ops/s2d.py:deconv2x_kernel_s2d), LayerNorm2d's statistics are
    layout-invariant (they reduce over ALL of H, W, C), and the per-channel
    affine tiles across phases. Returns the S2D-form activations
    (B, H, W, 4*features); callers either project per-pixel in S2D form or
    depth_to_space back. Eliminates the mask-resolution LN memory passes —
    the head's dominant serving cost (scripts/profile_stage2.py)."""
    kd, bd = deconv_mod(x, mode="params")
    g, be = norm_mod(jnp.zeros((1, 1, 1, features), x.dtype), mode="params")
    return pallas_head.conv_ln_act(
        x, deconv2x_kernel_s2d(kd).astype(x.dtype),
        tile_channel_params(bd), tile_channel_params(g),
        tile_channel_params(be),
        height=x.shape[1], width=x.shape[2], kernel=1)


def _fuse_mask_branch(module, x, train: bool, mh: int, mw: int) -> bool:
    """Gate for the S2D upsample fusion: serving only, explicit opt-in
    (head_fusion(s2d_upsample=True) — the bf16 k=1 kernel measures 0.5x
    XLA's deconv+LN chain, see ops/pallas_head.py), LayerNorm2d+relu
    semantics, and the deconv's 2x output must be exactly the mask size
    (the flagship contract: mask = 2 x ROI)."""
    if train or not pallas_head.s2d_upsample_enabled() or quant_enabled():
        return False
    if module.norm != "layernorm2d" or module.activation != "relu":
        return False
    return (x.shape[1] * 2, x.shape[2] * 2) == (mh, mw)


class EnhancedUNet(nn.Module):
    """Depth-N UNet with double residual blocks per level and a sigmoid
    spatial-attention bottleneck; outputs 2-class (bg/fg) logits."""

    base_channels: int = 96
    depth: int = 3
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        chans = [self.base_channels * (2 ** i) for i in range(self.depth)]

        skips = []
        for i in range(self.depth):
            if i == 0:
                x = ConvNormAct(chans[0], name="enc0_in", **kw)(x, train=train)
                x = ResidualBlock(chans[0], name="enc0_res0", **kw)(x, train=train)
                x = ResidualBlock(chans[0], name="enc0_res1", **kw)(x, train=train)
            else:
                x = ResidualBlock(chans[i - 1], name=f"enc{i}_res0", **kw)(x, train=train)
                x = ResidualBlock(chans[i - 1], name=f"enc{i}_res1", **kw)(x, train=train)
                x = prequantize_for(self, f"enc{i}_out/conv", x)
                x = ConvNormAct(chans[i], name=f"enc{i}_out", **kw)(x, train=train)
            skips.append(x)
            if i < self.depth - 1:
                x = max_pool_2x(x)

        # Bottleneck: attention path (res,res,conv-norm-act,1x1,sigmoid)
        # multiplying a parallel 3x3 conv of the same input.
        a = ResidualBlock(chans[-1], name="bott_res0", **kw)(x, train=train)
        a = ResidualBlock(chans[-1], name="bott_res1", **kw)(a, train=train)
        a = ConvNormAct(chans[-1], name="bott_cna", **kw)(a, train=train)
        a = prequantize_for(self, "bott_att", a, k=1)
        a = jax.nn.sigmoid(QConv(chans[-1], (1, 1), name="bott_att")(a))
        x = QConv(chans[-1], (3, 3), padding=1, name="bott_conv")(x) * a

        for d, i in enumerate(range(self.depth - 1, 0, -1)):
            x = ConvTranspose2x(chans[i - 1], name=f"up{d}")(x)
            skip = skips[i - 1]
            if x.shape[1:3] != skip.shape[1:3]:
                x = resize_bilinear(x, skip.shape[1], skip.shape[2])
            x = jnp.concatenate([x, skip], axis=-1)
            x = prequantize_for(self, f"dec{d}_in/conv", x)
            x = ConvNormAct(chans[i - 1], name=f"dec{d}_in", **kw)(x, train=train)
            x = ResidualBlock(chans[i - 1], name=f"dec{d}_res0", **kw)(x, train=train)
            x = ResidualBlock(chans[i - 1], name=f"dec{d}_res1", **kw)(x, train=train)

        x = ConvNormAct(chans[0] // 2, name="final_cna", **kw)(x, train=train)
        x = prequantize_for(self, "final_out", x, k=1)
        return QConv(2, (1, 1), name="final_out")(x)


class ShallowUNet(nn.Module):
    """Depth-2 UNet, 2-class output (hierarchical_segmentation_unet.py:61-171)."""

    base_channels: int = 64
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        bc = self.base_channels
        e1 = ConvNormAct(bc, name="enc1a", **kw)(x, train=train)
        e1 = ConvNormAct(bc, name="enc1b", **kw)(e1, train=train)
        h = max_pool_2x(e1)
        e2 = ConvNormAct(bc * 2, name="enc2a", **kw)(h, train=train)
        e2 = ConvNormAct(bc * 2, name="enc2b", **kw)(e2, train=train)
        h = max_pool_2x(e2)
        h = ConvNormAct(bc * 4, name="bota", **kw)(h, train=train)
        h = ConvNormAct(bc * 4, name="botb", **kw)(h, train=train)
        h = ConvTranspose2x(bc * 2, name="up2")(h)
        if h.shape[1:3] != e2.shape[1:3]:
            h = resize_bilinear(h, e2.shape[1], e2.shape[2])
        h = jnp.concatenate([h, e2], axis=-1)
        h = ConvNormAct(bc * 2, name="dec2a", **kw)(h, train=train)
        h = ConvNormAct(bc * 2, name="dec2b", **kw)(h, train=train)
        h = ConvTranspose2x(bc, name="up1")(h)
        if h.shape[1:3] != e1.shape[1:3]:
            h = resize_bilinear(h, e1.shape[1], e1.shape[2])
        h = jnp.concatenate([h, e1], axis=-1)
        h = ConvNormAct(bc, name="dec1a", **kw)(h, train=train)
        h = ConvNormAct(bc, name="dec1b", **kw)(h, train=train)
        return QConv(2, (1, 1), name="final")(h)


class HierarchicalHeadV2(nn.Module):
    """The production hierarchical head (V2).

    shared trunk -> (a) EnhancedUNet bg/fg logits (+2x deconv upsample to the
    mask size), (b) an fg gate from the low-res bg/fg logits modulating the
    shared features for the target/non-target branch. Final combine
    (hierarchical_segmentation_unet.py:825-836):
        final[..., 0] = bgfg[..., 0]
        final[..., 1] = bgfg[..., 1] + tnt[..., 0] * P(fg)
        final[..., 2] = bgfg[..., 1] + tnt[..., 1] * P(fg)
    """

    mid_channels: int = 256
    mask_size: Tuple[int, int] = (56, 56)
    dropout_rate: float = 0.1
    use_attention_module: bool = False
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0
    base_channels: int = 96
    depth: int = 3
    expose_shared: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        act = get_activation(self.activation, self.activation_beta)
        mc = self.mid_channels
        mh, mw = self.mask_size

        # Shared trunk
        shared = ConvNormAct(mc, name="shared_in", **kw)(features, train=train)
        shared = Dropout2d(self.dropout_rate, name="shared_drop0")(shared, train=train)
        shared = ResidualBlock(mc, name="shared_res0", **kw)(shared, train=train)
        shared = Dropout2d(self.dropout_rate, name="shared_drop1")(shared, train=train)
        shared = ResidualBlock(mc, name="shared_res1", **kw)(shared, train=train)

        # Branch 1: bg/fg via EnhancedUNet
        bg_fg_low = EnhancedUNet(
            base_channels=self.base_channels, depth=self.depth, name="bg_vs_fg_unet", **kw
        )(shared, train=train)

        up_deconv = ConvTranspose2x(32, name="upsample_deconv")
        up_norm = get_normalization(self.norm, 32, min(self.norm_groups, 32), name="upsample_norm")
        up_out = QConv(2, (1, 1), name="upsample_out")
        if _fuse_mask_branch(self, bg_fg_low, train, mh, mw):
            z = _fused_upsample(bg_fg_low, up_deconv, up_norm, 32)
            wo, bo = up_out(jnp.zeros((1, 1, 1, 32), z.dtype), mode="params")
            z = jax.lax.conv_general_dilated(
                z, conv1x1_kernel_s2d(wo).astype(z.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            bg_fg_logits = depth_to_space(z + tile_channel_params(bo).astype(z.dtype))
        else:
            up = up_deconv(bg_fg_low)
            up = up_norm(up, train=train)
            up = act(up)
            bg_fg_logits = up_out(up)
        if bg_fg_logits.shape[1:3] != (mh, mw):
            bg_fg_logits = resize_bilinear(bg_fg_logits, mh, mw)
        bg_fg_probs = jax.nn.softmax(bg_fg_logits, axis=-1)

        # Foreground attention gate from the low-res bg/fg logits
        g = act(QConv(mc // 4, (1, 1), name="gate0")(bg_fg_low))
        g = Dropout2d(self.dropout_rate * 0.5, name="gate_drop")(g, train=train)
        g = act(QConv(mc // 2, (1, 1), name="gate1")(
            prequantize_for(self, "gate1", g, k=1)))
        fg_attention = jax.nn.sigmoid(QConv(mc, (1, 1), name="gate2")(
            prequantize_for(self, "gate2", g, k=1)))

        # Branch 2: target vs non-target on gated shared features
        t = shared * fg_attention
        t = ResidualBlock(mc, name="tnt_res0", **kw)(t, train=train)
        if self.use_attention_module:
            t = SpatialAttention(kernel_size=7, name="tnt_satt")(t)
        t = Dropout2d(self.dropout_rate, name="tnt_drop0")(t, train=train)
        tnt_deconv = ConvTranspose2x(mc // 2, name="tnt_deconv")
        tnt_norm = get_normalization(self.norm, mc // 2, min(self.norm_groups, mc // 2), name="tnt_norm")
        if _fuse_mask_branch(self, t, train, mh, mw):
            t = depth_to_space(_fused_upsample(t, tnt_deconv, tnt_norm, mc // 2))
        else:
            t = tnt_deconv(t)
            t = tnt_norm(t, train=train)
            t = act(t)
        if self.use_attention_module:
            t = ChannelAttention(reduction_ratio=8, activation=self.activation,
                                 activation_beta=self.activation_beta, name="tnt_catt")(t)
        t = Dropout2d(self.dropout_rate, name="tnt_drop1")(t, train=train)
        t = ResidualBlock(mc // 2, name="tnt_res1", norm=self.norm,
                          norm_groups=min(self.norm_groups, mc // 2),
                          activation=self.activation, activation_beta=self.activation_beta)(t, train=train)
        tnt_logits = QConv(2, (1, 1), name="tnt_out")(t)
        if tnt_logits.shape[1:3] != (mh, mw):
            tnt_logits = resize_bilinear(tnt_logits, mh, mw)

        # Hierarchical combine
        fg_p = bg_fg_probs[..., 1:2]
        final = jnp.concatenate(
            [
                bg_fg_logits[..., 0:1],
                bg_fg_logits[..., 1:2] + tnt_logits[..., 0:1] * fg_p,
                bg_fg_logits[..., 1:2] + tnt_logits[..., 1:2] * fg_p,
            ],
            axis=-1,
        )

        aux: Dict[str, jnp.ndarray] = {
            "bg_fg_logits": bg_fg_logits,
            "bg_fg_logits_low": bg_fg_low,
            "target_nontarget_logits": tnt_logits,
            "fg_attention": fg_attention,
        }
        if self.expose_shared:
            aux["shared_features"] = shared
        return final, aux


class HierarchicalHeadV1(nn.Module):
    """V1: ShallowUNet bg/fg branch (hierarchical_segmentation_unet.py:420-535).
    Same hierarchical combine as V2, simpler branch-1 and no dropout."""

    mid_channels: int = 256
    mask_size: Tuple[int, int] = (56, 56)
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False):
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        act = get_activation(self.activation, self.activation_beta)
        mc = self.mid_channels
        mh, mw = self.mask_size

        shared = ConvNormAct(mc, name="shared_in", **kw)(features, train=train)
        shared = ResidualBlock(mc, name="shared_res0", **kw)(shared, train=train)
        shared = ResidualBlock(mc, name="shared_res1", **kw)(shared, train=train)

        bg_fg_low = ShallowUNet(base_channels=128, name="bg_vs_fg_unet", **kw)(shared, train=train)
        up = ConvTranspose2x(32, name="upsample_deconv")(bg_fg_low)
        up = get_normalization(self.norm, 32, min(self.norm_groups, 32), name="upsample_norm")(up, train=train)
        bg_fg_logits = QConv(2, (1, 1), name="upsample_out")(act(up))
        if bg_fg_logits.shape[1:3] != (mh, mw):
            bg_fg_logits = resize_bilinear(bg_fg_logits, mh, mw)
        bg_fg_probs = jax.nn.softmax(bg_fg_logits, axis=-1)

        g = act(QConv(mc // 4, (1, 1), name="gate0")(bg_fg_low))
        g = act(QConv(mc // 2, (1, 1), name="gate1")(g))
        fg_attention = jax.nn.sigmoid(QConv(mc, (1, 1), name="gate2")(g))

        t = shared * fg_attention
        t = ResidualBlock(mc, name="tnt_res0", **kw)(t, train=train)
        t = ConvTranspose2x(mc // 2, name="tnt_deconv")(t)
        t = get_normalization(self.norm, mc // 2, min(self.norm_groups, mc // 2), name="tnt_norm")(t, train=train)
        t = act(t)
        t = ResidualBlock(mc // 2, name="tnt_res1", norm=self.norm,
                          norm_groups=min(self.norm_groups, mc // 2),
                          activation=self.activation, activation_beta=self.activation_beta)(t, train=train)
        tnt_logits = QConv(2, (1, 1), name="tnt_out")(t)
        if tnt_logits.shape[1:3] != (mh, mw):
            tnt_logits = resize_bilinear(tnt_logits, mh, mw)

        fg_p = bg_fg_probs[..., 1:2]
        final = jnp.concatenate([
            bg_fg_logits[..., 0:1],
            bg_fg_logits[..., 1:2] + tnt_logits[..., 0:1] * fg_p,
            bg_fg_logits[..., 1:2] + tnt_logits[..., 1:2] * fg_p,
        ], axis=-1)
        aux = {"bg_fg_logits": bg_fg_logits, "bg_fg_logits_low": bg_fg_low,
               "target_nontarget_logits": tnt_logits, "fg_attention": fg_attention}
        return final, aux


class HierarchicalHeadV3(nn.Module):
    """V3: EnhancedUNet bg/fg + ShallowUNet target/non-target with dual
    gating (hierarchical_segmentation_unet.py:1210-1335)."""

    mid_channels: int = 256
    mask_size: Tuple[int, int] = (56, 56)
    base_channels: int = 96
    depth: int = 3
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False):
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        act = get_activation(self.activation, self.activation_beta)
        mc = self.mid_channels
        mh, mw = self.mask_size

        shared = ConvNormAct(mc, name="shared_in", **kw)(features, train=train)
        shared = ResidualBlock(mc, name="shared_res0", **kw)(shared, train=train)
        shared = ResidualBlock(mc, name="shared_res1", **kw)(shared, train=train)

        bg_fg_low = EnhancedUNet(base_channels=self.base_channels, depth=self.depth,
                                 name="bg_vs_fg_unet", **kw)(shared, train=train)
        up = ConvTranspose2x(32, name="up_bgfg_deconv")(bg_fg_low)
        up = get_normalization(self.norm, 32, min(self.norm_groups, 32), name="up_bgfg_norm")(up, train=train)
        bg_fg_logits = QConv(2, (1, 1), name="up_bgfg_out")(act(up))
        if bg_fg_logits.shape[1:3] != (mh, mw):
            bg_fg_logits = resize_bilinear(bg_fg_logits, mh, mw)
        bg_fg_probs = jax.nn.softmax(bg_fg_logits, axis=-1)

        g = act(QConv(mc // 4, (1, 1), name="fg_gate0")(bg_fg_low))
        fg_attention = jax.nn.sigmoid(QConv(mc, (1, 1), name="fg_gate1")(g))

        gated = shared * fg_attention
        tnt_low = ShallowUNet(base_channels=64, name="target_nontarget_unet", **kw)(gated, train=train)
        upt = ConvTranspose2x(32, name="up_tnt_deconv")(tnt_low)
        upt = get_normalization(self.norm, 32, min(self.norm_groups, 32), name="up_tnt_norm")(upt, train=train)
        tnt_logits = QConv(2, (1, 1), name="up_tnt_out")(act(upt))
        if tnt_logits.shape[1:3] != (mh, mw):
            tnt_logits = resize_bilinear(tnt_logits, mh, mw)

        tg = act(QConv(32, (1, 1), name="target_gate0")(tnt_low))
        target_attention = jax.nn.sigmoid(QConv(1, (1, 1), name="target_gate1")(tg))
        target_attention_up = resize_bilinear(target_attention, mh, mw)

        fg_p = bg_fg_probs[..., 1:2]
        fg_base = bg_fg_logits[..., 1:2]
        final = jnp.concatenate([
            bg_fg_logits[..., 0:1],
            fg_base + tnt_logits[..., 0:1] * fg_p * target_attention_up,
            fg_base + tnt_logits[..., 1:2] * fg_p,
        ], axis=-1)
        aux = {"bg_fg_logits": bg_fg_logits, "bg_fg_logits_low": bg_fg_low,
               "target_nontarget_logits": tnt_logits, "target_logits_low": tnt_low,
               "fg_attention": fg_attention, "target_attention": target_attention}
        return final, aux


class HierarchicalHeadV4(nn.Module):
    """V4: dual EnhancedUNet branches + cross-branch attention + fusion conv
    (hierarchical_segmentation_unet.py:1338-1444). The reference's 4-dim
    MultiheadAttention over HW tokens is kept as a single-head attention —
    on TPU this is one small batched matmul pair."""

    mid_channels: int = 256
    mask_size: Tuple[int, int] = (56, 56)
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False):
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        act = get_activation(self.activation, self.activation_beta)
        mc = self.mid_channels
        mh, mw = self.mask_size

        shared = ConvNormAct(mc, name="shared_in", **kw)(features, train=train)
        for i in range(3):
            shared = ResidualBlock(mc, name=f"shared_res{i}", **kw)(shared, train=train)

        def branch(name: str, base: int, depth: int):
            low = EnhancedUNet(base_channels=base, depth=depth, name=f"{name}_unet", **kw)(shared, train=train)
            u = ConvTranspose2x(64, name=f"{name}_deconv")(low)
            u = get_normalization(self.norm, 64, min(self.norm_groups, 64), name=f"{name}_norm")(u, train=train)
            u = act(u)
            u = ResidualBlock(64, name=f"{name}_res", **kw)(u, train=train)
            out = QConv(2, (1, 1), name=f"{name}_out")(u)
            if out.shape[1:3] != (mh, mw):
                out = resize_bilinear(out, mh, mw)
            return low, out

        bg_fg_low, bg_fg_logits = branch("bgfg", 128, 4)
        tnt_low, tnt_logits = branch("tnt", 96, 3)

        # Cross-branch self-attention over the 4 concatenated logit channels
        n = features.shape[0]
        combined = jnp.concatenate([bg_fg_logits, tnt_logits], axis=-1)  # (N, mh, mw, 4)
        tokens = combined.reshape(n, mh * mw, 4)
        attended = nn.SelfAttention(num_heads=1, qkv_features=4, name="cross_attention")(tokens)
        attended = attended.reshape(n, mh, mw, 4)

        f = ConvNormAct(64, name="fusion_in", **kw)(attended, train=train)
        f = ResidualBlock(64, name="fusion_res", **kw)(f, train=train)
        final = QConv(3, (1, 1), name="fusion_out")(f)

        aux = {"bg_fg_logits": bg_fg_logits, "bg_fg_logits_low": bg_fg_low,
               "target_nontarget_logits": tnt_logits, "target_logits_low": tnt_low,
               "attended_features": attended}
        return final, aux


class BoundaryRefinement(nn.Module):
    """Edge-gated residual refinement of the 3-class logits
    (hierarchical_segmentation_refinement.py:58-149)."""

    edge_channels: int = 32
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, mask_logits: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        probs = jax.nn.softmax(mask_logits, axis=-1)
        dy = jnp.abs(probs[:, 1:, :, :] - probs[:, :-1, :, :])
        dx = jnp.abs(probs[:, :, 1:, :] - probs[:, :, :-1, :])
        dy = jnp.pad(dy, ((0, 0), (0, 1), (0, 0), (0, 0)), mode="edge")
        dx = jnp.pad(dx, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
        edges = jnp.mean(jnp.sqrt(dy ** 2 + dx ** 2), axis=-1, keepdims=True)
        emin, emax = jnp.min(edges), jnp.max(edges)
        edges = jnp.where(emax - emin < 1e-6, jnp.zeros_like(edges), (edges - emin) / (emax - emin + 1e-6))

        small = nn.initializers.variance_scaling(0.01, "fan_avg", "uniform")
        h = nn.Conv(self.edge_channels, (3, 3), padding=1, kernel_init=small, name="edge0")(mask_logits)
        h = get_normalization(self.norm, self.edge_channels, min(self.norm_groups, self.edge_channels), name="edge_norm0")(h, train=train)
        h = get_activation(self.activation, self.activation_beta)(h)
        h = nn.Conv(self.edge_channels, (3, 3), padding=1, kernel_init=small, name="edge1")(h)
        h = get_normalization(self.norm, self.edge_channels, min(self.norm_groups, self.edge_channels), name="edge_norm1")(h, train=train)
        h = get_activation(self.activation, self.activation_beta)(h)
        refined_edges = nn.Conv(mask_logits.shape[-1], (1, 1), kernel_init=small, name="edge_out")(h)

        blend = self.param("blend_weight", lambda k: jnp.asarray(0.01))
        return mask_logits + blend * refined_edges * edges


class ProgressiveUpsamplingDecoder(nn.Module):
    """Two 2x deconv stages + projection (refinement.py:152-215)."""

    num_classes: int = 3
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, features: jnp.ndarray, target_hw: Tuple[int, int], train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        c = features.shape[-1]
        x = features
        for i, ch in enumerate((c // 2, c // 4)):
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME", name=f"stage{i}_deconv")(x)
            x = get_normalization(self.norm, ch, min(self.norm_groups, ch), name=f"stage{i}_norm")(x, train=train)
            x = get_activation(self.activation, self.activation_beta)(x)
            x = ResidualBlock(ch, name=f"stage{i}_res", **kw)(x, train=train)
        x = QConv(self.num_classes, (1, 1), name="proj")(x)
        if x.shape[1:3] != tuple(target_hw):
            x = resize_bilinear(x, target_hw[0], target_hw[1])
        return x


class SubPixelDecoder(nn.Module):
    """PixelShuffle upsampling decoder (refinement.py:218-252)."""

    num_classes: int = 3
    upscale_factor: int = 2

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        r = self.upscale_factor
        x = QConv(self.num_classes * r * r, (3, 3), padding=1, name="conv")(features)
        return pixel_shuffle(x, r)


class ContourBranch(nn.Module):
    """Single-channel sigmoid contour map (refinement.py:255-295)."""

    contour_channels: int = 64
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        x = ConvNormAct(self.contour_channels, name="c0", **kw)(features, train=train)
        x = ConvNormAct(self.contour_channels, name="c1", **kw)(x, train=train)
        return jax.nn.sigmoid(QConv(1, (1, 1), name="out")(x))


class DistanceTransformDecoder(nn.Module):
    """Distance-map regression with a learned sharp-sigmoid threshold
    (refinement.py:298-344)."""

    distance_channels: int = 128
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        x = ConvNormAct(self.distance_channels, name="d0", **kw)(features, train=train)
        x = ResidualBlock(self.distance_channels, name="d_res", **kw)(x, train=train)
        distance_map = QConv(1, (1, 1), name="out")(x)
        threshold = self.param("threshold", lambda k: jnp.asarray(0.3))
        mask = jax.nn.sigmoid((distance_map - threshold) * 10.0)
        return mask, distance_map


class RefinedHierarchicalHead(nn.Module):
    """HierarchicalHeadV2 + optional refinement modules
    (refinement.py:609-804). The flagship configs enable contour detection +
    distance transform (SURVEY §3.1)."""

    mid_channels: int = 256
    mask_size: Tuple[int, int] = (56, 56)
    dropout_rate: float = 0.1
    use_attention_module: bool = False
    use_boundary_refinement: bool = False
    use_progressive_upsampling: bool = False
    use_subpixel_conv: bool = False
    use_contour_detection: bool = False
    use_distance_transform: bool = False
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0
    base_channels: int = 96
    depth: int = 3

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        mh, mw = self.mask_size
        logits, aux = HierarchicalHeadV2(
            mid_channels=self.mid_channels,
            mask_size=self.mask_size,
            dropout_rate=self.dropout_rate,
            use_attention_module=self.use_attention_module,
            base_channels=self.base_channels,
            depth=self.depth,
            expose_shared=True,
            name="base_head",
            **kw,
        )(features, train=train)
        shared = aux["shared_features"]

        if self.use_progressive_upsampling:
            logits = ProgressiveUpsamplingDecoder(num_classes=3, name="progressive", **kw)(
                shared, (mh, mw), train=train)
        elif self.use_subpixel_conv:
            logits = SubPixelDecoder(num_classes=3, name="subpixel")(shared)
            if logits.shape[1:3] != (mh, mw):
                logits = resize_bilinear(logits, mh, mw)

        if self.use_boundary_refinement:
            logits = BoundaryRefinement(name="boundary", **kw)(logits, train=train)

        if self.use_contour_detection:
            contours = ContourBranch(name="contour", **kw)(shared, train=train)
            if contours.shape[1:3] != (mh, mw):
                contours = resize_bilinear(contours, mh, mw)
            aux["contours"] = contours

        if self.use_distance_transform:
            dmask, dmap = DistanceTransformDecoder(name="distance", **kw)(shared, train=train)
            if dmask.shape[1:3] != (mh, mw):
                dmask = resize_bilinear(dmask, mh, mw)
                dmap = resize_bilinear(dmap, mh, mw)
            aux["distance_mask"] = dmask
            aux["distance_map"] = dmap

        return logits, aux


class PretrainedUNetGuidedHead(nn.Module):
    """Direct 3-class head guided by the frozen stage-1 fg probability
    (hierarchical_segmentation_rgb.py:43-218). Used by non-refinement
    configs; synthesises ``bg_fg_logits`` as log-probs from the frozen mask
    so the hierarchical loss still applies."""

    mid_channels: int = 256
    mask_size: Tuple[int, int] = (56, 56)
    dropout_rate: float = 0.1
    use_attention_module: bool = False
    norm: str = "layernorm2d"
    norm_groups: int = 8
    activation: str = "relu"
    activation_beta: float = 1.0

    @nn.compact
    def __call__(self, features: jnp.ndarray, bg_fg_mask: jnp.ndarray, train: bool = False):
        kw = dict(norm=self.norm, norm_groups=self.norm_groups,
                  activation=self.activation, activation_beta=self.activation_beta)
        mh, mw = self.mask_size
        mc = self.mid_channels
        act = get_activation(self.activation, self.activation_beta)

        # The reference extracts CHANNEL 1 of the 2-channel wrapper crop as
        # the "foreground" logit (hierarchical_segmentation_rgb.py:135-137) —
        # note this is the wrapper's negated channel; the quirk is preserved
        # for checkpoint parity.
        if bg_fg_mask.shape[-1] == 2:
            fg_logit = bg_fg_mask[..., 1:2]
        else:
            fg_logit = bg_fg_mask
        fg_prob = jax.nn.sigmoid(fg_logit)
        if fg_prob.shape[1:3] != features.shape[1:3]:
            fg_prob_ds = resize_bilinear(fg_prob, features.shape[1], features.shape[2])
        else:
            fg_prob_ds = fg_prob

        x = jnp.concatenate([features, fg_prob_ds], axis=-1)
        x = QConv(features.shape[-1], (1, 1), name="input_adjust")(x)
        x = ConvNormAct(mc, name="fp_in", **kw)(x, train=train)
        x = Dropout2d(self.dropout_rate, name="fp_drop0")(x, train=train)
        x = ResidualBlock(mc, name="fp_res0", **kw)(x, train=train)
        x = Dropout2d(self.dropout_rate, name="fp_drop1")(x, train=train)
        x = ResidualBlock(mc, name="fp_res1", **kw)(x, train=train)

        if self.use_attention_module:
            a = act(QConv(mc // 4, (1, 1), name="att0")(x))
            a = jax.nn.sigmoid(QConv(1, (1, 1), name="att1")(a))
            x = x * (a * (0.5 + 0.5 * fg_prob_ds))

        h = ConvNormAct(mc // 2, name="cls0", **kw)(x, train=train)

        def bias_init(key, shape, dtype=jnp.float32):
            del key
            return jnp.asarray([0.0, 0.0, -0.5], dtype)  # non-target rarer

        final = nn.Conv(3, (1, 1), bias_init=bias_init, name="cls_out")(h)
        if final.shape[1:3] != (mh, mw):
            final = resize_bilinear(final, mh, mw)

        # Reference recomputes the sigmoid from the *resized logit*
        # (rgb.py:186-195), not a resized probability.
        if fg_logit.shape[1:3] != (mh, mw):
            fg_prob_full = jax.nn.sigmoid(resize_bilinear(fg_logit, mh, mw))
        else:
            fg_prob_full = fg_prob
        bg_fg_logits = jnp.concatenate(
            [jnp.log(1.0 - fg_prob_full + 1e-7), jnp.log(fg_prob_full + 1e-7)], axis=-1
        )

        aux = {
            "bg_fg_logits": bg_fg_logits,
            "target_nontarget_logits": final[..., 1:3],
            "fg_prob": fg_prob_full,
        }
        return final, aux
