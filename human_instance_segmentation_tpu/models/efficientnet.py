"""EfficientNet-B0..B7 encoders (Flax, NHWC) with UNet feature taps.

TPU-native replacement for the reference's `timm-efficientnet-{b0,b1,b3,b7}`
encoders loaded through segmentation-models-pytorch
(/root/reference/src/human_edge_detection/advanced/hierarchical_segmentation_unet.py:1708-1916).
This is a from-scratch Flax implementation of the standard EfficientNet
recipe (MBConv + SE, width/depth compound scaling), not a port: NHWC layout,
'SAME' spatial padding (the TF convention the timm tf_* variants use, which
is also XLA's native conv padding), SiLU activations, BatchNorm eps 1e-3.

Feature taps follow the smp encoder contract so the UNet decoder sees five
scales: [stem s2, stage2 s4, stage3 s8, stage5 s16, stage7 s32].
Channel counts for B0: (32, 24, 40, 112, 320) — matching the reference's
encoder out_channels so capacity is comparable.

Depthwise + 1x1 convs dominate; XLA maps the 1x1 expansions onto the MXU and
fuses BN+SiLU into them. bf16-friendly throughout.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.quant import QConv

# (expand_ratio, kernel, stride, out_channels, num_repeat) for B0
_B0_STAGES = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)

# (width_mult, depth_mult, default drop_rate)
VARIANTS = {
    "tiny": (0.25, 0.25, 0.0),  # test/dry-run variant: 7 blocks, 8-ch stem
    "b0": (1.0, 1.0, 0.2),
    "b1": (1.0, 1.1, 0.2),
    "b2": (1.1, 1.2, 0.3),
    "b3": (1.2, 1.4, 0.3),
    "b4": (1.4, 1.8, 0.4),
    "b5": (1.6, 2.2, 0.4),
    "b6": (1.8, 2.6, 0.5),
    "b7": (2.0, 3.1, 0.5),
}


def round_channels(c: float, width_mult: float, divisor: int = 8) -> int:
    c *= width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


def _bn(name: str, train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3, name=name)


class SqueezeExcite(nn.Module):
    squeeze_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_channels, (1, 1), name="reduce")(s)
        s = jax.nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), name="expand")(s)
        return x * jax.nn.sigmoid(s)


class _ConvKernel(nn.Module):
    """Parameter holder matching nn.Conv's tree for the fused path."""

    shape: Tuple[int, ...]
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = (self.param("bias", nn.initializers.zeros, (self.shape[-1],))
             if self.use_bias else None)
        return k, b


class _BNParams(nn.Module):
    """nn.BatchNorm's parameter/stat tree without the apply.

    ``epsilon`` mirrors the encoder's nn.BatchNorm (TF convention 1e-3);
    export's BN fold reads it via collect_bn_eps."""

    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        return scale, bias, mean.value, var.value


class _SEParams(nn.Module):
    """SqueezeExcite's parameter tree (reduce/expand convs with bias)."""

    squeeze_channels: int
    channels: int

    @nn.compact
    def __call__(self):
        kr, br = _ConvKernel((1, 1, self.channels, self.squeeze_channels),
                             use_bias=True, name="reduce")()
        ke, be = _ConvKernel((1, 1, self.squeeze_channels, self.channels),
                             use_bias=True, name="expand")()
        return kr, br, ke, be


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation.

    ``fused=True`` (serving only) computes the identical math through the
    fused Pallas kernel (ops/pallas_mbconv.py): BNs folded into the convs,
    per-image VMEM-resident tiles, same parameter tree.
    """

    out_channels: int
    expand_ratio: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    drop_path: float = 0.0
    fused: bool = False
    # Serving: consume the input in S2D(2) phase-major form (ops/s2d.py) —
    # the composed-kernel path for the lane-starved high-res blocks. With
    # ``s2d_out`` (stride-1 k3 blocks) the output stays in S2D form; without
    # it (the stride-2 k3 stage-exit block) the depthwise conv's stride-2
    # absorbs the depth-to-space and the output is the PLAIN half-res map.
    s2d_in: bool = False
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.s2d_in and not train:
            return self._s2d(x)
        in_ch = x.shape[-1]
        mid = in_ch * self.expand_ratio
        if self.fused and not train:
            return self._fused(x, in_ch, mid)
        h = x
        if self.expand_ratio != 1:
            h = QConv(mid, (1, 1), use_bias=False, name="expand_conv")(h)
            h = _bn("bn0", train)(h)
            h = jax.nn.silu(h)
        h = nn.Conv(
            mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding="SAME", feature_group_count=mid, use_bias=False, name="dw_conv",
        )(h)
        h = _bn("bn1", train)(h)
        h = jax.nn.silu(h)
        if self.se_ratio > 0:
            h = SqueezeExcite(max(1, int(in_ch * self.se_ratio)), name="se")(h)
        h = QConv(self.out_channels, (1, 1), use_bias=False, name="project_conv")(h)
        h = _bn("bn2", train)(h)
        if self.stride == 1 and in_ch == self.out_channels:
            if train and self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (h.shape[0], 1, 1, 1))
                h = h * mask / keep
            h = h + x
        return h

    def _s2d(self, x: jnp.ndarray) -> jnp.ndarray:
        """Serving path on S2D(2) input (B, H/2, W/2, 4*Ci), exact vs the
        plain path (eval BNs folded into the composed kernels; zero padding
        on the half grid equals full-res zero padding)."""
        from jax import lax

        from ..ops.pallas_mbconv import fold_bn
        from ..ops.s2d import (conv1x1_kernel_s2d, dw5_stride2_exit_kernel_s2d,
                               dw_kernel_s2d, dw_stride2_exit_kernel_s2d,
                               dw_stride2_s2d_kernel)

        assert self.kernel == 3 or (self.kernel == 5 and self.stride == 2
                                    and not self.s2d_out), \
            "S2D MBConv path: k=3 blocks, or a k=5 s2 plain-exit block"
        dt = x.dtype
        in_ch = x.shape[-1] // 4
        mid = in_ch * self.expand_ratio
        f32 = jnp.float32
        conv = lambda h, k, pad="SAME", s=1: lax.conv_general_dilated(
            h, k.astype(dt), (s, s), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        t4 = lambda v: jnp.tile(v, 4).astype(dt)

        h = x
        if self.expand_ratio != 1:
            ke, _ = _ConvKernel((1, 1, in_ch, mid), name="expand_conv")()
            g0, b0 = fold_bn(*_BNParams(name="bn0")(mid))
            kes = conv1x1_kernel_s2d(ke.astype(f32) * g0[None, None, None])
            h = jax.nn.silu(conv(h, kes) + t4(b0))

        kdw, _ = _ConvKernel((self.kernel, self.kernel, 1, mid), name="dw_conv")()
        g1, b1 = fold_bn(*_BNParams(name="bn1")(mid))
        kdwf = kdw.astype(f32) * g1[None, None, None]
        if self.s2d_out and self.stride == 1:
            d = jax.nn.silu(conv(h, dw_kernel_s2d(kdwf)) + t4(b1))
        elif self.s2d_out:
            # stride-2 k3 staying in S2D form: output is the S2D(2) form of
            # the half-res map (cell grid must be even; encoder gates on %8)
            d = conv(h, dw_stride2_s2d_kernel(kdwf), pad=((0, 1), (0, 1)), s=2)
            d = jax.nn.silu(d + t4(b1))
        elif self.kernel == 5:
            # k5 s2 exit to the plain half-res map (stage-2 entry)
            d = conv(h, dw5_stride2_exit_kernel_s2d(kdwf))
            d = jax.nn.silu(d + b1.astype(dt))
        else:
            assert self.stride == 2
            d = conv(h, dw_stride2_exit_kernel_s2d(kdwf),
                     pad=((0, 1), (0, 1)))
            d = jax.nn.silu(d + b1.astype(dt))

        if self.se_ratio > 0:
            sq = max(1, int(in_ch * self.se_ratio))
            kr, br, kse, bse = _SEParams(sq, mid, name="se")()
            if self.s2d_out:
                m = jnp.mean(d.reshape(*d.shape[:3], 4, mid), axis=(1, 2, 3))
            else:
                m = jnp.mean(d, axis=(1, 2))
            u = jax.nn.silu(m.astype(f32) @ kr[0, 0].astype(f32)
                            + br.astype(f32)[None])
            s = jax.nn.sigmoid(u @ kse[0, 0].astype(f32)
                               + bse.astype(f32)[None])
            s = s.astype(dt)
            d = d * (jnp.tile(s, (1, 4)) if self.s2d_out else s)[:, None, None, :]

        kp, _ = _ConvKernel((1, 1, mid, self.out_channels), name="project_conv")()
        g2, b2 = fold_bn(*_BNParams(name="bn2")(self.out_channels))
        kpf = kp.astype(f32) * g2[None, None, None]
        if self.s2d_out:
            y = conv(d, conv1x1_kernel_s2d(kpf)) + t4(b2)
        else:
            y = conv(d, kpf) + b2.astype(dt)
        if self.stride == 1 and in_ch == self.out_channels:
            y = y + x
        return y

    def _fused(self, x: jnp.ndarray, in_ch: int, mid: int) -> jnp.ndarray:
        from ..ops.pallas_mbconv import fold_bn, fused_mbconv_chw

        dt = x.dtype
        if self.expand_ratio != 1:
            ke, _ = _ConvKernel((1, 1, in_ch, mid), name="expand_conv")()
            g0, b0 = fold_bn(*_BNParams(name="bn0")(mid))
            we = (ke[0, 0].astype(jnp.float32) * g0[None]).astype(dt)
            be = b0.astype(dt)
        else:
            we = be = None
        kdw, _ = _ConvKernel((self.kernel, self.kernel, 1, mid), name="dw_conv")()
        g1, b1 = fold_bn(*_BNParams(name="bn1")(mid))
        wdw = (kdw[:, :, 0].astype(jnp.float32) * g1[None, None]).astype(dt)
        bdw = b1.astype(dt)
        sq = max(1, int(in_ch * self.se_ratio))
        kr, br_, kse, bse = _SEParams(sq, mid, name="se")()
        kp, _ = _ConvKernel((1, 1, mid, self.out_channels), name="project_conv")()
        g2, b2 = fold_bn(*_BNParams(name="bn2")(self.out_channels))
        wp = (kp[0, 0].astype(jnp.float32) * g2[None]).astype(dt)
        bp = b2.astype(dt)
        residual = self.stride == 1 and in_ch == self.out_channels
        y = fused_mbconv_chw(
            jnp.transpose(x, (0, 3, 1, 2)), we, be, wdw, bdw,
            kr[0, 0].astype(dt), br_.astype(dt),
            kse[0, 0].astype(dt), bse.astype(dt),
            wp, bp,
            kernel=self.kernel, stride=self.stride, residual=residual,
            interpret=jax.default_backend() == "cpu")
        return jnp.transpose(y, (0, 2, 3, 1))


class EfficientNetEncoder(nn.Module):
    """EfficientNet backbone returning five multi-scale feature maps.

    ``fused_blocks``: serving-only — run the first N MBConv blocks (the
    high-resolution, HBM-bound ones) through the fused Pallas kernel.
    """

    variant: str = "b0"
    drop_path_rate: float = 0.0
    fused_blocks: int = 0
    # Serving: compute the stem + stage-0 blocks + the stage-1 entry block
    # in S2D(2) form via composed kernels (ops/s2d.py) — the C=16/32
    # full-resolution tensors otherwise pad 4-8x in HBM lanes (measured
    # 5.4 -> 3.9 ms/batch-32, scripts/profile_encoder_s2d.py). The stem
    # tap (features[0]) is then returned in S2D(2) phase-major form; the
    # caller owns interpreting it (unet.py's fused decoder consumes it
    # directly, with no full-res materialisation anywhere).
    s2d_front: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        width, depth, _ = VARIANTS[self.variant]
        stem_ch = round_channels(32, width)
        s2d = (self.s2d_front and not train
               and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0)
        if s2d:
            from jax import lax

            from ..ops.pallas_mbconv import fold_bn
            from ..ops.s2d import stem_kernel_s2d

            kst, _ = _ConvKernel((3, 3, 3, stem_ch), name="stem_conv")()
            g, bsh = fold_bn(*_BNParams(name="stem_bn")(stem_ch))
            k5 = stem_kernel_s2d(
                kst.astype(jnp.float32) * g[None, None, None])
            h = lax.conv_general_dilated(
                x, k5.astype(x.dtype), (4, 4), ((0, 1), (0, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jax.nn.silu(h + jnp.tile(bsh, 4).astype(x.dtype))
        else:
            h = nn.Conv(stem_ch, (3, 3), strides=(2, 2), padding="SAME", use_bias=False, name="stem_conv")(x)
            h = _bn("stem_bn", train)(h)
            h = jax.nn.silu(h)

        # Five taps, smp encoder contract: stem@s2, stage1-out@s4,
        # stage2-out@s8, stage4-out@s16, stage6-out@s32. With s2d_front,
        # features[0] is the stem tap in S2D(2) form.
        features = [h]
        tap_after = {1, 2, 4, 6}
        total_blocks = sum(round_repeats(r, depth) for (_, _, _, _, r) in _B0_STAGES)
        block_idx = 0
        for stage_i, (e, k, s, c, r) in enumerate(_B0_STAGES):
            out_ch = round_channels(c, width)
            repeats = round_repeats(r, depth)
            for j in range(repeats):
                dp = self.drop_path_rate * block_idx / max(total_blocks, 1)
                stride = s if j == 0 else 1
                # S2D coverage: all of stage 0 (k3 s1) in-form; stage 1's
                # entry block (k3 s2) exits to the plain half-res map.
                # Extending in-form through stage 1/2 (dw_stride2_s2d_kernel
                # + dw5_stride2_exit_kernel_s2d, both exact) was MEASURED
                # SLOWER (27.2 -> 32.3 ms/batch-32 stage 1): the dense
                # phase-expanded depthwise costs O((4*mid)^2) FLOPs, a
                # ~1 TFLOP bomb at stage-1's mid=144. Coverage stops where
                # the composed kernels stay cheap.
                blk_s2d = s2d and (stage_i == 0 or (stage_i == 1 and j == 0))
                h = MBConv(
                    out_channels=out_ch,
                    expand_ratio=e,
                    kernel=k,
                    stride=stride,
                    drop_path=dp,
                    fused=(not blk_s2d) and block_idx < self.fused_blocks,
                    s2d_in=blk_s2d,
                    s2d_out=blk_s2d and stride == 1,
                    name=f"stage{stage_i}_block{j}",
                )(h, train=train)
                block_idx += 1
            if stage_i in tap_after:
                features.append(h)
        return tuple(features)


def encoder_feature_channels(variant: str) -> Tuple[int, ...]:
    """Channel counts of the five taps (s2, s4, s8, s16, s32)."""
    width, depth, _ = VARIANTS[variant]
    del depth
    stem = round_channels(32, width)
    # taps: stem@s2, stage1@s4, stage2@s8, stage4@s16, stage6@s32
    chans = [round_channels(c, width) for (_, _, _, c, _) in _B0_STAGES]
    return (stem, chans[1], chans[2], chans[4], chans[6])
