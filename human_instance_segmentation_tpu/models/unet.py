"""Full-image binary people-segmentation UNet (stage 1 of the pipeline).

TPU-native equivalent of the reference's frozen smp.Unet with
timm-EfficientNet encoder (`PreTrainedPeopleSegmentationUNet`,
/root/reference/src/human_edge_detection/advanced/hierarchical_segmentation_unet.py:1708-1916)
and its 1ch->2ch fixed-conv wrapper
(`PreTrainedPeopleSegmentationUNetWrapper`, same file :1919-1993).

Decoder follows the smp UnetDecoder recipe: five 2x-upsample stages with
skip concatenation and (conv3x3-BN-ReLU)x2 blocks, decoder channels
(256, 128, 64, 32, 16), then a 3x3 segmentation head to `classes` logits.
All NHWC; upsampling is the shared separable-matmul bilinear resize so the
whole stage compiles to one fused XLA program.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pallas_tail import TR as _TAIL_TR
from ..ops.pallas_tail import tail_with_borders
from ..ops.quant import QConv, calibrating, quant_enabled, static_scales
from ..ops.s2d import (conv3x3_n4, conv3x3_s2d, conv3x3_s2d_to_n4,
                       conv3x3_strided_s2d, conv_up_s2d, conv_up_s2d_nested,
                       depth_to_space, n4_regroup_to_s2d, n4_to_plain,
                       space_to_depth, tile_channel_params)
from ..ops.sampling import resize_bilinear
from .efficientnet import EfficientNetEncoder


class _Conv3Params(nn.Module):
    """Parameter holder with nn.Conv's exact tree/initialisers, for paths
    that consume the kernel directly (the fused S2D tail)."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return k, b


class _BNParams(nn.Module):
    """nn.BatchNorm's parameter/stat tree without the full-res apply.

    ``epsilon`` is what the fused-path apply sites use (torch default 1e-5,
    matching the unfused nn.BatchNorm); export's BN fold reads it off the
    module via collect_bn_eps instead of guessing from the path."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        return scale, bias, mean.value, var.value


class _DecoderParams(nn.Module):
    """DecoderBlock's fused-path parameter tree (conv0/bn0/conv1/bn1) without
    the apply — for the Pallas fused tail, which consumes the raw weights."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        k0, _ = _Conv3Params(self.features, name="conv0")(cin)
        bn0 = _BNParams(name="bn0")(self.features)
        k1, _ = _Conv3Params(self.features, name="conv1")(self.features)
        bn1 = _BNParams(name="bn1")(self.features)
        return k0, bn0, k1, bn1


def _bn_relu_s2d(y, scale, bias, mean, var, eps=1e-5):
    t = lambda v: tile_channel_params(v.astype(y.dtype))
    return jax.nn.relu((y - t(mean)) * jax.lax.rsqrt(t(var) + eps) * t(scale) + t(bias))


def _tail_qscales(module, tags):
    """Calibrated static int8 scales for a fused-tail module's quantization
    points, keyed ``<module path>#<tag>`` (see ops/quant.py:collect_scales).
    Returns {tag: float | None}; all-None outside int8 serving. Dynamic
    (uncalibrated) int8 is deliberately NOT attempted here — measured to
    lose throughput (the abs-max reduce is a full extra pass over high-res
    tensors), so a missing scale leaves that conv in bf16."""
    from ..ops.quant import int8_denied

    if not quant_enabled() or int8_denied(module.path):
        return {t: None for t in tags}
    sc = static_scales()
    if not sc:
        return {t: None for t in tags}
    p = "/".join(module.path)
    return {t: sc.get(p + "#" + t) for t in tags}


def _sow_amax(module, tag, x):
    module.sow("calib", "amax_" + tag,
               jnp.max(jnp.abs(x.astype(jnp.float32))))


class DecoderBlock(nn.Module):
    """2x upsample -> concat skip -> (conv-BN-ReLU) x 2.

    With ``fused=True`` (eval only) the block computes the identical math in
    space-to-depth form (see ops/s2d.py): the upsample is folded into conv0's
    kernel and both convs run on the half-resolution grid with 4x channels —
    same parameters, same outputs, ~MXU-shaped instead of lane-starved. The
    return value is then the S2D(2) form of the full-res output.
    """

    features: int
    fused: bool = False
    # 2x upsample stencil: "bilinear" (this repo's trained checkpoints) or
    # "nearest" (smp UnetDecoder's F.interpolate default — REQUIRED for
    # stage-1 logit parity with converted reference checkpoints,
    # hierarchical_segmentation_unet.py:1747-1799).
    upsample_mode: str = "bilinear"
    # input arrives in S2D(2) form from the previous fused stage (serving
    # only, skip-free blocks): the composed up+conv consumes it directly —
    # no depth_to_space materialisation of the small-C full-res tensor.
    input_s2d: bool = False
    # the skip arrives in S2D(2) form (encoder s2d_front stem tap): the
    # fused path consumes it via conv3x3_s2d — the full-res lane-padded
    # skip tensor never exists.
    skip_s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray | None, train: bool = False) -> jnp.ndarray:
        b, h, w, cx = x.shape
        if self.input_s2d:
            assert self.fused and not train and skip is None
            cin = cx // 4
            k0, _ = _Conv3Params(self.features, name="conv0")(cin)
            s0, b0, m0, v0 = _BNParams(name="bn0")(self.features)
            k1, _ = _Conv3Params(self.features, name="conv1")(self.features)
            s1, b1, m1, v1 = _BNParams(name="bn1")(self.features)
            y4 = conv_up_s2d_nested(x, k0, mode=self.upsample_mode)  # N4 on x's grid
            t = lambda v: jnp.tile(v.astype(y4.dtype), 16)
            y4 = jax.nn.relu((y4 - t(m0)) * jax.lax.rsqrt(t(v0) + 1e-5) * t(s0) + t(b0))
            y = n4_regroup_to_s2d(y4)                      # S2D(2) on 2x grid
            # keep the assembly/correction/bn/regroup pass out of the
            # consumer conv's operand fusion (measured 2x pathology, v3)
            y = jax.lax.optimization_barrier(y)
            y = conv3x3_s2d(y, k1)
            return _bn_relu_s2d(y, s1, b1, m1, v1)
        skip_is_s2d = self.skip_s2d and skip is not None
        skip_ch = 0 if skip is None else (
            skip.shape[-1] // 4 if skip_is_s2d else skip.shape[-1])
        size_ok = skip is None or (
            skip.shape[1:3] == ((h, w) if skip_is_s2d else (2 * h, 2 * w)))
        can_fuse = self.fused and not train and size_ok
        if can_fuse:
            cin = cx + skip_ch
            k0, _ = _Conv3Params(self.features, name="conv0")(cin)
            s0, b0, m0, v0 = _BNParams(name="bn0")(self.features)
            k1, _ = _Conv3Params(self.features, name="conv1")(self.features)
            s1, b1, m1, v1 = _BNParams(name="bn1")(self.features)

            if calibrating():
                _sow_amax(self, "x", x)
                if skip is not None:
                    _sow_amax(self, "skip", skip)
            from ..ops import quant as _quant
            if self.features >= _quant.TAIL_QUANT_MIN_FEATURES:
                qs = _tail_qscales(self, ("x", "skip", "mid"))
            else:
                qs = {"x": None, "skip": None, "mid": None}
            from ..ops.s2d import quantize_static

            def prequant(t, sc):
                # producer-side quantize + fusion cut (see the qs["mid"]
                # barrier note below); _conv_q accepts the s8 tensor
                if sc is None or t.dtype == jnp.int8:
                    return t
                return jax.lax.optimization_barrier(quantize_static(t, sc))

            y = conv_up_s2d(prequant(x, qs["x"]), k0[:, :, :cx],
                            qscale=qs["x"], mode=self.upsample_mode)
            if skip_is_s2d:
                # S2D skip (encoder s2d_front): same full-res 3x3 conv math
                # directly on the phase form
                y = y + conv3x3_s2d(prequant(skip, qs["skip"]),
                                    k0[:, :, cx:], qscale=qs["skip"])
            elif skip is not None:
                # one 4x4 stride-2 conv straight off the full-res skip — no
                # space_to_depth relayout (profile_fused_parts.py: ~3.7 ms)
                y = y + conv3x3_strided_s2d(skip, k0[:, :, cx:],
                                            qscale=qs["skip"])
            y = _bn_relu_s2d(y, s0, b0, m0, v0)
            if calibrating():
                _sow_amax(self, "mid", y)
            if qs["mid"] is not None:
                # Quantize in the producer epilogue, then CUT the fusion:
                # without the barrier XLA fuses bn+relu+quantize into the
                # consumer conv's operand and the int8 conv runs 3-6x slower
                # than bf16 (6.98 -> 14.92 ms/batch at decoder-4 shapes,
                # scripts/exp_r4_d4int8.py) — the same operand-fusion
                # pathology the conv_up border merge hits, now on the
                # quantize chain.
                from ..ops.s2d import quantize_static
                y = jax.lax.optimization_barrier(
                    quantize_static(y, qs["mid"]))
            y = conv3x3_s2d(y, k1, qscale=qs["mid"])
            return _bn_relu_s2d(y, s1, b1, m1, v1)

        if skip_is_s2d:  # unfused consumer: materialise the plain skip
            skip = depth_to_space(skip, 2)
        if self.upsample_mode == "nearest":
            from ..ops.s2d import upsample_2x_nearest

            x = upsample_2x_nearest(x)
        else:
            x = resize_bilinear(x, h * 2, w * 2)
        if skip is not None:
            # Guard odd input sizes: match the skip's spatial extent.
            if x.shape[1:3] != skip.shape[1:3]:
                x = resize_bilinear(x, skip.shape[1], skip.shape[2])
            x = jnp.concatenate([x, skip], axis=-1)
        for i in range(2):
            x = QConv(self.features, (3, 3), padding=1, use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"bn{i}")(x)
            x = jax.nn.relu(x)
        return x


class PeopleSegmentationUNet(nn.Module):
    """EfficientNet-UNet producing single-channel person/background logits.

    ``apply(params, images)`` -> logits (B, H, W, 1); images in [0, 1] are
    normalised inside the model (ImageNet mean/std by default, matching the
    reference's auto-detected normalisation for distilled checkpoints,
    hierarchical_segmentation_unet.py:1754-1792).
    """

    encoder_variant: str = "b0"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    classes: int = 1
    normalize_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    normalize_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    drop_path_rate: float = 0.0
    # Decoder 2x upsample stencil. "bilinear" for this repo's own trained
    # checkpoints; "nearest" reproduces smp's UnetDecoder
    # (F.interpolate(scale_factor=2, mode="nearest")) so CONVERTED reference
    # checkpoints produce matching stage-1 logits (the converter sets this,
    # convert_weights.py).
    upsample_mode: str = "bilinear"
    # Serving optimisation: compute the last N decoder stages + seg head in
    # space-to-depth form (exact same params/math; ops/s2d.py). The
    # high-res low-channel tail is the flagship's dominant cost at 2-5% MFU;
    # S2D-shaped convs reach ~80% (scripts/profile_stage1.py).
    fused_tail: int = 0
    # Serving: run the first N encoder MBConv blocks through the fused
    # Pallas kernel (ops/pallas_mbconv.py) — the high-res blocks are
    # HBM-bound and XLA moves the 6x-expanded tensor through HBM ~4 times.
    encoder_fused_blocks: int = 0
    # Serving: encoder stem + stage-0 + stage-1 entry in S2D(2) composed
    # form (models/efficientnet.py); the stem tap feeds the fused decoder
    # directly in phase form. Exact (tests/test_s2d_front.py).
    encoder_s2d_front: bool = False
    # Experimental: chain consecutive fused skip-free decoder stages in S2D
    # form (ops/s2d.py::conv_up_s2d_nested). Exact but measured slower than
    # the plain chain under XLA; see the note at the call site.
    nested_tail: bool = False
    # Serving: run the LAST decoder stage + seg head as one VMEM-resident
    # Pallas kernel (ops/pallas_tail.py) — identical params/math; output is
    # the DENSE rank-3 (B, H, W) logit map (raw form "dense"). Requires the
    # previous stage fused (S2D input), a skip-free last stage, classes=1,
    # and the cell grid a multiple of the kernel's row tile.
    pallas_tail: bool = False
    # Serving: compute the LAST decoder stage + seg head entirely in N4
    # phase form (ops/s2d.py::conv_up_s2d_nested + conv3x3_n4) — neither
    # the lane-padded full-res input (depth_to_space) nor the N4 -> S2D(2)
    # regroup transpose ever materialises. Identical params/math; requires
    # the previous stage fused (S2D input) and a skip-free last stage.
    n4_tail: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False, raw: bool = False,
                 stages: int | None = None):
        """With ``raw=True`` returns ``(form, tensor)`` where form is
        ``"n4"`` (fused tail active: tensor is the nested-S2D(4) logits,
        (B, H/4, W/4, 16*classes) — see ops/s2d.py) or ``"plain"``
        ((B, H, W, classes)). The N4 form avoids ever materialising the
        full-resolution small-channel logit map, whose 128-lane padding
        costs 8-32x its logical bytes in HBM.

        ``stages`` (profiling only): return the intermediate activation
        after the first ``stages`` decoder blocks (0 = encoder output) —
        used to bisect in-context stage costs on hardware."""
        mean = jnp.asarray(self.normalize_mean, images.dtype)
        std = jnp.asarray(self.normalize_std, images.dtype)
        x = (images - mean) / std

        s2d_front = (self.encoder_s2d_front and not train
                     and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0)
        feats = EfficientNetEncoder(
            variant=self.encoder_variant, drop_path_rate=self.drop_path_rate,
            fused_blocks=0 if train else self.encoder_fused_blocks,
            s2d_front=s2d_front, name="encoder"
        )(x, train=train)
        # feats: (s2, s4, s8, s16, s32); with s2d_front the s2 stem tap is
        # in S2D(2) phase form (consumed by the fused decoder directly)
        skips = list(feats[:-1])[::-1]  # s16, s8, s4, s2
        h = feats[-1]
        if stages == 0:
            return h
        n = len(self.decoder_channels)
        fused = 0 if train else self.fused_tail
        # Serving: store the s4 skip tap (decoder2's skip) in S2D(2) form.
        # Plain it is the worst-padded tensor in the graph (24ch at H/4
        # pads 5.3x in HBM lanes) and its fused consumer is a K=24 strided
        # conv; in S2D form the consumer is conv3x3_s2d with K=9*4*C —
        # MXU-shaped. The transpose fuses into the producing stage's
        # epilogue. Only when decoder2 will actually run fused.
        s4_tap_s2d = (
            len(skips) == 4 and skips[2] is not None and fused >= n - 2
            and skips[2].shape[1] % 2 == 0 and skips[2].shape[2] % 2 == 0)
        if s4_tap_s2d:
            skips[2] = space_to_depth(skips[2], 2)
        h_is_s2d = False
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            skip_s2d = skip is not None and (
                (s2d_front and i == len(skips) - 1) or (s4_tap_s2d and i == 2))
            hh, hw = h.shape[1], h.shape[2]
            if h_is_s2d:
                hh, hw = 2 * hh, 2 * hw  # full-res extent of the s2d form
            skip_fullres = None if skip is None else (
                (2 * skip.shape[1], 2 * skip.shape[2]) if skip_s2d
                else skip.shape[1:3])
            use_fused = (
                i >= n - fused
                and (skip is None or skip_fullres == (2 * hh, 2 * hw))
            )
            # consecutive fused skip-free stages CAN chain in S2D form via
            # conv_up_s2d_nested (exact; tests/test_s2d.py) — measured SLOWER
            # in-context on v5e: the composed conv reaches 95% MFU but XLA
            # splits the assembly/correction/regroup epilogue into ~5 full
            # tensor passes over layout-padded 5-D intermediates (traces r2).
            # Kept off; the Pallas fused tail owns this instead.
            input_s2d = self.nested_tail and h_is_s2d and use_fused and skip is None
            if (self.n4_tail and not train and i == n - 1 and h_is_s2d
                    and skip is None and use_fused
                    and h.shape[1] >= 3 and h.shape[2] >= 3):
                # N4 tail: decoder{n-1} + seg head entirely in phase form.
                k0, bn0, k1, bn1 = _DecoderParams(ch, name=f"decoder{i}")(h.shape[-1] // 4)
                kh, bsh = _Conv3Params(self.classes, use_bias=True, name="seg_head")(ch)
                t16 = lambda v: jnp.tile(v.astype(h.dtype), 16)
                y4 = conv_up_s2d_nested(h, k0, mode=self.upsample_mode)
                s0, b0, m0, v0 = bn0
                y4 = jax.nn.relu((y4 - t16(m0)) * jax.lax.rsqrt(t16(v0) + 1e-5)
                                 * t16(s0) + t16(b0))
                y4 = conv3x3_n4(y4, k1)
                s1, b1, m1, v1 = bn1
                y4 = jax.nn.relu((y4 - t16(m1)) * jax.lax.rsqrt(t16(v1) + 1e-5)
                                 * t16(s1) + t16(b1))
                y4 = conv3x3_n4(y4, kh) + jnp.tile(bsh.astype(y4.dtype), 16)
                if raw:
                    return "n4", y4
                return n4_to_plain(y4, self.classes)
            if (self.pallas_tail and not train and not calibrating()
                    and i == n - 1 and h_is_s2d
                    and self.upsample_mode == "bilinear"
                    and skip is None and use_fused and self.classes == 1
                    and h.shape[1] % _TAIL_TR == 0 and h.shape[1] >= 2 * _TAIL_TR
                    and h.shape[2] % 8 == 0):
                # Pallas fused tail: decoder{n-1} + seg head in one kernel;
                # parameter tree identical to the unfused path by name.
                # (Calibration passes take the plain fused path instead so
                # the #x/#mid/#head amax points get sown.)
                k0, bn0, k1, bn1 = _DecoderParams(ch, name=f"decoder{i}")(h.shape[-1] // 4)
                kh, bsh = _Conv3Params(self.classes, use_bias=True, name="seg_head")(ch)
                tail_scales = None
                if quant_enabled():
                    # calibrated static scales for the s8 tail kernel — the
                    # same quantization points the XLA qscale path uses
                    sc = static_scales() or {}
                    p = "/".join(self.path)
                    pfx = p + "/" if p else ""
                    tail_scales = (sc.get(f"{pfx}decoder{i}#x"),
                                   sc.get(f"{pfx}decoder{i}#mid"),
                                   sc.get(f"{p}#head" if p else "#head"))
                    if None in tail_scales:
                        tail_scales = None
                if tail_scales is not None:
                    # s8 MXU tail (ops/pallas_tail_q.py): XLA's s8 lowering
                    # is pathological at these shapes in context (6.98 ->
                    # 18.24 ms/batch, scripts/exp_r4_d4int8.py); the Pallas
                    # kernel runs the same per-phase matmuls at the MXU's
                    # int8 rate with all intermediates VMEM-resident.
                    from ..ops.pallas_tail_q import tail_with_borders_q

                    y = tail_with_borders_q(h, k0, bn0, k1, bn1, kh, bsh,
                                            *tail_scales)
                else:
                    y = tail_with_borders(h, k0, bn0, k1, bn1, kh, bsh)
                return ("dense", y) if raw else y[..., None]
            if h_is_s2d and not input_s2d:
                h = depth_to_space(h, 2)
            h = DecoderBlock(features=ch, name=f"decoder{i}", fused=use_fused,
                             upsample_mode=self.upsample_mode,
                             input_s2d=input_s2d, skip_s2d=skip_s2d)(
                h, skip, train=train)
            h_is_s2d = use_fused
            if stages == i + 1:
                return h
        if h_is_s2d:
            ch_last = h.shape[-1] // 4
            k, bsh = _Conv3Params(self.classes, use_bias=True, name="seg_head")(ch_last)
            if calibrating():
                _sow_amax(self, "head", h)
            from ..ops import quant as _quant
            qh = (_tail_qscales(self, ("head",))["head"]
                  if ch_last >= _quant.TAIL_QUANT_MIN_FEATURES else None)
            if h.shape[1] % 2 == 0 and h.shape[2] % 2 == 0:
                # one strided conv -> nested S2D(4) logits; the C=classes
                # full-res tensor (32x lane-padded on TPU) never exists
                hdt = h.dtype
                if qh is not None:
                    # producer-side quantize + fusion cut (same operand-
                    # fusion pathology as the decoder mid boundary)
                    from ..ops.s2d import quantize_static
                    h = jax.lax.optimization_barrier(quantize_static(h, qh))
                y4 = conv3x3_s2d_to_n4(h, k, qscale=qh) + tile_channel_params(
                    bsh.astype(hdt), 4)
                if raw:
                    return "n4", y4
                return n4_to_plain(y4, self.classes)
            y = conv3x3_s2d(h, k) + tile_channel_params(bsh.astype(h.dtype))
            y = depth_to_space(y, 2)
            return ("plain", y) if raw else y
        y = nn.Conv(self.classes, (3, 3), padding=1, name="seg_head")(h)
        return ("plain", y) if raw else y


class PeopleSegUNetWrapper(nn.Module):
    """1ch -> 2ch fixed linear map: [+x, -x] (wrapper :1961-1971).

    Channel 0 carries the person/foreground logit (x > 0 == person), channel 1
    its negation; ``softmax(...)[..., 0] == sigmoid(2x)`` is the deployed
    ``binary_masks`` output (export_onnx_advanced.py:386-387).
    The 1x1 conv is a real parameter (initialised to [[+1], [-1]], bias 0) so
    checkpoints that perturbed it stay loadable, mirroring the reference's
    post-load repair of output_conv (train_advanced.py:1204-1246).
    """

    @nn.compact
    def __call__(self, x1: jnp.ndarray) -> jnp.ndarray:
        def winit(key, shape, dtype=jnp.float32):
            del key
            return jnp.array([[[[1.0, -1.0]]]], dtype=dtype).reshape(shape)

        return nn.Conv(2, (1, 1), kernel_init=winit, bias_init=nn.initializers.zeros, name="output_conv")(x1)
