"""Int8 serving-mode convolutions (dynamic post-training quantization).

The reference deploys through TensorRT, whose engines run fp16/int8 tactics
(/root/reference/README.md:553-563). The TPU-native equivalent: the MXU
executes s8xs8->s32 at twice the bf16 rate (measured 2.7x at stage-2 head
shapes on this chip, scripts/profile_r2.py lineage), so serving can run the
dense stage-2 convolutions in int8 with
- dynamic per-tensor activation scales (abs-max over the batch, computed
  in-graph each call — no calibration dataset or scale-store subsystem),
- static per-output-channel weight scales (folded from the live params at
  trace time).

``QConv`` is a drop-in for ``nn.Conv`` with an IDENTICAL parameter tree
(kernel/bias names, shapes, initialisers), so checkpoints are
interchangeable and the mode is a pure serving switch:

    with int8_serving():
        logits, aux = model.apply(params, images, rois, train=False)

Outside the context (or under training) QConv computes exactly what
nn.Conv computes. Accuracy: int8 is NOT bit-exact — the mode is validated
by mask-agreement/mIoU-delta checks (tests/test_quant.py, bench_int8).
"""

from __future__ import annotations

import threading
from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

_STATE = threading.local()

# Composed S2D decoder-tail convs: round 3 gated decoder4 + the seg head
# OUT of int8 (>=32) because their s8 convs measured catastrophically slow
# in context. Round 4 found the real cause: XLA fuses the bn+relu+quantize
# chain into the CONSUMER conv's operand (recomputed per halo read) unless
# an optimization_barrier cuts it — with producer-side quantize + barriers
# (models/unet.py) the full tail quantizes cleanly: bench_serving_matrix
# int8+fused_head 36.4 ms/batch vs +tq16 34.6 (878 -> 925 img/s), and
# tq1 == tq16 (every tail stage is already >=16). Gate kept as a
# measurable knob; 16 = everything.
TAIL_QUANT_MIN_FEATURES = 16

# Lower 1x1 stride-1 QConvs as s8xs8->s32 dot_general over flattened
# pixels instead of conv_general_dilated (see qconv2d). Negative result
# (scripts/exp_r4_enc_dot.py, encoder batch 32): numerically exact but
# 13.06 ms vs 11.88 conv-lowered vs 11.30 bf16 — the (B,H,W,C)->(BHW,C)
# collapse forces a relayout that costs more than the s8 conv lowering
# loses, so the encoder int8 deficit is byte/fusion-bound, not a matmul
# lowering problem. Kept as an opt-in knob.
# NOTE: read at TRACE time, not part of any jit cache key — flipping it
# after a function compiled keeps the old lowering. Re-jit (fresh
# jax.jit / InferenceEngine, like exp_r4_enc_dot.py does) after changing.
ONE_BY_ONE_AS_DOT = False


def _padding_is_zero(padding) -> bool:
    """True when the dot_general lowering of a 1x1 stride-1 conv is shape-
    correct: named modes are fine (SAME == VALID for k=1), explicit pads
    must be all-zero (nonzero pads change the OUTPUT shape, which the
    flattened matmul cannot reproduce)."""
    if isinstance(padding, str):
        return True
    try:
        return all(p == 0 for pair in padding for p in pair)
    except TypeError:
        return padding == 0


def quant_enabled() -> bool:
    return getattr(_STATE, "enabled", False)


def calibrating() -> bool:
    return getattr(_STATE, "calibrating", False)


def static_scales() -> dict | None:
    return getattr(_STATE, "scales", None)


def int8_denied(path: tuple) -> bool:
    """True when this module path is on the serving denylist — the conv
    stays bf16 under int8_serving. XLA's s8 conv lowering LOSES at some
    shape families even with static scales; measured (batch 32, v5e,
    scripts/exp_r3_enc_d4.py): the whole EfficientNet-B0 encoder runs
    11.18 ms bf16 vs 12.32 ms int8-static — so the encoder is denied by
    default in InferenceEngine."""
    deny = getattr(_STATE, "deny", ())
    if not deny:
        return False
    p = "/".join(path)
    return any(d in p for d in deny)


class int8_serving:
    """Context manager enabling the int8 path of every QConv traced inside.

    With ``scales`` (a {module-path: float} dict from :func:`calibrate`),
    activation quantization uses those STATIC per-layer scales — the
    abs-max reduce disappears and the quantize rounds fuse into the
    preceding op's epilogue (measured: dynamic scales gave only 1.2x on
    stage-2 vs 2.7x for the bare int8 conv). Without scales, falls back to
    dynamic per-tensor quantization.
    """

    def __init__(self, enabled: bool = True, scales: dict | None = None,
                 deny: tuple = ()):
        self.enabled = enabled
        self.scales = scales
        self.deny = tuple(deny)

    def __enter__(self):
        self.prev = (quant_enabled(), static_scales(),
                     getattr(_STATE, "deny", ()))
        _STATE.enabled = self.enabled
        _STATE.scales = self.scales
        _STATE.deny = self.deny
        return self

    def __exit__(self, *exc):
        _STATE.enabled, _STATE.scales, _STATE.deny = self.prev
        return False


class calibration:
    """Context manager: QConv sows per-layer input abs-max into the
    ``calib`` collection (apply with ``mutable=["calib"]``)."""

    def __enter__(self):
        self.prev = calibrating()
        _STATE.calibrating = True
        return self

    def __exit__(self, *exc):
        _STATE.calibrating = self.prev
        return False


def collect_scales(calib_vars, margin: float = 1.0) -> dict:
    """Flatten a ``calib`` variable collection into {path: scale} floats.

    A leaf named ``amax`` keys the scale by its module path; a leaf named
    ``amax_<tag>`` (modules with several quantization points, e.g. the fused
    S2D decoder blocks) keys it by ``<module path>#<tag>``.
    """
    flat = {}

    def walk(tree, path):
        for k, v in tree.items():
            if k == "amax" or k.startswith("amax_"):
                # flax sow appends a tuple per call
                amax = max(float(x) for x in v) if isinstance(v, tuple) else float(v)
                key = "/".join(path)
                if k != "amax":
                    key = key + "#" + k[len("amax_"):]
                flat[key] = max(amax * margin, 1e-6) / 127.0
            else:
                walk(v, path + (k,))

    walk(calib_vars, ())
    return flat


def merge_scales(a: dict, b: dict) -> dict:
    """Pointwise max of two scale dicts (multi-batch calibration)."""
    return {k: max(a.get(k, 0.0), b.get(k, 0.0)) for k in set(a) | set(b)}


def quantize_symmetric(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest symmetric int8 quantization with saturation."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def qconv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    strides: Tuple[int, int],
    padding,
    static_scale: float | None = None,
) -> jnp.ndarray:
    """Quantized NHWC conv: int8 MXU compute, bf16 result.

    x: (B, H, W, Ci) float — or ALREADY int8, pre-quantized by the
    producer's epilogue with this conv's calibrated ``static_scale``
    (see models/blocks.py:prequantize_for — the bf16 boundary tensor then
    never exists in HBM). w: (kh, kw, Ci, Co) float. Activation scale is
    ``static_scale`` when given (calibrated; quantize fuses into the
    producer) else dynamic per-tensor abs-max. Weight scales are per
    output channel.
    """
    if x.dtype == jnp.int8:
        assert static_scale is not None, "int8 input needs its producer scale"
        sx = jnp.float32(static_scale)
        xq = x
        out_dtype = w.dtype
    else:
        if static_scale is not None:
            sx = jnp.float32(static_scale)
        else:
            sx = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-6) / 127.0
        xq = quantize_symmetric(x, sx)
        # Cut the fusion between the quantize chain and the conv operand:
        # XLA otherwise fuses round/clip/convert (plus whatever produced x)
        # INTO the conv's operand read, recomputing it per halo — measured
        # 3-6x conv slowdowns at decoder-tail shapes (scripts/
        # exp_r4_d4int8.py) and the likely encoder int8 loss. The barrier
        # still lets the quantize fuse FORWARD into x's producer epilogue.
        xq = lax.optimization_barrier(xq)
        out_dtype = x.dtype
    sw = jnp.maximum(
        jnp.max(jnp.abs(w), axis=(0, 1, 2)).astype(jnp.float32), 1e-8) / 127.0
    wq = quantize_symmetric(w, sw)
    if ONE_BY_ONE_AS_DOT and w.shape[0] == w.shape[1] == 1 \
            and tuple(strides) == (1, 1) and _padding_is_zero(padding):
        # 1x1 stride-1 conv IS a matmul over the flattened pixel axis.
        # XLA's s8 conv lowering loses at low-channel/high-res shapes (the
        # reason the encoder was denylisted); s8xs8->s32 dot_general is the
        # native MXU form and sidesteps that lowering entirely.
        b_, h_, w_, ci = xq.shape
        y = lax.dot_general(
            xq.reshape(b_ * h_ * w_, ci), wq.reshape(ci, -1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(b_, h_, w_, -1)
    else:
        y = lax.conv_general_dilated(
            xq, wq, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


class QConv(nn.Module):
    """nn.Conv-compatible conv that runs int8 inside :class:`int8_serving`.

    Parameter tree matches nn.Conv exactly (``kernel`` (kh, kw, Ci, Co)
    lecun_normal, optional ``bias`` zeros), so models can swap freely
    between the two without touching checkpoints. Only the plain dense case
    is supported (feature_group_count 1, dilation 1); anything else should
    keep using nn.Conv.

    The int8 path is skipped for tiny contractions (kh*kw*Ci < 48), where
    quantization noise is large relative to the MXU time saved.
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int], None] = 1
    padding: Union[str, int, Sequence] = "SAME"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str | None = None) -> jnp.ndarray:
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks)
        st = self.strides or 1
        if isinstance(st, int):
            st = (st, st)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*ks, x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if mode == "params":
            # fused-kernel callers (ops/pallas_head.py) read the params
            # without computing; declaration order/names stay identical
            return kernel, bias
        pre_quantized = x.dtype == jnp.int8
        if not pre_quantized:
            kernel = kernel.astype(x.dtype)
        eligible = ks[0] * ks[1] * x.shape[-1] >= 48
        if calibrating() and eligible:
            self.sow("calib", "amax", jnp.max(jnp.abs(x)).astype(jnp.float32))
        if (quant_enabled() and eligible and not int8_denied(self.path)) \
                or pre_quantized:
            scales = static_scales()
            sx = None
            if scales is not None:
                sx = scales.get("/".join(self.path))
            assert not (pre_quantized and sx is None), \
                f"int8 input to {'/'.join(self.path)} without a calibrated scale"
            y = qconv2d(x, kernel, st, pad, static_scale=sx)
        else:
            y = lax.conv_general_dilated(
                x, kernel, st, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
