"""Fused conv3x3/1x1 + LayerNorm2d + activation Pallas kernel for stage-2.

Why: the stage-2 head stack is ~30 conv->LayerNorm2d->ReLU units at ROI
shapes (64x48, 64-256 channels). The convs are MXU-fast (a bare
3x3x256x256 at these shapes runs in 0.039 ms/batch) but each LayerNorm2d
costs ~0.1 ms — XLA cannot fuse a global reduction into a convolution
epilogue, so every unit pays ~2.5 full memory passes
(scripts/profile_stage2.py: ConvNormAct 0.137 ms vs 0.039 ms bare conv).

TPU-first design: LayerNorm2d normalizes over ALL of (H, W, C) per sample
(ops/norms.py:19), and one ROI's activations fit comfortably in VMEM — so
the kernel processes one ROI per grid step with the flattened-NHWC 2-D
layout (pixels x channels, Mosaic-natural). The 3x3 conv runs as nine
K=Ci MXU matmuls over three zero-padded buffers (one per dx): row shifts
land out-of-range taps in the zero padding automatically, and the only
explicit masking is zeroing the single column in the dx=+-1 copies that
would otherwise wrap across image rows. LN statistics, affine, optional
residual add and ReLU all happen in-register on the f32 accumulator
before the single output write. No cross-ROI halos exist by construction.

Used by models/blocks.py (ConvNormAct / ResidualBlock) inside the
``head_fusion()`` serving context. Exact vs the unfused path up to f32
accumulation order.
"""

from __future__ import annotations

import functools
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STATE = threading.local()

# Measured win region (scripts/sweep_fused_unit.py, v5e, robust min-per-
# chain slope timing): XLA's own conv already runs at ~83% MFU at the
# 64x48x256 ROI stack and LN adds only ~17%, so the bf16 kernel loses
# there (0.99 vs 0.71 ms) and at every mask-resolution / low-channel
# shape. It WINS only at tiny-spatial high-channel shapes where XLA's
# conv tiling degrades — 16x12x384: 1.66x. The int8 path has different
# economics (2x MXU rate + norm for free) and is gated by the caller —
# but probing the int8 kernel at the full 64x48x256 ROI shape (3072
# pixels) also LOSES: 0.611 ms/unit vs 0.385 for XLA qconv+LN+relu with
# static scales, which already runs near the int8 roofline there. Do not
# widen _MAX_FUSED_PIXELS for the quantized path.
# Constants are module-level so tests can patch.
_MIN_FUSED_CH = 256
_MAX_FUSED_PIXELS = 512


def fusable_shape(h: int, w: int, ci: int, co: int) -> bool:
    if ci < _MIN_FUSED_CH or co < _MIN_FUSED_CH:
        return False
    return h * w <= _MAX_FUSED_PIXELS


def fusion_enabled() -> bool:
    return getattr(_STATE, "enabled", False)


def s2d_upsample_enabled() -> bool:
    """The S2D mask-branch fusion loses in bf16 (the k=1 kernel measures
    0.5x XLA's deconv+LN chain) — it is a separate opt-in for the int8
    serving path and tests."""
    return getattr(_STATE, "s2d_upsample", False)


class head_fusion:
    """Context manager: ConvNormAct/ResidualBlock trace the fused kernel."""

    def __init__(self, enabled: bool = True, s2d_upsample: bool = False):
        self.enabled = enabled
        self.s2d_upsample = s2d_upsample

    def __enter__(self):
        self.prev = (fusion_enabled(), s2d_upsample_enabled())
        _STATE.enabled = self.enabled
        _STATE.s2d_upsample = self.s2d_upsample
        return self

    def __exit__(self, *exc):
        _STATE.enabled, _STATE.s2d_upsample = self.prev
        return False


def _kernel(xr, wr, br, gr, betar, *rest, P, W, k, Ci, Co, eps,
            act, residual, quantized):
    # pallas passes all input refs, then output refs
    rest = list(rest)
    if quantized:
        qsr = rest.pop(0)       # (1, Co) f32: sx * sw per output channel
        invr = rest.pop(0)      # (1, 1) f32: 1 / sx
    if residual:
        resr, outr = rest
    else:
        (outr,) = rest
    pad = W + 1
    x2 = xr[0]                                   # (P, Ci)
    if quantized:
        # symmetric round-to-nearest int8; weights arrive pre-quantized
        xq = jnp.round(x2.astype(jnp.float32) * invr[:])
        x2 = jnp.clip(xq, -127.0, 127.0).astype(jnp.int8)
    if k == 3:
        # SAME 3x3 conv as 9 matmuls over three zero-padded buffers:
        # out[p] += x_dx[p + dy*W + dx] @ w[dy, dx], where x_dx is x with
        # the single column that would wrap across image rows zeroed
        # (dx=-1 reads col W-1 only via wrap; dx=+1 reads col 0 only via
        # wrap; dx=0 needs no mask). Row-boundary taps land in the zero
        # padding automatically (|dy*W + dx| <= pad). Keeping K=Ci
        # contractions and sublane shifts measures faster than a
        # dx-concatenated K=3*Ci buffer — lane-dimension concatenation is a
        # Mosaic relayout.
        col = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0),
                          jnp.int32(W))
        z = jnp.zeros((pad, Ci), x2.dtype)
        xp = {}
        for dx, xs in ((-1, jnp.where(col == W - 1, jnp.zeros((), x2.dtype), x2)),
                       (0, x2),
                       (1, jnp.where(col == 0, jnp.zeros((), x2.dtype), x2))):
            xp[dx] = jnp.concatenate([z, xs, z], axis=0)
        atype = jnp.int32 if quantized else jnp.float32
        acc = jnp.zeros((P, Co), atype)
        t = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                off = pad + dy * W + dx
                acc += jax.lax.dot_general(
                    xp[dx][off:off + P], wr[t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=atype)
                t += 1
    else:
        acc = jax.lax.dot_general(
            x2, wr[0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quantized else jnp.float32)
    if quantized:
        acc = acc.astype(jnp.float32) * qsr[:]
    acc = acc + br[:].astype(jnp.float32)
    m = jnp.mean(acc)
    v = jnp.mean(jnp.square(acc - m))
    y = (acc - m) * jax.lax.rsqrt(v + eps)
    y = y * gr[:].astype(jnp.float32) + betar[:].astype(jnp.float32)
    if residual:
        y = y + resr[0].astype(jnp.float32)
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    outr[0] = y.astype(outr.dtype)


def conv_ln_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    residual: Optional[jnp.ndarray] = None,
    *,
    height: int,
    width: int,
    kernel: int = 3,
    eps: float = 1e-5,
    act: str = "relu",
    xscale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``xscale`` (a calibrated per-layer activation scale) switches the
    matmuls to s8xs8->s32 on the MXU: weights are quantized per output
    channel at trace time, activations in-register, and the LN epilogue is
    unchanged (the TPU analogue of a TensorRT int8 tactic, with the norm
    for free)."""
    if interpret is None:
        # CPU (tests, dryruns) has no Mosaic — run the same kernel interpreted
        interpret = jax.default_backend() == "cpu"
    if xscale is not None:
        sw = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)),
                                 axis=(0, 1, 2)), 1e-8) / 127.0
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) / sw), -127.0,
                      127.0).astype(jnp.int8)
        qscale = (jnp.float32(xscale) * sw).reshape(1, -1)
        inv = jnp.full((1, 1), 1.0 / xscale, jnp.float32)
        return _conv_ln_act(x, wq, b, gamma, beta, residual, qscale, inv,
                            height=height, width=width, kernel=kernel,
                            eps=eps, act=act, interpret=interpret)
    return _conv_ln_act(x, w, b, gamma, beta, residual, None, None,
                        height=height, width=width, kernel=kernel, eps=eps,
                        act=act, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("height", "width", "kernel",
                                             "eps", "act", "interpret"))
def _conv_ln_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    residual: Optional[jnp.ndarray] = None,
    qscale: Optional[jnp.ndarray] = None,
    inv_xscale: Optional[jnp.ndarray] = None,
    *,
    height: int,
    width: int,
    kernel: int = 3,
    eps: float = 1e-5,
    act: str = "relu",
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SAME conv (k in {1,3}) + LayerNorm2d + optional residual + act.

    x (N, H, W, Ci); w (k, k, Ci, Co); b/gamma/beta (Co,);
    residual (N, H, W, Co) added after the norm, before the activation
    (ResidualBlock semantics). Returns (N, H, W, Co) in x.dtype.
    """
    N, H, W, Ci = x.shape
    assert (H, W) == (height, width)
    Co = w.shape[-1]
    k = kernel
    P = H * W
    xf = x.reshape(N, P, Ci)

    wr = w.reshape(k * k, Ci, Co)
    br = b.reshape(1, Co)
    gr = gamma.reshape(1, Co)
    betar = beta.reshape(1, Co)

    quantized = qscale is not None
    operands = [xf, wr, br, gr, betar]
    in_specs = [pl.BlockSpec((1, P, Ci), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)] + \
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    if quantized:
        operands += [qscale, inv_xscale]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    if residual is not None:
        operands.append(residual.reshape(N, P, Co))
        in_specs.append(pl.BlockSpec((1, P, Co), lambda n: (n, 0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, P=P, W=W, k=k, Ci=Ci, Co=Co, eps=eps,
                          act=act, residual=residual is not None,
                          quantized=quantized),
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, P, Co), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, P, Co), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*operands)
    return out.reshape(N, H, W, Co)
