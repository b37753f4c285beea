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
layout (pixels x channels, Mosaic-natural). The 3x3 conv runs as THREE
matmuls (one per dy) over a dx-concatenated buffer with K=3*Ci: row
shifts land out-of-range taps in the zero padding automatically, and the
only explicit masking is zeroing the single column per dx=+-1 copy that
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

# Measured win region (scripts/sweep_fused_unit.py, v5e): the kernel beats
# XLA's conv+LN+relu chain at the 256-channel ROI stack (1.8x) but loses
# badly at small channel counts (128-lane padding) and mask-resolution
# grids (VMEM pressure). Constants are module-level so tests can patch.
_MIN_FUSED_CH = 128
_MAX_FUSED_BYTES = 24 * 2**20


def fusable_shape(h: int, w: int, ci: int, co: int) -> bool:
    if ci < _MIN_FUSED_CH or co < _MIN_FUSED_CH:
        return False
    return h * w * (ci + 2 * co) * 4 < _MAX_FUSED_BYTES


def fusion_enabled() -> bool:
    return getattr(_STATE, "enabled", False)


class head_fusion:
    """Context manager: ConvNormAct/ResidualBlock trace the fused kernel."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        self.prev = fusion_enabled()
        _STATE.enabled = self.enabled
        return self

    def __exit__(self, *exc):
        _STATE.enabled = self.prev
        return False


def _kernel(xr, wr, br, gr, betar, *rest, P, W, k, Ci, Co, eps,
            act, residual):
    # pallas passes all input refs, then output refs
    if residual:
        resr, outr = rest
    else:
        (outr,) = rest
    pad = W + 1
    x2 = xr[0]                                   # (P, Ci)
    if k == 3:
        # SAME 3x3 conv as 3 matmuls over a dx-concatenated buffer:
        # out[p] += sum_dx x_dx[p + dy*W + dx] @ w[dy, dx], where x_dx is x
        # with the column that would wrap across image rows zeroed
        # (dx=-1 reads col W-1 only via wrap; dx=+1 reads col 0 only via
        # wrap). Row-boundary taps land in the zero padding automatically
        # (|dy*W + dx| <= pad). One matmul per dy with K=3*Ci keeps the MXU
        # busy instead of nine thin K=Ci contractions.
        col = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0),
                          jnp.int32(W))
        xl = jnp.where(col == W - 1, jnp.zeros((), x2.dtype), x2)
        xr_ = jnp.where(col == 0, jnp.zeros((), x2.dtype), x2)

        def shifted(xs, dx):
            zt = jnp.zeros((pad - dx, Ci), x2.dtype)
            zb = jnp.zeros((pad + dx, Ci), x2.dtype)
            return jnp.concatenate([zt, xs, zb], axis=0)

        xb = jnp.concatenate(
            [shifted(xl, -1), shifted(x2, 0), shifted(xr_, 1)], axis=1)
        acc = jnp.zeros((P, Co), jnp.float32)
        for dy in (-1, 0, 1):
            off = pad + dy * W
            acc += jax.lax.dot_general(
                xb[off:off + P], wr[dy + 1],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    else:
        acc = jax.lax.dot_general(
            x2, wr[0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
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
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        # CPU (tests, dryruns) has no Mosaic — run the same kernel interpreted
        interpret = jax.default_backend() == "cpu"
    return _conv_ln_act(x, w, b, gamma, beta, residual, height=height,
                        width=width, kernel=kernel, eps=eps, act=act,
                        interpret=interpret)


@functools.partial(jax.jit, static_argnames=("height", "width", "kernel",
                                             "eps", "act", "interpret"))
def _conv_ln_act(
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

    if k == 3:
        # (3, 3, Ci, Co) -> (3, 3*Ci, Co): one K=3*Ci contraction per dy,
        # (dx, ci) flattened dx-major to match the kernel's concat order
        wr = w.reshape(3, 3 * Ci, Co)
    else:
        wr = w.reshape(1, Ci, Co)
    br = b.reshape(1, Co)
    gr = gamma.reshape(1, Co)
    betar = beta.reshape(1, Co)

    operands = [xf, wr, br, gr, betar]
    in_specs = [pl.BlockSpec((1, P, Ci), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)] + \
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    if residual is not None:
        operands.append(residual.reshape(N, P, Co))
        in_specs.append(pl.BlockSpec((1, P, Co), lambda n: (n, 0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, P=P, W=W, k=k, Ci=Ci, Co=Co, eps=eps,
                          act=act, residual=residual is not None),
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, P, Co), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, P, Co), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*operands)
    return out.reshape(N, H, W, Co)
