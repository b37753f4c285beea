"""Fused MBConv Pallas kernels for the encoder's high-resolution stages.

Why: profiling (scripts/profile_encoder.py) shows EfficientNet's early
blocks are HBM-bound — the e6 expansion materialises a 6x-channel tensor at
full resolution and XLA moves it through HBM ~4 times per block (expand
write, dw read+write, SE/project reads); the grouped dw conv alone already
runs at memory speed-of-light, so no op-level rewrite helps. The reference
leaves this to cuDNN (timm EfficientNet, hierarchical_segmentation_unet.py:1708-1916).

Design (TPU-first, shaped by what Mosaic actually lowers):
- Everything is 2-D ``(C, H*W)``: C indexes sublanes, the flattened pixels
  fill lanes. Mosaic supports neither (sublane,lane)-merging reshapes nor
  3-D dot_general, and NHWC blocks pad C to 128 lanes (4-8x VMEM waste) —
  the flat layout gives clean 2-D matmuls for expand/project and turns the
  depthwise taps into static lane-shifted slices. Row-boundary wraparound
  of the x-taps is cancelled by precomputed column masks (plain inputs).
- The squeeze-excite global mean is a two-kernel split: kernel A computes
  per-image channel sums of silu(dw(expand(x))) (a (B, Cm, 1) output); XLA
  derives the SE scales; kernel B recomputes the cheap expand+dw and
  applies scale -> project -> (+residual). Recompute costs arithmetic
  (abundant) instead of HBM traffic (scarce): total traffic is ~2 reads of
  x + 1 write of out vs ~4 full passes of the EXPANDED tensor.
- Both kernels stream aligned row slabs via grid (B, n_tiles); the slab is
  staged zero-padded in a VMEM scratch so one aligned dynamic slice yields
  the tile window, with out-of-image rows landing in the zero padding.
- Stride-2 blocks compute/project at full resolution inside the kernel
  (lane compression is not Mosaic-expressible); rows/cols are subsampled
  by XLA right after the call. SE statistics are masked to the strided grid.

Serving-only: BatchNorms are folded into the adjacent convolutions by the
caller (models/efficientnet.py), exactly as at export (export.py BN fold).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 128  # lane padding so every static tap offset is non-negative


def _expand_dw(xr, wer, ber, wdwr, bdwr, maskr, scr, *, k, th, H, W,
               has_expand, t):
    """silu(dw(silu(expand(x)+be))+bdw) for row tile t, as (Cm, th*W) f32.

    xr (1, Ci, H*W); wer (Cm, Ci); ber (Cm, 1); wdwr (k*k, Cm, 1);
    bdwr (Cm, 1); maskr (k, 1, th*W) column-validity masks per dx;
    scr (Cm, 2*_PAD + (rows+2r)*W) staging scratch.
    """
    r = k // 2
    Cm = wdwr.shape[1]
    rows = min(th + 16, H)
    start = pl.multiple_of(jnp.clip(t * th - 8, 0, H - rows), 8)
    xt = xr[0, :, pl.ds(pl.multiple_of(start * W, 128), rows * W)]  # (Ci, rows*W)
    if has_expand:
        a = jax.lax.dot_general(
            wer[:], xt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (Cm, rows*W)
        a = jax.nn.silu(a + ber[:].astype(jnp.float32))
        a = a.astype(xr.dtype)
    else:
        a = xt
    scr[:] = jnp.zeros_like(scr)
    scr[:, _PAD + r * W:_PAD + (r + rows) * W] = a
    # tile window: flat position p = j*W + w of output row j maps to scratch
    # lane woff + _PAD + p (+ tap offset dy*W + dx - r)
    woff = pl.multiple_of((t * th - start) * W, 128)
    awin = scr[:, pl.ds(woff, (th + 2 * r) * W + 2 * _PAD)]
    d = jnp.zeros((Cm, th * W), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            off = _PAD + dy * W + dx - r
            tap = awin[:, off:off + th * W] * wdwr[dy * k + dx]
            d += (tap * maskr[dx]).astype(jnp.float32)
    return jax.nn.silu(d + bdwr[:].astype(jnp.float32))


def _sums_kernel(xr, wer, ber, wdwr, bdwr, maskr, smaskr, outr, scr,
                 *, k, th, H, W, has_expand, stride):
    t = pl.program_id(1)
    d = _expand_dw(xr, wer, ber, wdwr, bdwr, maskr, scr, k=k, th=th,
                   H=H, W=W, has_expand=has_expand, t=t)
    if stride == 2:
        d = d * smaskr[:].astype(jnp.float32)
    part = jnp.sum(d, axis=1, keepdims=True)      # (Cm, 1)

    @pl.when(t == 0)
    def _():
        outr[0] = jnp.zeros_like(outr[0])

    outr[0] = outr[0] + part


def _apply_kernel(xr, ser, wer, ber, wdwr, bdwr, maskr, smaskr, wpr, bpr,
                  outr, scr, *, k, th, H, W, has_expand, stride, residual):
    t = pl.program_id(1)
    d = _expand_dw(xr, wer, ber, wdwr, bdwr, maskr, scr, k=k, th=th,
                   H=H, W=W, has_expand=has_expand, t=t)
    d = d * ser[0].astype(jnp.float32)
    y = jax.lax.dot_general(
        wpr[:], d.astype(xr.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (Co, th*W)
    y = y + bpr[:].astype(jnp.float32)
    y = y.astype(outr.dtype)
    if residual:
        y = y + xr[0, :, pl.ds(pl.multiple_of(t * th * W, 128), th * W)]
    outr[0] = y


def _pick_tile(h: int, lo: int = 8, hi: int = 32) -> int:
    for cand in range(hi, lo - 1, -8):
        if h % cand == 0:
            return cand
    return h


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "residual",
                                             "tile_rows", "interpret"))
def fused_mbconv_chw(
    x: jnp.ndarray,
    we: Optional[jnp.ndarray], be: Optional[jnp.ndarray],
    wdw: jnp.ndarray, bdw: jnp.ndarray,
    wr: jnp.ndarray, br: jnp.ndarray,
    ws: jnp.ndarray, bs: jnp.ndarray,
    wp: jnp.ndarray, bp: jnp.ndarray,
    kernel: int = 3,
    stride: int = 1,
    residual: bool = False,
    tile_rows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused serving MBConv, channels-first.

    x (B, Ci, H, W); we (Ci, Cm) or None (expand_ratio 1, Cm == Ci);
    wdw (k, k, Cm); wr (Cm, Cse); ws (Cse, Cm); wp (Cm, Co); biases 1-D.
    BN folded into we/bdw/wp by the caller. Returns
    (B, Co, H/stride, W/stride) in x.dtype.
    """
    B, Ci, H, W = x.shape
    Cm = wdw.shape[-1]
    Co = wp.shape[-1]
    k = kernel
    r = k // 2
    assert r <= 8
    th = tile_rows or _pick_tile(H)
    assert H % th == 0 and W % stride == 0, (H, W, th)
    nt = H // th
    has_expand = we is not None
    if not has_expand:
        assert Cm == Ci
        we = jnp.zeros((Ci, Cm), x.dtype)
        be = jnp.zeros((Cm,), x.dtype)

    xf = x.reshape(B, Ci, H * W)
    wer = we.T.astype(x.dtype)                    # (Cm, Ci)
    ber = be.reshape(Cm, 1)
    wdwr = wdw.reshape(k * k, Cm, 1).astype(x.dtype)
    bdwr = bdw.reshape(Cm, 1)
    bpr = bp.reshape(Co, 1)
    wpr = wp.T.astype(x.dtype)                    # (Co, Cm)

    # column-validity masks: tap dx contributes to flat position p iff its
    # source column (p % W) + dx - r stays inside the row
    col = (jnp.arange(th * W, dtype=jnp.int32) % W)[None, :]
    masks = jnp.stack([((col + dx - r >= 0) & (col + dx - r < W))
                       .astype(x.dtype) for dx in range(k)])  # (k, 1, th*W)
    rowi = (jnp.arange(th * W, dtype=jnp.int32) // W)[None, :]
    smask = (((rowi % 2) == 1) & ((col % 2) == 1)).astype(x.dtype)  # (1, th*W)

    rows = min(th + 16, H)
    scratch = [pltpu.VMEM((Cm, 2 * _PAD + (rows + 2 * r) * W), x.dtype)]
    img_spec = pl.BlockSpec((1, Ci, H * W), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    sums = pl.pallas_call(
        functools.partial(_sums_kernel, k=k, th=th, H=H, W=W,
                          has_expand=has_expand, stride=stride),
        grid=(B, nt),
        in_specs=[img_spec] + [wspec] * 6,
        out_specs=pl.BlockSpec((1, Cm, 1), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cm, 1), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(xf, wer, ber, wdwr, bdwr, masks, smask)

    m = sums[:, :, 0] / ((H // stride) * (W // stride))    # (B, Cm)
    u = jax.nn.silu(m @ wr.astype(jnp.float32) + br.astype(jnp.float32)[None])
    se = jax.nn.sigmoid(u @ ws.astype(jnp.float32) + bs.astype(jnp.float32)[None])
    se = se.astype(x.dtype)[:, :, None]                    # (B, Cm, 1)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, k=k, th=th, H=H, W=W,
                          has_expand=has_expand, stride=stride,
                          residual=residual),
        grid=(B, nt),
        in_specs=[img_spec,
                  pl.BlockSpec((1, Cm, 1), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM)] + [wspec] * 8,
        out_specs=pl.BlockSpec((1, Co, th * W), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Co, H * W), x.dtype),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(xf, se, wer, ber, wdwr, bdwr, masks, smask, wpr, bpr)

    out = out.reshape(B, Co, H, W)
    if stride == 2:
        out = out[:, :, 1::2, 1::2]
    return out


def fold_bn(scale, bias, mean, var, eps: float = 1e-3):
    """BN(running stats) as (gain, shift): y = x*gain + shift, f32."""
    g = scale.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    return g, bias.astype(jnp.float32) - mean.astype(jnp.float32) * g
