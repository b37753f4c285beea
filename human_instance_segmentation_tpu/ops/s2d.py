"""Space-to-depth (S2D) domain convolutions for the UNet decoder tail.

Why: profiling on the v5e (scripts/profile_stage1.py) shows the stage-1
decoder's high-resolution low-channel stages dominate flagship inference —
decoder4 (480x640, C=16) runs at 1.9% MFU and decoder3 (240x320, C=32) at
5.0%, because C << 128 wastes almost the whole lane dimension of every tile,
while the same arithmetic expressed at half resolution with 4x channels
reaches 83% MFU (bare-conv microbenchmarks, same script). The reference has
no analogue: its CUDA path leaves this to cuDNN.

This module re-expresses the tail EXACTLY (same parameters, same math) on a
half-resolution grid where each cell holds a 2x2 block of full-resolution
pixels as 4x channels:

- ``space_to_depth``/``depth_to_space``: layout converters, phase order
  ``(ay, ax, c)`` channel-major.
- ``conv3x3_s2d``: a stride-1 3x3 full-res conv as one dense 3x3 conv on the
  S2D grid with a phase-expanded ``(3, 3, 4Ci, 4Co)`` kernel. Zero padding
  in cell space reproduces full-res zero padding exactly.
- ``conv_up_s2d``: the composition ``conv3x3(upsample_2x_bilinear(x))`` as a
  single 3x3 conv on the *low-res* grid producing the S2D form of the
  full-res output — the (B, 2H, 2W, C) upsampled intermediate is never
  materialised. The bilinear stencil (ops/sampling.upsample_2x_bilinear:
  half-pixel, edge-clamped) is folded into the conv kernel; the four border
  rows/cols, where edge-clamped upsampling meets the conv's zero padding,
  are recomputed exactly from 2-pixel strips and overwritten.

All functions are differentiable (kernels are built from the live params),
so the fused tail also works under grad, but batch-stat updates don't — the
callers keep the plain path for train=True.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .sampling import upsample_2x_bilinear


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, r*r*C), channel index (ay*r + ax)*C + c."""
    b, h, w, c = x.shape
    assert h % r == 0 and w % r == 0, (h, w, r)
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // r, w // r, r * r * c)


def depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, hc, wc, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, hc, wc, r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hc * r, wc * r, c)


def _conv(x, k, padding):
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# --- int8 path (STATIC calibrated scales only) -----------------------------
#
# Dynamic per-call scales were measured to LOSE throughput here (649 -> 531
# img/s flagship): the abs-max reduce + quantize are extra full passes over
# the high-res tensors. With a static scale the round/clip/convert chain is
# pure elementwise work that XLA fuses into the PRODUCER's epilogue (the
# previous stage's bn+relu), so the bf16 intermediate is never written at
# all when its only consumer is the quantized conv — the conv then reads
# half the padded HBM bytes and runs s8xs8->s32 at twice the MXU rate.

def quantize_static(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Symmetric round-to-nearest int8 with a static (trace-time) scale."""
    q = jnp.round(x.astype(jnp.float32) * (1.0 / scale))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def _quantize_kernel(k: jnp.ndarray):
    """Per-output-channel int8 kernel + f32 scale row (trace-time, tiny;
    constant-folds under const-params serving)."""
    kf = k.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-8) / 127.0
    kq = jnp.clip(jnp.round(kf / sw), -127.0, 127.0).astype(jnp.int8)
    return kq, sw


def _dequant(x: jnp.ndarray, qscale, dtype) -> jnp.ndarray:
    """int8 -> float for the (thin) float consumers of a quantized input."""
    if x.dtype == jnp.int8:
        return (x.astype(jnp.float32) * qscale).astype(dtype)
    return x


def _conv_q(x, K, strides, padding, qscale, out_dtype=None):
    """NHWC conv; int8 compute when ``qscale`` is given. ``x`` may already
    be int8 (quantized by the producer with the same scale)."""
    if qscale is None:
        return lax.conv_general_dilated(
            x, K.astype(x.dtype), strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if out_dtype is None:
        out_dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else K.dtype
    xq = x if x.dtype == jnp.int8 else quantize_static(x, qscale)
    kq, sw = _quantize_kernel(K)
    y = lax.conv_general_dilated(
        xq, kq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (jnp.float32(qscale) * sw)).astype(out_dtype)


def expand_kernel_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) full-res conv kernel -> (3, 3, 2*2*Ci, 2*2*Co) cell
    kernel: out cell i, phase a gets full-res tap d = 2*di + alpha - a from
    input phase alpha of cell i+di."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for ay in range(2):
        for ax in range(2):
            for ayi in range(2):
                for axi in range(2):
                    for di in (-1, 0, 1):
                        dy = 2 * di + ayi - ay
                        if not -1 <= dy <= 1:
                            continue
                        for dj in (-1, 0, 1):
                            dx = 2 * dj + axi - ax
                            if not -1 <= dx <= 1:
                                continue
                            out = out.at[
                                di + 1, dj + 1,
                                (ayi * 2 + axi) * ci:(ayi * 2 + axi + 1) * ci,
                                (ay * 2 + ax) * co:(ay * 2 + ax + 1) * co,
                            ].set(w[dy + 1, dx + 1])
    return out


def conv3x3_s2d(x_s2d: jnp.ndarray, w: jnp.ndarray,
                qscale: float | None = None) -> jnp.ndarray:
    """Full-res stride-1 3x3 conv (zero padding) applied in S2D(2) form.

    x_s2d: (B, Hc, Wc, 4*Ci); w: (3, 3, Ci, Co) -> (B, Hc, Wc, 4*Co).
    Exact: cell-space zero padding == full-res zero padding (an out-of-range
    full-res tap always lands in an out-of-range cell). With ``qscale``
    (calibrated static input scale) the conv runs s8xs8->s32 on the MXU.
    """
    return _conv_q(x_s2d, expand_kernel_s2d(w), (1, 1), "SAME", qscale)


# 1-D composition tables: u[2i + s] as weights over x[i + delta], for the
# half-pixel edge-clamped 2x bilinear upsample (interior rows; borders are
# fixed separately). s = a + d ranges over {-1, 0, 1, 2}.
_A = {
    -1: {-1: 0.75, 0: 0.25},
    0: {-1: 0.25, 0: 0.75},
    1: {0: 0.75, 1: 0.25},
    2: {0: 0.25, 1: 0.75},
}

# Same table for NEAREST upsampling (u[2i+s] = x[i + floor(s/2)]) — the smp
# UnetDecoder default (F.interpolate(scale_factor=2, mode="nearest"), which
# the reference's frozen stage-1 checkpoints were trained with). Unlike
# bilinear there is no edge clamp: an out-of-range full-res tap maps to an
# out-of-range LOW-res cell, so cell-space zero padding is exact everywhere
# and the composed conv needs NO border corrections.
_A_NEAREST = {
    -1: {-1: 1.0},
    0: {0: 1.0},
    1: {0: 1.0},
    2: {1: 1.0},
}

_UP_TABLES = {"bilinear": _A, "nearest": _A_NEAREST}


def upsample_2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C), torch F.interpolate(mode='nearest')."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _upsample(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "nearest":
        return upsample_2x_nearest(x)
    return upsample_2x_bilinear(x)


def compose_up_conv_kernel(w: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """Fold a 2x upsample (bilinear or nearest) into a following 3x3 conv.

    w: (3, 3, Ci, Co) -> K: (3, 3, Ci, 4*Co) over the LOW-res grid, where
    output channel block (ay*2 + ax) is full-res phase (ay, ax):
        y[2i+ay, 2j+ax] = sum_d w[d] u[2i+ay+d] = sum_delta K[delta] x[i+delta]
    """
    table = _UP_TABLES[mode]
    co = w.shape[3]
    blocks = []
    for ay in range(2):
        for ax in range(2):
            ky = np.zeros((3, 3), np.float64)  # (d+1, delta+1) y-axis factor
            kx = np.zeros((3, 3), np.float64)
            for d in (-1, 0, 1):
                for delta, wt in table[ay + d].items():
                    ky[d + 1, delta + 1] += wt
                for delta, wt in table[ax + d].items():
                    kx[d + 1, delta + 1] += wt
            k = jnp.einsum("yxio,yY,xX->YXio", w.astype(jnp.float32),
                           jnp.asarray(ky, jnp.float32), jnp.asarray(kx, jnp.float32))
            blocks.append(k.astype(w.dtype))
    return jnp.concatenate(blocks, axis=-1)  # (3, 3, Ci, 4*Co)


def _conv_up_s2d_strips(x: jnp.ndarray, w: jnp.ndarray,
                        mode: str = "bilinear") -> jnp.ndarray:
    """Strip-recompute variant of :func:`conv_up_s2d` (v2).

    Exact but slow on TPU: the four 2-pixel strips are thin-slice ops with
    pathological layouts, measured ~6 ms of decoder-4's 10.6 ms block at
    batch 32 (scripts/profile_d4.py). Kept for small inputs (fewer than 4
    cells on a side, where v3's border/corner regions overlap) and as the
    oracle in tests.
    """
    K = compose_up_conv_kernel(w, mode)
    y = _conv(x, K, "SAME")  # wrong only in cell rows/cols 0 and -1

    def strip(xs):  # plain path on a small strip: upsample then SAME conv
        return _conv(_upsample(xs, mode), w, "SAME")

    # Exact border cell rows/cols, all four phases. Within each 2-pixel
    # strip the taken rows/cols only consume upsample values that the strip
    # computes exactly (the clamp at the strip's inner edge is never read).
    top = space_to_depth(strip(x[:, :2])[:, :2], 2)          # (B, 1, Wc, 4Co)
    bot = space_to_depth(strip(x[:, -2:])[:, -2:], 2)
    left = space_to_depth(strip(x[:, :, :2])[:, :, :2], 2)   # (B, Hc, 1, 4Co)
    right = space_to_depth(strip(x[:, :, -2:])[:, :, -2:], 2)

    hc, wc = y.shape[1], y.shape[2]
    row_ix = jax.lax.broadcasted_iota(jnp.int32, (1, hc, 1, 1), 1)
    col_ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wc, 1), 2)
    y = jnp.where(row_ix == 0, top, jnp.where(row_ix == hc - 1, bot, y))
    return jnp.where(col_ix == 0, left, jnp.where(col_ix == wc - 1, right, y))


def _border_correction_kernels(w: jnp.ndarray):
    """Impulse-extracted border/corner corrections for :func:`conv_up_s2d`.

    The SAME-composed conv is exact except in the first/last cell row and
    column, where the composed kernel's zero padding stands in for the true
    edge-clamped upsample. The error there is LINEAR in the two edge
    rows/cols of x, so the correction kernels are extracted numerically at
    trace time by pushing one-hot impulses through the true (strip) and
    composed computations and reading off the difference. All extraction
    tensors are tiny (few KB) and depend only on ``w``, so inside a jitted
    serving graph they cost microseconds and hoist out of any scan/loop.

    Returns (k_top, k_bot, k_left, k_right, corners) where the k_* are conv
    kernels over the 2-row/col edge slabs of x and ``corners`` is a list of
    four (2, 2, Ci, 4Co) tensors giving the TRUE corner-cell values as a
    contraction of the corner 2x2 cells of x (order: tl, tr, bl, br).
    """
    ci, co = w.shape[2], w.shape[3]
    K = compose_up_conv_kernel(w)
    P = 8
    jc = P // 2

    def true_rows(e, sl):  # strip computation, rows `sl` of the 4-row upsample
        return space_to_depth(_conv(upsample_2x_bilinear(e), w, "SAME")[:, sl], 2)

    def comp_rows(e, cell):
        return _conv(e, K, "SAME")[:, cell:cell + 1]

    # impulses: one per (edge-row i, channel c), centred at col jc
    eye = jnp.eye(ci, dtype=w.dtype)
    imp = jnp.zeros((2 * ci, 2, P, ci), w.dtype)
    for i in range(2):
        imp = imp.at[i * ci:(i + 1) * ci, i, jc].set(eye)

    def readout_rows(d):  # (2Ci, 1, P, 4Co) -> (2, 3, Ci, 4Co)
        d = d.reshape(2, ci, P, 4 * co)
        # input impulse at col jc contributes to output cols jc+dj with
        # kernel tap index (1 - dj)
        taps = [d[:, :, jc - dj] for dj in (-1, 0, 1)]
        return jnp.stack(taps, axis=1)  # (2, 3, Ci, 4Co) — [i, dj+1, c, :]

    k_top = readout_rows(true_rows(imp, slice(0, 2)) - comp_rows(imp, 0))
    k_bot = readout_rows(true_rows(imp, slice(2, 4)) - comp_rows(imp, 1))

    def col_kernel(side):  # side 0 = left, 1 = right
        # impulses over (edge-col i, channel c) at centre ROW qc of a (Q, 2)
        # input; compute true/composed on the transposed layout then map
        # phases back.
        q = P
        qc = q // 2
        impc = jnp.zeros((2 * ci, q, 2, ci), w.dtype)
        for i in range(2):
            impc = impc.at[i * ci:(i + 1) * ci, qc, i].set(eye)
        true_full = _conv(upsample_2x_bilinear(impc), w, "SAME")
        if side == 0:
            tr = true_full[:, :, 0:2]
        else:
            tr = true_full[:, :, 2:4]
        tr = space_to_depth(tr, 2)                      # (2Ci, Q, 1, 4Co)
        cp = _conv(impc, K, "SAME")[:, :, side:side + 1]  # (2Ci, Q, 1, 4Co)
        d = (tr - cp).reshape(2, ci, q, 4 * co)
        taps = [d[:, :, qc - di] for di in (-1, 0, 1)]
        return jnp.stack(taps, axis=0)  # (3, 2, Ci, 4Co) — [di+1, i, c, :]

    k_left = col_kernel(0)
    k_right = col_kernel(1)

    # true corner cells from the 2x2 corner cells of x
    imp2 = jnp.zeros((4 * ci, 2, 2, ci), w.dtype)
    n = 0
    for i in range(2):
        for j in range(2):
            imp2 = imp2.at[n * ci:(n + 1) * ci, i, j].set(eye)
            n += 1
    u2 = _conv(upsample_2x_bilinear(imp2), w, "SAME")    # (4Ci, 4, 4, Co)
    corners = []
    for (ri, cix) in ((slice(0, 2), slice(0, 2)), (slice(0, 2), slice(2, 4)),
                      (slice(2, 4), slice(0, 2)), (slice(2, 4), slice(2, 4))):
        v = space_to_depth(u2[:, ri, cix], 2)            # (4Ci, 1, 1, 4Co)
        corners.append(v.reshape(2, 2, ci, 4 * co))
    return k_top, k_bot, k_left, k_right, corners


def conv_up_s2d(x: jnp.ndarray, w: jnp.ndarray,
                qscale: float | None = None,
                mode: str = "bilinear") -> jnp.ndarray:
    """conv3x3(zero-pad, kernel w) of a 2x upsample of x, returned in
    S2D(2) form on x's own grid, without materialising the upsample.

    x: (B, H, W, Ci); w: (3, 3, Ci, Co) -> (B, H, W, 4*Co).

    ``mode="bilinear"`` composes the half-pixel edge-clamped bilinear
    stencil (ops/sampling.upsample_2x_bilinear); ``mode="nearest"`` the smp
    UnetDecoder default (F.interpolate(mode="nearest")) the reference's
    frozen stage-1 checkpoints were trained with — converted-checkpoint
    serving must use nearest for stage-1 logit parity.

    Bilinear: interior cells come from a single composed 3x3 SAME conv over
    x; the first/last cell rows/cols — where composed zero padding deviates
    from the true edge-clamped upsample — are fixed by ADDING
    impulse-extracted correction terms (:func:`_border_correction_kernels`):
    two 2-row convs, two 2-col convs and four 2x2 corner contractions,
    merged in one fused masked-add/select pass. This replaces the v2 strip
    recompute whose thin-slice layouts cost ~6 ms/batch at decoder-4 shapes
    (scripts/profile_d4.py); all variants are bit-identical in f32.

    Nearest has no edge clamp — an out-of-range full-res tap maps to an
    out-of-range cell — so the composed SAME conv is exact EVERYWHERE and
    the whole border/corner machinery (and its optimization_barrier)
    disappears.

    With ``qscale`` the main composed conv runs int8 (``x`` may arrive
    pre-quantized); the bilinear border/corner corrections — thin 2-row/col
    slabs — stay in float, computed from the dequantized edge slices so
    they correct exactly the map the int8 interior approximates.
    """
    b, h, wd, ci = x.shape
    if mode == "nearest":
        K = compose_up_conv_kernel(w, mode)
        return _conv_q(x, K, (1, 1), "SAME", qscale,
                       out_dtype=None if qscale is None else w.dtype)
    if h < 4 or wd < 4:
        return _conv_up_s2d_strips(_dequant(x, qscale, w.dtype), w)
    K = compose_up_conv_kernel(w)
    y = _conv_q(x, K, (1, 1), "SAME", qscale)  # wrong only in cell rows/cols 0 and -1

    k_top, k_bot, k_left, k_right, corners = _border_correction_kernels(w)
    co4 = y.shape[-1]

    xe = (x if qscale is None else
          {"t": _dequant(x[:, :2], qscale, y.dtype),
           "b": _dequant(x[:, -2:], qscale, y.dtype),
           "l": _dequant(x[:, :, :2], qscale, y.dtype),
           "r": _dequant(x[:, :, -2:], qscale, y.dtype)})
    xt = x[:, :2] if qscale is None else xe["t"]
    xb = x[:, -2:] if qscale is None else xe["b"]
    xl = x[:, :, :2] if qscale is None else xe["l"]
    xr = x[:, :, -2:] if qscale is None else xe["r"]

    corr_top = _conv(xt, k_top, ((0, 0), (1, 1)))       # (B, 1, Wc, 4Co)
    corr_bot = _conv(xb, k_bot, ((0, 0), (1, 1)))
    corr_left = _conv(xl, k_left, ((1, 1), (0, 0)))  # (B, Hc, 1, 4Co)
    corr_right = _conv(xr, k_right, ((1, 1), (0, 0)))

    cs = [jnp.einsum("bijc,ijco->bo", sl, ck.astype(y.dtype)) for sl, ck in zip(
        (xt[:, :, :2], xt[:, :, -2:], xb[:, :, :2], xb[:, :, -2:]), corners)]

    row_ix = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    col_ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wd, 1), 2)
    top_m = row_ix == 0
    bot_m = row_ix == h - 1
    left_m = col_ix == 0
    right_m = col_ix == wd - 1
    zero = jnp.zeros((), y.dtype)
    y = y + jnp.where(top_m, corr_top, zero) + jnp.where(bot_m, corr_bot, zero) \
        + jnp.where(left_m, corr_left, zero) + jnp.where(right_m, corr_right, zero)
    # corners: the row/col corrections are both x-interior approximations
    # there; overwrite with the exact contraction of the corner 2x2 cells.
    tl = cs[0].reshape(b, 1, 1, co4)
    tr = cs[1].reshape(b, 1, 1, co4)
    bl = cs[2].reshape(b, 1, 1, co4)
    br = cs[3].reshape(b, 1, 1, co4)
    y = jnp.where(top_m & left_m, tl, y)
    y = jnp.where(top_m & right_m, tr, y)
    y = jnp.where(bot_m & left_m, bl, y)
    y = jnp.where(bot_m & right_m, br, y)
    # Without a barrier XLA fuses this select/add epilogue into the consumer
    # conv's operand and the block costs 2x (10.4 -> 5.2 ms at decoder-4
    # shapes, scripts/profile_d4.py convfull vs convfull_bar).
    return jax.lax.optimization_barrier(y)


def conv_up_s2d_nested(x_s2d: jnp.ndarray, w: jnp.ndarray,
                       mode: str = "bilinear") -> jnp.ndarray:
    """:func:`conv_up_s2d` with the INPUT already in S2D(2) form, output in
    nested-S2D(4) ("N4") form on the input's own cell grid.

    x_s2d: (B, Hc, Wc, 4*Ci) — S2D(2) of a (2Hc, 2Wc, Ci) map;
    w: (3, 3, Ci, Co) -> (B, Hc, Wc, 16*Co), the N4 form (bit-nested phase
    order (u, v, ay, ax)) of conv3x3(upsample_2x_bilinear(plain), w) at
    (4Hc, 4Wc, Co).

    Why: the plain-input path forces a depth_to_space materialisation of the
    (2Hc, 2Wc, Ci) map whose small C is 128-lane padded (at decoder-4
    flagship shapes: a 1.27 ms copy + a 16%-MFU conv+select fusion,
    profiled r2). Here the composed up+conv kernel consumes the S2D(2) form
    directly: one dense (2, 2, 4Ci, 16Co) conv (contraction 16*Ci — MXU
    shaped) over the cell grid, four shifted slices re-assembled by output
    phase, and the border corrections of :func:`_border_correction_kernels`
    re-indexed into the N4 layout. Exact vs the plain path.
    """
    b, hc, wc, c4 = x_s2d.shape
    ci = c4 // 4
    co = w.shape[3]
    co4 = 4 * co
    K = compose_up_conv_kernel(w, mode)  # (3, 3, Ci, 4Co) over the 240-grid

    if hc < 3 or wc < 3:
        # small inputs: border regions overlap; use the plain path
        y240 = conv_up_s2d(depth_to_space(x_s2d, 2), w, mode=mode)
        return space_to_depth_blocks(y240)

    # pad-slice composed conv: output 240-cell q = 2I + g reads input cells
    # {I-1, I} (g=0) / {I, I+1} (g=1); one VALID 2x2 conv over the padded
    # cell grid covers both alignments, the per-phase slice picks the right
    # one. Kernel tap (t, alpha, g) maps to composed tap d = 2(t-1)+alpha+g.
    # selection tensor: T[t, al, gy, dy] = 1 iff composed tap dy = 2(t-1)+al+gy
    T = np.zeros((2, 2, 2, 3), np.float32)
    for t in range(2):
        for al in range(2):
            for g in range(2):
                d = 2 * (t - 1) + al + g
                if -1 <= d <= 1:
                    T[t, al, g, d + 1] = 1.0
    Tj = jnp.asarray(T)
    # K22[t, s, (al, be, ci), (gy, gx, 4co)]
    K22 = jnp.einsum("tagd,sbhe,deio->tsabigho", Tj, Tj, K)
    K22 = K22.reshape(2, 2, c4, 16 * co)
    xpad = jnp.pad(x_s2d, ((0, 0), (1, 1), (1, 1), (0, 0)))
    O = lax.conv_general_dilated(
        xpad, K22.astype(x_s2d.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B, Hc+1, Wc+1, 16Co)

    # assemble as (B, Hc, Wc, gy, gx, 4Co); everything below is additive
    # elementwise work over this block-expanded view (no overwrites, no
    # barriers) so XLA can fuse assembly + corrections (+ the caller's
    # bn/relu + regroup transpose) into ONE pass over the output
    S = jnp.stack([
        O[:, gy:hc + gy, gx:wc + gx, (gy * 2 + gx) * co4:(gy * 2 + gx + 1) * co4]
        for gy in range(2) for gx in range(2)], axis=3)
    S = S.reshape(b, hc, wc, 2, 2, co4)

    if mode == "nearest":
        # no edge clamp -> the pad-slice composed conv is exact everywhere
        return S.reshape(b, hc, wc, 16 * co)

    # border corrections, re-indexed from the 240-grid machinery
    k_top, k_bot, k_left, k_right, corners = _border_correction_kernels(w)
    d2s_rows = lambda strip: strip.reshape(b, 1, wc, 2, 2, ci).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, 2, 2 * wc, ci)           # x cell row -> 2 plain 240-rows
    d2s_cols = lambda strip: strip.reshape(b, hc, 1, 2, 2, ci).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, 2 * hc, 2, ci)

    # (B, 1, Wc, gx, 4Co) / (B, Hc, gy, 1, 4Co) correction slabs
    ct = _conv(d2s_rows(x_s2d[:, :1]), k_top, ((0, 0), (1, 1))).reshape(b, 1, wc, 2, co4)
    cb = _conv(d2s_rows(x_s2d[:, -1:]), k_bot, ((0, 0), (1, 1))).reshape(b, 1, wc, 2, co4)
    cl = _conv(d2s_cols(x_s2d[:, :, :1]), k_left, ((1, 1), (0, 0))).reshape(b, hc, 2, 1, co4)
    cr = _conv(d2s_cols(x_s2d[:, :, -1:]), k_right, ((1, 1), (0, 0))).reshape(b, hc, 2, 1, co4)

    def pad6(v, ipad, jpad, gypad, gxpad):
        return jnp.pad(v, ((0, 0), ipad, jpad, gypad, gxpad, (0, 0)))

    # cl/cr are (B, I, gy, J=1, Co4) -> reorder to (B, I, J, gy, gx, Co4)
    cl_r = cl.transpose(0, 1, 3, 2, 4)[:, :, :, :, None, :]
    cr_r = cr.transpose(0, 1, 3, 2, 4)[:, :, :, :, None, :]
    corr = pad6(ct[:, :, :, None, :, :], (0, hc - 1), (0, 0), (0, 1), (0, 0)) \
        + pad6(cb[:, :, :, None, :, :], (hc - 1, 0), (0, 0), (1, 0), (0, 0)) \
        + pad6(cl_r, (0, 0), (0, wc - 1), (0, 0), (0, 1)) \
        + pad6(cr_r, (0, 0), (wc - 1, 0), (0, 0), (1, 0))

    # exact corner 240-cells, made ADDITIVE: exact - base - row - col
    def corner_val(cell, ck):
        # one x cell == the plain 2x2 pixel corner the corner kernels contract
        return jnp.einsum("bijc,ijco->bo", cell.reshape(b, 2, 2, ci),
                          ck.astype(x_s2d.dtype))

    add_tl = corner_val(x_s2d[:, 0, 0], corners[0]) \
        - O[:, 0, 0, 0 * co4:1 * co4] - ct[:, 0, 0, 0] - cl[:, 0, 0, 0]
    add_tr = corner_val(x_s2d[:, 0, -1], corners[1]) \
        - O[:, 0, wc, 1 * co4:2 * co4] - ct[:, 0, -1, 1] - cr[:, 0, 0, 0]
    add_bl = corner_val(x_s2d[:, -1, 0], corners[2]) \
        - O[:, hc, 0, 2 * co4:3 * co4] - cb[:, 0, 0, 0] - cl[:, -1, 1, 0]
    add_br = corner_val(x_s2d[:, -1, -1], corners[3]) \
        - O[:, hc, wc, 3 * co4:4 * co4] - cb[:, 0, -1, 1] - cr[:, -1, 1, 0]

    five = lambda v: v[:, None, None, None, None, :]
    corr = corr \
        + pad6(five(add_tl), (0, hc - 1), (0, wc - 1), (0, 1), (0, 1)) \
        + pad6(five(add_tr), (0, hc - 1), (wc - 1, 0), (0, 1), (1, 0)) \
        + pad6(five(add_bl), (hc - 1, 0), (0, wc - 1), (1, 0), (0, 1)) \
        + pad6(five(add_br), (hc - 1, 0), (wc - 1, 0), (1, 0), (1, 0))

    return (S + corr).reshape(b, hc, wc, 16 * co)


def space_to_depth_blocks(y_s2d: jnp.ndarray) -> jnp.ndarray:
    """S2D(2) (B, 2Hc, 2Wc, 4Co) -> N4 (B, Hc, Wc, 16Co) (cell-grid S2D of
    an already-S2D tensor; bit-nested phase order)."""
    b, h2, w2, c4 = y_s2d.shape
    hc, wc = h2 // 2, w2 // 2
    y = y_s2d.reshape(b, hc, 2, wc, 2, c4)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, hc, wc, 4 * c4)


def _n4_lane(u: int, v: int, ay: int, ax: int) -> int:
    """Phase-block index in the bit-nested N4 channel order (u, v, ay, ax)."""
    return ((u * 2 + v) * 2 + ay) * 2 + ax


def conv3x3_n4(x_n4: jnp.ndarray, w: jnp.ndarray,
               qscale: float | None = None) -> jnp.ndarray:
    """Full-res stride-1 3x3 conv (zero padding) applied in nested-S2D(4)
    ("N4") form — the output stays N4, so the chain d4-conv1 -> seg head
    never regroups to the 2x grid (the N4 -> S2D(2) regroup transpose was
    the measured 5-pass epilogue that sank the nested tail in round 2).

    x_n4: (B, Hg, Wg, 16*Ci), the N4 form (bit-nested phase order
    (u, v, ay, ax)) of a (4Hg, 4Wg, Ci) map; w: (3, 3, Ci, Co)
    -> (B, Hg, Wg, 16*Co).

    Decomposition: a full-res 3x3 tap from output phase p=(py, px) reads
    source phase q=(py+dy, px+dx); when q stays in 0..3 on both axes the
    tap is INSIDE the same 4x4 cell — all such taps form one dense
    (16Ci -> 16Co) matrix applied as a 1x1 conv (the MXU-shaped bulk, ~78%
    of the true taps). Taps that cross a cell boundary exist only for the
    extreme phases (py=0 with dy=-1, py=3 with dy=+1, same in x), giving
    four thin edge terms (64-lane gather @ (4Ci, 4Co) matmul on a
    cell-shifted view) and four corner terms (16 lanes @ (Ci, Co)).
    FLOP inflation vs the exact conv is only the center matrix's zero
    blocks (~2.2x) — far below the 16x of the naive dense N4 kernel.

    Exact: an out-of-range full-res tap maps to an out-of-range cell, so
    cell-space zero padding equals full-res zero padding (same argument as
    :func:`conv3x3_s2d`). No border corrections needed.
    """
    b, hg, wg, c16 = x_n4.shape
    ci = c16 // 16
    co = w.shape[3]
    wf = w.astype(jnp.float32)

    # --- center: all taps with both source phases in range -------------
    M0 = jnp.zeros((16 * ci, 16 * co), jnp.float32)
    for pu in range(2):
        for pv in range(2):
            for pay in range(2):
                for pax in range(2):
                    py, px = 2 * pu + pay, 2 * pv + pax
                    pb = _n4_lane(pu, pv, pay, pax)
                    for dy in (-1, 0, 1):
                        qy = py + dy
                        if not 0 <= qy <= 3:
                            continue
                        for dx in (-1, 0, 1):
                            qx = px + dx
                            if not 0 <= qx <= 3:
                                continue
                            qb = _n4_lane(qy // 2, qx // 2, qy % 2, qx % 2)
                            M0 = M0.at[qb * ci:(qb + 1) * ci,
                                       pb * co:(pb + 1) * co].set(wf[dy + 1, dx + 1])
    y = _conv_q(x_n4, M0.reshape(1, 1, 16 * ci, 16 * co), (1, 1), "VALID",
                qscale)

    def shift(sy: int, sx: int) -> jnp.ndarray:
        # result[I] = x[I + s] per axis, zero padded at the image border
        t = jnp.pad(x_n4, ((0, 0), (max(-sy, 0), max(sy, 0)),
                           (max(-sx, 0), max(sx, 0)), (0, 0)))
        return t[:, max(sy, 0):max(sy, 0) + hg, max(sx, 0):max(sx, 0) + wg]

    def cat_lanes(t, starts, width):
        return jnp.concatenate(
            [lax.slice_in_dim(t, s, s + width, axis=3) for s in starts], -1)

    def scatter_lanes(t, starts, width):
        parts = []
        for i, s in enumerate(starts):
            seg = lax.slice_in_dim(t, i * width, (i + 1) * width, axis=3)
            parts.append(jnp.pad(
                seg, ((0, 0), (0, 0), (0, 0), (s, 16 * co - s - width))))
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return out

    dt = y.dtype

    # --- y-crossing edges: (py, dy, qy) = (0, -1, 3) / (3, +1, 0) ------
    for sy, py, qy, ky in ((-1, 0, 3, 0), (1, 3, 0, 2)):
        # rows: fixed y-phase qy, (v, ax, ci) order — 2 blocks of 2*Ci
        rstarts = [_n4_lane(qy // 2, v, qy % 2, 0) * ci for v in (0, 1)]
        # cols: fixed y-phase py — 2 blocks of 2*Co
        cstarts = [_n4_lane(py // 2, v, py % 2, 0) * co for v in (0, 1)]
        M = jnp.zeros((4 * ci, 4 * co), jnp.float32)
        for v in range(2):
            for ax in range(2):
                qx = 2 * v + ax
                for vv in range(2):
                    for axx in range(2):
                        px = 2 * vv + axx
                        if abs(qx - px) > 1:
                            continue
                        r0 = (v * 2 + ax) * ci
                        c0 = (vv * 2 + axx) * co
                        M = M.at[r0:r0 + ci, c0:c0 + co].set(
                            wf[ky, qx - px + 1])
        g = cat_lanes(shift(sy, 0), rstarts, 2 * ci)
        e = jnp.einsum("bhwi,io->bhwo", g, M.astype(dt))
        y = y + scatter_lanes(e, cstarts, 2 * co).astype(dt)

    # --- x-crossing edges: (px, dx, qx) = (0, -1, 3) / (3, +1, 0) ------
    for sx, px, qx, kx in ((-1, 0, 3, 0), (1, 3, 0, 2)):
        # rows: fixed x-phase qx, (u, ay, ci) order — 4 blocks of Ci
        rstarts = [_n4_lane(u, qx // 2, ay, qx % 2) * ci
                   for u in (0, 1) for ay in (0, 1)]
        cstarts = [_n4_lane(u, px // 2, ay, px % 2) * co
                   for u in (0, 1) for ay in (0, 1)]
        M = jnp.zeros((4 * ci, 4 * co), jnp.float32)
        for u in range(2):
            for ay in range(2):
                qy = 2 * u + ay
                for uu in range(2):
                    for ayy in range(2):
                        py = 2 * uu + ayy
                        if abs(qy - py) > 1:
                            continue
                        r0 = (u * 2 + ay) * ci
                        c0 = (uu * 2 + ayy) * co
                        M = M.at[r0:r0 + ci, c0:c0 + co].set(
                            wf[qy - py + 1, kx])
        g = cat_lanes(shift(0, sx), rstarts, ci)
        e = jnp.einsum("bhwi,io->bhwo", g, M.astype(dt))
        y = y + scatter_lanes(e, cstarts, co).astype(dt)

    # --- corners: both axes cross ---------------------------------------
    for sy, py, qy, ky in ((-1, 0, 3, 0), (1, 3, 0, 2)):
        for sx, px, qx, kx in ((-1, 0, 3, 0), (1, 3, 0, 2)):
            rs = _n4_lane(qy // 2, qx // 2, qy % 2, qx % 2) * ci
            cs = _n4_lane(py // 2, px // 2, py % 2, px % 2) * co
            g = lax.slice_in_dim(shift(sy, sx), rs, rs + ci, axis=3)
            e = jnp.einsum("bhwi,io->bhwo", g, wf[ky, kx].astype(dt))
            y = y + jnp.pad(
                e, ((0, 0), (0, 0), (0, 0), (cs, 16 * co - cs - co))).astype(dt)

    return y


def n4_regroup_to_s2d(y_n4: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth_blocks`: N4 (B, Hc, Wc, 16Co) ->
    S2D(2) (B, 2Hc, 2Wc, 4Co) on the doubled grid."""
    b, hc, wc, c16 = y_n4.shape
    c4 = c16 // 4
    y = y_n4.reshape(b, hc, wc, 2, 2, c4)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * hc, 2 * wc, c4)


def conv3x3_strided_s2d(x: jnp.ndarray, w: jnp.ndarray,
                        qscale: float | None = None) -> jnp.ndarray:
    """Full-res stride-1 3x3 conv (zero pad) of a FULL-RES input, output in
    S2D(2) form — as one 4x4 stride-2 conv, so the input never goes through
    a space_to_depth relayout (measured ~3.7 ms at decoder-3 skip shapes).

    x: (B, 2Hc, 2Wc, Ci); w: (3, 3, Ci, Co) -> (B, Hc, Wc, 4*Co).
    Output phase (ay, ax) of cell (i, j) reads full-res rows 2i-1..2i+2 —
    window position p = ay + dy + 1 with asymmetric padding (1, 2).
    """
    ci, co = w.shape[2], w.shape[3]
    W = jnp.zeros((4, 4, ci, 4 * co), w.dtype)
    for ay in range(2):
        for ax in range(2):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    W = W.at[ay + dy + 1, ax + dx + 1, :,
                             (ay * 2 + ax) * co:(ay * 2 + ax + 1) * co].set(w[dy + 1, dx + 1])
    return _conv_q(x, W, (2, 2), ((1, 2), (1, 2)), qscale)


def conv3x3_s2d_to_n4(h_s2d: jnp.ndarray, w: jnp.ndarray,
                      qscale: float | None = None) -> jnp.ndarray:
    """Full-res stride-1 3x3 conv of an S2D(2) input, output in *nested* S2D(4)
    ("N4") form on a grid coarsened by another 2x — one strided conv, so no
    small-channel full-res tensor is ever materialised.

    h_s2d: (B, Hc, Wc, 4*Ci) S2D(2) of a (2Hc, 2Wc, Ci) map; w: (3, 3, Ci, Co)
    -> (B, Hc/2, Wc/2, 16*Co). Output channel order is bit-nested:
    block index (u*2 + v) * 4 + (ay*2 + ax), full-res phase (A, B) =
    (2u + ay, 2v + ax). Hc and Wc must be even.

    Why: a full-res map with tiny C (the seg head's 1-4 channels) is
    lane-padded to 128 on TPU — 8-32x wasted HBM bytes; the N4 form carries
    16x the channels at 1/16 the positions (profiled: the seg head fusion
    alone cost 1.9 ms/batch at flagship shapes in the C=4 layout).
    """
    b, hc, wc, c4 = h_s2d.shape
    ci = c4 // 4
    assert hc % 2 == 0 and wc % 2 == 0, (hc, wc)
    k_cell = expand_kernel_s2d(w)  # (3, 3, 4Ci, 4Co) on the S2D(2) grid
    co4 = k_cell.shape[3]
    # strided-s2d expansion of the cell kernel (same construction as
    # conv3x3_strided_s2d, with the S2D(2) grid playing the full-res role)
    W = jnp.zeros((4, 4, c4, 4 * co4), k_cell.dtype)
    for u in range(2):
        for v in range(2):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    W = W.at[u + dy + 1, v + dx + 1, :,
                             (u * 2 + v) * co4:(u * 2 + v + 1) * co4].set(k_cell[dy + 1, dx + 1])
    return _conv_q(h_s2d, W, (2, 2), ((1, 2), (1, 2)), qscale)


def n4_to_plain(y: jnp.ndarray, classes: int = 1) -> jnp.ndarray:
    """(B, Hg, Wg, 16*C) N4 form (bit-nested phase order (u, v, ay, ax)) ->
    plain (B, 4*Hg, 4*Wg, C)."""
    b, hg, wg, c16 = y.shape
    c = c16 // 16
    assert c == classes and c16 == 16 * classes, (c16, classes)
    y = y.reshape(b, hg, wg, 2, 2, 2, 2, c)          # [u, v, ay, ax, c]
    y = y.transpose(0, 1, 3, 5, 2, 4, 6, 7)          # b, hg, u, ay, wg, v, ax, c
    return y.reshape(b, 4 * hg, 4 * wg, c)


def tile_channel_params(v: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Per-channel affine/stat vector (C,) -> (r*r*C,) matching S2D order."""
    return jnp.tile(v, r * r)


def deconv2x_kernel_s2d(k: jnp.ndarray) -> jnp.ndarray:
    """flax ConvTranspose(k=2, s=2, VALID) kernel (2, 2, Ci, Co) -> a 1x1
    conv kernel (1, 1, Ci, 4*Co) whose output IS the deconv result in
    S2D(2) form: y[2i+a, 2j+b] = x[i, j] @ k[1-a, 1-b] (flax flips the
    spatial taps of a transposed conv), so phase (a, b) gets block
    k[1-a, 1-b]."""
    ci, co = k.shape[2], k.shape[3]
    kf = k[::-1, ::-1]                      # (a, b) -> k[1-a, 1-b]
    return kf.transpose(2, 0, 1, 3).reshape(1, 1, ci, 4 * co)


def conv1x1_kernel_s2d(w: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Per-pixel 1x1 conv kernel (1, 1, Ci, Co) -> the phase-block-diagonal
    (1, 1, r*r*Ci, r*r*Co) kernel applying it in S2D(r) form."""
    ci, co = w.shape[2], w.shape[3]
    p = r * r
    out = jnp.zeros((1, 1, p * ci, p * co), w.dtype)
    for i in range(p):
        out = out.at[:, :, i * ci:(i + 1) * ci, i * co:(i + 1) * co].set(w)
    return out


def stem_kernel_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 3x3 stem kernel (3, 3, Ci, C) -> a (5, 5, Ci, 4*C) stride-4
    kernel whose output IS the stem output in S2D(2) form (phase-major).

    TF-SAME s2 k3 on even extents pads (0, 1): out row o taps in rows
    [2o, 2o+3). Composed over the 2x2 output phase block, cell Y covers in
    rows [4Y, 4Y+5) — one conv with explicit padding ((0, 1), (0, 1)) and
    no relayout pass (the plain stem output, C=32, pads 4x in HBM lanes).
    """
    import numpy as np
    c = w.shape[-1]
    # S[g, r, d] = 1 where kernel row r = 2g + d (phase g, original tap d)
    S = np.zeros((2, 5, 3), np.float32)
    for g in range(2):
        for d in range(3):
            S[g, 2 * g + d, d] = 1.0
    Sj = jnp.asarray(S, w.dtype)
    # (5, 5, Ci, 2, 2, C): out channel block (gy, gx) phase-major
    k5 = jnp.einsum("grd,hse,deio->rsigho", Sj, Sj, w)
    return k5.reshape(5, 5, w.shape[2], 4 * c)


def dw_kernel_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise SAME s1 3x3 kernel (3, 3, 1, C) -> the dense
    (3, 3, 4C, 4C) kernel computing it on the S2D(2) grid (phase-major;
    off-phase/off-channel blocks zero). Zero padding on the half grid
    equals full-res zero padding, so edges are exact."""
    import numpy as np
    c = w.shape[-1]
    wf = w[:, :, 0]                              # (3, 3, C)
    # S[k, gi, go, d] = 1 where full-res tap d = 2(k-1) + gi - go + 1
    S = np.zeros((3, 2, 2, 3), np.float32)
    for k in range(3):
        for gi in range(2):
            for go in range(2):
                d = 2 * (k - 1) + gi - go + 1
                if 0 <= d < 3:
                    S[k, gi, go, d] = 1.0
    Sj = jnp.asarray(S, w.dtype)
    a = jnp.einsum("kipd,ljqe,dec->klipjqc", Sj, Sj, wf)  # (3,3,gi,go,gxi,gxo,C)
    eye = jnp.eye(c, dtype=w.dtype)
    k4 = jnp.einsum("klipjqc,cd->klijcpqd", a, eye)  # in (gi,gxi,ci), out (go,gxo,co)
    return k4.reshape(3, 3, 4 * c, 4 * c)


def dw_stride2_exit_kernel_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise SAME s2 3x3 kernel (3, 3, 1, C) consuming an S2D(2) input
    -> a (2, 2, 4C, C) phase-selecting kernel (explicit padding (0, 1))
    whose output is the PLAIN half-res map. TF-SAME s2 k3 pads (0, 1):
    out row O taps full-res rows [2O, 2O+3) = S2D cells O, O+1."""
    import numpy as np
    c = w.shape[-1]
    wf = w[:, :, 0]
    # S[k, gi, d] = 1 where d = 2k + gi
    S = np.zeros((2, 2, 3), np.float32)
    for k in range(2):
        for gi in range(2):
            if 2 * k + gi < 3:
                S[k, gi, 2 * k + gi] = 1.0
    Sj = jnp.asarray(S, w.dtype)
    a = jnp.einsum("kid,lje,dec->klijc", Sj, Sj, wf)   # (2,2,gi,gxi,C)
    eye = jnp.eye(c, dtype=w.dtype)
    k2 = jnp.einsum("klijc,cd->klijcd", a, eye)
    return k2.reshape(2, 2, 4 * c, c)


def dw_stride2_s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise SAME s2 3x3 kernel (3, 3, 1, C) consuming an S2D(2) input
    -> a (3, 3, 4C, 4C) STRIDE-2 kernel (explicit padding (0, 1)) whose
    output is the S2D(2) form of the half-res output map.

    Output cell Y phase go = half-res row 2Y+go, which taps full-res rows
    [2(2Y+go), 2(2Y+go)+3) = input cells 2Y+k (k in 0..2) phase gi where
    the full-res tap index d satisfies d = 2k + gi - 2*go, 0 <= d < 3.
    The cell grid must be even (full-res extent % 4 == 0)."""
    import numpy as np
    c = w.shape[-1]
    wf = w[:, :, 0]
    S = np.zeros((3, 2, 2, 3), np.float32)   # [k, gi, go, d]
    for k in range(3):
        for gi in range(2):
            for go in range(2):
                d = 2 * k + gi - 2 * go
                if 0 <= d < 3:
                    S[k, gi, go, d] = 1.0
    Sj = jnp.asarray(S, w.dtype)
    # (3, 3, gi, go, gxi, gxo, C)
    a = jnp.einsum("kipd,ljqe,dec->klipjqc", Sj, Sj, wf)
    eye = jnp.eye(c, dtype=w.dtype)
    # in block (gi, gxi, ci), out block (go, gxo, co)
    k4 = jnp.einsum("klipjqc,cd->klijcpqd", a, eye)
    return k4.reshape(3, 3, 4 * c, 4 * c)


def dw5_stride2_exit_kernel_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise SAME s2 5x5 kernel (5, 5, 1, C) consuming an S2D(2) input
    -> a (3, 3, 4C, C) stride-1 SAME kernel on the cell grid whose output
    is the PLAIN half-res map.

    TF-SAME k5 s2 on an even extent pads (1, 2): out row O taps full-res
    rows [2O-1, 2O+4) = input cells O-1..O+1 (k in 0..2) phase gi where
    the tap index d = 2k + gi - 1, 0 <= d < 5. A zero cell reproduces the
    zero full-res rows exactly (row -2 is never tapped)."""
    import numpy as np
    c = w.shape[-1]
    wf = w[:, :, 0]
    S = np.zeros((3, 2, 5), np.float32)      # [k, gi, d]
    for k in range(3):
        for gi in range(2):
            d = 2 * k + gi - 1
            if 0 <= d < 5:
                S[k, gi, d] = 1.0
    Sj = jnp.asarray(S, w.dtype)
    a = jnp.einsum("kid,lje,dec->klijc", Sj, Sj, wf)   # (3,3,gi,gxi,C)
    eye = jnp.eye(c, dtype=w.dtype)
    k3 = jnp.einsum("klijc,cd->klijcd", a, eye)
    return k3.reshape(3, 3, 4 * c, c)


# --- single-channel full-res ops in N4 phase form ---------------------------
#
# The deployed binary-mask epilogues (dilation, edge smoothing, bilateral)
# operate on C=1 full-resolution maps, which pad 128x in TPU lanes — the
# measured bilateral+smooth epilogue costs ~21 ms/batch-32 at 480x640 in
# plain form. The same math runs on the stage-1 N4 phase form
# (B, H/4, W/4, 16), which is lane-dense: a K x K single-channel conv
# becomes one small dense conv over the 16 phase channels, and shifts
# become channel permutations + cell shifts. Exact vs the plain ops
# (tests/test_postprocess.py).

def n4_channel(pr: int, pc: int) -> int:
    """Channel index of full-res phase (row%4, col%4) in the bit-nested N4
    order (u, v, ay, ax) used by conv3x3_s2d_to_n4/n4_to_plain."""
    return (pr // 2) * 8 + (pc // 2) * 4 + (pr % 2) * 2 + (pc % 2)


def dw_kernel_n4(k2d, dtype=jnp.float32) -> jnp.ndarray:
    """(K, K) single-channel full-res conv kernel (zero padding) -> the
    dense (kc, kc, 16, 16) kernel computing it on the N4 form. Cell-space
    zero padding equals full-res zero padding (an out-of-range tap lands in
    an out-of-range cell)."""
    k2d = np.asarray(k2d, np.float64)
    K = k2d.shape[0]
    half = K // 2
    reach = (half + 3) // 4
    kc = 2 * reach + 1
    W = np.zeros((kc, kc, 16, 16), np.float64)
    for pr in range(4):
        for pc in range(4):
            out_ch = n4_channel(pr, pc)
            for dy in range(K):
                for dx in range(K):
                    ty, tx = pr + dy - half, pc + dx - half
                    cy, sr = ty // 4, ty % 4
                    cx, sc = tx // 4, tx % 4
                    W[cy + reach, cx + reach, n4_channel(sr, sc), out_ch] \
                        += k2d[dy, dx]
    return jnp.asarray(W, dtype)


def conv_dw_n4(x_n4: jnp.ndarray, k2d) -> jnp.ndarray:
    """Depthwise (single-channel) full-res conv applied to an N4 map
    (B, Hg, Wg, 16) -> same shape; kernel weights may be a numpy array."""
    return lax.conv_general_dilated(
        x_n4, dw_kernel_n4(k2d, x_n4.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def shift_n4(x_n4: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Full-res shift by (dy, dx) of a single-channel map in N4 form
    (zero padding): out[r, c] = x[r + dy, c + dx]."""
    b, hg, wg, _ = x_n4.shape
    ry = (abs(dy) + 3) // 4
    rx = (abs(dx) + 3) // 4
    xp = jnp.pad(x_n4, ((0, 0), (ry, ry), (rx, rx), (0, 0)))
    cols = []
    for pr in range(4):
        for pc in range(4):
            ty, tx = pr + dy, pc + dx
            cy, sr = ty // 4, ty % 4
            cx, sc = tx // 4, tx % 4
            src = xp[:, ry + cy:ry + cy + hg, rx + cx:rx + cx + wg,
                     n4_channel(sr, sc)]
            cols.append((n4_channel(pr, pc), src))
    cols.sort()
    return jnp.stack([c for _, c in cols], axis=-1)


def maxpool_n4(x_n4: jnp.ndarray, size: int) -> jnp.ndarray:
    """Full-res SAME max-pool (size x size, stride 1) on an N4 map —
    the dilation primitive. Decomposed into per-axis shift-max chains."""
    half = size // 2
    y = x_n4
    for axis_shift in [(d, 0) for d in range(-half, half + 1) if d] :
        y = jnp.maximum(y, shift_n4(x_n4, *axis_shift))
    out = y
    for d in range(-half, half + 1):
        if d:
            out = jnp.maximum(out, shift_n4(y, 0, d))
    return out
