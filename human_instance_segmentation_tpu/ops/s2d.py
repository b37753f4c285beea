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
        x, k, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


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


def conv3x3_s2d(x_s2d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Full-res stride-1 3x3 conv (zero padding) applied in S2D(2) form.

    x_s2d: (B, Hc, Wc, 4*Ci); w: (3, 3, Ci, Co) -> (B, Hc, Wc, 4*Co).
    Exact: cell-space zero padding == full-res zero padding (an out-of-range
    full-res tap always lands in an out-of-range cell).
    """
    return _conv(x_s2d, expand_kernel_s2d(w), "SAME")


# 1-D composition tables: u[2i + s] as weights over x[i + delta], for the
# half-pixel edge-clamped 2x bilinear upsample (interior rows; borders are
# fixed separately). s = a + d ranges over {-1, 0, 1, 2}.
_A = {
    -1: {-1: 0.75, 0: 0.25},
    0: {-1: 0.25, 0: 0.75},
    1: {0: 0.75, 1: 0.25},
    2: {0: 0.25, 1: 0.75},
}


def compose_up_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Fold upsample_2x_bilinear into a following 3x3 conv.

    w: (3, 3, Ci, Co) -> K: (3, 3, Ci, 4*Co) over the LOW-res grid, where
    output channel block (ay*2 + ax) is full-res phase (ay, ax):
        y[2i+ay, 2j+ax] = sum_d w[d] u[2i+ay+d] = sum_delta K[delta] x[i+delta]
    """
    co = w.shape[3]
    blocks = []
    for ay in range(2):
        for ax in range(2):
            ky = np.zeros((3, 3), np.float64)  # (d+1, delta+1) y-axis factor
            kx = np.zeros((3, 3), np.float64)
            for d in (-1, 0, 1):
                for delta, wt in _A[ay + d].items():
                    ky[d + 1, delta + 1] += wt
                for delta, wt in _A[ax + d].items():
                    kx[d + 1, delta + 1] += wt
            k = jnp.einsum("yxio,yY,xX->YXio", w.astype(jnp.float32),
                           jnp.asarray(ky, jnp.float32), jnp.asarray(kx, jnp.float32))
            blocks.append(k.astype(w.dtype))
    return jnp.concatenate(blocks, axis=-1)  # (3, 3, Ci, 4*Co)


def conv_up_s2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """conv3x3(zero-pad, kernel w) of upsample_2x_bilinear(x), returned in
    S2D(2) form on x's own grid, without materialising the upsample.

    x: (B, H, W, Ci); w: (3, 3, Ci, Co) -> (B, H, W, 4*Co).

    Interior cells come from a single composed 3x3 SAME conv over x (no
    padded copy); the first/last CELL rows and columns — where the composed
    kernel's zero padding deviates from the true edge-clamped upsample — are
    recomputed exactly from 2-pixel strips and merged in one fused
    select pass (scatter updates cost a full-tensor copy each; measured 6 ms
    per call at decoder-4 shapes, scripts/profile_fused_parts.py).
    """
    K = compose_up_conv_kernel(w)
    y = _conv(x, K, "SAME")  # wrong only in cell rows/cols 0 and -1

    def strip(xs):  # plain path on a small strip: upsample then SAME conv
        return _conv(upsample_2x_bilinear(xs), w, "SAME")

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


def conv3x3_strided_s2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
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
    return lax.conv_general_dilated(
        x, W, (2, 2), ((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def tile_channel_params(v: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Per-channel affine/stat vector (C,) -> (r*r*C,) matching S2D order."""
    return jnp.tile(v, r * r)
