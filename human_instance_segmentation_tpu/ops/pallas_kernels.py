"""Pallas TPU kernels for the deployment post-processing hot ops.

The XLA bilateral filter (models/postprocess.py) materialises k^2 shifted
whole-image intermediates — at k=7 that's 49 reads of the image from HBM
plus temporaries. These kernels keep the (padded) plane resident in VMEM
and walk it in row tiles: every input element is read from HBM exactly
once, all k^2 fused multiply-adds run on the VPU, and the live temporaries
are bounded to one row tile (a full-plane working set blows the ~16 MB VMEM
budget at 480x640 — hence the in-kernel `fori_loop` tiling).

Layout note: planes are (rows, cols) per (batch*channel) grid step — the
lane dimension is the image width (640 = 5*128 for deployment frames).

`interpret=True` runs the same kernels on CPU for tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gaussian_2d(k: int, sigma: float) -> np.ndarray:
    c = np.arange(k, dtype=np.float32) - (k - 1) / 2
    d2 = c[:, None] ** 2 + c[None, :] ** 2
    return np.exp(-d2 / (2.0 * sigma ** 2))


def _row_tile(h: int, target: int = 64) -> int:
    """Largest divisor of h that is <= target, preferring multiples of 8:
    Mosaic must statically prove the dynamic sublane start (t * tile_h) is
    8-aligned, and tile_h % 8 == 0 makes that provable."""
    for t in range(min(target, h) // 8 * 8, 0, -8):
        if h % t == 0:
            return t
    for t in range(min(target, h), 0, -1):
        if h % t == 0:
            return t
    return h


def _bilateral_kernel(x_ref, out_ref, *, kernel_size: int, sigma_range: float,
                      spatial: np.ndarray, h: int, w: int, tile_h: int):
    pad = kernel_size // 2
    inv2s2 = 1.0 / (2.0 * sigma_range ** 2)
    n_tiles = h // tile_h

    def body(t, _):
        r0 = t * tile_h
        xp = x_ref[0, pl.ds(r0, tile_h + 2 * pad), :]  # (tile_h + 2p, w + 2p)
        # Column shifts via lane-dim roll (unaligned lane slices don't
        # lower); rolled[:, :w][r, j] == xp[r, j + dj] with no wraparound
        # because j + dj < w + 2*pad always holds.
        n_cols = w + 2 * pad
        cols = [pltpu.roll(xp, (n_cols - dj) % n_cols, 1)[:, :w] for dj in range(kernel_size)]
        center = cols[pad][pad:pad + tile_h, :]
        num = jnp.zeros((tile_h, w), jnp.float32)
        den = jnp.zeros((tile_h, w), jnp.float32)
        for di in range(kernel_size):
            for dj in range(kernel_size):
                shifted = cols[dj][di:di + tile_h, :]
                wgt = float(spatial[di, dj]) * jnp.exp(-((shifted - center) ** 2) * inv2s2)
                num = num + wgt * shifted
                den = den + wgt
        out_ref[0, pl.ds(r0, tile_h), :] = num / (den + 1e-8)
        return 0

    lax.fori_loop(0, n_tiles, body, 0)


@partial(jax.jit, static_argnames=("kernel_size", "sigma_spatial", "sigma_range", "interpret"))
def bilateral_filter_pallas(
    x: jnp.ndarray,
    kernel_size: int = 5,
    sigma_spatial: float = 1.0,
    sigma_range: float = 0.1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact bilateral filter, Pallas TPU kernel.

    Matches models/postprocess.bilateral_filter (reflect padding, Gaussian
    spatial x Gaussian range weights). x: (B, H, W, C) float.
    """
    b, h, w, c = x.shape
    pad = kernel_size // 2
    spatial = _gaussian_2d(kernel_size, sigma_spatial)

    planes = jnp.transpose(x, (0, 3, 1, 2)).reshape(b * c, h, w).astype(jnp.float32)
    planes = jnp.pad(planes, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")

    kernel = partial(_bilateral_kernel, kernel_size=kernel_size,
                     sigma_range=sigma_range, spatial=spatial, h=h, w=w,
                     tile_h=_row_tile(h))
    out = pl.pallas_call(
        kernel,
        grid=(b * c,),
        in_specs=[pl.BlockSpec((1, h + 2 * pad, w + 2 * pad),
                               lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * c, h, w), jnp.float32),
        interpret=interpret,
    )(planes)
    return jnp.transpose(out.reshape(b, c, h, w), (0, 2, 3, 1)).astype(x.dtype)


def _edge_smooth_kernel(m_ref, out_ref, *, blur_strength: float, threshold: float,
                        h: int, w: int, tile_h: int):
    """Fused Laplacian edge detect + Gaussian blur + blend + binarise
    (mirrors models/postprocess.edge_smooth_binary_mask)."""
    n_tiles = h // tile_h

    def body(t, _):
        r0 = t * tile_h
        mp = m_ref[0, pl.ds(r0, tile_h + 2), :]  # (tile_h + 2, w + 2)
        n_cols = w + 2
        cols = [pltpu.roll(mp, (n_cols - dj) % n_cols, 1)[:, :w] for dj in range(3)]

        def win(di, dj):
            return cols[dj][di:di + tile_h, :]

        center = win(1, 1)
        neigh_sum = (win(0, 0) + win(0, 1) + win(0, 2) + win(1, 0) + win(1, 2)
                     + win(2, 0) + win(2, 1) + win(2, 2))
        edges = jnp.abs(8.0 * center - neigh_sum)
        edge_w = jax.nn.sigmoid(edges * blur_strength)
        blurred = (win(0, 0) + 2 * win(0, 1) + win(0, 2)
                   + 2 * win(1, 0) + 4 * center + 2 * win(1, 2)
                   + win(2, 0) + 2 * win(2, 1) + win(2, 2)) * (1.0 / 16.0)
        smoothed = center * (1.0 - edge_w) + blurred * edge_w
        out_ref[0, pl.ds(r0, tile_h), :] = (smoothed > threshold).astype(jnp.float32)
        return 0

    lax.fori_loop(0, n_tiles, body, 0)


@partial(jax.jit, static_argnames=("threshold", "blur_strength", "interpret"))
def edge_smooth_pallas(
    mask: jnp.ndarray,
    threshold: float = 0.5,
    blur_strength: float = 3.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused binary-mask edge smoothing (B, H, W, C)."""
    b, h, w, c = mask.shape
    planes = jnp.transpose(mask, (0, 3, 1, 2)).reshape(b * c, h, w).astype(jnp.float32)
    # zero padding matches the XLA/torch conv 'same' semantics
    planes = jnp.pad(planes, ((0, 0), (1, 1), (1, 1)))

    kernel = partial(_edge_smooth_kernel, blur_strength=blur_strength,
                     threshold=threshold, h=h, w=w, tile_h=_row_tile(h))
    out = pl.pallas_call(
        kernel,
        grid=(b * c,),
        in_specs=[pl.BlockSpec((1, h + 2, w + 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * c, h, w), jnp.float32),
        interpret=interpret,
    )(planes)
    return jnp.transpose(out.reshape(b, c, h, w), (0, 2, 3, 1)).astype(mask.dtype)
