"""Separable bilinear sampling primitives (RoIAlign, resize) as MXU matmuls.

TPU-first design note
---------------------
The reference implements RoIAlign by building a dense per-ROI sampling grid
and calling ``torch.nn.functional.grid_sample`` (a gather-heavy CUDA kernel);
see /root/reference/src/human_edge_detection/dynamic_roi_align.py:56-171 for
the exact semantics reproduced here. Gathers are slow on TPU. Because every
ROI is an axis-aligned box sampled on a regular ``linspace`` lattice, the
bilinear interpolation is *separable*: sampling reduces to two dense matrix
products per ROI,

    out[n, :, :, c] = Wy[n] @ img[batch_idx[n], :, :, c] @ Wx[n].T

where ``Wy[n] (oh, H)`` / ``Wx[n] (ow, W)`` are interpolation matrices whose
rows are hat functions ``max(0, 1 - |pos - j|)``. These matmuls run on the
MXU, are trivially differentiable, need no dynamic shapes, and reproduce
``grid_sample(mode='bilinear', padding_mode='zeros', align_corners=aligned)``
exactly (hat weights vanish outside the image, which *is* zeros padding).

All tensors here are NHWC (TPU-preferred layout).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp

Scale = Union[float, Tuple[float, float]]


def _as_hw(scale: Scale) -> Tuple[float, float]:
    if isinstance(scale, (tuple, list)):
        assert len(scale) == 2, "spatial_scale tuple must be (scale_h, scale_w)"
        return float(scale[0]), float(scale[1])
    return float(scale), float(scale)


def bilinear_weight_matrix(
    pos: jnp.ndarray,
    size: int,
    padding: str = "zeros",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Dense hat-function interpolation matrix.

    Args:
      pos: (..., out) sample positions in source pixel-index space.
      size: source extent S.
      padding: 'zeros'  -> out-of-range positions lose weight (grid_sample
                           padding_mode='zeros' semantics);
               'edge'   -> positions are clamped to [0, S-1] first
                           (torch F.interpolate border semantics).

    Returns:
      (..., out, S) weights; each row has at most two non-zeros.
    """
    if padding == "edge":
        pos = jnp.clip(pos, 0.0, size - 1.0)
    elif padding != "zeros":
        raise ValueError(f"unknown padding mode: {padding}")
    idx = jnp.arange(size, dtype=pos.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - idx))
    return w.astype(dtype)


def grid_sample_positions(
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    out_size: int,
    aligned: bool,
) -> jnp.ndarray:
    """Per-ROI 1-D sample positions in source pixel-index space.

    Reproduces the reference grid construction
    (dynamic_roi_align.py:110-146): ``f = lo + linspace(0, 1, out) * (hi-lo)``
    in spatial-scale units, then the grid_sample unnormalisation, which for a
    feature map of the same extent collapses to ``f`` (align_corners=True)
    or ``f - 0.5`` (align_corners=False).

    Args:
      lo, hi: (...,) box edges already multiplied by spatial_scale.
      out_size: number of output samples along this axis.
    """
    if out_size == 1:
        t = jnp.zeros((1,), dtype=lo.dtype)
    else:
        t = jnp.linspace(0.0, 1.0, out_size, dtype=lo.dtype)
    f = lo[..., None] + t * (hi - lo)[..., None]
    return f if aligned else f - 0.5


@partial(jax.jit, static_argnames=("output_height", "output_width", "spatial_scale", "aligned"))
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_height: int,
    output_width: int,
    spatial_scale: Scale = (640.0, 640.0),
    aligned: bool = False,
) -> jnp.ndarray:
    """Dynamic RoIAlign with grid_sample-exact semantics, as separable matmuls.

    Args:
      features: (B, H, W, C) feature map (NHWC).
      rois: (N, 5) rows ``[batch_idx, x1, y1, x2, y2]`` with coordinates
        normalised to [0, 1] (reference contract, dynamic_roi_align.py:63-67).
        Padded ROIs may carry batch_idx < 0; they produce garbage rows the
        caller masks out (indices are clipped for safety).
      output_height/output_width: static output size.
      spatial_scale: scalar or (scale_h, scale_w); multiplies the normalised
        coordinates into feature-pixel space.
      aligned: align_corners flag (True for the mask/RGB crops of the
        deployed model, hierarchical_segmentation_rgb.py:636-647).

    Returns:
      (N, output_height, output_width, C) pooled features.
    """
    ssh, ssw = _as_hw(spatial_scale)
    B, H, W, _ = features.shape
    dtype = features.dtype

    batch_idx = jnp.clip(rois[:, 0].astype(jnp.int32), 0, B - 1)
    x1 = rois[:, 1] * ssw
    y1 = rois[:, 2] * ssh
    x2 = rois[:, 3] * ssw
    y2 = rois[:, 4] * ssh

    pos_y = grid_sample_positions(y1, y2, output_height, aligned)  # (N, oh)
    pos_x = grid_sample_positions(x1, x2, output_width, aligned)  # (N, ow)
    wy = bilinear_weight_matrix(pos_y, H, "zeros", dtype)  # (N, oh, H)
    wx = bilinear_weight_matrix(pos_x, W, "zeros", dtype)  # (N, ow, W)

    sel = jnp.take(features, batch_idx, axis=0)  # (N, H, W, C)
    # Contract H then W; both products tile onto the MXU. Precision policy:
    # f32 features use HIGHEST (interpolation weights need full mantissas
    # for grid_sample parity; default TPU matmul is bf16); bf16 serving
    # accepts single-pass bf16 sampling — the activations carry <8 mantissa
    # bits anyway, so the 6-pass emulation would buy nothing.
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    t = jnp.einsum("nyh,nhwc->nywc", wy, sel, precision=prec)
    out = jnp.einsum("nxw,nywc->nyxc", wx, t, precision=prec)
    return out.astype(dtype)


@partial(jax.jit, static_argnames=("output_height", "output_width", "spatial_scale", "aligned"))
def roi_align_n4(
    features_n4: jnp.ndarray,
    rois: jnp.ndarray,
    output_height: int,
    output_width: int,
    spatial_scale: Scale = (640.0, 640.0),
    aligned: bool = False,
) -> jnp.ndarray:
    """:func:`roi_align` over a map stored in nested-S2D(4) ("N4") form.

    features_n4: (B, Hg, Wg, 16*C) with bit-nested phase order (u, v, ay, ax)
    — see ops/s2d.py::conv3x3_s2d_to_n4 — representing a (4Hg, 4Wg, C) map.
    Exact: the full-res interpolation matrices are reshaped by phase
    (row index y = 4*Y + 2*u + ay), so the contraction is identical to
    sampling the plain map; the plain form is never materialised.
    """
    ssh, ssw = _as_hw(spatial_scale)
    B, Hg, Wg, c16 = features_n4.shape
    C = c16 // 16
    H, W = 4 * Hg, 4 * Wg
    dtype = features_n4.dtype

    batch_idx = jnp.clip(rois[:, 0].astype(jnp.int32), 0, B - 1)
    pos_y = grid_sample_positions(rois[:, 2] * ssh, rois[:, 4] * ssh, output_height, aligned)
    pos_x = grid_sample_positions(rois[:, 1] * ssw, rois[:, 3] * ssw, output_width, aligned)
    wy = bilinear_weight_matrix(pos_y, H, "zeros", dtype)  # (N, oh, H)
    wx = bilinear_weight_matrix(pos_x, W, "zeros", dtype)  # (N, ow, W)
    # y = 4Y + 2u + ay -> (N, oh, Hg, u, ay); x = 4X + 2v + ax
    wy = wy.reshape(*wy.shape[:-1], Hg, 2, 2)
    wx = wx.reshape(*wx.shape[:-1], Wg, 2, 2)

    sel = jnp.take(features_n4, batch_idx, axis=0)
    sel = sel.reshape(-1, Hg, Wg, 2, 2, 2, 2, C)  # [u, v, ay, ax, c]
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    t = jnp.einsum("nyhua,nhwuvabc->nywvbc", wy, sel, precision=prec)
    out = jnp.einsum("nxwvb,nywvbc->nyxc", wx, t, precision=prec)
    return out.astype(dtype)


@partial(jax.jit, static_argnames=("output_height", "output_width", "spatial_scale", "aligned"))
def roi_align_dense(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_height: int,
    output_width: int,
    spatial_scale: Scale = (640.0, 640.0),
    aligned: bool = False,
) -> jnp.ndarray:
    """:func:`roi_align` over a single-channel map stored DENSE as rank-3.

    features: (B, H, W) — W in the 128-lane dimension with no channel
    padding (the Pallas fused-tail serving form, ops/pallas_tail.py).
    Returns (N, oh, ow, 1).
    """
    ssh, ssw = _as_hw(spatial_scale)
    B, H, W = features.shape
    dtype = features.dtype

    batch_idx = jnp.clip(rois[:, 0].astype(jnp.int32), 0, B - 1)
    pos_y = grid_sample_positions(rois[:, 2] * ssh, rois[:, 4] * ssh, output_height, aligned)
    pos_x = grid_sample_positions(rois[:, 1] * ssw, rois[:, 3] * ssw, output_width, aligned)
    wy = bilinear_weight_matrix(pos_y, H, "zeros", dtype)  # (N, oh, H)
    wx = bilinear_weight_matrix(pos_x, W, "zeros", dtype)  # (N, ow, W)

    sel = jnp.take(features, batch_idx, axis=0)  # (N, H, W)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    t = jnp.einsum("nyh,nhw->nyw", wy, sel, precision=prec)
    out = jnp.einsum("nxw,nyw->nyx", wx, t, precision=prec)
    return out.astype(dtype)[..., None]


def _upsample_2x_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x half-pixel bilinear upsample along one axis, elementwise.

    out[2i]   = 0.25 * x[i-1] + 0.75 * x[i]     (edge-clamped)
    out[2i+1] = 0.75 * x[i]   + 0.25 * x[i+1]
    which is precisely ``F.interpolate(scale_factor=2, mode='bilinear',
    align_corners=False)`` along that axis. Pure VPU work (two FMAs + an
    interleave) — no dense interpolation matmul.
    """
    prev = jnp.concatenate([jax.lax.slice_in_dim(x, 0, 1, axis=axis),
                            jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis=axis)
    nxt = jnp.concatenate([jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
                           jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)], axis=axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] *= 2
    return stacked.reshape(new_shape)


def upsample_2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """2x spatial upsample of an NHWC tensor (half-pixel bilinear)."""
    return _upsample_2x_axis(_upsample_2x_axis(x, 1), 2)


@partial(jax.jit, static_argnames=("height", "width", "method", "antialias"))
def resize_bilinear(
    x: jnp.ndarray,
    height: int,
    width: int,
    method: str = "half_pixel",
    antialias: bool = False,
) -> jnp.ndarray:
    """Bilinear resize matching ``F.interpolate(mode='bilinear',
    align_corners=False)`` (half-pixel centres, border replication).

    Built from the same separable hat-weight machinery as :func:`roi_align`
    so the whole sampling stack shares one code path.

    Args:
      x: (B, H, W, C).
      method: 'half_pixel' (torch align_corners=False) or 'align_corners'.
    """
    del antialias  # parity with torch: no antialiasing
    B, H, W, C = x.shape
    dtype = x.dtype
    if (H, W) == (height, width):
        return x
    if method == "half_pixel" and (height, width) == (2 * H, 2 * W):
        return upsample_2x_bilinear(x)  # exact fast path, no matmul

    def positions(o: int, s: int) -> jnp.ndarray:
        j = jnp.arange(o, dtype=jnp.float32)
        if method == "half_pixel":
            return (j + 0.5) * (s / o) - 0.5
        if method == "align_corners":
            if o == 1:
                return jnp.zeros((1,), jnp.float32)
            return j * ((s - 1) / (o - 1))
        raise ValueError(f"unknown resize method: {method}")

    wy = bilinear_weight_matrix(positions(height, H), H, "edge", dtype)  # (oh, H)
    wx = bilinear_weight_matrix(positions(width, W), W, "edge", dtype)  # (ow, W)
    t = jnp.einsum("yh,bhwc->bywc", wy, x, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("xw,bywc->byxc", wx, t, precision=jax.lax.Precision.HIGHEST).astype(dtype)
