"""Pallas fused stage-1 tail: decoder4 + seg head in one VMEM-resident kernel.

STATUS — measured and NOT enabled by default. At flagship shapes
(batch 32 bf16, 120x160 cell grid) the kernel runs 18.1-18.8 ms/batch vs
6.8 ms for the XLA S2D path it replaces (scripts/profile_pallas_tail.py).
The loss is structural, not tuning: Mosaic's missing relayout primitives
(no cross-offset vector concatenate, no lane split/merge, no strided value
slicing) force the conv1 im2col and the N4 interleave into per-phase
matmuls with K=64 / N=16 / M=8 shapes whose MXU-padded FLOP cost (~8 ms
floor) exceeds the XLA path's whole runtime — raising the row tile 8->24
changed nothing (18.8 -> 18.1), confirming shape cost dominates per-step
overhead. Kept as an opt-in (`PeopleSegmentationUNet(pallas_tail=True)`) —
it is exact (f32 maxdiff 2e-6 vs the oracle; bf16 differences are rounding
order only), and the VMEM-resident structure becomes profitable if Mosaic
gains lane-relayout support (HBM floor ~0.25 ms vs the XLA path's ~2.4 ms
of intermediate traffic).

Replaces, for serving, the last decoder stage of the people-seg UNet
(DecoderBlock(16): upsample->conv3x3->BN->ReLU->conv3x3->BN->ReLU) plus the
3x3 seg head — the flagship's dominant stage-1 cost. The XLA path, even in
S2D form, materialises three 240x320-size tensors in HBM per image (each
2-32x lane-padded) and runs the composed conv at 16% MFU inside a select
fusion (jax.profiler traces, r2).

One kernel over (batch, row-tile):
  - input: decoder3's output in S2D(2) form, (B, Hc, Wc, 4*Ci) — dense
    128-lane layout, windowed-DMA'd per tile (+3-cell halo)
  - conv0 (the fused 2x-bilinear-upsample + conv3x3 of the plain path,
    ops/s2d.py::compose_up_conv_kernel) as a pad-slice cell conv: 4 shifted
    (M, 4Ci) @ (4Ci, 16C) matmuls — contraction 16*Ci, MXU-shaped
  - BN0 (eval stats) folded into the conv at trace time; ReLU on the
    assembled S2D(2)@2G form in VMEM
  - conv1 as im2col over 4x4-cell patches: (M, 64C) @ (64C, 16C) — the
    output lands directly in nested-S2D(4) ("N4") phase form
  - BN1 folded; seg head as 9 (M, 16C) @ (16C, 16) cell-offset matmuls
  - output: the final 1-channel logit map as a DENSE (B, H, W) rank-3
    array (H = 4Hc, W = 4Wc) — no 128-lane padding anywhere in HBM

Border semantics: the kernel computes pure zero-padding cell-space math,
exact everywhere except where the plain path's edge-clamped bilinear
upsample differs — the outer 6 rows/cols of the output map.
:func:`tail_with_borders` recomputes those strips exactly with the plain
XLA ops (tiny tensors) and merges them in one fused select pass.

Reference semantics reproduced: the smp UnetDecoder final block + seg head
of the pretrained people-seg UNet (/root/reference/src/human_edge_detection/
advanced/hierarchical_segmentation_unet.py:1708-1916; smp decoder =
upsample-conv-bn-relu x2, final stage skip-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .s2d import compose_up_conv_kernel
from .sampling import upsample_2x_bilinear

TR = 8  # 120-grid rows per tile (15 tiles for the flagship 120 rows)


def _fold_bn(scale, bias, mean, var, eps=1e-5):
    s = scale * lax.rsqrt(var + eps)
    return s, bias - mean * s


def build_tail_weights(k0, bn0, k1, bn1, kh, bh):
    """Trace-time composition of the kernel's weight operands.

    k0 (3,3,Ci,C); bn0/bn1 = (scale, bias, mean, var); k1 (3,3,C,C);
    kh (3,3,C,1); bh (1,). Returns (K22, B0, K1P, B1, KH, BH):
      K22 (2,2,4Ci,16C)  pad-slice composed up+conv0, bn0 scale folded
      B0  (1, 4C)        bn0 bias in S2D(2) channel order
      K1P (64C, 16C)     conv1 4x4-cell patch matrix -> N4, bn1 folded
      B1  (1, 16C)       bn1 bias in N4 order
      KH  (3,3,16C,16)   seg-head cell-offset blocks -> 16 N4 logits
      BH  (1, 16)        seg-head bias
    """
    ci, c = k0.shape[2], k0.shape[3]
    f32 = jnp.float32
    s0, b0 = _fold_bn(*[v.astype(f32) for v in bn0])
    s1, b1 = _fold_bn(*[v.astype(f32) for v in bn1])

    K = compose_up_conv_kernel(k0.astype(f32))          # (3,3,Ci,4C)
    K = K * jnp.tile(s0, 4)[None, None, None, :]
    # pad-slice selection (ops/s2d.py::conv_up_s2d_nested): tap d = 2(t-1)+al+g
    T = np.zeros((2, 2, 2, 3), np.float32)
    for t in range(2):
        for al in range(2):
            for g in range(2):
                d = 2 * (t - 1) + al + g
                if -1 <= d <= 1:
                    T[t, al, g, d + 1] = 1.0
    Tj = jnp.asarray(T)
    K22 = jnp.einsum("tagd,sbhe,deio->tsabigho", Tj, Tj, K).reshape(
        2, 2, 4 * ci, 16 * c)
    B0 = jnp.tile(b0, 4)[None]

    # conv1 patch matrix: patch slot (du, dv, ay, ax, cin) over the 4x4
    # 240-cells [2i-1 .. 2i+2]; output N4 slot (A, B, cout); full-res row
    # of the patch element = 4i + 2du + ay - 2, of the output = 4i + A.
    U = np.zeros((4, 2, 4, 3), np.float32)  # [du, ay, A, dy+1]
    for du in range(4):
        for ay in range(2):
            for A in range(4):
                dy = 2 * du + ay - 2 - A
                if -1 <= dy <= 1:
                    U[du, ay, A, dy + 1] = 1.0
    Uj = jnp.asarray(U)
    k1f = k1.astype(f32) * s1[None, None, None, :]
    K1P = jnp.einsum("uaAd,vbBe,deio->uvabiABo", Uj, Uj, k1f).reshape(
        64 * c, 16 * c)
    B1 = jnp.tile(b1, 16)[None]

    # seg head: output N4 slot (Ao, Bo); input y1 N4 cell offset (di, dj)
    # slot (A, B, c): full-res row in = 4(i+di) + A, out = 4i + Ao.
    V = np.zeros((3, 4, 4, 3), np.float32)  # [di+1, A, Ao, dy+1]
    for di in (-1, 0, 1):
        for A in range(4):
            for Ao in range(4):
                dy = 4 * di + A - Ao
                if -1 <= dy <= 1:
                    V[di + 1, A, Ao, dy + 1] = 1.0
    Vj = jnp.asarray(V)
    khf = kh.astype(f32)[..., 0]                        # (3,3,C)
    KH = jnp.einsum("mAat,nBbu,tui->mnABiab", Vj, Vj, khf).reshape(
        3, 3, 16 * c, 16)
    BH = jnp.broadcast_to(bh.astype(f32).reshape(1, 1), (1, 16))
    return K22, B0, K1P, B1, KH, BH


def _tail_kernel(x_hbm, K22, B0, K1P, B1, KH, BH, P, out_ref, xs, ys, y1s,
                 sem, *, wc):
    """One (batch, row-tile) step; wc = input cell-grid width."""
    r = pl.program_id(1)
    nr = pl.num_programs(1)
    b = pl.program_id(0)
    c4 = x_hbm.shape[3]
    c16 = K22.shape[3]
    c4o = c16 // 4
    r0 = r * TR
    dt = xs.dtype  # compute dtype (the input's); out_ref is f32 (see below)
    f32 = jnp.float32

    # ---- stage x rows [r0-3, r0+TR+3) into xs with zero W margins. The
    # data starts at col 8 (not 1): DMA destination slices must be
    # 8-aligned in the sublane dim (Mosaic memref_slice tiling rule);
    # value loads below can read at any offset.
    xs[:, 0:8, :] = jnp.zeros_like(xs[:, 0:8, :])
    xs[:, 8 + wc:9 + wc, :] = jnp.zeros_like(xs[:, 8 + wc:9 + wc, :])

    def dma(src_lo, dst_lo, rows):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_lo, rows), :, :],
            xs.at[pl.ds(dst_lo, rows), pl.ds(8, wc), :],
            sem)
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_and(r > 0, r < nr - 1))
    def _():
        dma(r0 - 3, 0, TR + 6)

    @pl.when(r == 0)
    def _():
        xs[0:3, :, :] = jnp.zeros_like(xs[0:3, :, :])
        dma(0, 3, TR + 3)

    @pl.when(r == nr - 1)
    def _():
        xs[TR + 3:TR + 6, :, :] = jnp.zeros_like(xs[TR + 3:TR + 6, :, :])
        dma(r0 - 3, 0, TR + 3)

    xv = xs[:, :, :]

    # ---- conv0: O cell rows [r0-2, r0+TR+3) (TR+5), cols [0, wc+1);
    # O col o taps x cols o+s-1 = xs cols o+s+7
    acc = jnp.zeros(((TR + 5) * (wc + 1), c16), f32)
    for t in range(2):
        for s in range(2):
            sl = xv[t:t + TR + 5, 7 + s:7 + s + wc + 1, :].reshape(
                (TR + 5) * (wc + 1), c4)
            acc = acc + jnp.dot(sl, K22[t, s], preferred_element_type=f32)
    Oc = acc.reshape(TR + 5, wc + 1, c16)

    # ---- y0 kept as 4 parity-phase buffers (gy, gx) over the 240-grid —
    # NOT interleaved: Mosaic has no strided value slicing, and the phase
    # split makes every conv1 patch access below unit-stride. Phase (gy, gx)
    # holds 240-rows 2I+gy (I = r0-2+l), cols 2J+gx, channels (ay, ax, c);
    # 1-cell zero col each side covers 240-cols -1 and 2wc. The phases live
    # in VMEM scratch (ys) because a value-level jnp.pad lowers to a
    # sublane-offset concatenate Mosaic rejects; ref stores at an offset
    # are fine.
    zcol = jnp.zeros((TR + 4, 1, c4o), dt)
    for gy in range(2):
        for gx in range(2):
            blk = (gy * 2 + gx) * c4o
            p = Oc[gy:gy + TR + 4, gx:gx + wc, blk:blk + c4o]
            ys[gy * 2 + gx, :, 1:wc + 1, :] = jnp.maximum(
                p + B0[:, :], 0.0).astype(dt)
            ys[gy * 2 + gx, :, 0:1, :] = zcol
            ys[gy * 2 + gx, :, wc + 1:wc + 2, :] = zcol

    # ---- conv1: N4 output cells i = r0-1+loc, loc in [0, TR+2) (incl.
    # seg-head halo). Patch element (du, dv): 240-row 2i + (du-1) = phase
    # gy=(du+1)%2 at cell I = i + floor((du-1)/2); same for cols. Each
    # (du, dv) contributes one (M, 4C) @ (4C, 16C) matmul, accumulated —
    # an im2col concat of the 16 slices would need a cross-offset vector
    # concatenate Mosaic rejects (offsets differ by (ro, co)).
    sel = ((1, 0), (0, 1), (1, 1), (0, 2))  # d -> (parity, local offset)
    y1a = jnp.zeros(((TR + 2) * wc, c16), f32)
    for du in range(4):
        gy, ro = sel[du]
        for dv in range(4):
            gx, co = sel[dv]
            sl = ys[gy * 2 + gx, ro:ro + TR + 2, co:co + wc, :].reshape(
                (TR + 2) * wc, c4o)
            blk = (4 * du + dv) * c4o
            y1a = y1a + jnp.dot(sl, K1P[blk:blk + c4o, :],
                                preferred_element_type=f32)
    y1v = jnp.maximum(y1a + B1[:, :], 0.0).astype(dt).reshape(TR + 2, wc, c16)
    # y1 into scratch with zero cols each side (same Mosaic pad workaround)
    y1s[:, 1:wc + 1, :] = y1v
    zc = jnp.zeros((TR + 2, 1, c16), dt)
    y1s[:, 0:1, :] = zc
    y1s[:, wc + 1:wc + 2, :] = zc

    # ---- seg head: 9 cell-offset matmuls -> N4 logits rows [r0, r0+TR)
    hacc = jnp.zeros((TR * wc, 16), f32)
    for di in range(3):
        for dj in range(3):
            sl = y1s[di:di + TR, dj:dj + wc, :].reshape(TR * wc, c16)
            hacc = hacc + jnp.dot(sl, KH[di, dj], preferred_element_type=f32)

    # ---- interleave N4 -> row-phase (4, TR, 4*wc). Mosaic has no lane
    # split/merge, lane-strided stores, or (for non-128-lane memrefs)
    # sublane-strided stores, so: minor transpose puts j in lanes, the
    # B-interleave is 4 accumulated one-hot permutation matmuls (P blocks;
    # concatenating the B-slices first would be a cross-offset concat),
    # and the row interleave (A phase) is left to one XLA transpose
    # outside the kernel, fused into the border-merge pass.
    h = (hacc + BH[:, :]).astype(dt).reshape(TR, wc, 16).transpose(0, 2, 1)
    for A in range(4):
        row = jnp.zeros((TR, 4 * wc), f32)
        for Bb in range(4):
            row = row + jnp.dot(h[:, 4 * A + Bb, :],
                                P[Bb * wc:(Bb + 1) * wc, :],
                                preferred_element_type=f32)
        out_ref[0, A, :, :] = row


def _tail_call(x_s2d, K22, B0, K1P, B1, KH, BH, interpret=False):
    B, hc, wc, c4 = x_s2d.shape
    assert hc % TR == 0 and hc >= 2 * TR, (hc, TR)
    assert wc % 8 == 0, wc  # sublane-aligned staging margins
    nr = hc // TR
    dt = x_s2d.dtype
    # lane-interleave permutation: block order [B*wc + j] -> 4j + B
    P = jnp.zeros((4 * wc, 4 * wc), dt).at[
        jnp.arange(4 * wc),
        4 * (jnp.arange(4 * wc) % wc) + jnp.arange(4 * wc) // wc].set(1)
    wspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    m4 = pl.pallas_call(
        functools.partial(_tail_kernel, wc=wc),
        grid=(B, nr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # x windows DMA'd
            wspec(), wspec(), wspec(), wspec(), wspec(), wspec(), wspec(),
        ],
        out_specs=pl.BlockSpec((1, 4, TR, 4 * wc), lambda b, r: (b, 0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4, hc, 4 * wc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TR + 6, wc + 9, c4), dt),
            pltpu.VMEM((4, TR + 4, wc + 2, K22.shape[3] // 4), dt),
            pltpu.VMEM((TR + 2, wc + 2, K22.shape[3]), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        interpret=interpret,
    )(x_s2d, K22.astype(dt), B0.astype(jnp.float32), K1P.astype(dt),
      B1.astype(jnp.float32), KH.astype(dt), BH.astype(jnp.float32), P)
    # row-phase (B, 4, hc, W) -> dense (B, 4hc, W); m4[b, A, i] is full-res
    # row 4i+A. One XLA relayout pass, fused into the border merge.
    return m4.transpose(0, 2, 1, 3).reshape(B, 4 * hc, 4 * wc)


def tail_reference(xplain, k0, bn0, k1, bn1, kh, bh):
    """Plain-XLA oracle of the tail on a PLAIN (B, h, w, Ci) chunk:
    upsample2x -> conv0 -> bn0/relu -> conv1 -> bn1/relu -> seg head."""
    conv = lambda x, k: lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bn = lambda x, p: jnp.maximum(
        (x - p[2].astype(x.dtype)) * lax.rsqrt(p[3].astype(x.dtype) + 1e-5)
        * p[0].astype(x.dtype) + p[1].astype(x.dtype), 0)
    y = bn(conv(upsample_2x_bilinear(xplain), k0), bn0)
    y = bn(conv(y, k1), bn1)
    return conv(y, kh)[..., 0] + bh.astype(y.dtype)[0]


def tail_with_borders(x_s2d, k0, bn0, k1, bn1, kh, bh, interpret=None):
    """Full fused tail: Pallas interior + exact XLA border strips.

    x_s2d (B, Hc, Wc, 4*Ci) [decoder3's S2D(2) output] ->
    (B, 4Hc, 4Wc) seg-head logit map matching the plain path exactly
    (incl. the edge-clamped bilinear upsample at image borders).
    ``interpret=None`` auto-selects interpret mode on the CPU backend
    (tests / virtual meshes); pass an explicit bool to override.
    """
    from .s2d import depth_to_space

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    B, hc, wc, _ = x_s2d.shape
    H, W = 4 * hc, 4 * wc
    weights = build_tail_weights(k0, bn0, k1, bn1, kh, bh)
    m = _tail_call(x_s2d, *weights, interpret=interpret)  # f32

    f32 = jnp.float32
    ref = lambda xp: tail_reference(
        xp, k0, bn0, k1, bn1, kh, bh).astype(f32)
    # 4 input cell rows -> >= 10 exact output rows at the clamped edge;
    # rows/cols [0, 6) / [-6:] are the only ones the kernel gets wrong
    top = ref(depth_to_space(x_s2d[:, :4], 2))[:, :6]
    bot = ref(depth_to_space(x_s2d[:, -4:], 2))[:, -6:]
    left = ref(depth_to_space(x_s2d[:, :, :4], 2))[:, :, :6]
    right = ref(depth_to_space(x_s2d[:, :, -4:], 2))[:, :, -6:]

    row = lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    m = jnp.where(col < 6, jnp.pad(left, ((0, 0), (0, 0), (0, W - 6))), m)
    m = jnp.where(col >= W - 6, jnp.pad(right, ((0, 0), (0, 0), (W - 6, 0))), m)
    m = jnp.where(row < 6, jnp.pad(top, ((0, 0), (0, H - 6), (0, 0))), m)
    m = jnp.where(row >= H - 6, jnp.pad(bot, ((0, 0), (H - 6, 0), (0, 0))), m)
    return m.astype(x_s2d.dtype)
