"""INT8 Pallas fused stage-1 tail: decoder4 + seg head, s8 MXU matmuls.

STATUS — measured and NOT enabled by default. At flagship shapes
(batch 32, 120x160 cells) the s8 kernel runs 17.0 ms/batch vs 18.9 for
the bf16 kernel and ~8.6 for the XLA S2D path it would replace
(scripts/exp_r4_ptailq.py). The hypothesis that the MXU's int8 rate
(1175 TOP/s measured on 512-tiled Pallas matmuls, 5.6x bf16,
scripts/exp_r4_probe.py) would collapse the bf16 kernel's ~8 ms
MXU-shape floor was WRONG: the floor comes from tile PADDING (conv1's
per-phase K=4C=64 contractions, the seg head's N=16), and padding wastes
int8 cycles exactly as it wastes bf16 cycles — the deep-K pipelining
that makes s8 5x only exists at K >= ~512. Kept opt-in because it is the
correct structure the moment Mosaic gains lane-relayout support (which
would allow im2col-style K=1024 contractions in VMEM), and its accuracy
path is tested; serving instead uses XLA int8 S2D convs with
producer-side quantize + fusion barriers (models/unet.py), which realise
the isolated 2x s8 conv wins that fusion pathologies were eating
(scripts/exp_r4_d4int8.py).

Why a kernel at all: XLA's s8 conv lowering was unusable at the tail's
shapes IN CONTEXT — quantizing decoder4 through the XLA path measured
6.98 -> 18.24 ms/batch before the barrier fix (the bare convs in
isolation DO win 2x: conv1 2.32 -> 1.13 ms, composed-up 1.73 -> 0.92).

Same math/structure as ops/pallas_tail.py (see its header for the
conv0/conv1/seg-head decomposition and border semantics), with:
- all three matmul groups running s8 x s8 -> s32 on the MXU,
- static calibrated activation scales (s_x, s_mid, s_head) — the same
  quantization points the XLA qscale tail uses (DecoderBlock sows
  ``#x``/``#mid``, the seg head ``#head``),
- per-output-channel weight scales folded into the dequant rows,
- s8 VMEM scratch with 32-sublane-aligned stores (Mosaic's s8 memref
  tiling rule; value loads read at any offset),
- the input arriving ALREADY quantized (s8 HBM tensor) so the bf16
  boundary tensor from decoder3 never exists — its quantize fuses into
  decoder3's BN+ReLU epilogue.

Accuracy: int8-approximate in the interior exactly like the XLA qscale
path; borders are computed exactly in bf16 from dequantized edge strips
(tail_with_borders_q), and the whole mode sits behind the same
calibrated-int8 serving gate validated by tests/test_int8_accuracy.py.

Reference semantics reproduced: the smp UnetDecoder final block + seg
head (/root/reference/src/human_edge_detection/advanced/
hierarchical_segmentation_unet.py:1708-1916); the reference's deployment
analogue is its TensorRT int8 engine path (README.md:553-624).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_tail import TR, build_tail_weights, tail_reference
from .s2d import depth_to_space

M32 = 32  # s8 sublane alignment margin for staged/stored scratch columns


def _qchan(K, axis_keep):
    """Per-output-channel s8 quantization of a weight operand.

    Returns (Kq s8, sw f32 (Co,)) with Co the size of ``axis_keep``'s last
    dim; max taken over all other axes."""
    Kf = K.astype(jnp.float32)
    red = tuple(i for i in range(Kf.ndim) if i != axis_keep)
    sw = jnp.maximum(jnp.max(jnp.abs(Kf), axis=red), 1e-8) / 127.0
    Kq = jnp.clip(jnp.round(Kf / sw), -127.0, 127.0).astype(jnp.int8)
    return Kq, sw


def build_tail_weights_q(k0, bn0, k1, bn1, kh, bh, s_x, s_mid, s_head):
    """Quantized kernel operands + f32 dequant rows.

    Same composition as pallas_tail.build_tail_weights, then each matmul
    operand is per-output-channel s8 quantized and its dequant row folds
    the producer's static activation scale:
      K22q (2,2,4Ci,16C) s8, G0 (1,16C) = s_x * sw0
      K1Pq (64C,16C) s8,    G1 (1,16C) = s_mid * sw1
      KHq (3,3,16C,16) s8,  GH (1,16)  = s_head * swh
    B0/B1/BH stay f32 as in the bf16 kernel. The inverse activation scales
    (1/s_mid, 1/s_head) are returned for the in-kernel requantize steps.
    """
    K22, B0, K1P, B1, KH, BH = build_tail_weights(k0, bn0, k1, bn1, kh, bh)
    K22q, sw0 = _qchan(K22, 3)
    K1Pq, sw1 = _qchan(K1P, 1)
    KHq, swh = _qchan(KH, 3)
    f32 = jnp.float32
    G0 = (jnp.float32(s_x) * sw0)[None].astype(f32)
    G1 = (jnp.float32(s_mid) * sw1)[None].astype(f32)
    GH = (jnp.float32(s_head) * swh)[None].astype(f32)
    inv = jnp.asarray([[1.0 / s_mid, 1.0 / s_head]], f32)  # (1, 2) SMEM-able
    return K22q, B0, G0, K1Pq, B1, G1, KHq, BH, GH, inv


def _requant(y_f32, inv_scale):
    """f32 -> s8 with a static scale (round-to-nearest, saturating)."""
    q = jnp.round(y_f32 * inv_scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def _tail_kernel_q(x_hbm, K22, B0, G0, K1P, B1, G1, KH, BH, GH, inv, P,
                   out_ref, xs, ys, y1s, sem, *, wc):
    """One (batch, row-tile) step; all heavy matmuls s8 x s8 -> s32.

    Mirrors pallas_tail._tail_kernel; differences: s8 scratch with data at
    column offset M32 (s8 DMA/store destinations must be 32-aligned in the
    sublane dim — value loads below read at any offset), per-channel f32
    dequant rows instead of a single cast, and requantize-to-s8 between
    stages.
    """
    r = pl.program_id(1)
    nr = pl.num_programs(1)
    b = pl.program_id(0)
    c4 = x_hbm.shape[3]
    c16 = K22.shape[3]
    c4o = c16 // 4
    r0 = r * TR
    f32 = jnp.float32

    # ---- stage x rows [r0-3, r0+TR+3) into xs, data at col M32
    xs[:, 0:M32, :] = jnp.zeros_like(xs[:, 0:M32, :])
    xs[:, M32 + wc:, :] = jnp.zeros_like(xs[:, M32 + wc:, :])

    def dma(src_lo, dst_lo, rows):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_lo, rows), :, :],
            xs.at[pl.ds(dst_lo, rows), pl.ds(M32, wc), :],
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

    # ---- conv0: 4 pad-slice s8 matmuls, (M, 4Ci) @ (4Ci, 16C) -> s32
    acc = jnp.zeros(((TR + 5) * (wc + 1), c16), jnp.int32)
    for t in range(2):
        for s in range(2):
            sl = xv[t:t + TR + 5, M32 - 1 + s:M32 - 1 + s + wc + 1, :].reshape(
                (TR + 5) * (wc + 1), c4)
            acc = acc + jax.lax.dot_general(
                sl, K22[t, s], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    Oc = (acc.astype(f32) * G0[:, :]).reshape(TR + 5, wc + 1, c16)

    # ---- y0 phase buffers, requantized to s8 with the conv1 input scale
    inv_mid = inv[0, 0]
    zcol = jnp.zeros((TR + 4, M32, c4o), jnp.int8)
    for gy in range(2):
        for gx in range(2):
            blk = (gy * 2 + gx) * c4o
            p = Oc[gy:gy + TR + 4, gx:gx + wc, blk:blk + c4o]
            ys[gy * 2 + gx, :, M32:M32 + wc, :] = _requant(
                jnp.maximum(p + B0[:, :], 0.0), inv_mid)
            ys[gy * 2 + gx, :, 0:M32, :] = zcol
            ys[gy * 2 + gx, :, M32 + wc:, :] = zcol

    # ---- conv1: 16 s8 matmuls (M, 4C) @ (4C, 16C) -> s32
    sel = ((1, 0), (0, 1), (1, 1), (0, 2))  # d -> (parity, local offset)
    y1a = jnp.zeros(((TR + 2) * wc, c16), jnp.int32)
    for du in range(4):
        gy, ro = sel[du]
        for dv in range(4):
            gx, co = sel[dv]
            sl = ys[gy * 2 + gx, ro:ro + TR + 2,
                    M32 - 1 + co:M32 - 1 + co + wc, :].reshape(
                        (TR + 2) * wc, c4o)
            blk = (4 * du + dv) * c4o
            y1a = y1a + jax.lax.dot_general(
                sl, K1P[blk:blk + c4o, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    inv_head = inv[0, 1]
    y1v = _requant(jnp.maximum(y1a.astype(f32) * G1[:, :] + B1[:, :], 0.0),
                   inv_head).reshape(TR + 2, wc, c16)
    y1s[:, M32:M32 + wc, :] = y1v
    zc = jnp.zeros((TR + 2, M32, c16), jnp.int8)
    y1s[:, 0:M32, :] = zc
    y1s[:, M32 + wc:, :] = zc

    # ---- seg head: 9 s8 cell-offset matmuls -> s32 (M, 16)
    hacc = jnp.zeros((TR * wc, 16), jnp.int32)
    for di in range(3):
        for dj in range(3):
            sl = y1s[di:di + TR, M32 - 1 + dj:M32 - 1 + dj + wc, :].reshape(
                TR * wc, c16)
            hacc = hacc + jax.lax.dot_general(
                sl, KH[di, dj], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    hf = hacc.astype(f32) * GH[:, :] + BH[:, :]

    # ---- interleave N4 -> row-phase, exactly as the bf16 kernel (f32)
    h = hf.reshape(TR, wc, 16).transpose(0, 2, 1)
    for A in range(4):
        row = jnp.zeros((TR, 4 * wc), f32)
        for Bb in range(4):
            row = row + jnp.dot(h[:, 4 * A + Bb, :],
                                P[Bb * wc:(Bb + 1) * wc, :],
                                preferred_element_type=f32)
        out_ref[0, A, :, :] = row


def _tail_call_q(x_q, weights, interpret=False):
    B, hc, wc, c4 = x_q.shape
    assert x_q.dtype == jnp.int8, x_q.dtype
    assert hc % TR == 0 and hc >= 2 * TR, (hc, TR)
    assert wc % 8 == 0, wc
    nr = hc // TR
    K22q, B0, G0, K1Pq, B1, G1, KHq, BH, GH, inv = weights
    c16 = K22q.shape[3]
    f32 = jnp.float32
    P = jnp.zeros((4 * wc, 4 * wc), f32).at[
        jnp.arange(4 * wc),
        4 * (jnp.arange(4 * wc) % wc) + jnp.arange(4 * wc) // wc].set(1)
    wspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    m4 = pl.pallas_call(
        functools.partial(_tail_kernel_q, wc=wc),
        grid=(B, nr),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]  # x windows DMA'd
        + [wspec()] * 11,
        out_specs=pl.BlockSpec((1, 4, TR, 4 * wc), lambda b, r: (b, 0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4, hc, 4 * wc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TR + 6, wc + 2 * M32, c4), jnp.int8),
            pltpu.VMEM((4, TR + 4, wc + 2 * M32, c16 // 4), jnp.int8),
            pltpu.VMEM((TR + 2, wc + 2 * M32, c16), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        interpret=interpret,
    )(x_q, K22q, B0.astype(f32), G0, K1Pq, B1.astype(f32), G1, KHq,
      BH.astype(f32), GH, inv, P)
    return m4.transpose(0, 2, 1, 3).reshape(B, 4 * hc, 4 * wc)


def tail_with_borders_q(x_s2d, k0, bn0, k1, bn1, kh, bh,
                        s_x, s_mid, s_head, interpret=None,
                        out_dtype=None):
    """Full int8 fused tail: s8 Pallas interior + exact bf16 border strips.

    ``x_s2d`` (B, Hc, Wc, 4*Ci) may be bf16/f32 (quantized here with
    ``s_x`` — XLA fuses the quantize into the producer's epilogue, so the
    bf16 boundary tensor never reaches HBM when this is its only consumer)
    or already s8. Returns the (B, 4Hc, 4Wc) seg-head logit map; interior
    int8-approximate (calibrated static scales), outer 6 rows/cols exact
    bf16 (computed from dequantized edge strips so they join the map the
    int8 interior approximates).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    B, hc, wc, _ = x_s2d.shape
    H, W = 4 * hc, 4 * wc
    weights = build_tail_weights_q(k0, bn0, k1, bn1, kh, bh,
                                   s_x, s_mid, s_head)
    if x_s2d.dtype == jnp.int8:
        xq = x_s2d
        edge_dt = out_dtype or jnp.bfloat16
    else:
        q = jnp.round(x_s2d.astype(jnp.float32) * (1.0 / s_x))
        xq = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
        edge_dt = out_dtype or x_s2d.dtype
    m = _tail_call_q(xq, weights, interpret=interpret)  # f32

    f32 = jnp.float32
    deq = lambda t: (t.astype(f32) * jnp.float32(s_x)).astype(edge_dt)
    ref = lambda xp: tail_reference(
        xp, k0, bn0, k1, bn1, kh, bh).astype(f32)
    top = ref(depth_to_space(deq(xq[:, :4]), 2))[:, :6]
    bot = ref(depth_to_space(deq(xq[:, -4:]), 2))[:, -6:]
    left = ref(depth_to_space(deq(xq[:, :, :4]), 2))[:, :, :6]
    right = ref(depth_to_space(deq(xq[:, :, -4:]), 2))[:, :, -6:]

    row = lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    m = jnp.where(col < 6, jnp.pad(left, ((0, 0), (0, 0), (0, W - 6))), m)
    m = jnp.where(col >= W - 6, jnp.pad(right, ((0, 0), (0, 0), (W - 6, 0))), m)
    m = jnp.where(row < 6, jnp.pad(top, ((0, 0), (0, H - 6), (0, 0))), m)
    m = jnp.where(row >= H - 6, jnp.pad(bot, ((0, 0), (H - 6, 0), (0, 0))), m)
    return m.astype(edge_dt)
