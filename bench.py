"""Benchmark: B0 flagship inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference TensorRT EP, B0 480x640 1 ROI = 4.74 ms/img
(~211 img/s) — /root/reference/README.md:553-563 (see BASELINE.md).

Serving config (the measured optimum, scripts/results/serving_matrix.jsonl):
- b0-fast: 128-wide stage-2 head (the `*_fast` config family). Measured
  31.82 ms/batch-32 vs 34.62 for the 256-wide flagship; accuracy is gated
  by the DEPLOYED-scale KD experiment (B0 encoder, 480x640, 360 steps,
  scripts/results/b0_fast_deployed.jsonl): teacher mid256 val target-mIoU
  0.9548, KD mid128 student 0.9547 (delta -0.0001, gate <=0.5pt PASS;
  from-scratch mid128 is 0.9515, so the KD recipe recovers +0.32pt).
  Narrower probes (mid96/mid64-class, fd128, half-width stage-1 decoder)
  all measured SLOWER — v5e's 128-lane layout punishes them.
- fused_tail=3 + encoder_s2d_front: the stage-1 decoder tail and encoder
  front run in space-to-depth form — exact same params/math (ops/s2d.py,
  tests/test_s2d.py, tests/test_s2d_front.py), MXU-shaped instead of
  lane-starved.
- calibrated int8 (quantize="int8"): stage-2 QConv stack + the FULL
  decoder tail run s8xs8->s32 on the MXU (r4 operand-fusion barriers) —
  the TPU analogue of the reference's TensorRT int8 engines. The default
  denylist keeps only the measured losers bf16 (encoder stages 0-3,
  inference.py:ENCODER_INT8_DENY). Accuracy: target mIoU 0.9253 (f32) vs
  0.9263 (int8 fused-tail) on a flagship trained to convergence
  (scripts/eval_int8_accuracy.py) — no measurable loss.
- fused_head=True: stage-2 conv+LayerNorm2d+relu units that stay bf16
  (int8 takes precedence where calibrated) run through the Pallas fused
  kernel.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    # persistent compile cache (axon IFRT sidechannel): repeated runs of
    # the identical served program skip the multi-minute remote compiles
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from human_instance_segmentation_tpu.inference import (
        InferenceEngine, cast_floating, create_flagship)

    batch = 32         # saturating batch (throughput plateaus ~32 on v5e); 1 ROI per image, the baseline's shape
    ih, iw = 480, 640

    model, params = create_flagship(
        variant="b0", roi_size=(64, 48), mask_size=(128, 96), image_size=(ih, iw),
        fused_tail=3, encoder_s2d_front=True, mid_channels=128)
    params = cast_floating(params, jnp.bfloat16)

    rng = np.random.default_rng(0)
    images_np = rng.random((batch, ih, iw, 3), np.float32)
    rois_np = np.concatenate([
        np.arange(batch, dtype=np.float32)[:, None],
        np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (batch, 1)),
    ], axis=1)

    engine = InferenceEngine(model, params, dilation_pixels=1,
                             dtype=jnp.bfloat16, quantize="int8",
                             fused_head=True)
    engine.calibrate(images_np, rois_np)
    fn = engine._fn(batch, batch)
    eparams = engine.params

    def infer(images, rois):
        inst, binary, _ = fn(eparams, images, rois)
        return inst, binary

    images = jnp.asarray(images_np, jnp.bfloat16)
    rois = jnp.asarray(rois_np)

    # Chain iterations inside one XLA program with a data dependency between
    # them (host-side block_until_ready is not a reliable fence on every
    # remote-device transport), and take the SLOPE between two chain lengths
    # so fixed per-call costs cancel.
    def make_chain(iters):
        @jax.jit
        def chained(images, rois):
            def body(i, carry):
                inst, binary = infer(images + carry, rois)
                return (jnp.mean(inst) * 1e-12).astype(images.dtype)
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.asarray(0.0, images.dtype))
        return chained

    i1, i2 = 5, 25
    c1, c2 = make_chain(i1), make_chain(i2)
    float(c1(images, rois))  # compile + warm
    float(c2(images, rois))
    t0 = time.perf_counter()
    float(c1(images, rois))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(c2(images, rois))
    d2 = time.perf_counter() - t0
    dt = (d2 - d1) / (i2 - i1)

    imgs_per_sec = batch / dt
    baseline = 211.0  # img/s, B0 TRT 1-ROI
    print(json.dumps({
        "metric": "b0_480x640_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
