"""Benchmark: B0 flagship inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference TensorRT EP, B0 480x640 1 ROI = 4.74 ms/img
(~211 img/s) — /root/reference/README.md:553-563 (see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from human_instance_segmentation_tpu.inference import (
        cast_floating, create_flagship, deployed_outputs)

    batch = 32         # saturating batch (throughput plateaus ~32 on v5e); 1 ROI per image, the baseline's shape
    ih, iw = 480, 640

    # fused_tail: the last stage-1 decoder stages run in space-to-depth form
    # (exact same params/math, ops/s2d.py) — 2.1x on stage 1, which otherwise
    # dominates at <5% MFU (scripts/profile_stage1.py).
    # encoder_s2d_front: stem + stage-0 + stage-1 entry as composed S2D
    # convs (the C=16/32 full-res tensors pad 4-8x in HBM lanes otherwise);
    # exact, tests/test_s2d_front.py — 649 -> 734 img/s.
    model, params = create_flagship(
        variant="b0", roi_size=(64, 48), mask_size=(128, 96), image_size=(ih, iw),
        fused_tail=3, encoder_s2d_front=True)
    # bf16 serving: TPU-native mixed precision (norm statistics stay f32
    # inside the modules); the reference's TRT baseline row is fp16.
    params = cast_floating(params, jnp.bfloat16)

    @jax.jit
    def infer(params, images, rois):
        logits, aux = model.apply(params, images, rois, train=False)
        return deployed_outputs(logits, aux, rois, dilation_pixels=1)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, ih, iw, 3), np.float32), jnp.bfloat16)
    rois = jnp.asarray(
        np.concatenate([
            np.arange(batch, dtype=np.float32)[:, None],
            np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (batch, 1)),
        ], axis=1))

    # Chain iterations inside one XLA program with a data dependency between
    # them (host-side block_until_ready is not a reliable fence on every
    # remote-device transport), and take the SLOPE between two chain lengths
    # so fixed per-call costs cancel.
    def make_chain(iters):
        @jax.jit
        def chained(params, images, rois):
            def body(i, carry):
                inst, binary = infer(params, images + carry, rois)
                return (jnp.mean(inst) * 1e-12).astype(images.dtype)
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.asarray(0.0, images.dtype))
        return chained

    i1, i2 = 5, 25
    c1, c2 = make_chain(i1), make_chain(i2)
    float(c1(params, images, rois))  # compile + warm
    float(c2(params, images, rois))
    t0 = time.perf_counter()
    float(c1(params, images, rois))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(c2(params, images, rois))
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
