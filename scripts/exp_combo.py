"""One-off serving-combo timings at the bench shape (B0 480x640 b32).

Modes: int8, int8+fused, int8+fused+const, fused+const, ...
Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_combo.py int8+fused+const
Optionally set XLA_FLAGS first to probe compiler-flag effects.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(call, args, i1=5, i2=25):
    def make_chain(iters):
        @jax.jit
        def chained(images, rois):
            def body(i, carry):
                inst, binary = call(images + carry, rois)
                return (jnp.mean(inst) * 1e-12).astype(images.dtype)
            return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0, images.dtype))
        return chained

    c1, c2 = make_chain(i1), make_chain(i2)
    float(c1(*args)); float(c2(*args))
    best = []
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(*args)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(c2(*args)); d2 = time.perf_counter() - t0
        best.append((d2 - d1) / (i2 - i1))
    return min(best)


def main():
    from human_instance_segmentation_tpu.inference import (
        InferenceEngine, cast_floating, create_flagship)

    modes = sys.argv[1:] or ["int8+fused+const"]
    b, ih, iw = 32, 480, 640
    model, params = create_flagship(
        variant="b0", roi_size=(64, 48), mask_size=(128, 96),
        image_size=(ih, iw), fused_tail=3, encoder_s2d_front=True)
    params = cast_floating(params, jnp.bfloat16)
    rng = np.random.default_rng(0)
    images_np = rng.random((b, ih, iw, 3), np.float32)
    rois_np = np.concatenate([
        np.arange(b, dtype=np.float32)[:, None],
        np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (b, 1)),
    ], axis=1)
    args = (jnp.asarray(images_np, jnp.bfloat16), jnp.asarray(rois_np))

    for mode in modes:
        kw = dict(
            quantize="int8" if "int8" in mode else None,
            fused_head="fused" in mode,
            const_params="const" in mode,
        )
        eng = InferenceEngine(model, params, dilation_pixels=1,
                              dtype=jnp.bfloat16, **kw)
        if kw["quantize"]:
            eng.calibrate(images_np, rois_np)
        fn, eparams = eng._fn(b, b), eng.params
        call = lambda im, ro: fn(eparams, im, ro)[:2]
        ms = slope_time(call, args) * 1e3
        print(f"{mode:22s} {ms:8.2f} ms/batch   {b / ms * 1e3:7.1f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
