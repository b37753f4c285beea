"""Cumulative in-context stage-1 timing UNDER CALIBRATED INT8 SERVING.

Same methodology as profile_stage1_cum.py, but with the int8_serving
context + calibrated static scales active — attributes the int8 serving
config's stage-1 cost (profile_current.py: 27.2 ms of the 39.1 ms batch)
to encoder / decoder stages / seg head.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_stage1_cum_int8.py [k ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.inference import (
    InferenceEngine, cast_floating, create_flagship)
from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet
from human_instance_segmentation_tpu.ops.quant import int8_serving


def time_slope(fn, *args, perturb=1, i1=4, i2=16):
    def mk(iters):
        @jax.jit
        def chained(*a):
            def body(i, carry):
                ai = list(a)
                ai[perturb] = ai[perturb] + carry.astype(ai[perturb].dtype)
                out = fn(*ai)
                return sum((jnp.sum(l) * 1e-30).astype(jnp.float32)
                           for l in jax.tree.leaves(out))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return chained

    c1, c2 = mk(i1), mk(i2)
    float(c1(*args)); float(c2(*args))
    best = []
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(*args)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(c2(*args)); d2 = time.perf_counter() - t0
        best.append((d2 - d1) / (i2 - i1))
    return min(best)


def main():
    sel = sys.argv[1:] or ["0", "1", "2", "3", "4", "5", "full"]
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

    engine = InferenceEngine(model, params, dilation_pixels=1,
                             dtype=jnp.bfloat16, quantize="int8")
    engine.calibrate(images_np, rois_np)
    scales = engine._scales or {}
    uscales = {k[len("pretrained_unet/"):]: v for k, v in scales.items()
               if k.startswith("pretrained_unet/")}

    unet = PeopleSegmentationUNet(encoder_variant="b0", fused_tail=3,
                                  encoder_s2d_front=True)
    uparams = {
        "params": params["params"]["pretrained_unet"],
        "batch_stats": params["batch_stats"]["pretrained_unet"],
    }
    images = jnp.asarray(images_np, jnp.bfloat16)

    prev = None
    for item in sel:
        if item == "full":
            def fn(up, x):
                with int8_serving(True, uscales):
                    return unet.apply(up, x, train=False, raw=True)[1]
            label = "full (raw n4)"
        else:
            k = int(item)

            def fn(up, x, _k=k):
                with int8_serving(True, uscales):
                    return unet.apply(up, x, train=False, stages=_k)
            label = f"enc + {item} dec stages"
        t = time_slope(fn, uparams, images) * 1e3
        delta = "" if prev is None else f"  (+{t - prev:6.3f})"
        print(f"{label:22s} {t:8.3f} ms/b{delta}", flush=True)
        prev = t


if __name__ == "__main__":
    main()
