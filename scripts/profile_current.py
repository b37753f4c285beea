"""Where does the time go in the CURRENT bench serving config?

Measures, batch-32 int8+fused_tail=3+s2d-front (exactly bench.py's config):
  full      — whole deployed program (should match bench.py's ms/batch)
  stage1    — the stage-1 UNet alone (int8 contexts active)
  stage2    — crops + RGB extractor + head + epilogues, given stage-1 output

Run: PYTHONPATH=/root/repo python -u scripts/profile_current.py [parts...]
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
    sel = sys.argv[1:] or ["full", "stage1", "stage2"]
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
    images = jnp.asarray(images_np, jnp.bfloat16)
    rois = jnp.asarray(rois_np)

    engine = InferenceEngine(model, params, dilation_pixels=1,
                             dtype=jnp.bfloat16, quantize="int8")
    engine.calibrate(images_np, rois_np)
    scales = engine._scales

    if "full" in sel:
        fn = engine._fn(b, b)

        def full(params, images, rois):
            return fn(params, images, rois)

        ms = time_slope(full, engine.params, images, rois) * 1e3
        print(f"full      {ms:8.2f} ms/batch  ({b / ms * 1e3:.1f} img/s)")

    unet = PeopleSegmentationUNet(encoder_variant="b0", fused_tail=3,
                                  encoder_s2d_front=True)
    uparams = {
        "params": params["params"]["pretrained_unet"],
        "batch_stats": params["batch_stats"]["pretrained_unet"],
    }
    uscales = {k[len("pretrained_unet/"):]: v for k, v in (scales or {}).items()
               if k.startswith("pretrained_unet/")}

    def stage1(up, x):
        with int8_serving(True, uscales):
            return unet.apply(up, x, train=False)

    if "stage1" in sel:
        ms = time_slope(stage1, uparams, images) * 1e3
        print(f"stage1    {ms:8.2f} ms/batch")

    if "stage2" in sel:
        s1out = jax.jit(stage1)(uparams, images)
        s1out = jax.tree.map(jax.block_until_ready, s1out)

        full_fn = engine._fn(b, b)

        def stage2(params, s1, images, rois):
            # rerun of the full program minus stage 1 isn't separable from
            # the assembly; approximate: full minus stage1 measured above.
            raise SystemExit("use full-stage1 as the stage-2 estimate")

        print("stage2   = full - stage1")


if __name__ == "__main__":
    main()
