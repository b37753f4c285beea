"""In-context breakdown with the r2 serving flags on (fused_tail=3 +
encoder_s2d_front): encoder, stage-1 total, stage-2, full apply.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_r3.py [items]
items: enc stage1 stage2 full
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.inference import cast_floating, create_flagship
from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet
from human_instance_segmentation_tpu.ops.sampling import roi_align


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
    sel = sys.argv[1:] or ["enc", "stage1", "stage2", "full"]
    b, ih, iw = 32, 480, 640
    rh, rw = 64, 48
    model, params = create_flagship(
        variant="b0", roi_size=(rh, rw), mask_size=(128, 96),
        image_size=(ih, iw), fused_tail=3, encoder_s2d_front=True)
    params = cast_floating(params, jnp.bfloat16)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, ih, iw, 3), np.float32), jnp.bfloat16)
    rois = jnp.asarray(np.concatenate([
        np.arange(b, dtype=np.float32)[:, None],
        np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (b, 1)),
    ], axis=1))

    if "enc" in sel or "stage1" in sel:
        unet = PeopleSegmentationUNet(encoder_variant="b0", fused_tail=3,
                                      encoder_s2d_front=True)
        uparams = {
            "params": params["params"]["pretrained_unet"],
            "batch_stats": params["batch_stats"]["pretrained_unet"],
        }
        if "enc" in sel:
            from human_instance_segmentation_tpu.models.efficientnet import (
                EfficientNetEncoder)
            eparams = {
                "params": uparams["params"]["encoder"],
                "batch_stats": uparams["batch_stats"]["encoder"],
            }
            encm = EfficientNetEncoder(variant="b0", s2d_front=True)

            def encf(ep, x):
                return encm.apply(ep, x, train=False)

            t = time_slope(encf, eparams, images, perturb=1)
            print(f"encoder (s2d front)  {t*1e3:8.3f} ms/b", flush=True)

        if "stage1" in sel:
            def stage1f(up, x):
                return unet.apply(up, x, train=False, raw=True)[1]

            t = time_slope(stage1f, uparams, images, perturb=1)
            print(f"stage-1 total        {t*1e3:8.3f} ms/b", flush=True)

    if "stage2" in sel:
        lg1 = jnp.asarray(rng.standard_normal((b, rh, rw, 2)), jnp.bfloat16)
        roi_rgb = jax.jit(lambda im, ro: roi_align(
            im, ro, rh, rw, spatial_scale=(float(ih), float(iw)),
            aligned=True))(images, rois)

        def stage2(params, roi_rgb, roi_bg_fg):
            def m2(m, rr, rb):
                f = m.rgb_extractor(rr, train=False)
                combined = jnp.concatenate([f, rb], axis=-1)
                combined = m.feature_combiner(combined)
                return m.head(combined, train=False)[0]
            return model.apply(params, roi_rgb, roi_bg_fg, method=m2)

        t = time_slope(stage2, params, roi_rgb, lg1, perturb=1)
        print(f"stage-2 (ext+head)   {t*1e3:8.3f} ms/b", flush=True)

    if "full" in sel:
        def full(params, images, rois):
            return model.apply(params, images, rois, train=False)[0]

        t = time_slope(full, params, images, rois)
        print(f"full apply           {t*1e3:8.3f} ms/b  ({b/t:6.1f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
