"""Per-stage timing breakdown of the flagship B0 inference graph.

VERDICT r1 asked for a profile-driven throughput investigation: this script
times each pipeline stage in isolation (stage-1 UNet, the two RoIAlign crops
— matmul vs Pallas formulation — and the stage-2 extractor+head), reports
XLA's own FLOP estimates, and derives an MFU figure per stage so the
optimisation targets are explicit rather than guessed.

Timing uses the same chained-fori_loop slope method as bench.py (fixed
per-call transport costs over the remote-device tunnel cancel in the slope).

Run: python scripts/profile_breakdown.py [--batch 32] [--rois-per-image 1]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.inference import cast_floating, create_flagship
from human_instance_segmentation_tpu.ops.sampling import roi_align
from human_instance_segmentation_tpu.ops.pallas_roi_align import roi_align_pallas

V5E_PEAK_BF16 = 394e12 / 2  # 197 TFLOP/s per chip


def time_slope(fn, *args, perturb=1, i1=4, i2=16):
    """Seconds per iteration of fn(*args) via two chained-run lengths.

    The carry is folded into args[perturb] each iteration so successive
    calls have a true data dependency — otherwise XLA hoists the
    loop-invariant call out of the fori_loop and the slope collapses.
    """

    def make_chain(iters):
        @jax.jit
        def chained(*a):
            def body(i, carry):
                ai = list(a)
                ai[perturb] = ai[perturb] + carry.astype(ai[perturb].dtype)
                out = fn(*ai)
                leaves = jax.tree.leaves(out)
                s = sum((jnp.sum(l) * 1e-30).astype(jnp.float32) for l in leaves)
                return s
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return chained

    c1, c2 = make_chain(i1), make_chain(i2)
    float(c1(*args)); float(c2(*args))  # compile + warm
    best = []
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(*args)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(c2(*args)); d2 = time.perf_counter() - t0
        best.append((d2 - d1) / (i2 - i1))
    return min(best)


def flops_of(fn, *args):
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001 — best-effort on experimental platform
        print(f"  (cost_analysis unavailable: {e})")
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rois-per-image", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    ih, iw = 480, 640
    rh, rw = 64, 48
    dtype = jnp.dtype(args.dtype)
    b = args.batch
    n = b * args.rois_per_image

    model, params = create_flagship(variant="b0", roi_size=(rh, rw),
                                    mask_size=(128, 96), image_size=(ih, iw))
    params = cast_floating(params, dtype)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, ih, iw, 3), np.float32), dtype)
    rois = jnp.asarray(np.concatenate([
        np.repeat(np.arange(b, dtype=np.float32), args.rois_per_image)[:, None],
        np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (n, 1)),
    ], axis=1))

    def full(params, images, rois):
        return model.apply(params, images, rois, train=False)[0]

    def stage1(params, images):
        return model.apply(params, images,
                           method=lambda m, im: m.stage1(im, train=False))

    logits2 = jax.jit(stage1)(params, images)

    def crop_mask_matmul(lg, rois):
        return roi_align(lg, rois, rh, rw, spatial_scale=(float(ih), float(iw)), aligned=True)

    def crop_rgb_matmul(im, rois):
        return roi_align(im, rois, rh, rw, spatial_scale=(float(ih), float(iw)), aligned=True)

    def crop_mask_pallas(lg, rois):
        return roi_align_pallas(lg, rois, rh, rw, spatial_scale=(float(ih), float(iw)), aligned=True)

    def crop_rgb_pallas(im, rois):
        return roi_align_pallas(im, rois, rh, rw, spatial_scale=(float(ih), float(iw)), aligned=True)

    roi_bg_fg = jax.jit(crop_mask_matmul)(logits2, rois)
    roi_rgb = jax.jit(crop_rgb_matmul)(images, rois)

    def stage2(params, roi_rgb, roi_bg_fg):
        def m2(m, rr, rb):
            f = m.rgb_extractor(rr, train=False)
            combined = jnp.concatenate([f, rb], axis=-1)
            combined = m.feature_combiner(combined)
            return m.head(combined, train=False)[0]
        return model.apply(params, roi_rgb, roi_bg_fg, method=m2)

    def rgb_extractor_only(params, roi_rgb):
        return model.apply(params, roi_rgb,
                           method=lambda m, rr: m.rgb_extractor(rr, train=False))

    rows = []

    def report(name, secs, flops, per=b):
        mfu = flops / secs / V5E_PEAK_BF16 if flops == flops else float("nan")
        rows.append({
            "stage": name, "ms_per_batch": round(secs * 1e3, 3),
            "us_per_image": round(secs / per * 1e6, 1),
            "gflops_per_batch": round(flops / 1e9, 1) if flops == flops else None,
            "mfu_pct": round(mfu * 100, 1) if mfu == mfu else None,
        })
        print(f"{name:28s} {secs*1e3:8.3f} ms/batch  {secs/per*1e6:8.1f} us/img  "
              f"flops={flops/1e9 if flops==flops else float('nan'):8.1f} G  "
              f"MFU={mfu*100 if mfu==mfu else float('nan'):5.1f}%")

    print(f"batch={b} rois={n} dtype={dtype.name} image={ih}x{iw} roi={rh}x{rw}")

    report("full_model", time_slope(full, params, images, rois), flops_of(full, params, images, rois))
    report("stage1_unet", time_slope(stage1, params, images), flops_of(stage1, params, images))
    report("roi_crop_mask_matmul", time_slope(crop_mask_matmul, logits2, rois, perturb=0), flops_of(crop_mask_matmul, logits2, rois))
    report("roi_crop_rgb_matmul", time_slope(crop_rgb_matmul, images, rois, perturb=0), flops_of(crop_rgb_matmul, images, rois))
    try:
        report("roi_crop_mask_pallas", time_slope(crop_mask_pallas, logits2, rois, perturb=0), float("nan"))
        report("roi_crop_rgb_pallas", time_slope(crop_rgb_pallas, images, rois, perturb=0), float("nan"))
    except Exception as e:  # noqa: BLE001
        print(f"pallas crop failed: {e}")
    report("stage2_extractor+head", time_slope(stage2, params, roi_rgb, roi_bg_fg), flops_of(stage2, params, roi_rgb, roi_bg_fg))
    report("rgb_extractor_only", time_slope(rgb_extractor_only, params, roi_rgb), flops_of(rgb_extractor_only, params, roi_rgb))

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
