"""Latency benchmark: flagship, batch 1, N ROIs — the BASELINE.md shapes.

Reports per-call latency (and per-ROI p50) for N in {1, 3, 10} against the
reference's TensorRT EP rows:
  B0 480x640 (BASELINE.md:12-17): 4.74 / 6.51 / 12.60 ms
  B1 640x640 (BASELINE.md:13-17): 6.86 / 9.75 / 19.69 ms

Method: chained fori_loop with a data dependency + slope between two chain
lengths (block_until_ready is not a reliable fence on the axon tunnel and
each call carries a large variable fixed cost; see bench.py). The slope is
measured several times; the p50 of those per-iteration estimates is
reported.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_latency.py [b0] [b1]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# variant -> (image (h, w), roi, mask, {n_rois: reference TRT-EP ms})
SHAPES = {
    "b0": ((480, 640), (64, 48), (128, 96), {1: 4.74, 3: 6.51, 10: 12.60}),
    "b1": ((640, 640), (80, 60), (160, 120), {1: 6.86, 3: 9.75, 10: 19.69}),
}


def bench_variant(variant: str, fast: bool = False) -> list:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from human_instance_segmentation_tpu.inference import (
        cast_floating, create_flagship, deployed_outputs)

    (ih, iw), roi, mask, baseline_ms = SHAPES[variant]
    extra = {"mid_channels": 128} if fast else {}
    model, params = create_flagship(
        variant=variant, roi_size=roi, mask_size=mask, image_size=(ih, iw),
        fused_tail=3, encoder_s2d_front=True, **extra)
    params = cast_floating(params, jnp.bfloat16)

    def infer(params, images, rois):
        logits, aux = model.apply(params, images, rois, train=False)
        return deployed_outputs(logits, aux, rois, dilation_pixels=1)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((1, ih, iw, 3), np.float32), jnp.bfloat16)

    rows = []
    for n in (1, 3, 10):
        rois = jnp.asarray(np.concatenate([
            np.zeros((n, 1), np.float32),
            np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (n, 1))
            + np.linspace(0, 0.02, n, dtype=np.float32)[:, None],
        ], axis=1))

        def make_chain(iters):
            @jax.jit
            def chained(params, images, rois):
                def body(i, carry):
                    inst, binary = infer(params, images + carry, rois)
                    return (jnp.mean(inst) * 1e-12).astype(images.dtype)
                return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0, images.dtype))
            return chained

        i1, i2 = 5, 25
        c1, c2 = make_chain(i1), make_chain(i2)
        float(c1(params, images, rois))
        float(c2(params, images, rois))
        estimates = []
        for _ in range(5):
            t0 = time.perf_counter(); float(c1(params, images, rois)); d1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(c2(params, images, rois)); d2 = time.perf_counter() - t0
            estimates.append((d2 - d1) / (i2 - i1))
        p50_ms = float(np.median(estimates)) * 1e3
        rows.append({
            "metric": f"{variant}_{ih}x{iw}_latency_{n}roi"
                      + ("_fast" if fast else ""),
            "value": round(p50_ms, 3),
            "unit": "ms (p50 per call)",
            "per_roi_ms": round(p50_ms / n, 3),
            "baseline_ms": baseline_ms[n],
            "vs_baseline": round(baseline_ms[n] / p50_ms, 3),  # >1 == faster
        })
        print(json.dumps(rows[-1]), flush=True)
        from bench_serving_matrix import record_result
        record_result("latency", rows[-1])
    return rows


def main():
    fast = "--fast" in sys.argv
    variants = [v for v in sys.argv[1:] if v in SHAPES] or ["b0"]
    rows = []
    for v in variants:
        rows += bench_variant(v, fast=fast)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
