"""Throughput vs batch size for the fused flagship (B0, 480x640, bf16).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_batch_sweep.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.inference import (
    cast_floating, create_flagship, deployed_outputs)


def main():
    ih, iw = 480, 640
    model, params = create_flagship(
        variant="b0", roi_size=(64, 48), mask_size=(128, 96),
        image_size=(ih, iw), fused_tail=3)
    params = cast_floating(params, jnp.bfloat16)

    def infer(params, images, rois):
        logits, aux = model.apply(params, images, rois, train=False)
        return deployed_outputs(logits, aux["full_image_logits"], rois, 1)

    rng = np.random.default_rng(0)
    for batch in (16, 32, 64):
        images = jnp.asarray(rng.random((batch, ih, iw, 3), np.float32), jnp.bfloat16)
        rois = jnp.asarray(np.concatenate([
            np.arange(batch, dtype=np.float32)[:, None],
            np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (batch, 1)),
        ], axis=1))

        def make_chain(iters):
            @jax.jit
            def chained(params, images, rois):
                def body(i, carry):
                    inst, binary = infer(params, images + carry, rois)
                    return (jnp.mean(inst) * 1e-12).astype(images.dtype)
                return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0, images.dtype))
            return chained

        i1, i2 = 4, 16
        c1, c2 = make_chain(i1), make_chain(i2)
        float(c1(params, images, rois)); float(c2(params, images, rois))
        est = []
        for _ in range(3):
            t0 = time.perf_counter(); float(c1(params, images, rois)); d1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(c2(params, images, rois)); d2 = time.perf_counter() - t0
            est.append((d2 - d1) / (i2 - i1))
        dt = min(est)
        print(f"batch {batch:3d}: {dt*1e3:8.3f} ms/call  {batch/dt:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
