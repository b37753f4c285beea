"""Serving with params baked as XLA constants vs passed as arguments.

For a fixed-weights serving engine, closing the params over the jitted
function lets XLA constant-fold the composed S2D kernels / BN folds and
prepack weight layouts at compile time. This measures the end-to-end
difference at the bench config (B0, batch 32, bf16, fused_tail=3 +
encoder_s2d_front).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_const_params.py [args|const]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.inference import cast_floating, create_flagship


def time_slope_images(fn, images, rois, i1=4, i2=16):
    def mk(iters):
        @jax.jit
        def chained(images, rois):
            def body(i, carry):
                out = fn(images + carry.astype(images.dtype), rois)
                return sum((jnp.sum(l) * 1e-30).astype(jnp.float32)
                           for l in jax.tree.leaves(out))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return chained

    c1, c2 = mk(i1), mk(i2)
    float(c1(images, rois)); float(c2(images, rois))
    best = []
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(images, rois)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(c2(images, rois)); d2 = time.perf_counter() - t0
        best.append((d2 - d1) / (i2 - i1))
    return min(best)


def main():
    sel = sys.argv[1:] or ["args", "const"]
    b, ih, iw = 32, 480, 640
    model, params = create_flagship(
        variant="b0", roi_size=(64, 48), mask_size=(128, 96),
        image_size=(ih, iw), fused_tail=3, encoder_s2d_front=True)
    params = cast_floating(params, jnp.bfloat16)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, ih, iw, 3), np.float32), jnp.bfloat16)
    rois = jnp.asarray(np.concatenate([
        np.arange(b, dtype=np.float32)[:, None],
        np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (b, 1)),
    ], axis=1))

    if "args" in sel:
        # device arrays closed over the jit stay jaxpr constvars ->
        # executable parameters (the bench.py configuration)
        def f_args(im, ro):
            return model.apply(params, im, ro, train=False)[0]

        t = time_slope_images(f_args, images, rois)
        print(f"params-as-args  {t*1e3:8.3f} ms/b ({b/t:6.1f} img/s)",
              flush=True)

    if "const" in sel:
        const = jax.tree.map(np.asarray, params)  # numpy -> XLA constants

        def f_const(im, ro):
            return model.apply(const, im, ro, train=False)[0]

        t = time_slope_images(f_const, images, rois)
        print(f"params-as-const {t*1e3:8.3f} ms/b ({b/t:6.1f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
