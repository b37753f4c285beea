"""Measure the S2D fused-tail speedup on the real chip.

Times stage-1 (B0 480x640, batch 32, bf16) and the full flagship with
fused_tail in {0, 2, 3}, plus output-equivalence spot checks.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_fused_tail.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.inference import cast_floating, create_flagship
from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet


def time_slope(fn, *args, perturb=1, i1=4, i2=16):
    def make_chain(iters):
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

    c1, c2 = make_chain(i1), make_chain(i2)
    float(c1(*args)); float(c2(*args))
    best = []
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(*args)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(c2(*args)); d2 = time.perf_counter() - t0
        best.append((d2 - d1) / (i2 - i1))
    return min(best)


def main():
    b = 32
    ih, iw = 480, 640
    rng = np.random.default_rng(0)
    images32 = rng.random((b, ih, iw, 3), np.float32)
    images = jnp.asarray(images32, jnp.bfloat16)

    base = PeopleSegmentationUNet(encoder_variant="b0")
    variables = jax.jit(lambda r: base.init(r, jnp.zeros((1, ih, iw, 3)), train=False))(
        jax.random.PRNGKey(0))
    vbf16 = cast_floating(variables, jnp.bfloat16)

    for ft in (0, 2, 3):
        m = PeopleSegmentationUNet(encoder_variant="b0", fused_tail=ft)
        t = time_slope(lambda v, x, _m=m: _m.apply(v, x, train=False), vbf16, images)
        print(f"stage1 fused_tail={ft}: {t*1e3:8.3f} ms/b  {t/b*1e6:7.1f} us/img", flush=True)

    # equivalence spot check on the chip (bf16): fused vs plain
    y0 = jax.jit(lambda v, x: PeopleSegmentationUNet(
        encoder_variant="b0", fused_tail=0).apply(v, x, train=False))(vbf16, images)
    y2 = jax.jit(lambda v, x: PeopleSegmentationUNet(
        encoder_variant="b0", fused_tail=3).apply(v, x, train=False))(vbf16, images)
    d = jnp.max(jnp.abs(y0.astype(jnp.float32) - y2.astype(jnp.float32)))
    print(f"max |plain - fused| (bf16 logits): {float(d):.4f}", flush=True)

    # full flagship
    for ft in (0, 3):
        model, params = create_flagship(variant="b0", roi_size=(64, 48),
                                        mask_size=(128, 96), image_size=(ih, iw),
                                        fused_tail=ft)
        params = cast_floating(params, jnp.bfloat16)
        rois = jnp.asarray(np.concatenate([
            np.arange(b, dtype=np.float32)[:, None],
            np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (b, 1)),
        ], axis=1))

        def full(params, images, rois, _m=model):
            return _m.apply(params, images, rois, train=False)[0]

        t = time_slope(full, params, images, rois)
        print(f"flagship fused_tail={ft}: {t*1e3:8.3f} ms/b  {b/t:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
