"""Cost of the deployed-output epilogue vs the bare model apply.

The deployed contract returns instance_masks (N, mh, mw, 1) and
binary_masks (B, H, W, 1) — C=1 tensors that a tiled TPU HBM layout pads
128x in the lane dim. This script times (batch 32, bf16, fused_tail=3):
  bare:    model.apply -> (logits, person_prob_n4) only
  rank4:   + deployed_outputs (the r1 contract, C=1 rank-4 outputs)
  rank3:   + rank-3 variants (N, mh, mw) / (B, H, W) — W in lanes, dense

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_epilogue.py [items]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.inference import (
    cast_floating, create_flagship, deployed_outputs)
from human_instance_segmentation_tpu.models.postprocess import (
    mask_dilation_logit_boost)
from human_instance_segmentation_tpu.ops.s2d import n4_to_plain


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
    sel = sys.argv[1:] or ["bare", "rank4", "rank3"]
    b, ih, iw = 32, 480, 640
    model, params = create_flagship(
        variant="b0", roi_size=(64, 48), mask_size=(128, 96),
        image_size=(ih, iw), fused_tail=3)
    params = cast_floating(params, jnp.bfloat16)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, ih, iw, 3), np.float32), jnp.bfloat16)
    rois = jnp.asarray(np.concatenate([
        np.arange(b, dtype=np.float32)[:, None],
        np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (b, 1)),
    ], axis=1))

    def bare(params, images, rois):
        logits, aux = model.apply(params, images, rois, train=False)
        return logits, aux["person_prob_n4"]

    def rank4(params, images, rois):
        logits, aux = model.apply(params, images, rois, train=False)
        return deployed_outputs(logits, aux, rois, dilation_pixels=1)

    def rank3(params, images, rois):
        logits, aux = model.apply(params, images, rois, train=False)
        lg = mask_dilation_logit_boost(logits, 1)
        cls = jnp.argmax(lg, axis=-1)
        valid = (rois[:, 0] >= 0).astype(lg.dtype)[:, None, None]
        instance = (cls == 1).astype(lg.dtype) * valid        # (N, mh, mw)
        binary = n4_to_plain(aux["person_prob_n4"], 1)[..., 0]  # (B, H, W)
        return instance, binary

    for name, fn in (("bare", bare), ("rank4", rank4), ("rank3", rank3)):
        if name in sel:
            t = time_slope(fn, params, images, rois)
            print(f"{name:6s} {t * 1e3:8.3f} ms/batch "
                  f"({b / t:7.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
