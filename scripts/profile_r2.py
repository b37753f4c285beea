"""Round-2 fine-grained breakdown of the fused (fused_tail=3) flagship.

Times every stage-1 piece individually (encoder, each decoder block in its
deployed form, seg head), stage-2, and the deployed postprocess, so the
next optimisation target is measured rather than guessed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_r2.py
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.inference import (
    cast_floating, create_flagship, deployed_outputs)
from human_instance_segmentation_tpu.models.unet import (
    DecoderBlock, PeopleSegmentationUNet)
from human_instance_segmentation_tpu.ops.s2d import depth_to_space


def time_slope(fn, *args, perturb=0, i1=4, i2=16):
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
    import sys
    # 0=all, 1=encoder, 2=decoders+seghead, 3=totals
    part = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    only = int(sys.argv[2]) if len(sys.argv) > 2 else -1  # part 2: single decoder (5=seg head)
    b = 32
    ih, iw = 480, 640
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, ih, iw, 3), np.float32), jnp.bfloat16)
    rois = jnp.asarray(np.concatenate([
        np.arange(b, dtype=np.float32)[:, None],
        np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (b, 1)),
    ], axis=1))

    model, params = create_flagship(variant="b0", roi_size=(64, 48),
                                    mask_size=(128, 96), image_size=(ih, iw),
                                    fused_tail=3)
    params = cast_floating(params, jnp.bfloat16)
    uvars = {k: v["flagship_pretrained_unet"]["unet"] if "flagship_pretrained_unet" in v
             else v for k, v in params.items()}
    # locate the unet variable subtree by walking known names
    def sub(tree, *names):
        for n in names:
            tree = tree[n]
        return tree
    # find unet params path
    p = params["params"]
    path = None
    for k in p:
        if "unet" in k or "pretrained" in k:
            path = (k,)
            break
    print("unet path:", path, list(p.keys()))
    unet_params = {c: sub(params[c], *path) for c in params}
    if "unet" in unet_params["params"]:
        unet_params = {c: unet_params[c]["unet"] for c in unet_params}

    unet = PeopleSegmentationUNet(encoder_variant="b0", fused_tail=3)

    def norm_feats(v, x):
        return unet.apply(v, x, method=lambda m, xx: m.__class__.__dict__ and None)

    # encoder features (normalised input) via a manual recompute
    mean = jnp.asarray((0.485, 0.456, 0.406), images.dtype)
    std = jnp.asarray((0.229, 0.224, 0.225), images.dtype)
    from human_instance_segmentation_tpu.models.efficientnet import EfficientNetEncoder
    enc = EfficientNetEncoder(variant="b0")
    enc_params = {c: unet_params[c]["encoder"] for c in unet_params}

    def run_enc(v, x):
        return enc.apply(v, (x - mean) / std, train=False)

    if part in (0, 1, 2):
        feats = jax.jit(run_enc)(enc_params, images)
        print("feat shapes:", [f.shape for f in feats])

    if part in (0, 1):
        t = time_slope(run_enc, enc_params, images, perturb=1)
        print(f"encoder                  {t*1e3:8.3f} ms/b", flush=True)

    # decoder stages as deployed (0,1 plain; 2,3,4 fused)
    if part in (0, 2):
      skips = list(feats[:-1])[::-1]
      h = feats[-1]
      chans = (256, 128, 64, 32, 16)
      for i, ch in enumerate(chans):
          skip = skips[i] if i < len(skips) else None
          fused = i >= 2
          blk = DecoderBlock(features=ch, fused=fused)
          bp = {c: unet_params[c][f"decoder{i}"] for c in unet_params}

          def run_blk(v, x, s=skip, _b=blk):
              return _b.apply(v, x, s, train=False)

          hn = jax.jit(run_blk)(bp, h)
          if part in (0, 2) and only in (-1, i):
              t = time_slope(run_blk, bp, h, perturb=1)
              print(f"decoder{i} fused={int(fused)} in{tuple(h.shape)} -> {tuple(hn.shape)}"
                    f"  {t*1e3:8.3f} ms/b", flush=True)
          h = hn
          if fused and i < 4:
              h = jax.jit(lambda x: depth_to_space(x, 2))(h)

      # seg head (s2d form)
      from human_instance_segmentation_tpu.ops.s2d import conv3x3_s2d, tile_channel_params
      sp = {c: unet_params[c].get("seg_head", {}) for c in unet_params if "seg_head" in unet_params[c]}
      k = unet_params["params"]["seg_head"]["kernel"]
      bb = unet_params["params"]["seg_head"]["bias"]

      def run_head(x):
          return depth_to_space(conv3x3_s2d(x, k) + tile_channel_params(bb.astype(x.dtype)), 2)

      if part in (0, 2) and only in (-1, 5):
          t = time_slope(run_head, h)
          print(f"seg_head s2d             {t*1e3:8.3f} ms/b", flush=True)

    if part in (0, 3):
        # stage-1 total, stage-2, postprocess, full
        def stage1(v, x):
            return model.apply(v, x, method=lambda m, im: m.stage1(im, train=False))

        t = time_slope(stage1, params, images, perturb=1)
        print(f"stage1 total             {t*1e3:8.3f} ms/b", flush=True)

        def full(v, x, r):
            return model.apply(v, x, r, train=False)

        t = time_slope(full, params, images, rois, perturb=1)
        print(f"full flagship            {t*1e3:8.3f} ms/b  ({b/t:6.1f} img/s)", flush=True)

        out = jax.jit(full)(params, images, rois)
        logits, aux = out

        def post(lg, fl, r):
            return deployed_outputs(lg, fl, r, dilation_pixels=1)

        t = time_slope(post, logits, aux["full_image_logits"], rois)
        print(f"deployed_outputs         {t*1e3:8.3f} ms/b", flush=True)

        def full_post(v, x, r):
            lg, aux2 = model.apply(v, x, r, train=False)
            return deployed_outputs(lg, aux2["full_image_logits"], r, 1)

        t = time_slope(full_post, params, images, rois, perturb=1)
        print(f"full + postprocess       {t*1e3:8.3f} ms/b  ({b/t:6.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
