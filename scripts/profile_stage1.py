"""Fine-grained timing of stage-1 (EfficientNet-B0 UNet) on the TPU.

The coarse breakdown (scripts/profile_breakdown.py) shows stage 1 at 84% of
flagship inference time with 5.4% MFU. This script splits it: encoder vs
decoder stages vs seg head, plus microbenchmarks of bare convolutions at the
decoder's (resolution, channel) points to see what XLA itself achieves there.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_stage1.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from human_instance_segmentation_tpu.inference import cast_floating
from human_instance_segmentation_tpu.models.efficientnet import EfficientNetEncoder
from human_instance_segmentation_tpu.models.unet import DecoderBlock, PeopleSegmentationUNet

V5E_PEAK_BF16 = 197e12


def time_slope(fn, *args, perturb=1, i1=4, i2=16):
    def make_chain(iters):
        @jax.jit
        def chained(*a):
            def body(i, carry):
                ai = list(a)
                ai[perturb] = ai[perturb] + carry.astype(ai[perturb].dtype)
                out = fn(*ai)
                leaves = jax.tree.leaves(out)
                return sum((jnp.sum(l) * 1e-30).astype(jnp.float32) for l in leaves)
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


def report(name, secs, flops=float("nan"), batch=32):
    mfu = flops / secs / V5E_PEAK_BF16
    print(f"{name:34s} {secs*1e3:8.3f} ms/b  {secs/batch*1e6:7.1f} us/img  "
          f"{flops/1e9:7.1f} G  MFU={mfu*100:5.1f}%")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="stages", choices=["stages", "convs"])
    args = ap.parse_args()
    b = 32
    ih, iw = 480, 640
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, ih, iw, 3), np.float32), dtype)

    model = PeopleSegmentationUNet(encoder_variant="b0")
    params = jax.jit(lambda r: model.init(r, jnp.zeros((1, ih, iw, 3)), train=False))(
        jax.random.PRNGKey(0))
    params = cast_floating(params, dtype)

    # encoder only (apply the submodule directly with its params subtree)
    enc_mod = EfficientNetEncoder(variant="b0")
    enc_vars = {"params": params["params"]["encoder"],
                "batch_stats": params["batch_stats"]["encoder"]}

    def enc(ev, x):
        return enc_mod.apply(ev, x, train=False)

    feats = jax.jit(enc)(enc_vars, images)
    print("encoder feature shapes:", [f.shape for f in feats], flush=True)
    if args.part == "stages":
        report("encoder_b0", time_slope(enc, enc_vars, images), 0.0)

    if args.part == "stages":
        def full(params, x):
            return model.apply(params, x, train=False)

        report("stage1_full", time_slope(full, params, images), 893.8e9)

    if args.part == "stages":
        # decoder stages, isolated with materialised inputs
        skips = list(feats[:-1])[::-1] + [None]
        h = feats[-1]
        chans = (256, 128, 64, 32, 16)
        for i, ch in enumerate(chans):
            skip = skips[i]
            sub = DecoderBlock(features=ch)
            sp = {"params": params["params"][f"decoder{i}"],
                  "batch_stats": params["batch_stats"][f"decoder{i}"]}
            sp = cast_floating(sp, dtype)

            if skip is not None:
                fn = lambda hh, ss, _sub=sub, _sp=sp: _sub.apply(_sp, hh, ss, train=False)
                t = time_slope(fn, h, skip, perturb=0)
                out = jax.jit(fn)(h, skip)
            else:
                fn = lambda hh, _sub=sub, _sp=sp: _sub.apply(_sp, hh, None, train=False)
                t = time_slope(fn, h, perturb=0)
                out = jax.jit(fn)(h)
            # conv flops for this block
            b_, hh, ww, _ = out.shape
            cin1 = h.shape[-1] + (skip.shape[-1] if skip is not None else 0)
            fl = b_ * hh * ww * 9 * 2 * (cin1 * ch + ch * ch)
            report(f"decoder{i} {h.shape[1]}x{h.shape[2]}->{hh}x{ww} c{cin1}->{ch}",
                   t, fl)
            h = out
        return

    # bare conv microbenchmarks at decoder shapes
    print("\nbare 3x3 conv microbenchmarks (bf16, NHWC):")
    for (hh, ww, ci, co) in [
        (30, 40, 432, 256), (30, 40, 256, 256),
        (60, 80, 296, 128), (60, 80, 128, 128),
        (120, 160, 152, 64), (120, 160, 64, 64),
        (240, 320, 80, 32), (240, 320, 32, 32),
        (480, 640, 32, 16), (480, 640, 16, 16),
        (480, 640, 16, 128),   # what if channels were wide?
        (240, 320, 64, 128),   # s2d-ish equivalent shape
    ]:
        x = jnp.asarray(rng.random((b, hh, ww, ci), np.float32), dtype)
        k = jnp.asarray(rng.random((3, 3, ci, co), np.float32) * 0.01, dtype)

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t = time_slope(conv, x, k, perturb=0)
        fl = b * hh * ww * 9 * 2 * ci * co
        report(f"conv {hh}x{ww} {ci}->{co}", t, fl)


if __name__ == "__main__":
    main()
