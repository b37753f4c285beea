"""Break down stage-2 (RGB extractor + refined head) — the remaining 13.4 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_stage2.py [item ...]
items: extractor shared eunet head conv_ln conv_bare ln_bare
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.inference import cast_floating, create_flagship
from human_instance_segmentation_tpu.models.heads import EnhancedUNet
from human_instance_segmentation_tpu.models.blocks import ConvNormAct
from human_instance_segmentation_tpu.ops.norms import LayerNorm2d
import flax.linen as nn


def time_slope(fn, *args, perturb=0, i1=4, i2=16):
    def make_chain(iters):
        @jax.jit
        def chained(*a):
            def body(i, carry):
                ai = list(a)
                ai[perturb] = (ai[perturb] + carry.astype(ai[perturb].dtype))
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
    sel = sys.argv[1:] or ["extractor", "shared", "eunet", "head"]
    b = 32
    rng = np.random.default_rng(0)

    def rand(shape):
        return jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)

    model, params = create_flagship(variant="b0", roi_size=(64, 48),
                                    mask_size=(128, 96), image_size=(480, 640))
    params = cast_floating(params, jnp.bfloat16)
    rr = rand((b, 64, 48, 3))
    comb = rand((b, 64, 48, 256))

    if "extractor" in sel:
        def ex(p, a):
            return model.apply(p, a, method=lambda m, x: m.rgb_extractor(x, train=False))
        t = time_slope(ex, params, rr, perturb=1)
        print(f"rgb_extractor            {t*1e3:8.3f} ms/b", flush=True)

    if "head" in sel:
        def hd(p, c):
            return model.apply(p, c, method=lambda m, x: m.head(x, train=False)[0])
        t = time_slope(hd, params, comb, perturb=1)
        print(f"refined head             {t*1e3:8.3f} ms/b", flush=True)

    if "eunet" in sel:
        eu = EnhancedUNet(base_channels=96, depth=3)
        v = jax.jit(lambda r: eu.init(r, jnp.zeros((1, 64, 48, 256)), train=False))(
            jax.random.PRNGKey(0))
        v = cast_floating(v, jnp.bfloat16)
        t = time_slope(lambda vv, x: eu.apply(vv, x, train=False), v, comb, perturb=1)
        print(f"EnhancedUNet(96, d3)     {t*1e3:8.3f} ms/b", flush=True)

    if "conv_ln" in sel:
        cna = ConvNormAct(256)
        v = jax.jit(lambda r: cna.init(r, jnp.zeros((1, 64, 48, 256)), train=False))(
            jax.random.PRNGKey(0))
        v = cast_floating(v, jnp.bfloat16)
        t = time_slope(lambda vv, x: cna.apply(vv, x, train=False), v, comb, perturb=1)
        print(f"ConvNormAct 256 (1x)     {t*1e3:8.3f} ms/b", flush=True)

    if "ln_bare" in sel:
        ln = LayerNorm2d()
        v = ln.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 256)))
        v = cast_floating(v, jnp.bfloat16)
        t = time_slope(lambda vv, x: ln.apply(vv, x), v, comb, perturb=1)
        print(f"LayerNorm2d 256 (1x)     {t*1e3:8.3f} ms/b", flush=True)

    if "conv_bare" in sel:
        k = rand((3, 3, 256, 256))
        from jax import lax
        t = time_slope(lambda x, kk: lax.conv_general_dilated(
            x, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")), comb, k)
        print(f"bare conv3 256->256      {t*1e3:8.3f} ms/b", flush=True)


if __name__ == "__main__":
    main()
