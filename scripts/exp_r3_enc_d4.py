"""Round-3 experiments: (a) does int8 help or hurt the ENCODER in
isolation, (b) d4 plain-input vs nested-S2D-input forms.

The int8 serving config measures stage-1 at 27.2 ms/batch-32, of which
encoder+d0 is ~12.7 and decoder4 ~8.5 (profile_stage1_cum_int8.py). The
encoder's 1x1 QConvs are quantized whenever eligible — this isolates
whether that's a win at encoder shapes (XLA's s8 conv lowering loses badly
at some low-channel/high-res shapes, see ops/quant.py's tail notes).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r3_enc_d4.py [items]
items: enc d4
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.models.efficientnet import EfficientNetEncoder
from human_instance_segmentation_tpu.models.unet import DecoderBlock
from human_instance_segmentation_tpu.ops.quant import (
    calibration, collect_scales, int8_serving)
from human_instance_segmentation_tpu.ops.s2d import depth_to_space


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


def cast_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def main():
    sel = sys.argv[1:] or ["enc", "d4"]
    b = 32
    rng = np.random.default_rng(0)

    if "enc" in sel:
        x = jnp.asarray(rng.random((b, 480, 640, 3)), jnp.bfloat16)
        enc = EfficientNetEncoder(variant="b0", s2d_front=True)
        params = jax.jit(lambda r: enc.init(r, x[:1], train=False))(
            jax.random.PRNGKey(0))
        params = cast_bf16(params)

        @jax.jit
        def calib(p, xx):
            with calibration():
                return enc.apply(p, xx, train=False, mutable=["calib"])

        _, cv = calib(params, x)
        scales = collect_scales(jax.tree.map(float, cv["calib"]))
        print(f"calibrated {len(scales)} encoder scales", flush=True)

        def f_bf16(p, xx):
            return enc.apply(p, xx, train=False)

        def f_int8(p, xx):
            with int8_serving(True, scales):
                return enc.apply(p, xx, train=False)

        def f_dyn(p, xx):
            with int8_serving(True, None):
                return enc.apply(p, xx, train=False)

        for name, f in (("enc bf16", f_bf16), ("enc int8-static", f_int8),
                        ("enc int8-dynamic", f_dyn)):
            t = time_slope(f, params, x) * 1e3
            print(f"{name:18s} {t:8.3f} ms/b", flush=True)

    if "d4" in sel:
        # d3 output: S2D(2) of (240, 320, 32) = (120, 160, 128)
        xs2d = jnp.asarray(rng.random((b, 120, 160, 128)), jnp.bfloat16)
        for name, blk, prep in (
            ("d4 plain-input", DecoderBlock(features=16, fused=True),
             lambda t: depth_to_space(t, 2)),
            ("d4 nested-input", DecoderBlock(features=16, fused=True,
                                             input_s2d=True),
             lambda t: t),
        ):
            xin = prep(xs2d)
            p = blk.init(jax.random.PRNGKey(1), xin, None, train=False)
            p = cast_bf16(p)

            def f(pp, tt, _blk=blk, _prep=prep):
                return _blk.apply(pp, _prep(tt), None, train=False)

            t = time_slope(f, p, xs2d) * 1e3
            print(f"{name:18s} {t:8.3f} ms/b", flush=True)


if __name__ == "__main__":
    main()
