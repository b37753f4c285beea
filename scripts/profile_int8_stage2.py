"""Where does the stage-2 int8 win go? (13.4 bf16 -> 10.2 int8, vs 2.7x bare)

Decomposes the gap at the deployment shape (32 ROIs x 64x48):
  conv_bf16   bare bf16 3x3 conv 256->256
  conv_s8     same conv, inputs/weights already int8 (pure MXU rate)
  conv_q      qconv2d with a static scale (adds round/clip + dequant)
  cna_bf16 / cna_q    ConvNormAct unit (conv + LayerNorm2d + relu)
  res_bf16 / res_q    ResidualBlock
  ext_bf16 / ext_q    flagship rgb_extractor
  head_bf16 / head_q  flagship refined head

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_int8_stage2.py [items]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from human_instance_segmentation_tpu.inference import cast_floating, create_flagship
from human_instance_segmentation_tpu.models.blocks import ConvNormAct, ResidualBlock
from human_instance_segmentation_tpu.ops.quant import int8_serving, qconv2d


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
    sel = sys.argv[1:] or ["conv_bf16", "conv_s8", "conv_q", "cna_bf16",
                           "cna_q", "res_bf16", "res_q", "ext_bf16", "ext_q",
                           "head_bf16", "head_q"]
    b = 32
    rng = np.random.default_rng(0)

    def rand(shape, dt=jnp.bfloat16):
        return jnp.asarray(rng.random(shape, np.float32), dt)

    x = rand((b, 64, 48, 256))
    k = rand((3, 3, 256, 256))

    if "conv_bf16" in sel:
        t = time_slope(lambda a, kk: lax.conv_general_dilated(
            a, kk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x, k)
        print(f"conv_bf16  {t*1e3:8.3f} ms/b", flush=True)

    if "conv_s8" in sel:
        xi = jnp.asarray(rng.integers(-127, 128, (b, 64, 48, 256)), jnp.int8)
        ki = jnp.asarray(rng.integers(-127, 128, (3, 3, 256, 256)), jnp.int8)

        def cs8(a, kk):
            y = lax.conv_general_dilated(
                a, kk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return y.astype(jnp.bfloat16)
        # perturb via int add to keep the chain honest
        def chain_s8(a, kk):
            return cs8(a, kk)
        t = time_slope(chain_s8, xi, ki)
        print(f"conv_s8    {t*1e3:8.3f} ms/b", flush=True)

    if "conv_q" in sel:
        t = time_slope(lambda a, kk: qconv2d(a, kk, (1, 1), "SAME",
                                             static_scale=1.0 / 127), x, k)
        print(f"conv_q     {t*1e3:8.3f} ms/b", flush=True)

    scales1 = None

    def calibrated(mod, v, a):
        """Run one calibration pass, return {path: scale}."""
        from human_instance_segmentation_tpu.ops.quant import (
            calibration, collect_scales)

        def run(vv, aa):
            with calibration():
                return mod.apply(vv, aa, train=False, mutable=["calib"])
        _, cv = jax.jit(run)(v, a)
        return collect_scales(jax.tree.map(float, cv["calib"]))

    if "cna_bf16" in sel or "cna_q" in sel:
        cna = ConvNormAct(256)
        v = jax.jit(lambda r: cna.init(r, jnp.zeros((1, 64, 48, 256)),
                                       train=False))(jax.random.PRNGKey(0))
        v = cast_floating(v, jnp.bfloat16)
        if "cna_bf16" in sel:
            t = time_slope(lambda vv, a: cna.apply(vv, a, train=False), v, x,
                           perturb=1)
            print(f"cna_bf16   {t*1e3:8.3f} ms/b", flush=True)
        if "cna_q" in sel:
            sc = calibrated(cna, v, x)

            def f(vv, a):
                with int8_serving(scales=sc):
                    return cna.apply(vv, a, train=False)
            t = time_slope(f, v, x, perturb=1)
            print(f"cna_q      {t*1e3:8.3f} ms/b", flush=True)

    if "res_bf16" in sel or "res_q" in sel:
        res = ResidualBlock(256)
        v = jax.jit(lambda r: res.init(r, jnp.zeros((1, 64, 48, 256)),
                                       train=False))(jax.random.PRNGKey(0))
        v = cast_floating(v, jnp.bfloat16)
        if "res_bf16" in sel:
            t = time_slope(lambda vv, a: res.apply(vv, a, train=False), v, x,
                           perturb=1)
            print(f"res_bf16   {t*1e3:8.3f} ms/b", flush=True)
        if "res_q" in sel:
            sc = calibrated(res, v, x)

            def f(vv, a):
                with int8_serving(scales=sc):
                    return res.apply(vv, a, train=False)
            t = time_slope(f, v, x, perturb=1)
            print(f"res_q      {t*1e3:8.3f} ms/b", flush=True)

    if any(s in sel for s in ("ext_bf16", "ext_q", "head_bf16", "head_q")):
        model, params = create_flagship(variant="b0", roi_size=(64, 48),
                                        mask_size=(128, 96),
                                        image_size=(480, 640))
        params = cast_floating(params, jnp.bfloat16)
        rr = rand((b, 64, 48, 3))
        comb = rand((b, 64, 48, 256))

        def calib_sub(method, a):
            from human_instance_segmentation_tpu.ops.quant import (
                calibration, collect_scales)

            def run(p, aa):
                with calibration():
                    return model.apply(p, aa, method=method, mutable=["calib"])
            _, cv = jax.jit(run)(params, a)
            return collect_scales(jax.tree.map(float, cv["calib"]))

        ext_m = lambda m, a: m.rgb_extractor(a, train=False)
        head_m = lambda m, a: m.head(a, train=False)[0]

        if "ext_bf16" in sel:
            t = time_slope(lambda p, a: model.apply(p, a, method=ext_m),
                           params, rr, perturb=1)
            print(f"ext_bf16   {t*1e3:8.3f} ms/b", flush=True)
        if "ext_q" in sel:
            sc = calib_sub(ext_m, rr)

            def f(p, a):
                with int8_serving(scales=sc):
                    return model.apply(p, a, method=ext_m)
            t = time_slope(f, params, rr, perturb=1)
            print(f"ext_q      {t*1e3:8.3f} ms/b", flush=True)
        if "head_bf16" in sel:
            t = time_slope(lambda p, a: model.apply(p, a, method=head_m),
                           params, comb, perturb=1)
            print(f"head_bf16  {t*1e3:8.3f} ms/b", flush=True)
        if "head_q" in sel:
            sc = calib_sub(head_m, comb)

            def f(p, a):
                with int8_serving(scales=sc):
                    return model.apply(p, a, method=head_m)
            t = time_slope(f, params, comb, perturb=1)
            print(f"head_q     {t*1e3:8.3f} ms/b", flush=True)


if __name__ == "__main__":
    main()
