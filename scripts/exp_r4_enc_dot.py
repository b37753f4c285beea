"""Round-4: encoder int8 with 1x1 QConvs lowered as s8 dot_general.

Round 3 denylisted the encoder because int8-static measured SLOWER than
bf16 (11.18 vs 12.32 ms, exp_r3_enc_d4.py) — XLA's s8 conv lowering loses
at encoder shapes. The MBConv expand/project convs are all 1x1 stride-1,
i.e. plain matmuls; this A/Bs lowering them via s8xs8->s32 dot_general
over flattened pixels (ops/quant.py ONE_BY_ONE_AS_DOT) against the conv
lowering and bf16.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r4_enc_dot.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.models.efficientnet import EfficientNetEncoder
from human_instance_segmentation_tpu.ops import quant as quant_mod
from human_instance_segmentation_tpu.ops.quant import (
    calibration, collect_scales, int8_serving)


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
    b = 32
    rng = np.random.default_rng(0)
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

    t = time_slope(f_bf16, params, x) * 1e3
    print(f"enc bf16            {t:8.3f} ms/b", flush=True)
    for flag in (False, True):
        quant_mod.ONE_BY_ONE_AS_DOT = flag
        t = time_slope(f_int8, params, x) * 1e3
        print(f"enc int8 1x1dot={int(flag)}  {t:8.3f} ms/b", flush=True)
    # numeric sanity: dot path == conv path
    quant_mod.ONE_BY_ONE_AS_DOT = False
    ref = jax.jit(f_int8)(params, x)
    quant_mod.ONE_BY_ONE_AS_DOT = True
    got = jax.jit(f_int8)(params, x)
    err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32))))
              for a, b_ in zip(jax.tree.leaves(ref), jax.tree.leaves(got)))
    print(f"max |dot - conv| over encoder taps: {err:.6f}", flush=True)


if __name__ == "__main__":
    main()
