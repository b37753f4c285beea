"""Round-4: why does tail int8 lose IN CONTEXT when the bare convs win 2x?

exp_r4_probe.py (current XLA) shows the isolated d4 conv shapes now run ~2x
faster in int8 (conv1 2.32 -> 1.13 ms, composed-up 1.73 -> 0.92), yet the
serving matrix measures tq16 (quantize d4 + seg head) at +0.5 ms/batch.
This bisects the d4 stage in its REAL serving form (plain-input fused
DecoderBlock: depth_to_space -> conv_up_s2d -> bn/relu -> conv3x3_s2d ->
bn/relu) plus the N4 seg head, bf16 vs calibrated-int8, to find where the
integration eats the win.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r4_d4int8.py [items]
items: d4 head both
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.models.unet import (
    DecoderBlock, _Conv3Params, tile_channel_params)
from human_instance_segmentation_tpu.ops import quant as quant_mod
from human_instance_segmentation_tpu.ops.quant import (
    calibration, collect_scales, int8_serving)
from human_instance_segmentation_tpu.ops.s2d import (
    conv3x3_s2d_to_n4, depth_to_space)


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
    sel = sys.argv[1:] or ["d4", "head", "both"]
    b = 32
    rng = np.random.default_rng(0)
    # d3 output in S2D(2): (120, 160, 128); d4 consumes the plain form
    xs2d = jnp.asarray(rng.random((b, 120, 160, 128)), jnp.bfloat16)

    blk = DecoderBlock(features=16, fused=True)
    xin = depth_to_space(xs2d, 2)
    p = cast_bf16(blk.init(jax.random.PRNGKey(1), xin, None, train=False))

    # seg head params (3, 3, 16, 1)
    hp_mod = _Conv3Params(1, use_bias=True, name="seg_head")
    hp = cast_bf16(hp_mod.init(jax.random.PRNGKey(2), 16))

    def d4(pp, tt):
        return blk.apply(pp, depth_to_space(tt, 2), None, train=False)

    def head(hpars, hh):
        k, bsh = hp_mod.apply(hpars, 16)
        return conv3x3_s2d_to_n4(hh, k) + tile_channel_params(
            bsh.astype(hh.dtype), 4)

    def head_q(hpars, hh, qh):
        from human_instance_segmentation_tpu.ops.s2d import quantize_static
        k, bsh = hp_mod.apply(hpars, 16)
        hq = jax.lax.optimization_barrier(quantize_static(hh, qh))
        return conv3x3_s2d_to_n4(hq, k, qscale=qh) + tile_channel_params(
            bsh.astype(hh.dtype), 4)

    # calibrate with the tail gate lowered so d4 (features=16) sows scales
    quant_mod.TAIL_QUANT_MIN_FEATURES = 16

    @jax.jit
    def calib(pp, tt):
        with calibration():
            return blk.apply(pp, depth_to_space(tt, 2), None, train=False,
                             mutable=["calib"])

    hout, cv = calib(p, xs2d)
    scales = collect_scales(jax.tree.map(float, cv["calib"]))
    qh = float(jnp.max(jnp.abs(hout)).astype(jnp.float32)) / 127.0
    print(f"calibrated tail scales: {sorted(scales)}", flush=True)

    if "d4" in sel:
        t = time_slope(d4, p, xs2d) * 1e3
        print(f"d4 block bf16        {t:8.3f} ms/b", flush=True)

        def d4_q(pp, tt):
            with int8_serving(True, scales):
                return blk.apply(pp, depth_to_space(tt, 2), None, train=False)

        t = time_slope(d4_q, p, xs2d) * 1e3
        print(f"d4 block int8-static {t:8.3f} ms/b", flush=True)

        # bisect: only conv_up quantized / only conv1 ("mid") quantized
        for keep in ("x", "mid"):
            sc = {k: v for k, v in scales.items() if k.endswith("#" + keep)}

            def d4_part(pp, tt, _sc=sc):
                with int8_serving(True, _sc):
                    return blk.apply(pp, depth_to_space(tt, 2), None,
                                     train=False)

            t = time_slope(d4_part, p, xs2d) * 1e3
            print(f"d4 int8 only {keep:4s}    {t:8.3f} ms/b", flush=True)

    if "head" in sel:
        hh = jnp.asarray(rng.random((b, 240, 320, 64)), jnp.bfloat16)
        t = time_slope(head, hp, hh) * 1e3
        print(f"seg head bf16        {t:8.3f} ms/b", flush=True)
        t = time_slope(lambda a, x: head_q(a, x, qh), hp, hh) * 1e3
        print(f"seg head int8        {t:8.3f} ms/b", flush=True)

    if "both" in sel:
        def chain_bf16(pp, tt):
            return head(hp, d4(pp, tt))

        def chain_q(pp, tt):
            with int8_serving(True, scales):
                hh = blk.apply(pp, depth_to_space(tt, 2), None, train=False)
            return head_q(hp, hh, qh)

        t = time_slope(chain_bf16, p, xs2d) * 1e3
        print(f"d4+head bf16         {t:8.3f} ms/b", flush=True)
        t = time_slope(chain_q, p, xs2d) * 1e3
        print(f"d4+head int8         {t:8.3f} ms/b", flush=True)


if __name__ == "__main__":
    main()
