"""Pallas fused tail vs the XLA S2D tail at flagship decoder-4 shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_pallas_tail.py
Times (slope method, see bench.py) the stage-1 tail both ways:
  xla:    depth_to_space -> conv_up_s2d -> bn/relu -> conv3x3_s2d -> bn/relu
          -> conv3x3_s2d_to_n4 seg head  (the committed serving path)
  pallas: ops/pallas_tail.tail_with_borders (one kernel + border strips)
and checks they agree numerically.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.ops.pallas_tail import tail_with_borders
from human_instance_segmentation_tpu.ops.s2d import (
    conv3x3_s2d, conv3x3_s2d_to_n4, conv_up_s2d, depth_to_space, n4_to_plain,
    space_to_depth, tile_channel_params)


def time_slope(fn, *args, i1=4, i2=16):
    def make_chain(iters):
        @jax.jit
        def chained(*a):
            def body(i, carry):
                ai = list(a)
                ai[0] = ai[0] + carry.astype(ai[0].dtype)
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
    sel = sys.argv[1:] or ["agree", "xla", "pallas"]
    rng = np.random.default_rng(0)
    B, hc, wc, ci, c = 32, 120, 160, 32, 16
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, hc, wc, 4 * ci)), dt)
    k0 = jnp.asarray(rng.standard_normal((3, 3, ci, c)) * 0.2, dt)
    k1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, dt)
    kh = jnp.asarray(rng.standard_normal((3, 3, c, 1)) * 0.2, dt)
    bh = jnp.asarray(rng.standard_normal((1,)), jnp.float32)
    mkbn = lambda: tuple(jnp.asarray(v, jnp.float32) for v in (
        rng.uniform(0.5, 1.5, c), rng.standard_normal(c) * 0.1,
        rng.standard_normal(c) * 0.1, rng.uniform(0.5, 1.5, c)))
    bn0, bn1 = mkbn(), mkbn()

    def bn_relu(y, p):
        t = lambda v: tile_channel_params(v.astype(y.dtype))
        return jax.nn.relu((y - t(p[2])) * jax.lax.rsqrt(t(p[3]) + 1e-5)
                           * t(p[0]) + t(p[1]))

    def xla_tail(xx):
        h = depth_to_space(xx, 2)
        y = bn_relu(conv_up_s2d(h, k0), bn0)
        y = bn_relu(conv3x3_s2d(y, k1), bn1)
        return conv3x3_s2d_to_n4(y, kh) + tile_channel_params(
            bh.astype(y.dtype), 4)

    def pallas_tail(xx):
        return tail_with_borders(xx, k0, bn0, k1, bn1, kh, bh)

    if "agree" in sel:
        xs = x[:2]
        a = n4_to_plain(jax.jit(xla_tail)(xs), 1)[..., 0]
        b = jax.jit(pallas_tail)(xs)
        d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        print(f"agreement: maxdiff {float(jnp.max(d)):.3e} "
              f"mean|ref| {float(jnp.mean(jnp.abs(a))):.3f}", flush=True)

    for name, fn in (("xla", xla_tail), ("pallas", pallas_tail)):
        if name in sel:
            t = time_slope(fn, x)
            print(f"{name:8s} {t * 1e3:8.3f} ms/batch  "
                  f"({t / B * 1e6:7.1f} us/img)", flush=True)


if __name__ == "__main__":
    main()
