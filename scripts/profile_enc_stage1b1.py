"""Encoder stage-1 block-1 formulations: plain vs S2D(2) channel-major.

The B0 encoder's stage-1 block-1 (k3 s1, 24ch @ 120x160, e6) is the next
lane-starved block after the s2d front (24ch pads 5.3x, mid 144 pads 1.8x).
Candidate S2D forms of its pieces on the half grid (60x80):
  expand:   dense phase 1x1 (1,1,96,576)       [phase-major]
  dw:       (a) dense (3,3,576,576)            [phase-major, 576x FLOPs - expected loss]
            (b) grouped (3,3,4,576) fg=144     [channel-major, 4x FLOPs]
  project:  dense phase 1x1 (1,1,576,96)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_enc_stage1b1.py [items]
items: plain exp_s2d dw_dense dw_grp proj_s2d
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def time_slope(fn, *args, perturb=0, i1=4, i2=16):
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


def conv(x, k, stride=1, pad="SAME", fg=1):
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=fg)


def main():
    sel = sys.argv[1:] or ["plain", "exp_s2d", "dw_dense", "dw_grp", "proj_s2d"]
    rng = np.random.default_rng(0)
    rand = lambda s: jnp.asarray(rng.random(s, np.float32), jnp.bfloat16)
    B = 32
    Ci, Cm = 24, 144

    for name in sel:
        if name == "plain":
            x = rand((B, 120, 160, Ci))
            ke = rand((1, 1, Ci, Cm))
            kdw = rand((3, 3, 1, Cm))
            kp = rand((1, 1, Cm, Ci))

            def plain(xx):
                h = jax.nn.silu(conv(xx, ke))
                h = jax.nn.silu(conv(h, kdw, fg=Cm))
                return conv(h, kp) + xx

            t = time_slope(plain, x)
            print(f"plain block (no SE)        {t*1e3:8.3f} ms/b", flush=True)
        elif name == "exp_s2d":
            x = rand((B, 60, 80, 4 * Ci))
            k = rand((1, 1, 4 * Ci, 4 * Cm))
            t = time_slope(lambda xx: jax.nn.silu(conv(xx, k)), x)
            print(f"expand s2d 96->576 1x1     {t*1e3:8.3f} ms/b", flush=True)
        elif name == "dw_dense":
            h = rand((B, 60, 80, 4 * Cm))
            k = rand((3, 3, 4 * Cm, 4 * Cm))
            t = time_slope(lambda xx: jax.nn.silu(conv(xx, k)), h)
            print(f"dw dense s2d 576x576       {t*1e3:8.3f} ms/b", flush=True)
        elif name == "dw_grp":
            h = rand((B, 60, 80, 4 * Cm))
            k = rand((3, 3, 4, 4 * Cm))
            t = time_slope(lambda xx: jax.nn.silu(conv(xx, k, fg=Cm)), h)
            print(f"dw grouped(4) channel-major {t*1e3:7.3f} ms/b", flush=True)
        elif name == "proj_s2d":
            h = rand((B, 60, 80, 4 * Cm))
            k = rand((1, 1, 4 * Cm, 4 * Ci))
            x = rand((B, 60, 80, 4 * Ci))
            t = time_slope(lambda hh, xx: conv(hh, k) + xx, h, x)
            print(f"project s2d 576->96 1x1    {t*1e3:8.3f} ms/b", flush=True)


if __name__ == "__main__":
    main()
