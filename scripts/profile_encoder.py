"""Per-stage encoder timing + depthwise-conv formulation microbenchmarks.

B0 @ 480x640 batch 32 bf16. Stages are timed with synthesized inputs at
their true shapes; the depthwise microbench compares XLA's grouped conv
against a roll-based VPU formulation.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_encoder.py [item ...]
items: stem s0 s1 s2 s3 s4 s5 s6 dw
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from human_instance_segmentation_tpu.models.efficientnet import MBConv


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


# B0 stages at 480x640: (expand, kernel, stride, out_ch, repeats, in_shape)
STAGES = {
    "s0": (1, 3, 1, 16, 1, (32, 240, 320, 32)),
    "s1": (6, 3, 2, 24, 2, (32, 240, 320, 16)),
    "s2": (6, 5, 2, 40, 2, (32, 120, 160, 24)),
    "s3": (6, 3, 2, 80, 3, (32, 60, 80, 40)),
    "s4": (6, 5, 1, 112, 3, (32, 30, 40, 80)),
    "s5": (6, 5, 2, 192, 4, (32, 30, 40, 112)),
    "s6": (6, 3, 1, 320, 1, (32, 15, 20, 192)),
}


def dw_roll(x, w):
    """Depthwise kxk SAME conv as k^2 shifted elementwise multiply-adds."""
    k = w.shape[0]
    r = k // 2
    out = jnp.zeros_like(x)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            sh = jnp.roll(x, (-dy, -dx), axis=(1, 2))
            # zero the wrapped borders
            h, wd = x.shape[1], x.shape[2]
            ri = lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
            ci = lax.broadcasted_iota(jnp.int32, (1, 1, wd, 1), 2)
            ok = (ri + dy >= 0) & (ri + dy < h) & (ci + dx >= 0) & (ci + dx < wd)
            out = out + jnp.where(ok, sh, 0) * w[dy + r, dx + r]
    return out


def main():
    sel = sys.argv[1:] or list(STAGES) + ["stem", "dw"]
    rng = np.random.default_rng(0)

    def rand(shape):
        return jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)

    for name in sel:
        if name == "stem":
            x = rand((32, 480, 640, 3))
            k = rand((3, 3, 3, 32))

            def stem(xx):
                return lax.conv_general_dilated(
                    xx, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

            t = time_slope(stem, x)
            print(f"stem                     {t*1e3:8.3f} ms/b", flush=True)
        elif name in STAGES:
            e, kk, s, oc, rep, in_shape = STAGES[name]
            x = rand(in_shape)
            blocks = []
            ic = in_shape[-1]
            for j in range(rep):
                blk = MBConv(out_channels=oc, expand_ratio=e, kernel=kk,
                             stride=s if j == 0 else 1)
                xin = jnp.zeros(in_shape if j == 0 else
                                (32, in_shape[1] // s, in_shape[2] // s, oc), jnp.float32)
                v = jax.jit(lambda r, xx, _b=blk: _b.init(r, xx, train=False))(
                    jax.random.PRNGKey(j), xin)
                v = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                                 if a.dtype == jnp.float32 else a, v)
                blocks.append((blk, v))

            def run(xx):
                h = xx
                for blk, v in blocks:
                    h = blk.apply(v, h, train=False)
                return h

            t = time_slope(run, x)
            print(f"{name} x{rep:d} {str(in_shape):22s} {t*1e3:8.3f} ms/b", flush=True)
        elif name == "dw":
            for shape, kk in (((32, 240, 320, 96), 3), ((32, 120, 160, 144), 5),
                              ((32, 60, 80, 240), 5)):
                x = rand(shape)
                w = rand((kk, kk, 1, shape[-1]))

                def grouped(xx):
                    return lax.conv_general_dilated(
                        xx, w, (1, 1), "SAME", feature_group_count=shape[-1],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))

                def rolled(xx):
                    return dw_roll(xx, w[:, :, 0])

                tg = time_slope(grouped, x)
                tr = time_slope(rolled, x)
                print(f"dw{kk} {str(shape):22s} grouped {tg*1e3:7.3f}  roll {tr*1e3:7.3f} ms/b",
                      flush=True)


if __name__ == "__main__":
    main()
