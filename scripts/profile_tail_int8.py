"""Isolated decoder-block timing: bf16 vs int8 composed convs (static scales).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_tail_int8.py [d2 d3 d4 head]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.models.unet import DecoderBlock
from human_instance_segmentation_tpu.ops.quant import int8_serving
from human_instance_segmentation_tpu.ops.s2d import conv3x3_s2d_to_n4


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


ITEMS = {
    "d2": (64, (32, 60, 80, 128), (32, 120, 160, 24)),
    "d3": (32, (32, 120, 160, 64), (32, 240, 320, 32)),
    "d4": (16, (32, 240, 320, 32), None),
}


def main():
    sel = sys.argv[1:] or ["d2", "d3", "d4", "head"]
    rng = np.random.default_rng(0)
    rand = lambda s: jnp.asarray(rng.random(s, np.float32), jnp.bfloat16)

    for name in sel:
        if name == "head":
            h = rand((32, 240, 320, 64))
            k = rand((3, 3, 16, 1))
            for mode, qs in (("bf16", None), ("int8", 0.01)):
                t = time_slope(lambda x, _q=qs: conv3x3_s2d_to_n4(h * 0 + x, k, qscale=_q), h)
                print(f"head_n4 {mode}  {t*1e3:8.3f} ms/b", flush=True)
            continue
        feat, in_shape, skip_shape = ITEMS[name]
        blk = DecoderBlock(features=feat, fused=True)
        h = rand(in_shape)
        skip = rand(skip_shape) if skip_shape else None
        v = jax.jit(lambda r, x, s: blk.init(r, x, s, train=False))(
            jax.random.PRNGKey(0), h.astype(jnp.float32),
            None if skip is None else skip.astype(jnp.float32))
        v = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
        scales = {"#x": 0.01, "#skip": 0.01, "#mid": 0.01}

        def run_f(vv, x, s=skip, _b=blk):
            return _b.apply(vv, x, s, train=False)

        def run_q(vv, x, s=skip, _b=blk):
            with int8_serving(True, scales):
                return _b.apply(vv, x, s, train=False)

        tf = time_slope(run_f, v, h, perturb=1)
        tq = time_slope(run_q, v, h, perturb=1)
        print(f"{name} bf16 {tf*1e3:8.3f}  int8 {tq*1e3:8.3f} ms/b", flush=True)


if __name__ == "__main__":
    main()
