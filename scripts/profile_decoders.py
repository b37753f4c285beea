"""Time each stage-1 decoder block (deployed form) with synthesized inputs.

Input shapes are static (B0, 480x640, batch 32), so the blocks are timed in
isolation without paying the encoder compile. Params are freshly initialised
— conv timing does not depend on weight values.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_decoders.py [item ...]
items: d0 d1 d2 d3 d4 head d2s
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.models.unet import DecoderBlock
from human_instance_segmentation_tpu.ops.s2d import (
    conv3x3_s2d, depth_to_space, tile_channel_params)


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


# (name, features, fused, in_shape, skip_shape) for B0 480x640 batch 32
ITEMS = {
    "d0": (256, False, (32, 15, 20, 320), (32, 30, 40, 112)),
    "d1": (128, False, (32, 30, 40, 256), (32, 60, 80, 40)),
    "d2": (64, True, (32, 60, 80, 128), (32, 120, 160, 24)),
    "d3": (32, True, (32, 120, 160, 64), (32, 240, 320, 32)),
    "d4": (16, True, (32, 240, 320, 32), None),
}


def main():
    sel = sys.argv[1:] or ["d0", "d1", "d2", "d3", "d4", "head", "d2s"]
    rng = np.random.default_rng(0)

    def rand(shape):
        return jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)

    for name in sel:
        if name in ITEMS:
            feat, fused, in_shape, skip_shape = ITEMS[name]
            blk = DecoderBlock(features=feat, fused=fused)
            h = rand(in_shape)
            skip = rand(skip_shape) if skip_shape else None
            v = jax.jit(lambda r, x, s: blk.init(r, x, s, train=False))(
                jax.random.PRNGKey(0), h.astype(jnp.float32),
                None if skip is None else skip.astype(jnp.float32))
            v = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)

            def run(vv, x, s=skip, _b=blk):
                return _b.apply(vv, x, s, train=False)

            t = time_slope(run, v, h, perturb=1)
            print(f"{name} fused={int(fused)} in{in_shape} "
                  f"skip{skip_shape}  {t*1e3:8.3f} ms/b", flush=True)
        elif name == "head":
            h = rand((32, 240, 320, 64))
            k = rand((3, 3, 16, 1))
            bb = rand((1,))

            def run_head(x):
                return depth_to_space(conv3x3_s2d(x, k) + tile_channel_params(bb), 2)

            t = time_slope(run_head, h)
            print(f"head s2d in(32,240,320,64)  {t*1e3:8.3f} ms/b", flush=True)
        elif name == "d2s":
            h = rand((32, 240, 320, 64))
            t = time_slope(lambda x: depth_to_space(x, 2), h)
            print(f"depth_to_space 240x320x64  {t*1e3:8.3f} ms/b", flush=True)


def chain():
    """Time the fused tail chain d2->d3->d4->head vs its parts, with and
    without inter-stage barriers."""
    import sys
    rng = np.random.default_rng(0)

    def rand(shape):
        return jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)

    h_in = rand((32, 60, 80, 128))
    skips = {2: rand((32, 120, 160, 24)), 3: rand((32, 240, 320, 32)), 4: None}
    blocks = {}
    for i, (feat, _, in_shape, skip_shape) in (
            (2, ITEMS["d2"]), (3, ITEMS["d3"]), (4, ITEMS["d4"])):
        blk = DecoderBlock(features=feat, fused=True)
        hjnp = jnp.zeros(in_shape, jnp.float32)
        sj = None if skip_shape is None else jnp.zeros(skip_shape, jnp.float32)
        v = jax.jit(lambda r, x, s, _b=blk: _b.init(r, x, s, train=False))(
            jax.random.PRNGKey(i), hjnp, sj)
        v = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                         if a.dtype == jnp.float32 else a, v)
        blocks[i] = (blk, v)
    k = rand((3, 3, 16, 1))
    bb = rand((1,))

    def run(x, barrier):
        h = x
        for i in (2, 3, 4):
            blk, v = blocks[i]
            h = blk.apply(v, h, skips[i], train=False)
            if i < 4:
                h = depth_to_space(h, 2)
            if barrier:
                h = jax.lax.optimization_barrier(h)
        y = conv3x3_s2d(h, k) + tile_channel_params(bb)
        return depth_to_space(y, 2)

    which = [bool(int(a)) for a in sys.argv[2:]] or [False, True]
    for barrier in which:
        t = time_slope(lambda x, b=barrier: run(x, b), h_in)
        print(f"tail chain barrier={int(barrier)}  {t*1e3:8.3f} ms/b", flush=True)


if __name__ == "__main__":
    import sys
    (chain if "chain" in sys.argv else main)()
