"""Break down the fused-tail and encoder costs after the S2D rewrite.

Times the sub-ops of the fused decoder blocks (composed up-conv, expanded
conv, D2S relayout, border strips) and the encoder's stem vs blocks, to rank
the next optimisation targets.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_fused_parts.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.ops.s2d import (
    conv3x3_s2d, conv_up_s2d, depth_to_space, space_to_depth,
    compose_up_conv_kernel, _conv)


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


def report(name, secs):
    print(f"{name:44s} {secs*1e3:8.3f} ms/b", flush=True)


def main():
    b = 32
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.random(shape, np.float32), dt)

    # d4 shapes: input 240x320x32, conv1 -> 4*16 at 240x320, conv2 s2d 64ch
    x4 = mk((b, 240, 320, 32))
    w4a = mk((3, 3, 32, 16))
    report("d4 conv_up_s2d (borders on)", time_slope(lambda x: conv_up_s2d(x, w4a), x4))

    def conv_up_noborder(x, w):
        K = compose_up_conv_kernel(w)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return _conv(xp, K, "VALID")

    report("d4 conv_up (no border fix)", time_slope(lambda x: conv_up_noborder(x, w4a), x4))

    y4 = mk((b, 240, 320, 64))
    w4b = mk((3, 3, 16, 16))
    report("d4 conv3x3_s2d 64->64", time_slope(lambda x: conv3x3_s2d(x, w4b), y4))
    wseg = mk((3, 3, 16, 1))
    report("seg conv3x3_s2d 64->4", time_slope(lambda x: conv3x3_s2d(x, wseg), y4))
    report("d2s of (240,320,64)", time_slope(lambda x: depth_to_space(x, 2), y4))

    # d3 shapes: input 120x160x64, skip s2 (240,320,32)
    x3 = mk((b, 120, 160, 64))
    w3a = mk((3, 3, 64, 32))
    report("d3 conv_up_s2d", time_slope(lambda x: conv_up_s2d(x, w3a), x3))
    skip = mk((b, 240, 320, 32))
    w3s = mk((3, 3, 32, 32))
    report("d3 skip s2d+conv3x3_s2d 128->128",
           time_slope(lambda s: conv3x3_s2d(space_to_depth(s, 2), w3s), skip))
    y3 = mk((b, 120, 160, 128))
    w3b = mk((3, 3, 32, 32))
    report("d3 conv3x3_s2d 128->128", time_slope(lambda x: conv3x3_s2d(x, w3b), y3))
    report("d2s of (120,160,128)", time_slope(lambda x: depth_to_space(x, 2), y3))

    # encoder split: stem vs rest
    from human_instance_segmentation_tpu.models.efficientnet import EfficientNetEncoder
    from human_instance_segmentation_tpu.inference import cast_floating

    enc = EfficientNetEncoder(variant="b0")
    images = mk((b, 480, 640, 3))
    ev = jax.jit(lambda r: enc.init(r, jnp.zeros((1, 480, 640, 3)), train=False))(
        jax.random.PRNGKey(0))
    ev = cast_floating(ev, dt)
    report("encoder full", time_slope(lambda x: enc.apply(ev, x, train=False), images))

    # bare stem: conv 3->32 stride 2 at 480x640
    wstem = mk((3, 3, 3, 32))
    report("bare stem conv 3->32 s2", time_slope(
        lambda x: jax.lax.conv_general_dilated(
            x, wstem, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")), images))

    # stage0 depthwise at 240x320x32
    xs0 = mk((b, 240, 320, 32))
    wdw = mk((3, 3, 1, 32))
    report("bare dw conv 32 @240x320", time_slope(
        lambda x: jax.lax.conv_general_dilated(
            x, wdw, (1, 1), "SAME", feature_group_count=32,
            dimension_numbers=("NHWC", "HWIO", "NHWC")), xs0))


if __name__ == "__main__":
    main()
