"""Round-4 probe: (a) Mosaic s8xs8->s32 dot support, (b) XLA conv timings
at the shapes the int8 lowering collapses at (decoder4 / encoder), as the
baseline for the Pallas int8 conv kernel.

Run: PYTHONPATH=/root/repo python -u scripts/exp_r4_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def time_slope(fn, *args, i1=4, i2=16):
    def mk(iters):
        @jax.jit
        def chained(*a):
            def body(i, carry):
                ai = list(a)
                if jnp.issubdtype(ai[0].dtype, jnp.floating):
                    ai[0] = ai[0] + carry.astype(ai[0].dtype)
                else:
                    # integer inputs: keep a data dependency on the carry
                    # without changing values (carry is ~0, never > 1e30)
                    ai[0] = ai[0] + (carry > 1e30).astype(ai[0].dtype)
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


def probe_mosaic_int8():
    """Minimal Pallas kernel doing an s8xs8->s32 dot."""

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    a = jnp.ones((256, 256), jnp.int8)
    b = jnp.ones((256, 256), jnp.int8)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        print("mosaic s8xs8->s32 dot: OK,", int(out[0, 0]), flush=True)
        return True
    except Exception as e:
        print("mosaic s8xs8->s32 dot: FAIL:", str(e)[:500], flush=True)
        return False


def bench_pallas_matmul_int8():
    """Throughput of a big int8 pallas matmul vs bf16 (peak check).

    (M, K) @ (K, N) tiled 512x512x512.
    """
    M = N = K = 4096
    TM = TN = 512

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def mm_int8(a, b):
        return pl.pallas_call(
            kernel,
            grid=(M // TM, N // TN),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(a, b)

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    t = time_slope(mm_int8, a8, b8)
    flops = 2 * M * N * K
    print(f"pallas int8 matmul 4096^3: {t*1e3:.3f} ms = {flops/t/1e12:.1f} TOP/s", flush=True)

    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)
    t = time_slope(lambda a, b: a @ b, abf, bbf)
    print(f"XLA bf16 matmul 4096^3:   {t*1e3:.3f} ms = {flops/t/1e12:.1f} TFLOP/s", flush=True)

    t = time_slope(
        lambda a, b: lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32), a8, b8)
    print(f"XLA int8 matmul 4096^3:   {t*1e3:.3f} ms = {flops/t/1e12:.1f} TOP/s", flush=True)


def bench_xla_convs():
    """The collapsing shapes: d4 S2D conv (240x320, 64ch), d3 (120x160, 128),
    encoder-ish 1x1s."""
    rng = np.random.default_rng(0)
    b = 32
    shapes = [
        ("d4 conv1 3x3 (240,320,64->64)", (b, 240, 320, 64), (3, 3, 64, 64)),
        ("d3 conv1 3x3 (120,160,128->128)", (b, 120, 160, 128), (3, 3, 128, 128)),
        ("d4 composed up 3x3 (240,320,32->64)", (b, 240, 320, 32), (3, 3, 32, 64)),
        ("enc 1x1 (120,160,96->24)", (b, 120, 160, 96), (1, 1, 96, 24)),
        ("enc 1x1 (60,80,144->240)", (b, 60, 80, 144), (1, 1, 144, 240)),
    ]
    for name, xs, ks in shapes:
        x = jnp.asarray(rng.random(xs), jnp.bfloat16)
        w = jnp.asarray(rng.random(ks) - 0.5, jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 127, xs), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 127, ks), jnp.int8)

        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def conv8(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        tb = time_slope(conv, x, w) * 1e3
        t8 = time_slope(conv8, x8, w8) * 1e3
        flops = 2 * np.prod(xs) * ks[0] * ks[1] * ks[3]
        print(f"{name:42s} bf16 {tb:7.3f} ms ({flops/tb/1e9:6.1f} TF/s)  "
              f"int8-xla {t8:7.3f} ms", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    ok = probe_mosaic_int8()
    if ok:
        bench_pallas_matmul_int8()
    bench_xla_convs()
