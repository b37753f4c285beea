"""Round-4: int8 Pallas fused tail (ops/pallas_tail_q.py) — accuracy + speed.

accuracy (CPU, interpret): int8 interior vs the f32 oracle on small shapes.
speed (TPU): flagship d4+head shapes (B=32, 120x160 cells, Ci=32) vs the
XLA bf16 chain (8.58 ms, scripts/exp_r4_d4int8.py) and the bf16 Pallas
tail (18.1 ms, ops/pallas_tail.py header).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r4_ptailq.py [cpu|tpu]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def make_inputs(rng, b, hc, wc, ci, co, dtype):
    import jax.numpy as jnp
    x = jnp.asarray(rng.standard_normal((b, hc, wc, 4 * ci)) * 0.5, dtype)
    k0 = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.2, jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, co, co)) * 0.2, jnp.float32)
    kh = jnp.asarray(rng.standard_normal((3, 3, co, 1)) * 0.2, jnp.float32)
    bh = jnp.asarray([0.1], jnp.float32)
    bn = lambda: tuple(jnp.asarray(v, jnp.float32) for v in (
        1.0 + 0.1 * rng.standard_normal(co),
        0.1 * rng.standard_normal(co),
        0.05 * rng.standard_normal(co),
        1.0 + 0.2 * rng.random(co)))
    return x, k0, bn(), k1, bn(), kh, bh


def scales_for(x, k0, bn0, k1, bn1, kh, bh):
    """Oracle-run calibration: amax of x / mid / head activations."""
    import jax.numpy as jnp
    from jax import lax
    from human_instance_segmentation_tpu.ops.s2d import depth_to_space
    from human_instance_segmentation_tpu.ops.sampling import upsample_2x_bilinear

    conv = lambda t, k: lax.conv_general_dilated(
        t, k.astype(t.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bnr = lambda t, p: jnp.maximum(
        (t - p[2].astype(t.dtype)) * lax.rsqrt(p[3].astype(t.dtype) + 1e-5)
        * p[0].astype(t.dtype) + p[1].astype(t.dtype), 0)
    xp = depth_to_space(x, 2).astype(jnp.float32)
    y0 = bnr(conv(upsample_2x_bilinear(xp), k0), bn0)
    y1 = bnr(conv(y0, k1), bn1)
    amax = lambda t: float(jnp.max(jnp.abs(t)))
    return (max(amax(x), 1e-6) / 127.0, max(amax(y0), 1e-6) / 127.0,
            max(amax(y1), 1e-6) / 127.0)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if mode == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from human_instance_segmentation_tpu.ops.pallas_tail import (
        tail_reference, tail_with_borders)
    from human_instance_segmentation_tpu.ops.pallas_tail_q import (
        tail_with_borders_q)
    from human_instance_segmentation_tpu.ops.s2d import depth_to_space

    rng = np.random.default_rng(0)

    if mode == "cpu":
        b, hc, wc, ci, co = 2, 16, 16, 8, 16
        x, k0, bn0, k1, bn1, kh, bh = make_inputs(
            rng, b, hc, wc, ci, co, jnp.float32)
        sx, sm, sh = scales_for(x, k0, bn0, k1, bn1, kh, bh)
        oracle = tail_reference(
            depth_to_space(x, 2), k0, bn0, k1, bn1, kh, bh)
        got = tail_with_borders_q(x, k0, bn0, k1, bn1, kh, bh, sx, sm, sh,
                                  interpret=True)
        scale = float(jnp.max(jnp.abs(oracle)))
        err = np.asarray(jnp.abs(got.astype(jnp.float32) - oracle)) / scale
        print(f"int8 tail rel-err: interior max {err[:, 6:-6, 6:-6].max():.4f}"
              f" mean {err.mean():.5f}; border max "
              f"{max(err[:, :6].max(), err[:, -6:].max(), err[:, :, :6].max(), err[:, :, -6:].max()):.4f}",
              flush=True)
        # s8 fast path: pre-quantized input must produce identical interior
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        got2 = tail_with_borders_q(xq, k0, bn0, k1, bn1, kh, bh, sx, sm, sh,
                                   interpret=True)
        d = float(jnp.max(jnp.abs(got2[:, 6:-6, 6:-6].astype(jnp.float32)
                                  - got[:, 6:-6, 6:-6].astype(jnp.float32))))
        print(f"s8-input interior vs bf16-input: maxdiff {d:.6f}", flush=True)
        assert err[:, 6:-6, 6:-6].max() < 0.05, "int8 interior off"
        print("CPU interpret check OK", flush=True)
        return

    # ---- TPU timing at flagship shapes
    import jax
    b, hc, wc, ci, co = 32, 120, 160, 32, 16
    x, k0, bn0, k1, bn1, kh, bh = make_inputs(
        rng, b, hc, wc, ci, co, jnp.bfloat16)
    sx, sm, sh = scales_for(x.astype(jnp.float32), k0, bn0, k1, bn1, kh, bh)

    def time_slope(fn, *args, i1=4, i2=16):
        def mk(iters):
            @jax.jit
            def chained(*a):
                def body(i, carry):
                    ai = list(a)
                    ai[0] = ai[0] + carry.astype(ai[0].dtype)
                    out = fn(*ai)
                    return (jnp.sum(out) * 1e-30).astype(jnp.float32)
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

    fq = lambda t: tail_with_borders_q(
        t, k0, bn0, k1, bn1, kh, bh, sx, sm, sh, interpret=False)
    fb = lambda t: tail_with_borders(t, k0, bn0, k1, bn1, kh, bh,
                                     interpret=False)
    t = time_slope(fq, x) * 1e3
    print(f"int8 pallas tail   {t:8.3f} ms/b", flush=True)
    t = time_slope(fb, x) * 1e3
    print(f"bf16 pallas tail   {t:8.3f} ms/b", flush=True)
    # accuracy spot check on TPU as well
    oracle = tail_reference(
        depth_to_space(x.astype(jnp.float32), 2), k0, bn0, k1, bn1, kh, bh)
    got = fq(x)
    scale = float(jnp.max(jnp.abs(oracle)))
    err = np.asarray(jnp.abs(got.astype(jnp.float32) - oracle)) / scale
    print(f"rel-err interior max {err[:, 6:-6, 6:-6].max():.4f} "
          f"mean {err.mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
