"""Encoder front in space-to-depth form: exactness + timing vs the plain ops.

The early encoder (stem 32ch @240x320, s0 16ch, s1-in 16ch) is lane-starved:
C=16/32 tensors pad to 128 lanes in HBM (4-8x physical bytes), and profiling
shows stem+s0+s1 at ~6.2 ms/batch-32 vs <1.5 ms of logical traffic. The fix
mirrors the decoder S2D trick, composed INTO the convs so no relayout pass
exists:
  stem5: the stem conv (3x3 s2) and the S2D(2) regroup as ONE 5x5 s4 conv
         3 -> 128 (dense lanes, MXU-shaped contraction)
  s0:    dw 3x3 as a dense 3x3 conv on the S2D grid (128->128 kernel with
         zero off-phase blocks), SE/project phase-preserving
  s1b0:  expand as phase-preserving 1x1 (64->384), dw-stride-2 as a 2x2
         phase-selecting conv whose output IS the plain half-res tensor
Exactness is bit-level vs the plain path (same zero padding semantics).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_encoder_s2d.py [items]
items: stem s0 s1 chain
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from human_instance_segmentation_tpu.ops.s2d import depth_to_space, space_to_depth


def time_slope(fn, *args, i1=4, i2=16):
    def make_chain(iters):
        @jax.jit
        def chained(*a):
            def body(i, carry):
                ai = list(a)
                ai[0] = ai[0] + carry.astype(ai[0].dtype)
                out = fn(*ai)
                return (jnp.sum(out) * 1e-30).astype(jnp.float32)
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


def conv(x, k, stride=1, padding="SAME"):
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dwconv(x, k, stride=1):
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


# ---- composed-kernel builders (phase-major S2D channel order p*C + c) ----

def stem_s2d_kernel(w):
    """(3,3,3,C) stride-2 stem -> (5,5,3,4C) stride-4 producing S2D(2) out."""
    C = w.shape[-1]
    k5 = np.zeros((5, 5, 3, 4 * C), np.float32)
    for gy in range(2):
        for gx in range(2):
            p = gy * 2 + gx
            k5[2 * gy:2 * gy + 3, 2 * gx:2 * gx + 3, :, p * C:(p + 1) * C] = (
                np.asarray(w, np.float32))
    return jnp.asarray(k5)


def dw_s2d_kernel(w):
    """Depthwise (3,3,1,C) s1 -> dense (3,3,4C,4C) on the S2D(2) grid."""
    C = w.shape[-1]
    k = np.zeros((3, 3, 4 * C, 4 * C), np.float32)
    wf = np.asarray(w[:, :, 0], np.float32)  # (3,3,C)
    for gyo in range(2):
        for gxo in range(2):
            po = gyo * 2 + gxo
            for gyi in range(2):
                for gxi in range(2):
                    pi = gyi * 2 + gxi
                    for ky in range(-1, 2):
                        dy = 2 * ky + gyi - gyo + 1
                        if not 0 <= dy < 3:
                            continue
                        for kx in range(-1, 2):
                            dx = 2 * kx + gxi - gxo + 1
                            if not 0 <= dx < 3:
                                continue
                            for c in range(C):
                                k[ky + 1, kx + 1, pi * C + c, po * C + c] = (
                                    wf[dy, dx, c])
    return jnp.asarray(k)


def pw_s2d_kernel(w):
    """1x1 (1,1,Ci,Co) -> phase-preserving (1,1,4Ci,4Co)."""
    ci, co = w.shape[2], w.shape[3]
    k = np.zeros((1, 1, 4 * ci, 4 * co), np.float32)
    for p in range(4):
        k[0, 0, p * ci:(p + 1) * ci, p * co:(p + 1) * co] = np.asarray(
            w[0, 0], np.float32)
    return jnp.asarray(k)


def dw_s2_exit_kernel(w):
    """Depthwise (3,3,1,C) stride-2 consuming S2D(2) input, emitting the
    PLAIN half-res (..., C) output: a (2,2,4C,C) phase-selecting conv."""
    C = w.shape[-1]
    wf = np.asarray(w[:, :, 0], np.float32)
    k = np.zeros((2, 2, 4 * C, C), np.float32)
    for gyi in range(2):
        for gxi in range(2):
            pi = gyi * 2 + gxi
            for ky in range(2):
                dy = 2 * ky + gyi
                if dy >= 3:
                    continue
                for kx in range(2):
                    dx = 2 * kx + gxi
                    if dx >= 3:
                        continue
                    for c in range(C):
                        k[ky, kx, pi * C + c, c] = wf[dy, dx, c]
    return jnp.asarray(k)


def tile4(v):
    return jnp.tile(v, 4)


def main():
    sel = sys.argv[1:] or ["stem", "s0", "s1", "chain"]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    B = 32

    def rand(*shape, scale=0.2):
        return jnp.asarray(rng.standard_normal(shape) * scale, dt)

    images = jnp.asarray(rng.random((B, 480, 640, 3), np.float32), dt)
    w_stem = rand(3, 3, 3, 32)
    # s0 weights: dw 32 k3 + SE(8) + project 32->16
    w_dw0 = rand(3, 3, 1, 32)
    w_r0, b_r0 = rand(32, 8), rand(8)
    w_e0, b_e0 = rand(8, 32), rand(32)
    w_p0 = rand(1, 1, 32, 16)
    # s1b0: expand 16->96, dw 96 k3 s2, SE(4), project 96->24
    w_ex1 = rand(1, 1, 16, 96)
    w_dw1 = rand(3, 3, 1, 96)
    w_r1, b_r1 = rand(96, 4), rand(4)
    w_e1, b_e1 = rand(4, 96), rand(96)
    w_p1 = rand(1, 1, 96, 24)

    def se(x, wr, br, we, be, mean=None):
        m = jnp.mean(x, axis=(1, 2)) if mean is None else mean
        u = jax.nn.silu(m @ wr + br[None])
        s = jax.nn.sigmoid(u @ we + be[None])
        return x * s[:, None, None, :]

    # ---------------- plain ops ----------------
    def stem_plain(img):
        return jax.nn.silu(conv(img, w_stem, 2))

    def s0_plain(h):                      # (B,240,320,32) -> (B,240,320,16)
        d = jax.nn.silu(dwconv(h, w_dw0))
        d = se(d, w_r0, b_r0, w_e0, b_e0)
        return conv(d, w_p0)

    def s1b0_plain(h):                    # (B,240,320,16) -> (B,120,160,24)
        a = jax.nn.silu(conv(h, w_ex1))
        d = jax.nn.silu(dwconv(a, w_dw1, 2))
        d = se(d, w_r1, b_r1, w_e1, b_e1)
        return conv(d, w_p1)

    # ---------------- s2d ops ----------------
    k_stem5 = stem_s2d_kernel(w_stem)
    k_dw0 = dw_s2d_kernel(w_dw0)
    k_p0 = pw_s2d_kernel(w_p0)
    k_ex1 = pw_s2d_kernel(w_ex1)
    k_dw1x = dw_s2_exit_kernel(w_dw1)

    def stem_s2d(img):                    # -> (B,120,160,128) S2D(2)
        y = lax.conv_general_dilated(
            img, k_stem5.astype(img.dtype), (4, 4), ((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.silu(y)

    def s0_s2d(hs):                       # S2D 128 -> S2D 64
        d = jax.nn.silu(conv(hs, k_dw0))
        m = jnp.mean(d.reshape(d.shape[0], *d.shape[1:3], 4, 32),
                     axis=(1, 2, 3))
        u = jax.nn.silu(m @ w_r0 + b_r0[None])
        s = jax.nn.sigmoid(u @ w_e0 + b_e0[None])
        d = d * jnp.tile(s.astype(d.dtype), (1, 4))[:, None, None, :]
        return conv(d, k_p0)

    def s1b0_s2d(hs):                     # S2D 64 -> plain (B,120,160,24)
        a = jax.nn.silu(conv(hs, k_ex1))  # (B,120,160,384)
        d = lax.conv_general_dilated(
            a, k_dw1x.astype(a.dtype), (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        d = jax.nn.silu(d)                # (B,120,160,96) plain
        d = se(d, w_r1, b_r1, w_e1, b_e1)
        return conv(d, w_p1)

    def check(name, a, b, atol=2e-2):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        print(f"  {name}: maxdiff {d.max():.3e} mean|ref| "
              f"{np.abs(np.asarray(a, np.float32)).mean():.3f}", flush=True)

    if "stem" in sel:
        a = space_to_depth(jax.jit(stem_plain)(images[:2]), 2)
        b = jax.jit(stem_s2d)(images[:2])
        check("stem", a, b)
        print(f"stem  plain {time_slope(stem_plain, images)*1e3:7.3f} ms/b  "
              f"s2d {time_slope(stem_s2d, images)*1e3:7.3f} ms/b", flush=True)

    h_plain = jax.jit(stem_plain)(images)
    h_s2d = jax.jit(stem_s2d)(images)

    if "s0" in sel:
        a = space_to_depth(jax.jit(s0_plain)(h_plain[:2]), 2)
        b = jax.jit(s0_s2d)(h_s2d[:2])
        check("s0", a, b)
        print(f"s0    plain {time_slope(s0_plain, h_plain)*1e3:7.3f} ms/b  "
              f"s2d {time_slope(s0_s2d, h_s2d)*1e3:7.3f} ms/b", flush=True)

    if "s1" in sel:
        g_plain = jax.jit(s0_plain)(h_plain)
        g_s2d = jax.jit(s0_s2d)(h_s2d)
        a = jax.jit(s1b0_plain)(g_plain[:2])
        b = jax.jit(s1b0_s2d)(g_s2d[:2])
        check("s1b0", a, b)
        print(f"s1b0  plain {time_slope(s1b0_plain, g_plain)*1e3:7.3f} ms/b  "
              f"s2d {time_slope(s1b0_s2d, g_s2d)*1e3:7.3f} ms/b", flush=True)

    if "chain" in sel:
        def chain_plain(img):
            return s1b0_plain(s0_plain(stem_plain(img)))

        def chain_s2d(img):
            return s1b0_s2d(s0_s2d(stem_s2d(img)))

        a = jax.jit(chain_plain)(images[:2])
        b = jax.jit(chain_s2d)(images[:2])
        check("chain", a, b)
        print(f"chain plain {time_slope(chain_plain, images)*1e3:7.3f} ms/b  "
              f"s2d {time_slope(chain_s2d, images)*1e3:7.3f} ms/b", flush=True)

    if "h1" in sel:
        # hybrid: S2D stem+s0, one depth_to_space, plain s1b0
        def chain_h1(img):
            return s1b0_plain(depth_to_space(s0_s2d(stem_s2d(img)), 2))

        a = jax.jit(chain_h1)(images[:2])
        b = jax.jit(lambda im: s1b0_plain(s0_plain(stem_plain(im))))(images[:2])
        check("h1", a, b)
        print(f"h1 (s2d front + d2s + plain s1b0) "
              f"{time_slope(chain_h1, images)*1e3:7.3f} ms/b", flush=True)

    if "h2" in sel:
        # hybrid: expand S2D->plain via c-major order + grouped dw exit
        # c-major expand kernel: in p*16+ci -> out c*4+p
        kex = np.zeros((1, 1, 64, 384), np.float32)
        wex = np.asarray(w_ex1[0, 0], np.float32)
        for p in range(4):
            for co in range(96):
                kex[0, 0, p * 16:(p + 1) * 16, co * 4 + p] = wex[:, co]
        kexj = jnp.asarray(kex)
        # grouped dw exit: group c consumes phases of channel c (c-major)
        wf = np.asarray(w_dw1[:, :, 0], np.float32)
        kg = np.zeros((2, 2, 4, 96), np.float32)
        for gyi in range(2):
            for gxi in range(2):
                pi = gyi * 2 + gxi
                for ky in range(2):
                    dy = 2 * ky + gyi
                    if dy >= 3:
                        continue
                    for kx in range(2):
                        dx = 2 * kx + gxi
                        if dx >= 3:
                            continue
                        kg[ky, kx, pi, :] = wf[dy, dx, :]
        kgj = jnp.asarray(kg)

        def s1b0_h2(hs):
            a = jax.nn.silu(conv(hs, kexj))   # (B,120,160,384) c-major
            d = lax.conv_general_dilated(
                a, kgj.astype(a.dtype), (1, 1), ((0, 1), (0, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=96)
            d = jax.nn.silu(d)
            d = se(d, w_r1, b_r1, w_e1, b_e1)
            return conv(d, w_p1)

        g_plain = jax.jit(lambda im: s0_plain(stem_plain(im)))(images)
        g_s2d = jax.jit(lambda im: s0_s2d(stem_s2d(im)))(images)
        a = jax.jit(s1b0_plain)(g_plain[:2])
        b = jax.jit(s1b0_h2)(g_s2d[:2])
        check("h2", a, b)
        print(f"s1b0 h2 (grouped) {time_slope(s1b0_h2, g_s2d)*1e3:7.3f} ms/b",
              flush=True)


if __name__ == "__main__":
    main()
