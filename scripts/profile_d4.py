"""Isolate decoder-4's fused-block cost: bare composed convs vs border logic.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_d4.py [item ...]
items: conv0 conv0b conv01 convfull block strips
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_instance_segmentation_tpu.ops.s2d import (
    _conv, compose_up_conv_kernel, conv3x3_s2d, conv_up_s2d, space_to_depth,
    upsample_2x_bilinear)


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


def main():
    sel = sys.argv[1:] or ["conv0", "conv0b", "conv01", "convfull", "strips"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((32, 240, 320, 32), np.float32), jnp.bfloat16)
    k0 = jnp.asarray(rng.random((3, 3, 32, 16), np.float32), jnp.bfloat16)
    k1 = jnp.asarray(rng.random((3, 3, 16, 16), np.float32), jnp.bfloat16)

    items = {}
    # composed up-conv, interior only (no border fix)
    items["conv0"] = lambda xx: _conv(xx, compose_up_conv_kernel(k0), "SAME")
    # + second conv in s2d form
    items["conv0b"] = lambda xx: conv3x3_s2d(
        _conv(xx, compose_up_conv_kernel(k0), "SAME"), k1)
    # full conv_up (with border fix) only
    items["conv01"] = lambda xx: conv_up_s2d(xx, k0)
    # full conv_up + conv1 == the block minus bn/relu
    items["convfull"] = lambda xx: conv3x3_s2d(conv_up_s2d(xx, k0), k1)
    items["convfull_bar"] = lambda xx: conv3x3_s2d(
        jax.lax.optimization_barrier(conv_up_s2d(xx, k0)), k1)

    def strips(xx):
        def strip(xs):
            return _conv(upsample_2x_bilinear(xs), k0, "SAME")
        top = space_to_depth(strip(xx[:, :2])[:, :2], 2)
        bot = space_to_depth(strip(xx[:, -2:])[:, -2:], 2)
        left = space_to_depth(strip(xx[:, :, :2])[:, :, :2], 2)
        right = space_to_depth(strip(xx[:, :, -2:])[:, :, -2:], 2)
        return top, bot, left, right

    items["strips"] = strips

    for name in sel:
        t = time_slope(items[name], x)
        print(f"{name:10s} {t*1e3:8.3f} ms/b", flush=True)


def extra():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((32, 240, 320, 32), np.float32), jnp.bfloat16)
    k0 = jnp.asarray(rng.random((3, 3, 32, 16), np.float32), jnp.bfloat16)

    def strip(xs):
        return _conv(upsample_2x_bilinear(xs), k0, "SAME")

    def rows_only(xx):
        top = space_to_depth(strip(xx[:, :2])[:, :2], 2)
        bot = space_to_depth(strip(xx[:, -2:])[:, -2:], 2)
        return top, bot

    def cols_only(xx):
        left = space_to_depth(strip(xx[:, :, :2])[:, :, :2], 2)
        right = space_to_depth(strip(xx[:, :, -2:])[:, :, -2:], 2)
        return left, right

    def rows_batched(xx):
        # both row strips as one conv on a batch-stacked input
        s = jnp.concatenate([xx[:, :2], xx[:, -2:]], axis=0)
        y = strip(s)
        top = space_to_depth(y[:32, :2], 2)
        bot = space_to_depth(y[32:, 2:], 2)
        return top, bot

    def cols_via_transpose(xx):
        xt = jnp.transpose(xx, (0, 2, 1, 3))
        s = jnp.concatenate([xt[:, :2], xt[:, -2:]], axis=0)
        y = strip(s)   # conv is symmetric under transpose only if kernel transposed!
        return y

    def merge_only(y, top, bot, left, right):
        hc, wc = y.shape[1], y.shape[2]
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (1, hc, 1, 1), 1)
        col_ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wc, 1), 2)
        y = jnp.where(row_ix == 0, top, jnp.where(row_ix == hc - 1, bot, y))
        return jnp.where(col_ix == 0, left, jnp.where(col_ix == wc - 1, right, y))

    y0 = jnp.asarray(rng.random((32, 240, 320, 64), np.float32), jnp.bfloat16)
    top = jnp.asarray(rng.random((32, 1, 320, 64), np.float32), jnp.bfloat16)
    bot = jnp.asarray(rng.random((32, 1, 320, 64), np.float32), jnp.bfloat16)
    left = jnp.asarray(rng.random((32, 240, 1, 64), np.float32), jnp.bfloat16)
    right = jnp.asarray(rng.random((32, 240, 1, 64), np.float32), jnp.bfloat16)
    t = time_slope(merge_only, y0, top, bot, left, right)
    print(f"merge_only       {t*1e3:8.3f} ms/b", flush=True)

    def strips4(xx):
        return rows_only(xx) + cols_only(xx)
    t = time_slope(strips4, x)
    print(f"strips4          {t*1e3:8.3f} ms/b", flush=True)

    def strips4_bar(xx):
        r = rows_only(xx)
        r = jax.lax.optimization_barrier(r)
        return r + cols_only(xx)
    t = time_slope(strips4_bar, x)
    print(f"strips4_bar      {t*1e3:8.3f} ms/b", flush=True)

    def strips4_bar2(xx):
        a = jax.lax.optimization_barrier(strip(xx[:, :2]))
        b = jax.lax.optimization_barrier(strip(xx[:, -2:]))
        c = jax.lax.optimization_barrier(strip(xx[:, :, :2]))
        d = strip(xx[:, :, -2:])
        return (space_to_depth(a[:, :2], 2), space_to_depth(b[:, 2:], 2),
                space_to_depth(c[:, :, :2], 2), space_to_depth(d[:, :, 2:], 2))
    t = time_slope(strips4_bar2, x)
    print(f"strips4_bar2     {t*1e3:8.3f} ms/b", flush=True)

    def strips_one(xx):
        b, h, w, ci = xx.shape
        xt = jnp.transpose(xx, (0, 2, 1, 3))  # (B, W, H, C)
        pad = w - h
        rows = jnp.concatenate([xx[:, :2], xx[:, -2:]], axis=0)         # (2B,2,W,C)
        colsT = jnp.concatenate([xt[:, :2], xt[:, -2:]], axis=0)        # (2B,2,H,C)
        colsT = jnp.pad(colsT, ((0, 0), (0, 0), (0, pad), (0, 0)))
        s = jnp.concatenate([rows, colsT], axis=0)                      # (4B,2,W,C)
        # transposed strips need the spatially-transposed kernel; rows the plain
        u = upsample_2x_bilinear(s)
        yr = _conv(u[:2 * b], k0, "SAME")
        yc = _conv(u[2 * b:], jnp.transpose(k0, (1, 0, 2, 3)), "SAME")
        top = space_to_depth(yr[:b, :2], 2)
        bot = space_to_depth(yr[b:, 2:], 2)
        left = space_to_depth(jnp.transpose(yc[:b, :2, :2 * h], (0, 2, 1, 3)), 2)
        right = space_to_depth(jnp.transpose(yc[b:, 2:4, :2 * h], (0, 2, 1, 3)), 2)
        return top, bot, left, right
    t = time_slope(strips_one, x)
    print(f"strips_one       {t*1e3:8.3f} ms/b", flush=True)

    def strips_one2(xx):
        r = strips_one(xx)
        y = _conv(xx, compose_up_conv_kernel(k0), "SAME")
        hc, wc = y.shape[1], y.shape[2]
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (1, hc, 1, 1), 1)
        col_ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wc, 1), 2)
        top, bot, left, right = r
        y = jnp.where(row_ix == 0, top, jnp.where(row_ix == hc - 1, bot, y))
        return jnp.where(col_ix == 0, left, jnp.where(col_ix == wc - 1, right, y))
    t = time_slope(strips_one2, x)
    print(f"conv_up_v3       {t*1e3:8.3f} ms/b", flush=True)

    def combo_rc(xx):
        return rows_only(xx), cols_via_transpose(xx)
    t = time_slope(combo_rc, x)
    print(f"rows+colsT       {t*1e3:8.3f} ms/b", flush=True)

    def rows_pair(xx):
        top = space_to_depth(strip(xx[:, :2])[:, :2], 2)
        bot = space_to_depth(strip(xx[:, -2:])[:, -2:], 2)
        return top, bot
    def combo_rr(xx):
        return rows_pair(xx), rows_pair(xx + 1)
    t = time_slope(combo_rr, x)
    print(f"rows+rows        {t*1e3:8.3f} ms/b", flush=True)

    def cols_pairT(xx):
        xt = jnp.transpose(xx, (0, 2, 1, 3))
        s = jnp.concatenate([xt[:, :2], xt[:, -2:]], axis=0)
        return _conv(upsample_2x_bilinear(s), jnp.transpose(k0, (1, 0, 2, 3)), "SAME")
    def combo_rc2(xx):
        return rows_pair(xx), cols_pairT(xx)
    t = time_slope(combo_rc2, x)
    print(f"rows+colsT2      {t*1e3:8.3f} ms/b", flush=True)





if __name__ == "__main__":
    import sys
    (extra if "extra" in sys.argv else main)()
