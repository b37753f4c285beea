"""Fused MBConv Pallas kernel (ops/pallas_mbconv.py): exactness vs the plain
Flax MBConv across expand/stride/kernel variants, interpret mode on CPU.

Status: experimental — compiles and matches on the real chip (bf16 delta
~6e-3 from f32-in-kernel accumulation) but does not yet beat XLA's lowering
at B0 encoder shapes (5.1 vs 2.7 ms for s0 at batch 32); kept off by
default (EfficientNetEncoder.fused_blocks=0). See the module docstring for
the Mosaic lowering constraints that shaped the design.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.models.efficientnet import MBConv

CASES = [
    dict(out_channels=16, expand_ratio=1, kernel=3, stride=1, shape=(2, 48, 32, 16)),
    dict(out_channels=24, expand_ratio=6, kernel=3, stride=2, shape=(2, 48, 32, 16)),
    dict(out_channels=24, expand_ratio=6, kernel=3, stride=1, shape=(2, 16, 16, 24)),
    dict(out_channels=40, expand_ratio=6, kernel=5, stride=2, shape=(2, 48, 64, 24)),
    dict(out_channels=40, expand_ratio=6, kernel=5, stride=1, shape=(2, 48, 64, 40)),
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"k{c['kernel']}s{c['stride']}e{c['expand_ratio']}")
def test_fused_mbconv_matches_plain(case):
    case = dict(case)
    shape = case.pop("shape")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    plain = MBConv(**case, fused=False)
    fused = MBConv(**case, fused=True)
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    # randomise BN stats so the serving-time fold is actually exercised
    fl = flax.traverse_util.flatten_dict(v)
    for k in fl:
        if k[-1] == "mean":
            fl[k] = jnp.asarray(rng.standard_normal(fl[k].shape), jnp.float32) * 0.1
        if k[-1] == "var":
            fl[k] = jnp.abs(jnp.asarray(rng.standard_normal(fl[k].shape), jnp.float32)) + 0.5
    v = flax.traverse_util.unflatten_dict(fl)
    yp = plain.apply(v, x, train=False)
    yf = fused.apply(v, x, train=False)
    assert yp.shape == yf.shape
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yf), atol=2e-5)


def test_fused_is_train_noop():
    # train=True must ignore the fused flag (batch stats, dropout paths)
    case = dict(out_channels=24, expand_ratio=6, kernel=3, stride=1)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 16, 24)), jnp.float32)
    fused = MBConv(**case, fused=True)
    v = fused.init(jax.random.PRNGKey(0), x, train=False)
    y, _ = fused.apply(v, x, train=True, mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert y.shape == (2, 16, 16, 24)
