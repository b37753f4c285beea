"""Tests for the normalisation zoo and morphology ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from human_instance_segmentation_tpu.ops import get_normalization, max_pool2d, dilate, erode
from human_instance_segmentation_tpu.ops.norms import LayerNorm2d


def test_layernorm2d_matches_torch_reference(rng):
    # torch LayerNorm2d from reference model.py:18-38: statistics over ALL of
    # (C, H, W) per sample, eps 1e-5, biased variance. (The golden oracle
    # version of this check lives in tests/test_reference_parity.py.)
    x = rng.standard_normal((2, 5, 7, 16)).astype(np.float32)
    mod = LayerNorm2d()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = mod.apply(params, jnp.asarray(x))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    u = xt.mean(dim=(1, 2, 3), keepdim=True)
    s = (xt - u).pow(2).mean(dim=(1, 2, 3), keepdim=True)
    want = ((xt - u) / torch.sqrt(s + 1e-5)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "norm_type",
    ["layernorm2d", "batchnorm", "instancenorm", "groupnorm", "adaptive_instance",
     "spatial_group", "foreground_aware", "mixed"],
)
def test_norm_factory_shapes(rng, norm_type):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 24)).astype(np.float32))
    mod = get_normalization(norm_type, 24, num_groups=8)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    y = mod.apply(variables, x, train=False, mutable=False)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_groupnorm_fallback():
    # 24 % 8 == 0 -> 8 groups; 26 % 8 != 0 -> falls to 2
    m = get_normalization("groupnorm", 26, num_groups=8)
    assert m.num_groups == 2


def test_maxpool_matches_torch(rng):
    x = rng.standard_normal((1, 9, 9, 3)).astype(np.float32)
    got = max_pool2d(jnp.asarray(x), kernel=3, stride=1, padding=1)
    want = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 3, 1, 1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want)


def test_dilate_erode_roundtrip():
    m = jnp.zeros((1, 7, 7, 1)).at[0, 3, 3, 0].set(1.0)
    d = dilate(m, 1)
    assert float(d.sum()) == 9.0
    e = erode(d, 1)
    assert float(e.sum()) == 1.0
