"""Pallas post-processing kernels vs their XLA references (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.models import postprocess as pp
from human_instance_segmentation_tpu.ops.pallas_kernels import (
    bilateral_filter_pallas,
    edge_smooth_pallas,
)


def test_bilateral_pallas_matches_xla(rng):
    x = rng.random((2, 16, 24, 3)).astype(np.float32)
    ref = np.asarray(pp.bilateral_filter(jnp.asarray(x), 5, 1.0, 0.1))
    out = np.asarray(bilateral_filter_pallas(jnp.asarray(x), 5, 1.0, 0.1, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bilateral_pallas_k7(rng):
    x = rng.random((1, 8, 8, 1)).astype(np.float32)
    ref = np.asarray(pp.bilateral_filter(jnp.asarray(x), 7, 1.5, 0.2))
    out = np.asarray(bilateral_filter_pallas(jnp.asarray(x), 7, 1.5, 0.2, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_edge_smooth_pallas_matches_xla(rng):
    m = (rng.random((2, 16, 16, 1)) > 0.5).astype(np.float32)
    ref = np.asarray(pp.edge_smooth_binary_mask(jnp.asarray(m), 0.5, 3.0))
    out = np.asarray(edge_smooth_pallas(jnp.asarray(m), 0.5, 3.0, interpret=True))
    np.testing.assert_array_equal(out, ref)
