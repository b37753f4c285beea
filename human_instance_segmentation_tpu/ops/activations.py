"""Activation factory.

Mirrors the reference factory (advanced/activation_utils.py:12-208 and the
per-module copies of ``get_activation_function``): relu / swish(beta) /
gelu / silu. Returned values are pure functions (JAX has no in-place state,
so the reference's ONNX-safe Swish special-casing is unnecessary).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def swish(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """x * sigmoid(beta * x); beta=1 is SiLU."""
    return x * jax.nn.sigmoid(beta * x)


def get_activation(name: str = "relu", beta: float = 1.0) -> Callable[[jnp.ndarray], jnp.ndarray]:
    name = name.lower()
    if name == "relu":
        return jax.nn.relu
    if name in ("silu", "swish"):
        if name == "swish" and beta != 1.0:
            return lambda x: swish(x, beta)
        return jax.nn.silu
    if name == "gelu":
        # torch nn.GELU default is the exact (erf) formulation
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name in ("sigmoid",):
        return jax.nn.sigmoid
    if name in ("tanh",):
        return jnp.tanh
    if name in ("identity", "none", "linear"):
        return lambda x: x
    raise ValueError(f"Unsupported activation function: {name}")
