"""Shared test helpers.

fast_init: abstract-eval a Flax model's init (jax.eval_shape — no FLOPs, no
op-by-op CPU dispatch) and fill the variable tree with deterministic values.
A real ``model.init`` of the tiny assembly costs ~65 s on the CPU test
backend (thousands of eager op dispatches); eval_shape costs ~1.5 s.

The values are NOT flax's initializers — they are seeded per-leaf
fan-in-scaled normals (params) and identity stats (batch_stats). Every test
that compares two serving paths of the SAME parameters (fused vs plain,
int8 vs bf16, mesh vs single-device, export round-trips) is value-agnostic,
so this is safe there; tests that depend on specific initialiser semantics
(convergence tests, the output_conv [[+1,-1]] people-seg wrapper contract)
should keep using model.init. ``output_conv`` is special-cased to its fixed
[[+1,-1]] init so deployed binary_masks keep their meaning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fast_init(model, *example_args, seed: int = 0, **example_kwargs):
    """Deterministic O(seconds) substitute for ``model.init`` (see module
    docstring for when it is safe).

    batch_stats are filled with NON-trivial values (mean ~ 0.1*N(0,1),
    var ~ U(0.5, 1.5)) so eval-mode BN — and every BN-folding / fused-path
    equivalence check — exercises real normalisation, not the identity."""
    shapes = jax.eval_shape(
        lambda r: model.init(r, *example_args, **example_kwargs),
        jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)

    def fill(path, sd):
        name = str(getattr(path[-1], "key", path[-1]))
        parent = str(getattr(path[-2], "key", path[-2])) if len(path) > 1 else ""
        top = str(getattr(path[0], "key", path[0])) if path else ""
        if parent == "output_conv" and name == "kernel":
            # PeopleSegUNetWrapper's fixed 1ch->2ch [[+1,-1]] map
            return np.asarray([1.0, -1.0], sd.dtype).reshape(sd.shape)
        if top == "batch_stats":
            if "var" in name:
                return (rng.random(sd.shape) + 0.5).astype(sd.dtype)
            return (0.1 * rng.standard_normal(sd.shape)).astype(sd.dtype)
        if "var" in name or name == "scale":
            return np.ones(sd.shape, sd.dtype)
        if "mean" in name or "bias" in name:
            return np.zeros(sd.shape, sd.dtype)
        fan_in = int(np.prod(sd.shape[:-1])) or 1
        return (rng.standard_normal(sd.shape) / np.sqrt(fan_in)).astype(sd.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)
