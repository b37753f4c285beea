"""Train state: params + optimizer + device-resident loss EMA state.

The reference keeps optimizer/scheduler/loss state in separate mutable
objects checkpointed ad hoc (train_advanced.py:1592-1599,
train_distillation_staged.py:1352-1446). Here everything that evolves during
training is one pytree, so the whole step jits/shards and orbax checkpoints
it atomically.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..losses.hierarchical import HierarchicalLossState
from ..losses.distillation import DistillationState


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    loss_state: HierarchicalLossState
    distill_state: Optional[DistillationState]
    rng: jnp.ndarray
    # NaN-guard telemetry (reference skips NaN batches,
    # train_advanced.py:814-832): count of skipped steps
    skipped: jnp.ndarray

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation, rng,
               distill_state: Optional[DistillationState] = None) -> "TrainState":
        params = variables["params"]
        return cls(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            loss_state=HierarchicalLossState.create(),
            distill_state=distill_state,
            rng=rng,
            skipped=jnp.asarray(0, jnp.int32),
        )
