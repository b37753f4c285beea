"""Checkpoint → resume round trips (orbax), at both the state and CLI level.

The reference persists {epoch, model, optimizer, scheduler, best_miou,
loss_fn_state, unfreeze state} and resumes exactly
(/root/reference/train_advanced.py:1592-1599,
train_distillation_staged.py:1352-1446); here the whole TrainState pytree —
params, optimizer state, loss-EMA, distillation schedule state — is one
orbax checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from human_instance_segmentation_tpu.training.checkpoint import (
    latest_step, restore_checkpoint, save_checkpoint)


def test_trainstate_roundtrip_is_exact(tmp_path):
    from human_instance_segmentation_tpu.training.state import TrainState

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    tx = optax.adamw(1e-3)
    state = TrainState.create({"params": params}, tx, jax.random.PRNGKey(7))

    # take one real optimizer step so opt_state has non-init moments
    grads = jax.tree.map(jnp.ones_like, state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    state = state.replace(
        params=optax.apply_updates(state.params, updates),
        opt_state=new_opt, step=state.step + 1)

    save_checkpoint(str(tmp_path), jax.device_get(state), 1)
    assert latest_step(str(tmp_path)) == 1

    abstract = jax.tree.map(np.zeros_like, jax.device_get(state))
    restored, step = restore_checkpoint(str(tmp_path), abstract)
    assert step == 1

    flat_a, _ = jax.tree.flatten(jax.device_get(state))
    flat_b, _ = jax.tree.flatten(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_cli_resume_continues_from_checkpoint(tmp_path):
    from human_instance_segmentation_tpu.training.loop import run_training

    out = str(tmp_path / "run")
    run_training("rgb_hierarchical_unet_v2", steps=2, synthetic=True,
                 tiny=True, output_dir=out, platform="cpu")
    assert latest_step(out + "/checkpoints") == 2

    # resume: must pick up at step 2 and finish at 4, not restart at 0
    run_training("rgb_hierarchical_unet_v2", steps=4, synthetic=True,
                 tiny=True, output_dir=out, resume=True, platform="cpu")
    assert latest_step(out + "/checkpoints") == 4
