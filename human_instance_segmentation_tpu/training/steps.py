"""Jitted / shard_mapped train + eval steps for the hierarchical model.

TPU-native replacement for the reference's host-side epoch loop internals
(train_advanced.py:648-900): forward, loss, backward, grad-clip, NaN-guard
— all fused into one XLA program, data-parallel over a `jax.sharding.Mesh`
via `shard_map` with `pmean` gradient reduction on ICI (the reference is
strictly single-GPU; SURVEY §2.9).

Batch contract (leading axis shardable over the data mesh axis):
    images: (B, H, W, 3) float in [0, 1]
    boxes:  (B, K, 4)    normalised [x1, y1, x2, y2]
    masks:  (B, K, mh, mw) int32 labels {0, 1, 2}
    valid:  (B, K)       1.0 for real ROIs, 0.0 for padding
ROI rows [batch_idx, box] are built in-step with *local* batch indices so no
cross-shard gather is ever needed — each device runs its own slice of both
stages end to end.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..losses.hierarchical import RefinedLossConfig, refined_hierarchical_loss
from .state import TrainState


def rois_from_boxes(boxes: jnp.ndarray) -> jnp.ndarray:
    """(B, K, 4) boxes -> (B*K, 5) rois with local batch indices."""
    b, k, _ = boxes.shape
    idx = jnp.repeat(jnp.arange(b, dtype=boxes.dtype), k)[:, None]
    return jnp.concatenate([idx, boxes.reshape(b * k, 4)], axis=-1)


def _cast_floating(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)


def make_loss_fn(model, loss_cfg: RefinedLossConfig,
                 compute_dtype: Optional[str] = None):
    """Loss closure; with ``compute_dtype`` (e.g. "bfloat16") the forward and
    backward run in that dtype (the TPU analogue of the reference's
    AMP+GradScaler, train_advanced.py:660-700) while master params, optimizer
    state, BN running stats, and the loss itself stay float32."""
    cdt = (jnp.dtype(compute_dtype)
           if compute_dtype not in (None, "float32", "f32") else None)

    def loss_fn(params, batch_stats, loss_state, rng, batch):
        apply_params = _cast_floating(params, cdt) if cdt else params
        images = batch["images"].astype(cdt) if cdt else batch["images"]
        variables = {"params": apply_params}
        rois = rois_from_boxes(batch["boxes"])
        if batch_stats:
            # BatchNorm models (unfrozen stage 1 / batchnorm-configured
            # heads) update running stats in train mode.
            variables["batch_stats"] = (_cast_floating(batch_stats, cdt)
                                        if cdt else batch_stats)
            (logits, aux), updates = model.apply(
                variables, images, rois, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            new_stats = updates["batch_stats"]
        else:
            logits, aux = model.apply(
                variables, images, rois, train=True, rngs={"dropout": rng})
            new_stats = batch_stats
        if cdt:
            logits = logits.astype(jnp.float32)
            aux = _cast_floating(aux, jnp.float32)
            new_stats = _cast_floating(new_stats, jnp.float32)
        b, k = batch["boxes"].shape[:2]
        mh, mw = batch["masks"].shape[-2:]
        targets = batch["masks"].reshape(b * k, mh, mw)
        valid = batch["valid"].reshape(b * k)
        loss, new_loss_state, metrics = refined_hierarchical_loss(
            logits, targets, aux, loss_state, loss_cfg, valid=valid)
        return loss, (new_loss_state, new_stats, metrics)

    return loss_fn


def _tree_finite(tree) -> jnp.ndarray:
    # One fused reduction (finite iff the global norm is): far cheaper to
    # compile than per-leaf jnp.all stacks on models with many parameters.
    return jnp.isfinite(optax.global_norm(tree))


def _apply_step(state: TrainState, tx, grads, new_loss_state, new_batch_stats,
                loss) -> TrainState:
    """Grad update with the reference's NaN-batch skip
    (train_advanced.py:814-832): non-finite loss or grads leave params and
    optimizer state untouched (a zero-cost `where`, not control flow)."""
    ok = jnp.logical_and(_tree_finite(grads), jnp.isfinite(loss))
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    sel = lambda a, b: jax.tree.map(lambda x, y: jnp.where(ok, x, y), a, b)
    return state.replace(
        step=state.step + 1,
        params=sel(new_params, state.params),
        batch_stats=sel(new_batch_stats, state.batch_stats),
        opt_state=sel(new_opt, state.opt_state),
        loss_state=sel(new_loss_state, state.loss_state),
        skipped=state.skipped + jnp.where(ok, 0, 1).astype(state.skipped.dtype),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_cfg: RefinedLossConfig = RefinedLossConfig(),
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    compute_dtype: Optional[str] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step; with a mesh it is shard_mapped
    data-parallel (params replicated, batch sharded, grads pmean over ICI)."""
    loss_fn = make_loss_fn(model, loss_cfg, compute_dtype=compute_dtype)
    axis = mesh.axis_names[0] if mesh is not None else None

    def step(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        (loss, (new_loss_state, new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   state.loss_state, rng, batch)
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.lax.pmean(metrics, axis)
            new_loss_state = jax.lax.pmean(new_loss_state, axis)
            new_stats = jax.lax.pmean(new_stats, axis)
            loss = jax.lax.pmean(loss, axis)
        new_state = _apply_step(state, tx, grads, new_loss_state, new_stats, loss)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    state_spec = P()
    batch_spec = P(axis)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(state_spec, batch_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_scanned_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_cfg: RefinedLossConfig = RefinedLossConfig(),
    scan_steps: int = 8,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    compute_dtype: Optional[str] = None,
):
    """Run `scan_steps` optimizer steps per dispatch via `lax.scan` over a
    stacked super-batch (leading axis = step).

    One device dispatch per K steps amortises per-call host/transport
    overhead — essential on dispatch-expensive links (measured here:
    67 ms/step inside scan vs tens of seconds per individual dispatch on
    the tunnelled chip) and still a win on real pods.

    Batch contract: each array gains a leading (scan_steps,) axis.
    Returns (state, metrics_of_last_step).
    """
    loss_fn = make_loss_fn(model, loss_cfg, compute_dtype=compute_dtype)
    axis = mesh.axis_names[0] if mesh is not None else None

    def one(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        (loss, (nls, nstats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   state.loss_state, rng, batch)
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.lax.pmean(metrics, axis)
            nls = jax.lax.pmean(nls, axis)
            nstats = jax.lax.pmean(nstats, axis)
            loss = jax.lax.pmean(loss, axis)
        return _apply_step(state, tx, grads, nls, nstats, loss), metrics

    def scanned(state: TrainState, batches):
        def body(carry, batch):
            new_state, metrics = one(carry, batch)
            return new_state, metrics
        state, metrics_seq = jax.lax.scan(body, state, batches)
        last = jax.tree.map(lambda m: m[-1], metrics_seq)
        return state, last

    dn = (0,) if donate else ()
    if mesh is None:
        return jax.jit(scanned, donate_argnums=dn)
    # super-batch axes: (scan_step, batch, ...) — shard the batch axis
    return jax.jit(jax.shard_map(
        scanned, mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=(P(), P()),
        check_vma=False), donate_argnums=dn)


def stack_batches(batches):
    """Stack K host batches into the (K, ...) super-batch for
    make_scanned_train_step."""
    import numpy as np

    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def make_eval_step(model, mesh: Optional[Mesh] = None):
    """Per-batch IoU/accuracy metrics, vectorised (the reference computes
    these in per-sample Python loops, train_utils.py:266-293)."""
    axis = mesh.axis_names[0] if mesh is not None else None

    def step(params_and_stats, batch):
        params, batch_stats = params_and_stats
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        rois = rois_from_boxes(batch["boxes"])
        logits, _ = model.apply(variables, batch["images"], rois, train=False)
        b, k = batch["boxes"].shape[:2]
        mh, mw = batch["masks"].shape[-2:]
        targets = batch["masks"].reshape(b * k, mh, mw)
        valid = batch["valid"].reshape(b * k).astype(logits.dtype)
        pred = jnp.argmax(logits, axis=-1)

        tp = (pred == 1) & (targets == 1)
        union = (pred == 1) | (targets == 1)
        inter_n = jnp.sum(tp, axis=(1, 2)).astype(logits.dtype)
        union_n = jnp.sum(union, axis=(1, 2)).astype(logits.dtype)
        iou = inter_n / jnp.clip(union_n, 1.0, None)
        acc = jnp.sum((pred == targets) * valid[:, None, None]) / jnp.clip(
            jnp.sum(valid) * mh * mw, 1.0, None)

        sums = {
            "iou_sum": jnp.sum(iou * valid),
            "det50_sum": jnp.sum((iou > 0.5) * valid),
            "det70_sum": jnp.sum((iou > 0.7) * valid),
            "n": jnp.sum(valid),
            "acc": acc,
        }
        if axis is not None:
            sums = jax.lax.psum(sums, axis)
        return sums

    if mesh is None:
        return jax.jit(step)
    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(P(), P(mesh.axis_names[0])), out_specs=P(),
        check_vma=False,
    ))
