"""Temperature-progression distillation training (stage-1 binary UNet).

TPU-native rebuild of train_distillation_staged.py: teacher (frozen B7/B3
UNet) and student (B0/B1) run in ONE jitted step — the teacher under
stop_gradient — with the binary KD loss (KL + MSE + BCE/Dice task mix),
cosine temperature schedule, adaptive-alpha elimination, teacher-mIoU
caching, and progressive encoder unfreezing expressed as optax masks.

Batch contract: {"images": (B, H, W, 3), "masks": (B, H, W, 1)}.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..losses.distillation import (
    DistillationConfig,
    DistillationState,
    scheduled_temperature,
    unet_distillation_loss,
    update_adaptive_weights,
)
from ..models.unet import PeopleSegmentationUNet
from .metrics import binary_miou
from .state import TrainState


def build_student_teacher(student_variant: str, teacher_variant: str):
    student = PeopleSegmentationUNet(encoder_variant=student_variant)
    teacher = PeopleSegmentationUNet(encoder_variant=teacher_variant)
    return student, teacher


def make_distill_train_step(
    student: PeopleSegmentationUNet,
    teacher: PeopleSegmentationUNet,
    teacher_variables: Any,
    tx: optax.GradientTransformation,
    cfg: DistillationConfig = DistillationConfig(),
    mesh: Optional[Mesh] = None,
    compute_dtype: Optional[str] = None,
):
    """One fused step: teacher fwd (no grad) + student fwd/bwd + KD loss.

    The reference runs teacher under torch.no_grad in a separate call
    (train_distillation_staged.py:306-308); here both forwards sit in the
    same XLA program so the teacher's activations never round-trip to HBM
    unfused, and batch-norm batch statistics update for the student (train
    mode) while the teacher always uses running stats. ``compute_dtype``
    (e.g. bfloat16) casts both forwards; KD loss and masters stay f32.
    """
    from .steps import _cast_floating

    axis = mesh.axis_names[0] if mesh is not None else None
    cdt = (jnp.dtype(compute_dtype)
           if compute_dtype not in (None, "float32", "f32") else None)
    t_vars_c = _cast_floating(teacher_variables, cdt) if cdt else teacher_variables

    def loss_fn(params, batch_stats, distill_state, rng, batch):
        images = batch["images"].astype(cdt) if cdt else batch["images"]
        t_logits = teacher.apply(t_vars_c, images, train=False)
        t_logits = jax.lax.stop_gradient(t_logits)
        s_params = _cast_floating(params, cdt) if cdt else params
        s_stats = _cast_floating(batch_stats, cdt) if cdt else batch_stats
        s_logits, updates = student.apply(
            {"params": s_params, "batch_stats": s_stats}, images,
            train=True, mutable=["batch_stats"], rngs={"dropout": rng})
        new_stats = updates["batch_stats"]
        if cdt:
            s_logits = s_logits.astype(jnp.float32)
            t_logits = t_logits.astype(jnp.float32)
            new_stats = _cast_floating(new_stats, jnp.float32)
        loss, metrics = unet_distillation_loss(
            s_logits, t_logits, batch["masks"], distill_state, cfg)
        metrics["student_miou"] = binary_miou(jax.lax.stop_gradient(s_logits), batch["masks"])
        metrics["teacher_miou"] = binary_miou(t_logits, batch["masks"])
        return loss, (new_stats, metrics)

    def step(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.distill_state, rng, batch)
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.lax.pmean(metrics, axis)
            new_stats = jax.lax.pmean(new_stats, axis)
            loss = jax.lax.pmean(loss, axis)
        ok = jnp.logical_and(jnp.isfinite(optax.global_norm(grads)), jnp.isfinite(loss))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        sel = lambda a, b: jax.tree.map(lambda x, y: jnp.where(ok, x, y), a, b)
        new_state = state.replace(
            step=state.step + 1,
            params=sel(new_params, state.params),
            batch_stats=sel(new_stats, state.batch_stats),
            opt_state=sel(new_opt, state.opt_state),
            skipped=state.skipped + jnp.where(ok, 0, 1).astype(state.skipped.dtype),
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(P(), P(axis)), out_specs=(P(), P()),
        check_vma=False), donate_argnums=(0,))


def make_hierarchical_distill_step(
    student_model,
    teacher_model,
    teacher_variables: Any,
    tx: optax.GradientTransformation,
    loss_cfg,
    temperature: float = 4.0,
    alpha: float = 0.7,
    aux_weight: float = 0.3,
    mesh: Optional[Mesh] = None,
):
    """KD for the full ROI hierarchical model (DistillationLoss +
    DistillationModelWrapper, knowledge_distillation.py:10-207): teacher and
    student run in one jitted step; the KD term blends T^2-scaled softmax KL
    on final + auxiliary logits with the refined hierarchical base loss.

    Batch contract matches training.steps (images/boxes/masks/valid).
    """
    from ..losses.distillation import hierarchical_distillation_loss
    from ..losses.hierarchical import refined_hierarchical_loss
    from .steps import rois_from_boxes

    axis = mesh.axis_names[0] if mesh is not None else None

    def loss_fn(params, batch_stats, loss_state, rng, batch):
        rois = rois_from_boxes(batch["boxes"])
        t_logits, t_aux = teacher_model.apply(
            teacher_variables, batch["images"], rois, train=False)
        t_logits = jax.lax.stop_gradient(t_logits)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            (s_logits, s_aux), updates = student_model.apply(
                variables, batch["images"], rois, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            new_stats = updates["batch_stats"]
        else:
            s_logits, s_aux = student_model.apply(
                variables, batch["images"], rois, train=True,
                rngs={"dropout": rng})
            new_stats = batch_stats
        b, k = batch["boxes"].shape[:2]
        mh, mw = batch["masks"].shape[-2:]
        targets = batch["masks"].reshape(b * k, mh, mw)
        valid = batch["valid"].reshape(b * k)
        base, new_loss_state, metrics = refined_hierarchical_loss(
            s_logits, targets, s_aux, loss_state, loss_cfg, valid=valid)
        total, kd_metrics = hierarchical_distillation_loss(
            s_logits, t_logits, s_aux, t_aux, base,
            temperature=temperature, alpha=alpha, aux_weight=aux_weight)
        metrics.update(kd_metrics)
        return total, (new_loss_state, new_stats, metrics)

    def step(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        (loss, (nls, nstats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.loss_state, rng, batch)
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.lax.pmean(metrics, axis)
            nls = jax.lax.pmean(nls, axis)
            nstats = jax.lax.pmean(nstats, axis)
            loss = jax.lax.pmean(loss, axis)
        ok = jnp.logical_and(jnp.isfinite(optax.global_norm(grads)), jnp.isfinite(loss))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        sel = lambda a, b: jax.tree.map(lambda x, y: jnp.where(ok, x, y), a, b)
        return state.replace(
            step=state.step + 1,
            params=sel(new_params, state.params),
            opt_state=sel(new_opt, state.opt_state),
            batch_stats=sel(nstats, state.batch_stats),
            loss_state=sel(nls, state.loss_state),
            skipped=state.skipped + jnp.where(ok, 0, 1).astype(state.skipped.dtype),
        ), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    from jax.sharding import PartitionSpec as P

    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(P(), P(axis)), out_specs=(P(), P()),
        check_vma=False), donate_argnums=(0,))


def epoch_update(
    state: TrainState,
    cfg: DistillationConfig,
    epoch: int,
    total_epochs: int,
    student_iou: Optional[float] = None,
    teacher_iou: Optional[float] = None,
) -> TrainState:
    """Between-epoch distillation-state transition: temperature schedule
    (train_distillation_staged.py:1599) + adaptive alpha from validation
    IoUs (:1352-1446). Pure host-side; the new state rides into the next
    jitted step."""
    ds: DistillationState = state.distill_state
    new_t = scheduled_temperature(cfg, epoch, total_epochs)
    ds = ds.replace(temperature=jnp.asarray(new_t, jnp.float32))
    if student_iou is not None and teacher_iou is not None:
        ds = update_adaptive_weights(ds, cfg, jnp.asarray(student_iou),
                                     jnp.asarray(teacher_iou))
    return state.replace(distill_state=ds)
