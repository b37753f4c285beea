"""Optimizer/schedule/staged-freezing tests (pure optax, no model compiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from human_instance_segmentation_tpu.training.optim import (
    StageConfig,
    build_optimizer,
    build_schedule,
    distillation_optimizer,
    label_params,
    progressive_unfreeze_rules,
    stage_rules,
    staged_optimizer,
)


def _fake_params():
    return {
        "pretrained_unet": {"encoder": {"stage0_block0": {"kernel": jnp.ones((2, 2))},
                                        "stage6_block0": {"kernel": jnp.ones((2, 2))},
                                        "stem_conv": {"kernel": jnp.ones((2, 2))}}},
        "rgb_extractor": {"conv0": {"kernel": jnp.ones((2, 2))}},
        "head": {"cls": {"kernel": jnp.ones((2, 2))}},
    }


def test_schedules_shapes():
    for sched in ("cosine", "cosine_warm_restarts", "step", "exponential", "none"):
        s = build_schedule(1e-3, num_epochs=10, steps_per_epoch=10, scheduler=sched,
                           warmup_epochs=1 if sched == "cosine" else 0)
        v0, vmid, vend = float(s(0)), float(s(50)), float(s(99))
        assert 0.0 <= v0 <= 1e-3 + 1e-9, sched
        assert vend <= 1.1e-3, sched


def test_label_params_rules():
    params = _fake_params()
    labels = label_params(params, [("pretrained_unet", "frozen"), ("head", "train")])
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    for path, lab in flat:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if "pretrained_unet" in p:
            assert lab == "frozen", p
        else:
            assert lab == "train", p


def test_staged_optimizer_freezes_groups():
    params = _fake_params()
    stage = StageConfig(name="s", freeze_pretrained=True, freeze_rgb_extractor=False,
                        freeze_head=False)
    tx = staged_optimizer(
        {"train": optax.sgd(1.0), "frozen": optax.set_to_zero()},
        params, stage_rules(stage))
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates["pretrained_unet"]["encoder"]["stem_conv"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["head"]["cls"]["kernel"]).sum()) > 0.0
    assert float(jnp.abs(updates["rgb_extractor"]["conv0"]["kernel"]).sum()) > 0.0


def test_progressive_unfreeze_depth_order():
    # 2 unfrozen blocks -> stages 5,6 train, 0..4 frozen, stem frozen
    rules = dict(progressive_unfreeze_rules(2, encoder_path="pretrained_unet/encoder"))
    assert rules["pretrained_unet/encoder/stage6_"] == "encoder_train"
    assert rules["pretrained_unet/encoder/stage5_"] == "encoder_train"
    assert rules["pretrained_unet/encoder/stage0_"] == "frozen"
    assert rules["pretrained_unet/encoder/stem"] == "frozen"
    # all 7 -> everything incl. stem trains
    rules_all = dict(progressive_unfreeze_rules(7, encoder_path="pretrained_unet/encoder"))
    assert rules_all["pretrained_unet/encoder/stem"] == "encoder_train"
    assert rules_all["pretrained_unet/encoder/stage0_"] == "encoder_train"


def test_distillation_optimizer_discriminative_lr():
    params = {"encoder": {"stage6_block0": {"kernel": jnp.ones((2, 2))},
                          "stage0_block0": {"kernel": jnp.ones((2, 2))},
                          "stem_conv": {"kernel": jnp.ones((2, 2))}},
              "decoder0": {"conv0": {"kernel": jnp.ones((2, 2))}}}
    tx = distillation_optimizer(params, optax.constant_schedule(1e-3), num_unfrozen_blocks=1,
                                encoder_lr_scale=0.3, gradient_clip=0.0)
    st = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, st, params)
    dec = float(jnp.abs(updates["decoder0"]["conv0"]["kernel"]).mean())
    enc6 = float(jnp.abs(updates["encoder"]["stage6_block0"]["kernel"]).mean())
    enc0 = float(jnp.abs(updates["encoder"]["stage0_block0"]["kernel"]).mean())
    assert dec > 0.0
    assert enc6 > 0.0          # unfrozen deepest stage trains
    assert enc0 == 0.0         # shallow stage frozen
    # adamw normalises magnitudes; just confirm both groups step
    assert float(jnp.abs(updates["encoder"]["stem_conv"]["kernel"]).mean()) == 0.0


def test_build_optimizer_clip():
    tx = build_optimizer(optax.constant_schedule(1.0), "sgd", gradient_clip=1.0)
    params = {"w": jnp.zeros(3)}
    st = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray([10.0, 0.0, 0.0])}, st, params)
    assert abs(float(jnp.linalg.norm(updates["w"]))) <= 1.0 + 1e-5
