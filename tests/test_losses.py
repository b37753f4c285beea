"""Loss tests: parity vs torch reference math + state-machine behaviour."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_instance_segmentation_tpu import losses as L


@pytest.fixture()
def fake_batch(rng):
    n, h, w = 3, 16, 12
    logits = rng.normal(size=(n, h, w, 3)).astype(np.float32)
    targets = rng.integers(0, 3, size=(n, h, w)).astype(np.int32)
    return jnp.asarray(logits), jnp.asarray(targets)


def test_cross_entropy_matches_torch(fake_batch):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    logits, targets = fake_batch
    ours = float(L.cross_entropy(logits, targets))
    t = F.cross_entropy(
        torch.from_numpy(np.asarray(logits)).permute(0, 3, 1, 2),
        torch.from_numpy(np.asarray(targets)).long(),
    )
    assert ours == pytest.approx(float(t), rel=1e-5)

    # Weighted variant: torch normalises by summed class weights
    w = jnp.asarray([0.5, 2.0, 1.3])
    ours_w = float(L.cross_entropy(logits, targets, class_weights=w))
    t_w = F.cross_entropy(
        torch.from_numpy(np.asarray(logits)).permute(0, 3, 1, 2),
        torch.from_numpy(np.asarray(targets)).long(),
        weight=torch.tensor([0.5, 2.0, 1.3]),
    )
    assert ours_w == pytest.approx(float(t_w), rel=1e-5)


def test_dice_matches_reference_formula(fake_batch):
    logits, targets = fake_batch
    ours = float(L.dice_loss(logits, targets, class_indices=(1,)))
    p = np.asarray(jax.nn.softmax(logits, axis=-1))[..., 1]
    t = (np.asarray(targets) == 1).astype(np.float32)
    inter = (p * t).sum(axis=(1, 2))
    dice = (2 * inter + 1e-6) / (p.sum(axis=(1, 2)) + t.sum(axis=(1, 2)) + 1e-6)
    assert ours == pytest.approx(float((1 - dice).mean()), rel=1e-5)


def test_valid_mask_ignores_padded_rois(fake_batch):
    logits, targets = fake_batch
    # duplicate batch with an extra garbage ROI marked invalid
    pad_logits = jnp.concatenate([logits, 100.0 * jnp.ones_like(logits[:1])], axis=0)
    pad_targets = jnp.concatenate([targets, jnp.zeros_like(targets[:1])], axis=0)
    valid = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    a = float(L.cross_entropy(logits, targets))
    b = float(L.cross_entropy(pad_logits, pad_targets, valid=valid))
    assert a == pytest.approx(b, rel=1e-5)
    a = float(L.dice_loss(logits, targets))
    b = float(L.dice_loss(pad_logits, pad_targets, valid=valid))
    assert a == pytest.approx(b, rel=1e-5)


def test_hierarchical_loss_runs_and_updates_state(fake_batch):
    logits, targets = fake_batch
    aux = {
        "bg_fg_logits": logits[..., :2],
        "target_nontarget_logits": logits[..., 1:3],
    }
    state = L.HierarchicalLossState.create()
    total, new_state, metrics = L.hierarchical_loss(logits, targets, aux, state)
    assert np.isfinite(float(total))
    assert bool(new_state.initialized)
    # first call seeds the EMA with the batch value (no 1.0 blending)
    assert float(new_state.ema_bg) != 1.0 or float(new_state.ema_fg) != 1.0
    # second call blends with alpha=0.9
    total2, s2, _ = L.hierarchical_loss(logits, targets, aux, new_state)
    assert float(total2) == pytest.approx(float(total), rel=1e-3)
    expected = 0.9 * float(new_state.ema_bg) + 0.1 * float(new_state.ema_bg)
    assert float(s2.ema_bg) == pytest.approx(expected, rel=1e-5)


def test_refined_loss_terms_present(fake_batch):
    logits, targets = fake_batch
    aux = {
        "bg_fg_logits": logits[..., :2],
        "target_nontarget_logits": logits[..., 1:3],
        "contours": jax.nn.sigmoid(logits[..., :1]),
        "distance_map": logits[..., :1],
    }
    cfg = L.RefinedLossConfig(use_active_contour_loss=True, use_boundary_aware_loss=True)
    state = L.HierarchicalLossState.create()
    total, _, metrics = L.refined_hierarchical_loss(logits, targets, aux, state, cfg)
    for k in ("active_contour", "boundary_aware", "contour", "distance_transform"):
        assert k in metrics, k
        assert np.isfinite(float(metrics[k]))
    assert np.isfinite(float(total))


def test_contour_targets_mark_edges():
    m = np.zeros((1, 8, 8), np.int32)
    m[0, 2:6, 2:6] = 1
    ct = np.asarray(L.generate_contour_targets(jnp.asarray(m)))
    assert ct.shape == (1, 8, 8, 1)
    # forward-difference edges land on the preceding row/col and the last
    # interior row/col of the box
    assert ct[0, 1, 3, 0] > 0 and ct[0, 5, 3, 0] > 0
    assert ct[0, 3, 1, 0] > 0 and ct[0, 3, 5, 0] > 0
    assert ct[0, 0, 0, 0] == 0  # far background is not
    assert ct[0, 3, 3, 0] == 0  # box interior is not


def test_distance_targets_increase_inside():
    m = np.zeros((1, 16, 16), np.int32)
    m[0, 4:12, 4:12] = 1
    d = np.asarray(L.generate_distance_targets(jnp.asarray(m)))[0, :, :, 0]
    assert d[8, 8] == 1.0  # well inside
    assert d[4, 4] == 1.0  # mask pixels stay 1
    assert 0 < d[3, 8] < 1.0  # just outside gets partial value
    assert d[0, 0] < d[3, 8]  # decays with distance


def test_temperature_schedules():
    cfg = L.DistillationConfig(initial_temperature=10.0, final_temperature=1.0)
    for sched in ("linear", "cosine", "exponential"):
        c = L.DistillationConfig(initial_temperature=10.0, final_temperature=1.0,
                                 schedule_type=sched)
        t0 = L.scheduled_temperature(c, 0, 100)
        t_end = L.scheduled_temperature(c, 99, 100)
        assert t0 == pytest.approx(10.0, rel=1e-6)
        assert t_end == pytest.approx(1.0, rel=1e-6)
        mid = L.scheduled_temperature(c, 50, 100)
        assert 1.0 < mid < 10.0


def test_adaptive_elimination_is_permanent():
    cfg = L.DistillationConfig()
    s = L.DistillationState.create(temperature=4.0, alpha=0.5, task_weight=0.3)
    # student beats teacher by >3% -> eliminated
    s = L.update_adaptive_weights(s, cfg, jnp.asarray(0.95), jnp.asarray(0.90))
    assert bool(s.eliminated)
    assert float(s.alpha) == 0.0 and float(s.task_weight) == 1.0
    # even after regressing below teacher, stays eliminated
    s = L.update_adaptive_weights(s, cfg, jnp.asarray(0.5), jnp.asarray(0.9))
    assert bool(s.eliminated)
    assert float(s.alpha) == 0.0


def test_adaptive_decay_when_slightly_better():
    cfg = L.DistillationConfig()
    s = L.DistillationState.create(temperature=4.0, alpha=0.5, task_weight=0.3)
    s = L.update_adaptive_weights(s, cfg, jnp.asarray(0.901), jnp.asarray(0.9))
    assert not bool(s.eliminated)
    assert 0.0 < float(s.alpha) < 0.5  # exp(-20 * delta) decay
    assert float(s.task_weight) > 0.3


def test_unet_distillation_loss_components(rng):
    s = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))
    m = jnp.asarray((rng.random((2, 16, 16, 1)) > 0.5).astype(np.float32))
    state = L.DistillationState.create(temperature=4.0)
    total, metrics = L.unet_distillation_loss(s, t, m, state)
    for k in ("kl_loss", "mse_loss", "bce_loss", "dice_loss"):
        assert np.isfinite(float(metrics[k])), k
    assert float(metrics["kl_loss"]) >= 0.0
    # identical student/teacher -> zero KL and MSE
    total2, m2 = L.unet_distillation_loss(t, t, m, state)
    assert float(m2["kl_loss"]) == pytest.approx(0.0, abs=1e-5)
    assert float(m2["mse_loss"]) == pytest.approx(0.0, abs=1e-7)
    # eliminated state zeroes distillation terms
    st_e = state.replace(eliminated=jnp.asarray(True),
                         alpha=jnp.asarray(0.0), task_weight=jnp.asarray(1.0))
    total3, m3 = L.unet_distillation_loss(s, t, m, st_e)
    assert float(m3["kl_loss"]) == 0.0 and float(m3["mse_loss"]) == 0.0
    assert float(total3) == pytest.approx(
        0.7 * float(m3["bce_loss"]) + 0.3 * float(m3["dice_loss"]), rel=1e-5)


def test_hierarchical_kd(rng):
    sl = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    tl = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    aux_s = {"bg_fg_logits": sl[..., :2], "target_nontarget_logits": sl[..., 1:3]}
    aux_t = {"bg_fg_logits": tl[..., :2], "target_nontarget_logits": tl[..., 1:3]}
    base = jnp.asarray(1.0)
    total, metrics = L.hierarchical_distillation_loss(sl, tl, aux_s, aux_t, base)
    assert np.isfinite(float(total))
    # student == teacher -> pure (1-alpha) * base
    total2, _ = L.hierarchical_distillation_loss(tl, tl, aux_t, aux_t, base, alpha=0.7)
    assert float(total2) == pytest.approx(0.3, abs=1e-5)


def test_distance_aware_loss(fake_batch):
    logits, targets = fake_batch
    total, metrics = L.distance_aware_loss(logits, targets)
    assert np.isfinite(float(total))
    # boundary weights are >= 1 and peak at boundaries
    w = np.asarray(L.boundary_distance_weights(targets))
    assert (w >= 1.0 - 1e-5).all()


def test_class_weights_from_pixel_ratios():
    w = np.asarray(L.class_weights_from_pixel_ratios(
        {"background": 0.4865, "target": 0.3660, "non_target": 0.1476}))
    assert w.sum() == pytest.approx(3.0, rel=1e-5)
    assert w[2] > w[1] > w[0]  # rarer classes get higher weight
