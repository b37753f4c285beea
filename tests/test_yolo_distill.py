"""YOLO feature-distillation path: loss semantics + end-to-end tiny run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.losses import yolo_distillation_loss


def test_yolo_loss_terms(rng):
    n, h, w = 2, 16, 16
    s = jnp.asarray(rng.standard_normal((n, h, w, 1)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((n, h, w, 1)).astype(np.float32))
    m = jnp.asarray((rng.random((n, h, w, 1)) > 0.5).astype(np.float32))
    sf = jnp.asarray(rng.standard_normal((n, 2, 2, 8)).astype(np.float32))
    yf = jnp.asarray(rng.standard_normal((n, 2, 2, 8)).astype(np.float32))

    total, md = yolo_distillation_loss(s, t, m, sf, yf, temperature=3.0)
    assert np.isfinite(float(total))
    for k in ("kl_loss", "mse_loss", "bce_loss", "dice_loss", "feature_loss"):
        assert np.isfinite(float(md[k])), k
    assert float(md["feature_loss"]) > 0.0

    # identical student/teacher + matched features -> kl == mse == feat == 0
    total0, md0 = yolo_distillation_loss(t, t, m, yf, yf, temperature=3.0)
    assert float(md0["kl_loss"]) < 1e-5
    assert float(md0["mse_loss"]) < 1e-9
    assert float(md0["feature_loss"]) < 1e-9

    # cosine feature loss of identical features is ~0, orthogonal ~1
    _, mdc = yolo_distillation_loss(s, t, m, yf, yf, feature_loss_type="cosine")
    assert float(mdc["feature_loss"]) < 1e-5


def test_yolo_loss_feature_gradients_flow(rng):
    """The projector must receive gradients through the feature term."""
    s = jnp.zeros((1, 8, 8, 1))
    t = jnp.zeros((1, 8, 8, 1))
    m = jnp.zeros((1, 8, 8, 1))
    yf = jnp.ones((1, 1, 1, 4))

    def f(sf):
        return yolo_distillation_loss(s, t, m, sf, yf, feature_weight=1.0)[0]

    g = jax.grad(f)(jnp.zeros((1, 1, 1, 4)))
    assert float(jnp.abs(g).sum()) > 0.0


@pytest.mark.slow
def test_yolo_feature_distillation_tiny_run(tmp_path):
    from human_instance_segmentation_tpu.training.yolo_distill import (
        run_yolo_feature_distillation)

    m = run_yolo_feature_distillation(
        epochs=2, steps_per_epoch=3, batch=2, synthetic=True, tiny=True,
        output_dir=str(tmp_path))
    assert np.isfinite(m["total_loss"])
    assert np.isfinite(m["feature_loss"]) and m["feature_loss"] > 0.0
    assert "best_student_miou" in m
    # temperature scheduled down across the 2 epochs (cosine 3 -> 1)
    assert m["temperature"] == pytest.approx(1.0)


@pytest.mark.slow
def test_student_params_load_into_deploy_unet():
    from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet
    from human_instance_segmentation_tpu.models.yolo_distill import (
        YOLOFeatureDistillStudent, strip_projector)

    dec = (32, 24, 16, 16, 8)
    student = YOLOFeatureDistillStudent(
        encoder_variant="tiny", decoder_channels=dec,
        projection_hidden_dim=16, yolo_feature_dim=32)
    x = jnp.zeros((1, 64, 64, 3))
    sv = jax.jit(lambda r: student.init(r, x, train=False, return_features=True))(
        jax.random.PRNGKey(0))

    deploy = PeopleSegmentationUNet(encoder_variant="tiny", decoder_channels=dec)
    stripped = strip_projector(jax.device_get(sv))
    out = deploy.apply(stripped, x, train=False)  # raises if trees mismatch
    assert out.shape == (1, 64, 64, 1)


@pytest.mark.slow
def test_precomputed_feature_files(tmp_path):
    """--feature-dir: train against PRECOMPUTED real-YOLO feature dumps
    (.npz with images/masks/yolo_features), rebatched and cycled. The
    honest equivalent of the reference's in-loop ORT extractor
    (feature_extractor.py:123) without an ORT session in the step."""
    import numpy as np

    from human_instance_segmentation_tpu.training.yolo_distill import (
        npz_feature_batches, run_yolo_feature_distillation)

    rng = np.random.default_rng(0)
    ih = iw = 64
    for i, nb in enumerate((3, 2)):  # uneven file sizes exercise rebatching
        np.savez(tmp_path / f"feat{i}.npz",
                 images=rng.random((nb, ih, iw, 3)).astype(np.float32),
                 masks=(rng.random((nb, ih, iw, 1)) > 0.5).astype(np.float32),
                 yolo_features=rng.standard_normal(
                     (nb, ih // 8, iw // 8, 32)).astype(np.float32))

    it = npz_feature_batches(str(tmp_path), batch=2)
    b = next(it)
    assert b["images"].shape == (2, 64, 64, 3)
    assert b["yolo_features"].shape == (2, 8, 8, 32)
    next(it); next(it)  # cycles past the 5 available samples

    m = run_yolo_feature_distillation(
        epochs=1, steps_per_epoch=2, batch=2, tiny=True,
        feature_dir=str(tmp_path), output_dir=str(tmp_path / "out"),
        platform="cpu")
    assert np.isfinite(m["total_loss"]) and np.isfinite(m["feature_loss"])
