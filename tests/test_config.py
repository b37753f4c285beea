"""Config system tests: registry, round-trip, grammar parsing."""

import json

import pytest

from human_instance_segmentation_tpu.config import (
    ConfigManager,
    ExperimentConfig,
    FLAGSHIP_SIZES,
    parse_sizes_from_name,
    model_from_config,
)


def test_registry_covers_all_reference_names():
    """Every one of the reference's 79 registry names resolves
    (config_manager.py:275-5054; the full-image grid uses capital-B tags)."""
    names = set(ConfigManager.list_configs())
    grids = {
        "B0": ["32x24m64x48", "64x48m128x96", "80x60m160x120",
               "96x72m192x144", "112x84m224x168", "128x96m256x192"],
        "B1": ["32x24m64x48", "64x48m128x96", "80x60m160x120",
               "96x72m192x144", "112x84m224x168", "128x96m256x192"],
        "B7": ["64x48m128x96", "80x60m160x120"],
    }
    enhanced = {"B0": ["64x48m128x96", "80x60m160x120"],
                "B1": ["64x48m128x96", "80x60m160x120"],
                "B7": ["64x48m128x96", "80x60m160x120", "128x96m256x192"]}
    stem = "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_r"
    for arch, sizes in grids.items():
        for s in sizes:
            assert f"{stem}{s}_disttrans_contdet_baware_from_{arch}" in names
    for arch, sizes in enhanced.items():
        for s in sizes:
            assert f"{stem}{s}_disttrans_contdet_baware_from_{arch}_enhanced" in names
    assert "rgb_hierarchical_unet_v2_distillation_b0_from_b3_yolo" in names


def test_registry_size_and_key_names():
    names = ConfigManager.list_configs()
    assert len(names) >= 79
    for required in (
        "baseline",
        "rgb_hierarchical_unet_v2",
        "rgb_hierarchical_unet_v2_attention",
        "rgb_hierarchical_unet_v2_attention_r64m64",
        "rgb_hierarchical_unet_v2_attention_r112m224_refined",
        "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_r64x48m64x48_disttrans_contdet_baware",
        "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_r64x48m128x96_disttrans_contdet_baware_from_b0",
        "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_r80x60m160x120_disttrans_contdet_baware_from_b1_enhanced",
        "rgb_hierarchical_unet_v2_distillation_b0_from_b7_temp_prog",
        "rgb_hierarchical_unet_v2_distillation_b0_from_b3",
        "rgb_hierarchical_unet_v2_finetune_b7",
    ):
        assert required in names, required


def test_flagship_config_fields():
    cfg = ConfigManager.get_config(
        "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_"
        "r64x48m128x96_disttrans_contdet_baware_from_b0")
    assert cfg.model.roi_size == (64, 48)
    assert cfg.model.mask_size == (128, 96)
    assert cfg.model.encoder_name == "b0"
    assert cfg.model.use_full_image_unet and cfg.model.freeze_pretrained_weights
    assert cfg.model.use_contour_detection and cfg.model.use_distance_transform
    assert cfg.model.hierarchical_base_channels == 96


def test_enhanced_variant_capacity():
    base = ConfigManager.get_config(
        "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_"
        "r64x48m128x96_disttrans_contdet_baware_from_b7")
    enh = ConfigManager.get_config(base.name + "_enhanced")
    assert enh.model.hierarchical_base_channels > base.model.hierarchical_base_channels
    assert enh.model.hierarchical_depth == 4


def test_temp_prog_fields_are_first_class():
    cfg = ConfigManager.get_config("rgb_hierarchical_unet_v2_distillation_b0_from_b7_temp_prog")
    d = cfg.distillation
    assert d.enabled and d.use_temperature_scheduling and d.progressive_unfreeze
    assert d.initial_temperature == 10.0 and d.final_temperature == 1.0
    assert d.unfreeze_schedule  # a real dict, not strings in feature_match_layers
    assert d.student_encoder == "b0" and d.teacher_encoder == "b7"


def test_json_round_trip(tmp_path):
    cfg = ConfigManager.get_config("rgb_hierarchical_unet_v2_distillation_b0_from_b7_temp_prog")
    p = tmp_path / "cfg.json"
    cfg.save(str(p))
    loaded = ExperimentConfig.load(str(p))
    assert loaded.to_dict() == cfg.to_dict()


def test_custom_config_deep_merge():
    cfg = ConfigManager.create_custom_config(
        "rgb_hierarchical_unet_v2", "custom",
        {"training": {"learning_rate": 5e-4}, "model": {"roi_size": 32}})
    assert cfg.name == "custom"
    assert cfg.training.learning_rate == 5e-4
    assert cfg.model.roi_size == 32
    # untouched fields preserved
    assert cfg.training.num_epochs == 100


def test_get_config_returns_copy():
    a = ConfigManager.get_config("baseline")
    a.training.learning_rate = 123.0
    b = ConfigManager.get_config("baseline")
    assert b.training.learning_rate != 123.0


def test_parse_sizes_grammar():
    assert parse_sizes_from_name("..._r64x48m128x96_...") == ((64, 48), (128, 96))
    assert parse_sizes_from_name("..._r64m112") == ((64, 64), (112, 112))
    assert parse_sizes_from_name("nothing") == (None, None)


def test_model_from_config_dispatch():
    from human_instance_segmentation_tpu.models.assembly import (
        HierarchicalInstanceSegmenter, PureRGBHierarchicalModel)

    flag = ConfigManager.get_config(
        "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_"
        "r64x48m128x96_disttrans_contdet_baware_from_b0")
    m = model_from_config(flag)
    assert isinstance(m, HierarchicalInstanceSegmenter)
    assert m.encoder_variant == "b0"
    assert m.roi_size == (64, 48) and m.mask_size == (128, 96)

    plain = ConfigManager.get_config("rgb_hierarchical_unet_v2")
    assert isinstance(model_from_config(plain), PureRGBHierarchicalModel)


def test_registry_families_build_claimed_architectures():
    """Every registry family dispatches to the model its name claims
    (VERDICT r1: pretrained_peopleseg configs silently built PureRGB)."""
    from human_instance_segmentation_tpu.models.assembly import (
        HierarchicalInstanceSegmenter, PureRGBHierarchicalModel,
        ROIPretrainedHierarchicalModel)
    from human_instance_segmentation_tpu.models.baseline import ROISegmentationModel

    expectations = {
        "baseline": ROISegmentationModel,
        "rgb_hierarchical_unet_v2": PureRGBHierarchicalModel,
        "rgb_hierarchical_unet_v2_attention_r64m64": PureRGBHierarchicalModel,
        "rgb_hierarchical_unet_v2_pretrained_peopleseg_r64x48m64x48":
            ROIPretrainedHierarchicalModel,
        "rgb_hierarchical_unet_v2_pretrained_peopleseg_frozen_r64x48m64x48":
            ROIPretrainedHierarchicalModel,
        "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_"
        "r64x48m64x48_disttrans_contdet_baware": HierarchicalInstanceSegmenter,
    }
    for name, cls in expectations.items():
        m = model_from_config(ConfigManager.get_config(name))
        assert isinstance(m, cls), f"{name} built {type(m).__name__}, wanted {cls.__name__}"

    frozen = model_from_config(ConfigManager.get_config(
        "rgb_hierarchical_unet_v2_pretrained_peopleseg_frozen_r64x48m64x48"))
    assert frozen.freeze_pretrained


@pytest.mark.slow  # compiles a full ROI-cropped UNet (~100 s on the 1-core host)
def test_roi_pretrained_model_forward():
    import jax
    import jax.numpy as jnp

    from human_instance_segmentation_tpu.models.assembly import (
        ROIPretrainedHierarchicalModel)

    model = ROIPretrainedHierarchicalModel(
        encoder_variant="tiny", roi_size=(16, 12), mask_size=(32, 24),
        image_size=(64, 64), feature_dim=32,
        unet_decoder_channels=(32, 24, 16, 16, 8))
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    rois = jnp.asarray([[0, 0.1, 0.1, 0.9, 0.9], [1, 0.2, 0.2, 0.7, 0.8]],
                       jnp.float32)
    variables = jax.jit(lambda r: model.init(r, imgs, rois, train=False))(
        jax.random.PRNGKey(0))
    logits, aux = model.apply(variables, imgs, rois, train=False)
    assert logits.shape == (2, 32, 24, 3)
    assert aux["pretrained_bg_fg_logits"].shape == (2, 16, 12, 2)
    assert aux["roi_patches"].shape == (2, 16, 12, 3)


def test_unknown_config_raises():
    with pytest.raises(KeyError):
        ConfigManager.get_config("definitely_not_a_config")


def test_fast_flagship_config_halves_head_width():
    """The b0-fast serving config: identical pipeline, 128-wide stage-2
    head, distilled from the 256-wide flagship (scripts/exp_b0_fast.py).
    No reference analogue — stage-2 is 68% of the TPU program's FLOPs."""
    from human_instance_segmentation_tpu.config import model_from_config

    fast = ConfigManager.get_config(
        "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_"
        "r64x48m64x48_disttrans_contdet_baware_fast")
    assert fast.model.head_mid_channels == 128
    m = model_from_config(fast)
    assert m.mid_channels == 128
    base = ConfigManager.get_config(
        "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_"
        "r64x48m64x48_disttrans_contdet_baware")
    assert model_from_config(base).mid_channels == 256
