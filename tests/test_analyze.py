"""Analysis CLI subcommands (reference analyze_*.py equivalents)."""

import json

import numpy as np
import pytest

from human_instance_segmentation_tpu.analyze import (
    analyze_bboxes, analyze_roi_sizes, analyze_temperature, analyze_training,
    list_images_by_size, main as analyze_main)
from human_instance_segmentation_tpu.data import COCOIndex

ANNS = {
    "images": [
        {"id": 1, "file_name": "a.jpg", "width": 640, "height": 480},
        {"id": 2, "file_name": "b.jpg", "width": 320, "height": 240},
    ],
    "annotations": [
        {"id": 1, "image_id": 1, "bbox": [10, 10, 100, 200], "iscrowd": 0,
         "segmentation": [[10, 10, 110, 10, 110, 210, 10, 210]]},
        {"id": 2, "image_id": 1, "bbox": [300, 50, 20, 20], "iscrowd": 0,
         "segmentation": [[300, 50, 320, 50, 320, 70, 300, 70]]},
        # tiny (min side < 30) AND extreme aspect (10:1)
        {"id": 3, "image_id": 2, "bbox": [5, 5, 100, 10], "iscrowd": 0,
         "segmentation": [[5, 5, 105, 5, 105, 15, 5, 15]]},
        # degenerate
        {"id": 4, "image_id": 2, "bbox": [5, 5, 0, 10], "iscrowd": 0,
         "segmentation": [[5, 5, 5, 5, 5, 15]]},
    ],
}


def test_bboxes_flags_issues():
    rep = analyze_bboxes(COCOIndex(ANNS))
    assert rep["num_boxes"] == 4
    assert rep["issues"]["degenerate"] == 1
    assert rep["issues"]["tiny_lt_30px"] >= 2  # 20x20 and 100x10
    assert rep["issues"]["extreme_aspect"] == 1
    assert rep["width"][50] > 0


def test_roi_sizes_scaled_to_image_size():
    rep = analyze_roi_sizes(COCOIndex(ANNS), image_size=(640, 640))
    assert rep["num_boxes"] == 3
    # image 1 is 640x480 -> sy = 640/480: the 200-high box becomes ~266.7
    assert rep["roi_height_px"][95] > 200
    sh, sw = rep["suggested_roi_size"]
    assert sh % 16 == 0 and sw % 16 == 0 and sh >= 16 and sw >= 16


def test_temperature_sweep_monotone_schedule():
    rep = analyze_temperature(t_init=10.0, t_final=1.0, epochs=5,
                              schedule="linear")
    temps = [r["temperature"] for r in rep["rows"]]
    assert temps[0] == 10.0 and temps[-1] == 1.0
    assert all(t0 >= t1 for t0, t1 in zip(temps, temps[1:]))
    assert all(0.0 <= r["kl"] <= 5.0 for r in rep["rows"])
    # at high T the distributions are squashed together -> smaller raw KL
    assert rep["rows"][0]["kl"] < rep["rows"][-1]["kl"]


def test_training_summary_best_epoch(tmp_path):
    p = tmp_path / "train_x.jsonl"
    rows = [
        {"step": 10, "prefix": "train", "total_loss": 2.0},
        {"step": 10, "prefix": "val", "total_loss": 1.8, "target_miou": 0.5},
        {"step": 20, "prefix": "train", "total_loss": 1.0},
        {"step": 20, "prefix": "val", "total_loss": 1.1, "target_miou": 0.72},
        {"step": 30, "prefix": "val", "total_loss": 1.2, "target_miou": 0.65},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    rep = analyze_training(str(tmp_path))  # dir form picks the jsonl
    assert rep["best"] == {"step": 20, "target_miou": 0.72}
    assert rep["prefixes"]["train"]["loss_last"] == 1.0
    assert rep["prefixes"]["val"]["rows"] == 3


def test_images_by_size_and_resize(tmp_path):
    from PIL import Image

    root = tmp_path / "imgs"
    root.mkdir()
    Image.fromarray(np.zeros((480, 640, 3), np.uint8)).save(root / "a.jpg")

    names = list_images_by_size(COCOIndex(ANNS), (640, 480))
    assert names == ["a.jpg"]
    out = tmp_path / "small"
    names = list_images_by_size(COCOIndex(ANNS), (640, 480), resize=(320, 240),
                                images_root=str(root), out_dir=str(out))
    assert (out / "a.jpg").exists()
    assert Image.open(out / "a.jpg").size == (320, 240)


def test_legacy_cli_still_stats(tmp_path, capsys):
    ann_path = tmp_path / "anns.json"
    ann_path.write_text(json.dumps(ANNS))
    out = tmp_path / "stats.json"
    analyze_main(["--annotations", str(ann_path), "--out", str(out)])
    assert out.exists()
    ratios = json.loads(capsys.readouterr().out.strip())
    assert set(ratios) == {"background", "target", "non_target"}


@pytest.mark.slow
def test_complexity_tiny_config():
    from human_instance_segmentation_tpu.analyze import analyze_complexity
    from human_instance_segmentation_tpu.config import ConfigManager

    name = ConfigManager.list_configs()[0]
    rep = analyze_complexity([name], tiny=True)
    assert rep[name]["params"] > 0
    assert rep[name]["gflops_per_image"] > 0
