"""Curated per-epoch validation scenes (training/loop.py; reference:
train_distillation_staged.py:584-763 renders fixed 1/2/3/5-person images
every epoch as its visual-regression tool)."""

import json
import os
import tarfile
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def coco_tree(tmp_path_factory):
    """Bundled images + a synthetic annotation JSON with 1/2/3-person
    images, laid out the way the training CLI expects."""
    tar = Path("/root/reference/test_data/images_resized_160x120.tar.gz")
    if not tar.exists():
        pytest.skip("bundled test images unavailable")
    root = tmp_path_factory.mktemp("coco")
    with tarfile.open(tar) as tf:
        tf.extractall(root)
    img_dir = root / "images_resized_160x120"
    from PIL import Image

    files = sorted(img_dir.glob("*.jpg"))[:3]
    images, annotations = [], []
    ann_id = 1
    for i, (f, n_persons) in enumerate(zip(files, (1, 2, 3))):
        w, h = Image.open(f).size
        images.append({"id": i + 1, "file_name": f.name,
                       "width": w, "height": h})
        for j in range(n_persons):
            box = [5 + 30 * j, 10, 25, 70]
            x, y, bw, bh = box
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": 1,
                "bbox": box, "area": bw * bh, "iscrowd": 0,
                "segmentation": [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]],
            })
            ann_id += 1
    ann_path = root / "ann.json"
    ann_path.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}]}))
    return str(ann_path), str(img_dir)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="slow tier")
def test_curated_scenes_rendered_each_validation_epoch(coco_tree, tmp_path):
    from human_instance_segmentation_tpu.training.loop import run_training

    ann, img_dir = coco_tree
    out = str(tmp_path / "run")
    m = run_training(
        "rgb_hierarchical_unet_v2", steps=6, tiny=True, output_dir=out,
        platform="cpu",
        config_modifications={
            "data": {"train_annotation": ann, "train_img_dir": img_dir,
                     "val_annotation": ann, "val_img_dir": img_dir,
                     "use_augmentation": False, "num_workers": 1},
            "training": {"batch_size": 1, "validate_every": 1},
        })
    assert np.isfinite(m["total_loss"])
    # 3 val images with 1/2/3 instances -> three curated labels, rendered
    # at the first validation epoch (epoch 0 after 3 steps) and again at
    # epoch 1 (6 steps, 3 imgs/epoch at batch 1)
    viz = sorted(p.name for p in Path(out, "visualizations").glob("epoch*"))
    assert any("1person" in v for v in viz), viz
    assert any("2person" in v for v in viz), viz
    assert any("3person" in v for v in viz), viz
    epochs = {v.split("_")[0] for v in viz}
    assert len(epochs) >= 2, viz  # rendered at more than one epoch
    # aux-head diagnostic panels next to every curated grid
    # (visualize_auxiliary.py parity)
    assert any(v.endswith("_aux.png") for v in viz), viz
