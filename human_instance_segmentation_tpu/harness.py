"""Deployment inference harness CLI.

TPU-native equivalent of the reference's ONNX test harness
(/root/reference/test_hierarchical_instance_peopleseg_onnx.py:458-623):
loads an exported artifact (or builds a fresh model from a config), runs it
over a directory of images with ROIs from GT annotations or full-frame
defaults, and writes instance / binary overlay PNGs.

Usage:
    python -m human_instance_segmentation_tpu.harness \
        --images /tmp/verify_his/images_resized_160x120 \
        [--artifact exported_dir | --config <name>] \
        [--annotations coco.json] [--mode instance|binary] --out out_dir
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .visualize import overlay_binary, overlay_instances, save_image


def load_image(path: Path, size_hw: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def rois_for_image(
    annotations, img_name: str, default: bool = True
) -> np.ndarray:
    """GT person boxes normalised by the ORIGINAL annotation dims
    (test harness :549-567); a centred default box if no annotations."""
    if annotations is not None:
        for img in annotations.dataset.get("images", []):
            if img["file_name"] == img_name:
                w, h = img["width"], img["height"]
                boxes = []
                for ann in annotations.load_anns(annotations.get_ann_ids(img["id"], iscrowd=False)):
                    x, y, bw, bh = ann["bbox"]
                    boxes.append([0.0, x / w, y / h, (x + bw) / w, (y + bh) / h])
                if boxes:
                    return np.asarray(boxes, np.float32)
    if default:
        return np.asarray([[0.0, 0.15, 0.05, 0.85, 0.98]], np.float32)
    return np.zeros((0, 5), np.float32)


def run_harness(
    images_dir: str,
    out_dir: str,
    artifact: Optional[str] = None,
    config: Optional[str] = None,
    annotations_path: Optional[str] = None,
    mode: str = "instance",
    max_images: int = 8,
    dilation: int = 0,
) -> List[str]:
    from .data.coco import COCOIndex

    annotations = COCOIndex(annotations_path) if annotations_path else None

    if artifact:
        from .export import load_exported

        call, meta = load_exported(artifact)
        ih, iw = meta["image_size"]
    else:
        from .config import ConfigManager, _as_hw, model_from_config
        from .inference import InferenceEngine

        import jax
        import jax.numpy as jnp

        cfg = ConfigManager.get_config(
            config or "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_"
                      "r64x48m128x96_disttrans_contdet_baware_from_b0")
        model = model_from_config(cfg)
        ih, iw = _as_hw(cfg.model.image_size)
        init_img = jnp.zeros((1, ih, iw, 3), jnp.float32)
        init_rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
        params = jax.jit(lambda r: model.init(r, init_img, init_rois, train=False))(
            jax.random.PRNGKey(0))
        call = InferenceEngine(model, params, dilation_pixels=dilation)

    written = []
    files = sorted(Path(images_dir).glob("*.jpg"))[:max_images]
    t_total = 0.0
    for f in files:
        image = load_image(f, (ih, iw))
        rois = rois_for_image(annotations, f.name)
        t0 = time.perf_counter()
        inst, binary = call(image[None], rois)
        t_total += time.perf_counter() - t0
        if mode == "binary":
            vis = overlay_binary(image, binary[0])
        else:
            vis = overlay_instances(image, inst, rois[:, 1:5])
        out_path = str(Path(out_dir) / f"{f.stem}_{mode}.png")
        save_image(out_path, vis)
        written.append(out_path)
    if files:
        print(f"{len(files)} images, {t_total / len(files) * 1e3:.1f} ms/img "
              f"(incl. host transfers), outputs in {out_dir}")
    return written


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True)
    p.add_argument("--out", default="harness_out")
    p.add_argument("--artifact", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--annotations", default=None)
    p.add_argument("--mode", choices=["instance", "binary"], default="instance")
    p.add_argument("--max_images", type=int, default=8)
    p.add_argument("--dilation", type=int, default=0)
    args = p.parse_args()
    run_harness(args.images, args.out, args.artifact, args.config,
                args.annotations, args.mode, args.max_images, args.dilation)


if __name__ == "__main__":
    main()
