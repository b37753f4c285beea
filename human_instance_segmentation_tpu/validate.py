"""Standalone validation CLI.

Equivalent of the reference's validate.py / validate_advanced.py: rebuild a
model from a named config (+ optional orbax checkpoint), run the full metric
stack (target IoU, detection rates @0.5/@0.7, precision/recall/F1,
instance-separation accuracy, confusion matrices —
/root/reference/src/human_edge_detection/train_utils.py:109-404) over a COCO
dataset or synthetic batches, and print a JSON report.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, Optional

import numpy as np


def run_validation(
    config_name: str,
    checkpoint: Optional[str] = None,
    annotations: Optional[str] = None,
    image_dir: Optional[str] = None,
    synthetic_batches: int = 0,
    batch_size: int = 4,
    tiny: bool = False,
    platform: Optional[str] = None,
    cm_png_dir: Optional[str] = None,
) -> Dict[str, float]:
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    import jax
    import jax.numpy as jnp

    from .config import ConfigManager, _as_hw, model_from_config
    from .training.metrics import batch_metrics, finalize_metrics
    from .training.steps import rois_from_boxes

    cfg = ConfigManager.get_config(config_name)
    if tiny:
        cfg.model.image_size = (64, 64)
        cfg.model.roi_size = (16, 12)
        cfg.model.mask_size = (32, 24)
        cfg.model.encoder_name = "tiny"
        cfg.model.hierarchical_base_channels = 16
        cfg.model.hierarchical_depth = 2
        cfg.data.rois_per_image = 2
    model = model_from_config(cfg)
    if tiny and hasattr(model, "mid_channels"):
        model = model.clone(mid_channels=32, feature_dim=32,
                            unet_decoder_channels=(32, 24, 16, 16, 8))

    ih, iw = _as_hw(cfg.model.image_size)
    mh, mw = _as_hw(cfg.model.mask_size)
    k = cfg.data.rois_per_image

    init_img = jnp.zeros((1, ih, iw, 3), jnp.float32)
    init_rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
    variables = jax.jit(lambda r: model.init(r, init_img, init_rois, train=False))(
        jax.random.PRNGKey(0))
    if checkpoint:
        from .training.checkpoint import restore_checkpoint

        state, step = restore_checkpoint(checkpoint, None)
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        print(f"loaded checkpoint step {step}")

    @jax.jit
    def eval_batch(variables, batch):
        rois = rois_from_boxes(batch["boxes"])
        logits, _ = model.apply(variables, batch["images"], rois, train=False)
        b, kk = batch["boxes"].shape[:2]
        targets = batch["masks"].reshape(b * kk, mh, mw)
        valid = batch["valid"].reshape(b * kk)
        return batch_metrics(logits, targets, valid)

    def batches():
        if synthetic_batches > 0:
            rng = np.random.default_rng(0)
            for _ in range(synthetic_batches):
                yield {
                    "images": rng.random((batch_size, ih, iw, 3), np.float32),
                    "boxes": np.tile(np.asarray([[0.2, 0.2, 0.8, 0.8]], np.float32),
                                     (batch_size, k, 1)),
                    "masks": rng.integers(0, 3, (batch_size, k, mh, mw)).astype(np.int32),
                    "valid": np.ones((batch_size, k), np.float32),
                }
        else:
            from .data import (COCOInstanceSegmentationDataset, DatasetConfig,
                               padded_batch_iterator)

            ds = COCOInstanceSegmentationDataset(
                annotations or cfg.data.val_annotation,
                image_dir or cfg.data.val_img_dir,
                DatasetConfig(image_size=(ih, iw), mask_size=(mh, mw), rois_per_image=k))
            # padded (not ragged) tail batch: one static shape per sweep
            yield from padded_batch_iterator(ds, batch_size)

    sums = None
    for batch in batches():
        m = jax.device_get(eval_batch(variables, batch))
        if sums is None:
            sums = m
        else:
            sums = {kk2: sums[kk2] + m[kk2] for kk2 in sums}
    if sums is None:
        raise RuntimeError("no validation data")
    report = finalize_metrics(sums)
    if cm_png_dir:
        # per-sweep confusion-matrix heatmaps (reference renders these per
        # epoch via seaborn, train_utils.py:50-82 / 379-397)
        from .visualize import confusion_matrix_png

        names = {"cm3": ("bg", "target", "non-target"),
                 "cm_bgfg": ("bg", "fg"),
                 "cm_tnt": ("target", "non-target")}
        for key, cls in names.items():
            confusion_matrix_png(
                np.asarray(jax.device_get(sums[key])), cls,
                f"{cm_png_dir}/{key}.png", title=key)
    print(json.dumps(report, indent=2))
    return report


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--annotations", default=None)
    p.add_argument("--image_dir", default=None)
    p.add_argument("--synthetic", type=int, default=0, help="N synthetic batches")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default=None)
    p.add_argument("--cm_png_dir", default=None,
                   help="write confusion-matrix heatmap PNGs here")
    args = p.parse_args()
    run_validation(args.config, args.checkpoint, args.annotations, args.image_dir,
                   args.synthetic, args.batch_size, args.tiny, args.platform,
                   cm_png_dir=args.cm_png_dir)


if __name__ == "__main__":
    main()
