"""Dataset analysis CLI: the `data_analyze_*.json` producer.

Equivalent of the reference's analysis tooling (analyze_data_full.py and
the 20 analyze_*.py scripts' core outputs): computes the dataset statistics
the training loop consumes — image/instance counts, per-class pixel ratios
(background / target / non-target over ROI masks), instance-count histogram,
bbox size/aspect stats. Output schema matches
/root/reference/data_analyze_full.json (pixel ratios .4865/.3660/.1476 on
full COCO-person).
"""

from __future__ import annotations

import argparse
import json
from collections import Counter
from typing import Dict, Optional

import numpy as np


def analyze_dataset(
    annotations: str,
    image_dir: str = "",
    mask_size=(56, 56),
    rois_per_image: int = 10,
    max_images: Optional[int] = None,
) -> Dict:
    from .data import COCOIndex
    from .data.coco import ann_to_mask

    coco = annotations if isinstance(annotations, COCOIndex) else COCOIndex(annotations)
    img_ids = coco.get_img_ids()
    if max_images:
        img_ids = img_ids[:max_images]

    num_instances = 0
    pixel_counts = np.zeros(3, np.int64)
    inst_hist: Counter = Counter()
    widths, heights, aspects = [], [], []

    for img_id in img_ids:
        info = coco.load_imgs(img_id)[0]
        anns = coco.load_anns(coco.get_ann_ids(img_id, iscrowd=False))
        if not anns:
            continue
        inst_hist[min(len(anns), 20)] += 1
        num_instances += len(anns)
        masks = [ann_to_mask(a, info["height"], info["width"]) for a in anns]
        for ti, ann in enumerate(anns[:rois_per_image]):
            x, y, w, h = [int(round(v)) for v in ann["bbox"]]
            x2, y2 = min(x + max(w, 1), info["width"]), min(y + max(h, 1), info["height"])
            x, y = max(x, 0), max(y, 0)
            if x2 <= x or y2 <= y:
                continue
            roi = np.zeros((y2 - y, x2 - x), np.uint8)
            roi[masks[ti][y:y2, x:x2] > 0] = 1
            for oi, om in enumerate(masks):
                if oi != ti:
                    roi[(om[y:y2, x:x2] > 0) & (roi == 0)] = 2
            counts = np.bincount(roi.reshape(-1), minlength=3)
            pixel_counts += counts[:3]
            widths.append(w)
            heights.append(h)
            aspects.append(w / max(h, 1))

    total = max(int(pixel_counts.sum()), 1)
    return {
        "num_images": len(img_ids),
        "num_instances": num_instances,
        "pixel_ratios": {
            "background": round(float(pixel_counts[0]) / total, 4),
            "target": round(float(pixel_counts[1]) / total, 4),
            "non_target": round(float(pixel_counts[2]) / total, 4),
        },
        "instance_count_histogram": dict(sorted(inst_hist.items())),
        "bbox_stats": {
            "width_mean": float(np.mean(widths)) if widths else 0.0,
            "height_mean": float(np.mean(heights)) if heights else 0.0,
            "aspect_mean": float(np.mean(aspects)) if aspects else 0.0,
            "aspect_p05": float(np.percentile(aspects, 5)) if aspects else 0.0,
            "aspect_p95": float(np.percentile(aspects, 95)) if aspects else 0.0,
        },
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--annotations", required=True)
    p.add_argument("--out", default="data_analyze.json")
    p.add_argument("--max_images", type=int, default=None)
    args = p.parse_args()
    stats = analyze_dataset(args.annotations, max_images=args.max_images)
    with open(args.out, "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats["pixel_ratios"]))


if __name__ == "__main__":
    main()
