"""Visualisation: mask overlays and validation grids.

Replaces the reference's ~3,800 LoC of matplotlib/seaborn viz
(visualize.py, advanced/hierarchical_unet_visualizer.py,
test_hierarchical_instance_peopleseg_onnx.py:230-402) with a compact
PIL/numpy implementation: HSV-coloured per-instance overlays pasted back
into their ROI boxes, binary-mask green overlays, and side-by-side
GT / prediction grids written per validation epoch.
"""

from __future__ import annotations

import colorsys
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def instance_palette(n: int) -> List[Tuple[int, int, int]]:
    """n visually-distinct colors (HSV wheel, the harness's scheme)."""
    return [
        tuple(int(255 * c) for c in colorsys.hsv_to_rgb(i / max(n, 1), 0.9, 1.0))
        for i in range(n)
    ]


def paste_mask_into_box(
    mask: np.ndarray, box: Sequence[float], image_hw: Tuple[int, int]
) -> np.ndarray:
    """Resize a ROI mask into its normalised box on a full-image canvas
    (test_hierarchical_instance_peopleseg_onnx.py:230-300)."""
    from PIL import Image

    ih, iw = image_hw
    x1 = int(round(box[0] * iw))
    y1 = int(round(box[1] * ih))
    x2 = max(int(round(box[2] * iw)), x1 + 1)
    y2 = max(int(round(box[3] * ih)), y1 + 1)
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(x2, iw), min(y2, ih)
    canvas = np.zeros((ih, iw), np.float32)
    if x2 <= x1 or y2 <= y1:
        return canvas
    m = Image.fromarray((np.squeeze(mask) * 255).astype(np.uint8))
    m = m.resize((x2 - x1, y2 - y1), Image.BILINEAR)
    canvas[y1:y2, x1:x2] = np.asarray(m, np.float32) / 255.0
    return canvas


def overlay_instances(
    image: np.ndarray,
    instance_masks: np.ndarray,
    boxes: np.ndarray,
    alpha: float = 0.5,
    threshold: float = 0.5,
) -> np.ndarray:
    """HSV-coloured instance overlay. image (H, W, 3) in [0,1];
    instance_masks (N, mh, mw, 1); boxes (N, 4) normalised."""
    out = image.copy()
    colors = instance_palette(len(boxes))
    for i, (mask, box) in enumerate(zip(instance_masks, boxes)):
        full = paste_mask_into_box(mask, box, image.shape[:2]) > threshold
        color = np.asarray(colors[i], np.float32) / 255.0
        out[full] = (1 - alpha) * out[full] + alpha * color
    return np.clip(out, 0.0, 1.0)


def overlay_binary(image: np.ndarray, binary_mask: np.ndarray,
                   alpha: float = 0.5, threshold: float = 0.5) -> np.ndarray:
    """Green overlay of the stage-1 person mask (harness binary mode,
    :294-333)."""
    out = image.copy()
    m = np.squeeze(binary_mask) > threshold
    green = np.asarray([0.0, 1.0, 0.0], np.float32)
    out[m] = (1 - alpha) * out[m] + alpha * green
    return np.clip(out, 0.0, 1.0)


def save_image(path: str, image: np.ndarray) -> None:
    from PIL import Image

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8)).save(path)


def colorize_classes(mask: np.ndarray) -> np.ndarray:
    """3-class mask -> RGB (bg black, target green, non-target red)."""
    h, w = mask.shape
    rgb = np.zeros((h, w, 3), np.float32)
    rgb[mask == 1] = [0.1, 0.9, 0.1]
    rgb[mask == 2] = [0.9, 0.2, 0.2]
    return rgb


def validation_grid(
    image: np.ndarray,
    gt_masks: np.ndarray,
    pred_logits: np.ndarray,
    boxes: np.ndarray,
    binary_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """GT / prediction / (optional stage-1) rows for one sample — the
    per-epoch validation grid (visualize.py / hierarchical_unet_visualizer)."""
    from PIL import Image

    ih, iw = image.shape[:2]
    pred_cls = np.argmax(pred_logits, axis=-1)  # (N, mh, mw)
    rows = []

    def to_panel(m3):
        return 0.5 * image + 0.5 * m3

    gt_canvas = np.zeros((ih, iw), np.int32)
    pred_canvas = np.zeros((ih, iw), np.int32)
    for i, box in enumerate(boxes):
        g = paste_mask_into_box((gt_masks[i] == 1).astype(np.float32), box, (ih, iw)) > 0.5
        p = paste_mask_into_box((pred_cls[i] == 1).astype(np.float32), box, (ih, iw)) > 0.5
        gt_canvas[g] = 1
        pred_canvas[p] = 1
    rows.append(np.concatenate([image, to_panel(colorize_classes(gt_canvas))], axis=1))
    rows.append(np.concatenate(
        [overlay_instances(image, (pred_cls == 1).astype(np.float32)[..., None], boxes),
         to_panel(colorize_classes(pred_canvas))], axis=1))
    if binary_mask is not None:
        b = overlay_binary(image, binary_mask)
        rows.append(np.concatenate([b, b], axis=1))
    return np.concatenate(rows, axis=0)


def confusion_matrix_png(
    cm,
    class_names: Sequence[str],
    path: str,
    title: str = "",
    cell: int = 72,
) -> None:
    """Render a row-normalized confusion-matrix heatmap to ``path``.

    PIL replacement for the reference's per-epoch seaborn heatmaps
    (train_utils.py:50-82): blue-scale cells, count + row-percentage text,
    axis labels (rows = true class, columns = predicted).
    """
    from PIL import Image, ImageDraw

    cm = np.asarray(cm, np.float64)
    n = cm.shape[0]
    rows = np.clip(cm.sum(axis=1, keepdims=True), 1e-9, None)
    norm = cm / rows

    margin = cell  # left/top label band
    w, h = margin + n * cell, margin + n * cell + (cell // 2 if title else 0)
    img = Image.new("RGB", (w, h), (255, 255, 255))
    dr = ImageDraw.Draw(img)
    y0 = cell // 2 if title else 0
    if title:
        dr.text((margin, cell // 8), title, fill=(0, 0, 0))

    for i in range(n):
        for j in range(n):
            v = float(norm[i, j])
            # white -> saturated blue
            col = (int(255 - 200 * v), int(255 - 150 * v), 255)
            x, y = margin + j * cell, y0 + margin + i * cell
            dr.rectangle([x, y, x + cell - 1, y + cell - 1], fill=col,
                         outline=(160, 160, 160))
            txt = f"{int(cm[i, j])}\n{100 * v:.1f}%"
            fill = (255, 255, 255) if v > 0.6 else (0, 0, 0)
            dr.multiline_text((x + 4, y + cell // 3), txt, fill=fill)

    for k, name in enumerate(class_names[:n]):
        dr.text((margin + k * cell + 4, y0 + margin - 14), str(name), fill=(0, 0, 0))
        dr.text((4, y0 + margin + k * cell + cell // 2 - 6), str(name), fill=(0, 0, 0))
    dr.text((4, y0 + 4), "true \\ pred", fill=(90, 90, 90))

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    img.save(path)
