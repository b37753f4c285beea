"""Visualisation units: aux-head diagnostic panels (reference parity:
visualize_auxiliary.py + advanced/hierarchical_unet_visualizer.py render
the bg/fg branch, t/nt branch, fg-attention, contour and distance aux
outputs per epoch alongside pred/GT)."""

import numpy as np

from human_instance_segmentation_tpu.visualize import (
    auxiliary_grid,
    auxiliary_report,
    heatmap,
)


def test_heatmap_range_and_shape():
    h = heatmap(np.linspace(0, 1, 12).reshape(3, 4))
    assert h.shape == (3, 4, 3)
    assert h.min() >= 0.0 and h.max() <= 1.0
    # 'hot' ramp: low values are dark, high values near white
    assert h[0, 0].sum() < 0.2
    assert h[-1, -1].sum() > 2.8


def test_auxiliary_grid_panel_count():
    rng = np.random.default_rng(0)
    mh, mw = 16, 12
    roi = rng.random((24, 20, 3)).astype(np.float32)
    logits = rng.standard_normal((mh, mw, 3)).astype(np.float32)
    gt = rng.integers(0, 3, (mh, mw)).astype(np.int32)
    aux = {
        "bg_fg_logits": rng.standard_normal((mh, mw, 2)),
        "target_nontarget_logits": rng.standard_normal((mh, mw, 2)),
        "fg_attention": rng.random((8, 6, 4)),
        "contours": rng.standard_normal((8, 6, 1)),
        "distance_map": rng.random((8, 6, 1)),
        "distance_mask": rng.standard_normal((8, 6, 1)),
    }
    grid = auxiliary_grid(roi, logits, aux, gt_mask=gt)
    # roi + pred + gt + 6 aux panels, all resized to (mh, mw)
    assert grid.shape == (mh, 9 * mw, 3)
    assert np.isfinite(grid).all()
    assert grid.min() >= 0.0 and grid.max() <= 1.0

    # no gt, partial aux -> fewer panels, still well-formed
    grid2 = auxiliary_grid(roi, logits, {"bg_fg_logits": aux["bg_fg_logits"]})
    assert grid2.shape == (mh, 3 * mw, 3)


def test_auxiliary_report_stacks_rois_and_writes(tmp_path):
    rng = np.random.default_rng(1)
    n, mh, mw = 3, 8, 8
    crops = rng.random((n, 10, 10, 3)).astype(np.float32)
    logits = rng.standard_normal((n, mh, mw, 3)).astype(np.float32)
    aux = {
        "bg_fg_logits": rng.standard_normal((n, mh, mw, 2)),
        "fg_attention": rng.random((n, 4, 4, 2)),
        "scalar_metric": np.float32(0.5),  # non-spatial entries are skipped
    }
    out = tmp_path / "aux.png"
    grid = auxiliary_report(crops, logits, aux, str(out))
    assert out.exists()
    assert grid.shape == (n * mh, 4 * mw, 3)
