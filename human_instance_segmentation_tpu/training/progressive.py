"""Progressive feature activation + cross-model weight transfer.

TPU-native rework of the reference's progressive-training machinery
(/root/reference/src/human_edge_detection/experiments/progressive_training.py:12-140):

- ``ProgressiveTrainingSchedule`` there rebuilds configs (and therefore
  models) per phase so multiscale/distance/cascade features switch on at
  scheduled epochs. Under jit, swapping model architectures mid-run would
  change the parameter tree and force checkpoint surgery every phase; the
  idiomatic JAX equivalent keeps the parameter tree STATIC (build every
  branch up front — untrained branches are cheap) and gates the LOSS TERMS
  on the epoch schedule instead. Switching a feature on recompiles one
  train step, exactly like the reference's optimizer rebuild.
- ``ProgressiveModelBuilder.transfer_weights`` (name/shape-matched,
  non-strict state_dict copy) becomes a pytree path/shape matcher for the
  genuinely cross-architecture moves (e.g. warm-starting a cascade config
  from a trained V2 flagship), where loss gating cannot help.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

# feature name -> (config group attr, flag attr). These are the loss-side
# features the reference's default schedule staggers
# (progressive_training.py:29-36); contour/distance/boundary map to the
# refinement losses this repo gates through loss_config_from_experiment.
FEATURE_FLAGS: Dict[str, Tuple[str, str]] = {
    "distance_loss": ("distance_loss", "enabled"),
    "contour_detection": ("model", "use_contour_detection"),
    "distance_transform": ("model", "use_distance_transform"),
    "active_contour": ("model", "use_active_contour_loss"),
    "boundary_aware": ("model", "use_boundary_aware_loss"),
}


def active_features(schedule: Dict[str, int], epoch: int) -> List[str]:
    """Features whose activation epoch has been reached
    (progressive_training.py:39-48)."""
    return sorted(f for f, e in schedule.items() if epoch >= int(e))


def activation_epochs(schedule: Dict[str, int]) -> List[int]:
    """Distinct epochs at which the active-feature set changes."""
    return sorted({int(e) for e in schedule.values()})


def gate_config(cfg: Any, schedule: Dict[str, int], epoch: int) -> Any:
    """Copy of an ExperimentConfig with scheduled-but-not-yet-active
    features disabled (progressive_training.py:54-66 built a fresh config
    per phase; here only the loss-relevant flags move — the model, and
    therefore the parameter tree, never changes).

    A feature listed in the schedule must be enabled in the base config;
    the schedule decides WHEN its loss term starts contributing.
    """
    cfg = dataclasses.replace(cfg)
    for feature, start in schedule.items():
        if feature not in FEATURE_FLAGS:
            raise ValueError(
                f"unknown progressive feature {feature!r}; known: "
                f"{sorted(FEATURE_FLAGS)}")
        group_name, attr = FEATURE_FLAGS[feature]
        group = getattr(cfg, group_name)
        if epoch < int(start):
            setattr(cfg, group_name,
                    dataclasses.replace(group, **{attr: False}))
    return cfg


# ---------------------------------------------------------------------------
# Cross-model weight transfer
# ---------------------------------------------------------------------------


def _flatten(tree: Any) -> Dict[Tuple[str, ...], Any]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        tuple(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in flat
    }


def transfer_weights(
    source: Any, target: Any, strict: bool = False
) -> Tuple[Any, Dict[str, Any]]:
    """Copy every source leaf whose path+shape match into target.

    Pytree analogue of ProgressiveModelBuilder.transfer_weights
    (progressive_training.py:72-115): exact path matches first; with
    ``strict=False``, unmatched source leaves then try a suffix match (the
    last two path components — the reference's _match_layer_names), taking
    the first target leaf of the same shape not already written.

    Returns (new_target, report) where report maps '/'-joined source paths
    to "copied" / "suffix:<target path>" / "shape_mismatch" / "missing".
    """
    src = _flatten(source)
    dst = _flatten(target)
    out = dict(dst)
    written = set()
    report: Dict[str, Any] = {}

    def shapes_match(a, b) -> bool:
        return np.shape(a) == np.shape(b)

    for path, leaf in src.items():
        key = "/".join(path)
        if path in dst:
            if shapes_match(leaf, dst[path]):
                out[path] = leaf
                written.add(path)
                report[key] = "copied"
            else:
                report[key] = "shape_mismatch"
            continue
        if strict:
            report[key] = "missing"
            continue
        suffix = path[-2:]
        for tpath in dst:
            if tpath[-2:] == suffix and tpath not in written \
                    and shapes_match(leaf, dst[tpath]):
                out[tpath] = leaf
                written.add(tpath)
                report[key] = "suffix:" + "/".join(tpath)
                break
        else:
            report[key] = "missing"

    treedef = jax.tree_util.tree_structure(target)
    paths = [tuple(str(getattr(k, "key", k)) for k in p)
             for p, _ in jax.tree_util.tree_flatten_with_path(target)[0]]
    new_target = jax.tree_util.tree_unflatten(treedef, [out[p] for p in paths])
    n_copied = sum(1 for v in report.values() if v != "missing" and v != "shape_mismatch")
    report["_summary"] = f"transferred {n_copied}/{len(src)} leaves"
    return new_target, report
