"""Export / deployment artifacts.

TPU-native replacement for the reference's ONNX export stack
(/root/reference/export_hierarchical_instance_peopleseg_onnx.py,
src/human_edge_detection/export_onnx_advanced.py): instead of an .onnx
graph, an exported model is a directory

    params.msgpack    flax-serialised parameters (batch-stats folded)
    metadata.json     io contract + config (the reference's JSON sidecar,
                      export_hierarchical_instance_peopleseg_onnx.py:510-542)
    model.stablehlo   serialised jax.export artifact of the full deployed
                      forward (images, rois) -> (instance_masks,
                      binary_masks) — the XLA analogue of the ONNX file:
                      loadable and callable without the model code.

Includes universal BatchNorm folding: the reference performs post-hoc graph
surgery replacing two specific BN nodes with Mul/Add
(replace_target_batchnorms_with_affine, :207-328); here every BN in the
frozen stage folds into an affine at export, uniformly.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np


def detect_architecture_from_name(name: str) -> str:
    """b0/b1/b7 detection from checkpoint/config names
    (export_hierarchical_instance_peopleseg_onnx.py:30-62)."""
    s = name.lower()
    for arch in ("b0", "b1", "b3", "b7"):
        if f"from_{arch}" in s or f"best_model_{arch}" in s or f"_{arch}_" in s:
            return arch
    return "b1"


def fold_batch_stats(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold BatchNorm running statistics into the adjacent scale/bias.

    Returns a variables dict whose 'batch_stats' are identity (mean 0,
    var 1) and whose BN scale/bias absorb the normalisation:
        scale' = scale / sqrt(var + eps),  bias' = bias - mean * scale'.
    Inference output is bit-identical while every BN lowers to one fused
    multiply-add.
    """
    import flax
    import jax.numpy as jnp

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables.get("batch_stats", {}))

    def fold(p_node, s_node, path):
        for key, s_child in list(s_node.items()):
            p_child = p_node.get(key)
            if p_child is None:
                continue
            if isinstance(s_child, dict) and "mean" in s_child and "var" in s_child:
                mean = np.asarray(s_child["mean"])
                var = np.asarray(s_child["var"])
                # EfficientNet-encoder BNs use eps 1e-3 (TF convention);
                # UNet-decoder BNs use the torch default 1e-5.
                in_encoder = any("encoder" in str(p) for p in path + (key,))
                e = 1e-3 if in_encoder else 1e-5
                inv = 1.0 / np.sqrt(var + e)
                scale = np.asarray(p_child.get("scale", np.ones_like(mean)))
                bias = np.asarray(p_child.get("bias", np.zeros_like(mean)))
                p_child["scale"] = jnp.asarray(scale * inv)
                p_child["bias"] = jnp.asarray(bias - mean * scale * inv)
                s_child["mean"] = jnp.zeros_like(jnp.asarray(mean))
                s_child["var"] = jnp.ones_like(jnp.asarray(var))
            elif isinstance(s_child, dict):
                fold(p_child, s_child, path + (key,))

    fold(params, stats, ())
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def export_model(
    out_dir: str,
    model,
    variables: Dict[str, Any],
    image_size: Tuple[int, int],
    roi_size: Tuple[int, int],
    mask_size: Tuple[int, int],
    dilation_pixels: int = 0,
    roi_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16),
    batch_size: int = 1,
    config_name: str = "",
    fold_bn: bool = True,
    serialize_executable: bool = True,
) -> str:
    """Write the deployment artifact directory."""
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from .inference import deployed_outputs

    d = Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)

    if fold_bn and variables.get("batch_stats"):
        variables = fold_batch_stats(variables)

    (d / "params.msgpack").write_bytes(flax.serialization.to_bytes(variables))

    meta = {
        "framework": "human_instance_segmentation_tpu",
        "config_name": config_name,
        "image_size": list(image_size),
        "roi_size": list(roi_size),
        "mask_size": list(mask_size),
        "dilation_pixels": dilation_pixels,
        "roi_buckets": list(roi_buckets),
        "batch_size": batch_size,
        "inputs": {
            "images": f"({batch_size}, {image_size[0]}, {image_size[1]}, 3) float in [0,1] NHWC",
            "rois": "(N, 5) [batch_idx, x1, y1, x2, y2] normalised; pad with batch_idx=-1",
        },
        "outputs": {
            "instance_masks": f"(N, {mask_size[0]}, {mask_size[1]}, 1) {{0,1}}",
            "binary_masks": f"({batch_size}, {image_size[0]}, {image_size[1]}, 1) person prob",
        },
        "model_kwargs": {
            "encoder_variant": getattr(model, "encoder_variant", None),
        },
    }
    (d / "metadata.json").write_text(json.dumps(meta, indent=2))

    if serialize_executable:
        from jax import export as jexport

        def fn(variables, images, rois):
            logits, aux = model.apply(variables, images, rois, train=False)
            return deployed_outputs(logits, aux, rois, dilation_pixels)

        for bucket in roi_buckets:
            images = jax.ShapeDtypeStruct((batch_size, image_size[0], image_size[1], 3), jnp.float32)
            rois = jax.ShapeDtypeStruct((bucket, 5), jnp.float32)
            exported = jexport.export(jax.jit(fn))(
                jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables),
                images, rois)
            (d / f"model_n{bucket}.stablehlo").write_bytes(exported.serialize())

    return str(d)


def load_exported(artifact_dir: str):
    """Load an exported artifact: returns (call_fn, metadata).

    ``call_fn(images, rois)`` picks the right ROI-bucket executable, pads
    rois, and returns (instance_masks, binary_masks) — the reference's ONNX
    InferenceSession equivalent (test_hierarchical_instance_peopleseg_onnx.py:477).
    """
    import flax.serialization
    import jax
    from jax import export as jexport

    d = Path(artifact_dir)
    meta = json.loads((d / "metadata.json").read_text())
    variables = flax.serialization.msgpack_restore((d / "params.msgpack").read_bytes())

    buckets = sorted(int(m.group(1)) for p in d.glob("model_n*.stablehlo")
                     for m in [re.match(r"model_n(\d+)\.stablehlo", p.name)] if m)
    fns = {}
    for b in buckets:
        exported = jexport.deserialize((d / f"model_n{b}.stablehlo").read_bytes())
        fns[b] = exported.call

    def call(images: np.ndarray, rois: np.ndarray):
        from .inference import pad_rois

        n = rois.shape[0]
        bucket = next((b for b in buckets if b >= n), buckets[-1] if buckets else None)
        if bucket is None:
            raise ValueError("artifact has no serialised executables")
        rois_p = pad_rois(np.asarray(rois, np.float32), bucket)
        inst, binary = fns[bucket](variables, np.asarray(images, np.float32), rois_p)
        return np.asarray(inst)[:n], np.asarray(binary)

    return call, meta


def export_from_config(config_name: str, out_dir: str, variables=None,
                       dilation_pixels: int = 0, **export_kw) -> str:
    """Config-name driven export (the reference CLI path:
    detect arch -> config lookup -> build -> export)."""
    import jax
    import jax.numpy as jnp

    from .config import ConfigManager, _as_hw, model_from_config

    cfg = ConfigManager.get_config(config_name)
    model = model_from_config(cfg)
    ih, iw = _as_hw(cfg.model.image_size)
    if variables is None:
        images = jnp.zeros((1, ih, iw, 3), jnp.float32)
        rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
        variables = jax.jit(lambda r: model.init(r, images, rois, train=False))(
            jax.random.PRNGKey(0))
    return export_model(
        out_dir, model, variables,
        image_size=(ih, iw), roi_size=_as_hw(cfg.model.roi_size),
        mask_size=_as_hw(cfg.model.mask_size),
        dilation_pixels=dilation_pixels, config_name=config_name, **export_kw)


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir to load params from")
    p.add_argument("--dilation", type=int, default=0)
    p.add_argument("--no-executable", action="store_true")
    args = p.parse_args()

    variables = None
    if args.checkpoint:
        from .training.checkpoint import restore_checkpoint

        state, _ = restore_checkpoint(args.checkpoint, None)
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]

    path = export_from_config(args.config, args.out, variables,
                              dilation_pixels=args.dilation,
                              serialize_executable=not args.no_executable)
    print(f"exported to {path}")


if __name__ == "__main__":
    main()
