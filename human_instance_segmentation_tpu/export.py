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


def collect_bn_eps(model, variables, image_size: Tuple[int, int],
                   batch_size: int = 1) -> Dict[str, float]:
    """Map module path -> BatchNorm epsilon, read from the modules themselves.

    Abstractly traces ``model.apply`` under a flax method interceptor and
    records ``module.epsilon`` for every module that declares one (nn.BatchNorm
    and the fused-path ``_BNParams`` holders). The fold then uses the eps each
    module actually computes with — no name-based guessing (a renamed module
    can otherwise silently fold with the wrong eps; the encoder uses the TF
    convention 1e-3 while decoder BNs use the torch default 1e-5).
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    eps: Dict[str, float] = {}

    def interceptor(next_fn, args, kwargs, context):
        m = context.module
        e = getattr(m, "epsilon", None)
        if e is not None and m.path:
            eps["/".join(m.path)] = float(e)
        return next_fn(*args, **kwargs)

    images = jax.ShapeDtypeStruct((batch_size, image_size[0], image_size[1], 3),
                                  jnp.float32)
    rois = jax.ShapeDtypeStruct((1, 5), jnp.float32)

    def fn(v, images, rois):
        with nn.intercept_methods(interceptor):
            return model.apply(v, images, rois, train=False)

    jax.eval_shape(fn, jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables),
        images, rois)
    return eps


def fold_batch_stats(variables: Dict[str, Any],
                     eps_by_path: Optional[Dict[str, float]] = None,
                     default_eps: Optional[float] = None) -> Dict[str, Any]:
    """Fold BatchNorm running statistics into the adjacent scale/bias.

    Returns a variables dict whose 'batch_stats' are identity (mean 0,
    var 1) and whose BN scale/bias absorb the normalisation:
        scale' = scale / sqrt(var + eps),  bias' = bias - mean * scale'.
    Inference output is bit-identical while every BN lowers to one fused
    multiply-add.

    ``eps_by_path`` (from :func:`collect_bn_eps`) supplies each BN's epsilon
    as the module itself declares it. A BN whose path is missing falls back
    to ``default_eps``; with neither available the fold raises rather than
    guess (eps 1e-3 vs 1e-5 is a ~1e-3 relative output error per BN).
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
                mod_path = "/".join(str(p) for p in path + (key,))
                e = (eps_by_path or {}).get(mod_path, default_eps)
                if e is None:
                    raise ValueError(
                        f"no epsilon known for BatchNorm at {mod_path!r}: pass "
                        "eps_by_path=collect_bn_eps(model, variables, image_size) "
                        "or an explicit default_eps")
                inv = 1.0 / np.sqrt(var + e)
                scale = np.asarray(p_child.get("scale", np.ones_like(mean)))
                bias = np.asarray(p_child.get("bias", np.zeros_like(mean)))
                p_child["scale"] = jnp.asarray(scale * inv)
                p_child["bias"] = jnp.asarray(bias - mean * scale * inv)
                s_child["mean"] = jnp.zeros_like(jnp.asarray(mean))
                # var' = 1 - eps so the consumer's rsqrt(var' + eps) is
                # exactly 1 — the fold is then bit-exact, not eps-approximate
                s_child["var"] = jnp.full_like(jnp.asarray(var), 1.0 - e)
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
        variables = fold_batch_stats(
            variables, collect_bn_eps(model, variables, image_size, batch_size))

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

        if not buckets:
            raise ValueError("artifact has no serialised executables")
        n = rois.shape[0]
        rois = np.asarray(rois, np.float32)
        images = np.asarray(images, np.float32)
        bucket = next((b for b in buckets if b >= n), None)
        if bucket is not None:
            inst, binary = fns[bucket](variables, images, pad_rois(rois, bucket))
            return np.asarray(inst)[:n], np.asarray(binary)
        # N above the largest serialised bucket: chunk the ROI axis across
        # executable calls (the serialised graph is monolithic, so stage 1
        # recomputes per chunk — correctness over peak throughput here; the
        # live InferenceEngine compiles arbitrarily large buckets instead).
        maxb = buckets[-1]
        inst_parts = []
        binary = None
        for s in range(0, n, maxb):
            chunk = rois[s:s + maxb]
            inst, b_ = fns[maxb](variables, images, pad_rois(chunk, maxb))
            inst_parts.append(np.asarray(inst)[:chunk.shape[0]])
            if binary is None:
                binary = np.asarray(b_)
        return np.concatenate(inst_parts, axis=0), binary

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
