"""Convert reference PyTorch checkpoints (smp.Unet + timm-efficientnet) to
this framework's Flax parameter trees.

The reference's stage-1 people-segmentation UNets are
segmentation-models-pytorch `Unet(timm-efficientnet-{b0,b1,b3,b7})`
checkpoints (`PreTrainedPeopleSegmentationUNet`,
/root/reference/src/human_edge_detection/advanced/hierarchical_segmentation_unet.py:1708-1916,
including `model.`/`unet.` prefix stripping at :1800-1840). This module maps
those state_dicts onto `models/unet.PeopleSegmentationUNet` params:

  torch (O, I, kh, kw) conv        -> flax (kh, kw, I, O)
  torch depthwise (C, 1, kh, kw)   -> flax (kh, kw, 1, C)   [groups=C]
  BN weight/bias/running_mean/var  -> scale/bias + batch_stats mean/var

timm block naming:
  DepthwiseSeparableConv (stage 0): conv_dw,bn1, se, conv_pw,bn2
  InvertedResidual (stages 1-6):    conv_pw,bn1, conv_dw,bn2, se, conv_pwl,bn3
smp decoder: decoder.blocks.{i}.conv{1,2} = Sequential(conv,.0 / bn,.1)
head: segmentation_head.0

Loads .pth via torch (CPU) when available, or a plain dict of numpy arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from .models.efficientnet import VARIANTS, _B0_STAGES, round_repeats


def strip_prefixes(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Strip the reference's wrapper prefixes (model. / unet.)."""
    out = {}
    for k, v in state_dict.items():
        for p in ("model.", "unet."):
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def detect_variant_by_key_count(state_dict: Dict[str, Any]) -> str:
    """Encoder-size heuristic by key count (the reference's fallback,
    hierarchical_segmentation_unet.py:1806-1830: B0<400<B1<540<B3<700<B7)."""
    n = sum(1 for k in state_dict if k.startswith("encoder."))
    if n < 400:
        return "b0"
    if n < 540:
        return "b1"
    if n < 700:
        return "b3"
    return "b7"


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dw(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _bn(sd: Dict[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    return (
        {"scale": np.asarray(sd[f"{prefix}.weight"]),
         "bias": np.asarray(sd[f"{prefix}.bias"])},
        {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
         "var": np.asarray(sd[f"{prefix}.running_var"])},
    )


def convert_people_seg_unet(
    state_dict: Dict[str, Any], variant: Optional[str] = None
) -> Dict[str, Any]:
    """smp.Unet state_dict -> {'params', 'batch_stats'} for
    PeopleSegmentationUNet(encoder_variant=variant).

    IMPORTANT: serve converted weights with ``upsample_mode="nearest"``
    (``stage1_upsample_mode="nearest"`` on the flagship assembly) — smp's
    UnetDecoder upsamples with F.interpolate(scale_factor=2,
    mode="nearest"), and checkpoints trained under that stencil produce
    divergent logits through this repo's default bilinear decoder
    (tests/test_reference_parity.py::test_smp_decoder_block_*)."""
    sd = strip_prefixes(state_dict)
    variant = variant or detect_variant_by_key_count(sd)
    width, depth, _ = VARIANTS[variant]

    params: Dict[str, Any] = {"encoder": {}, "seg_head": {}}
    stats: Dict[str, Any] = {"encoder": {}}

    enc_p, enc_s = params["encoder"], stats["encoder"]
    enc_p["stem_conv"] = {"kernel": _conv(sd["encoder.conv_stem.weight"])}
    enc_p["stem_bn"], enc_s["stem_bn"] = _bn(sd, "encoder.bn1")

    for stage_i, (e, k, s, c, r) in enumerate(_B0_STAGES):
        repeats = round_repeats(r, depth)
        for j in range(repeats):
            t = f"encoder.blocks.{stage_i}.{j}"
            name = f"stage{stage_i}_block{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if e == 1:
                # DepthwiseSeparableConv: conv_dw,bn1 / se / conv_pw,bn2
                bp["dw_conv"] = {"kernel": _dw(sd[f"{t}.conv_dw.weight"])}
                bp["bn1"], bs["bn1"] = _bn(sd, f"{t}.bn1")
                bp["project_conv"] = {"kernel": _conv(sd[f"{t}.conv_pw.weight"])}
                bp["bn2"], bs["bn2"] = _bn(sd, f"{t}.bn2")
            else:
                # InvertedResidual: conv_pw,bn1 / conv_dw,bn2 / se / conv_pwl,bn3
                bp["expand_conv"] = {"kernel": _conv(sd[f"{t}.conv_pw.weight"])}
                bp["bn0"], bs["bn0"] = _bn(sd, f"{t}.bn1")
                bp["dw_conv"] = {"kernel": _dw(sd[f"{t}.conv_dw.weight"])}
                bp["bn1"], bs["bn1"] = _bn(sd, f"{t}.bn2")
                bp["project_conv"] = {"kernel": _conv(sd[f"{t}.conv_pwl.weight"])}
                bp["bn2"], bs["bn2"] = _bn(sd, f"{t}.bn3")
            if f"{t}.se.conv_reduce.weight" in sd:
                bp["se"] = {
                    "reduce": {"kernel": _conv(sd[f"{t}.se.conv_reduce.weight"]),
                               "bias": np.asarray(sd[f"{t}.se.conv_reduce.bias"])},
                    "expand": {"kernel": _conv(sd[f"{t}.se.conv_expand.weight"]),
                               "bias": np.asarray(sd[f"{t}.se.conv_expand.bias"])},
                }
            enc_p[name] = bp
            enc_s[name] = bs

    # smp UnetDecoder: blocks.{i}.conv{1,2} (Conv2dReLU = conv .0 + bn .1)
    i = 0
    while f"decoder.blocks.{i}.conv1.0.weight" in sd:
        dp: Dict[str, Any] = {}
        ds: Dict[str, Any] = {}
        for ci in (1, 2):
            dp[f"conv{ci - 1}"] = {"kernel": _conv(sd[f"decoder.blocks.{i}.conv{ci}.0.weight"])}
            dp[f"bn{ci - 1}"], ds[f"bn{ci - 1}"] = _bn(sd, f"decoder.blocks.{i}.conv{ci}.1")
        params[f"decoder{i}"] = dp
        stats[f"decoder{i}"] = ds
        i += 1

    params["seg_head"] = {
        "kernel": _conv(sd["segmentation_head.0.weight"]),
        "bias": np.asarray(sd["segmentation_head.0.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def convert_wrapper_output_conv(state_dict: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """The 1ch->2ch fixed output conv of the reference wrapper
    (output_conv, hierarchical_segmentation_unet.py:1961-1971)."""
    sd = state_dict
    key = next((k for k in sd if k.endswith("output_conv.weight")), None)
    if key is None:
        return None
    bias_key = key.replace("weight", "bias")
    return {"params": {"output_conv": {
        "kernel": _conv(sd[key]),
        "bias": np.asarray(sd[bias_key]),
    }}}


# ---------------------------------------------------------------------------
# Stage-2 (flagship) converters: generic torch-module -> flax-subtree mappers
# for the RGB extractor, feature combiner and the hierarchical head zoo
# (hierarchical_segmentation_rgb.py:564-774, hierarchical_segmentation_unet.py:670-845,
# hierarchical_segmentation_refinement.py:434-804).
# ---------------------------------------------------------------------------


def _norm(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """LayerNorm2d / GroupNorm / InstanceNorm affine -> {scale, bias}.

    The reference's LayerNorm2d stores weight/bias as (1, C, 1, 1)
    (model.py:18-38); flax wants (C,)."""
    return {"scale": np.asarray(sd[f"{prefix}.weight"]).reshape(-1),
            "bias": np.asarray(sd[f"{prefix}.bias"]).reshape(-1)}


def _conv_p(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    p = {"kernel": _conv(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _deconv_p(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    (kh, kw, in, out). lax.conv_transpose cross-correlates the zero-stuffed
    input whereas torch's transposed conv convolves (gradient-of-conv), so
    the spatial taps are flipped."""
    w = np.asarray(sd[f"{prefix}.weight"])
    k = np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])
    return {"deconv": {"kernel": k, "bias": np.asarray(sd[f"{prefix}.bias"])}}


def _res_block(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference ResidualBlock (conv1/norm1/conv2/norm2, any of the three
    copies) -> models.blocks.ResidualBlock params."""
    return {"conv1": _conv_p(sd, f"{prefix}.conv1"),
            "norm1": _norm(sd, f"{prefix}.norm1"),
            "conv2": _conv_p(sd, f"{prefix}.conv2"),
            "norm2": _norm(sd, f"{prefix}.norm2")}


def _conv_norm_act(sd: Dict[str, Any], conv_prefix: str, norm_prefix: str) -> Dict[str, Any]:
    return {"conv": _conv_p(sd, conv_prefix), "norm": _norm(sd, norm_prefix)}


def convert_enhanced_unet(sd: Dict[str, Any], prefix: str, depth: int = 3) -> Dict[str, Any]:
    """EnhancedUNet (hierarchical_segmentation_unet.py:277-417) ->
    models.heads.EnhancedUNet params."""
    p: Dict[str, Any] = {}
    # encoders.0 = Sequential(conv, norm, act, res, res)
    p["enc0_in"] = _conv_norm_act(sd, f"{prefix}.encoders.0.0", f"{prefix}.encoders.0.1")
    p["enc0_res0"] = _res_block(sd, f"{prefix}.encoders.0.3")
    p["enc0_res1"] = _res_block(sd, f"{prefix}.encoders.0.4")
    for i in range(1, depth):
        # encoders.i = Sequential(res, res, conv, norm, act)
        p[f"enc{i}_res0"] = _res_block(sd, f"{prefix}.encoders.{i}.0")
        p[f"enc{i}_res1"] = _res_block(sd, f"{prefix}.encoders.{i}.1")
        p[f"enc{i}_out"] = _conv_norm_act(sd, f"{prefix}.encoders.{i}.2", f"{prefix}.encoders.{i}.3")
    # bottleneck = Sequential(res, res, conv, norm, act, conv1x1, sigmoid)
    p["bott_res0"] = _res_block(sd, f"{prefix}.bottleneck.0")
    p["bott_res1"] = _res_block(sd, f"{prefix}.bottleneck.1")
    p["bott_cna"] = _conv_norm_act(sd, f"{prefix}.bottleneck.2", f"{prefix}.bottleneck.3")
    p["bott_att"] = _conv_p(sd, f"{prefix}.bottleneck.5")
    p["bott_conv"] = _conv_p(sd, f"{prefix}.bottleneck_conv")
    for d in range(depth - 1):
        p[f"up{d}"] = _deconv_p(sd, f"{prefix}.upconvs.{d}")
        # decoders.d = Sequential(conv, norm, act, res, res)
        p[f"dec{d}_in"] = _conv_norm_act(sd, f"{prefix}.decoders.{d}.0", f"{prefix}.decoders.{d}.1")
        p[f"dec{d}_res0"] = _res_block(sd, f"{prefix}.decoders.{d}.3")
        p[f"dec{d}_res1"] = _res_block(sd, f"{prefix}.decoders.{d}.4")
    # final = Sequential(conv, norm, act, conv1x1)
    p["final_cna"] = _conv_norm_act(sd, f"{prefix}.final.0", f"{prefix}.final.1")
    p["final_out"] = _conv_p(sd, f"{prefix}.final.3")
    return p


def convert_hierarchical_head_v2(
    sd: Dict[str, Any], prefix: str, depth: int = 3,
    use_attention_module: bool = False,
) -> Dict[str, Any]:
    """HierarchicalSegmentationHeadUNetV2 / ExtendedHierarchical... ->
    models.heads.HierarchicalHeadV2 params. Both torch variants share the
    same parameter names (hierarchical_segmentation_unet.py:714-845,
    hierarchical_segmentation_refinement.py:434-560)."""
    p: Dict[str, Any] = {}
    # shared_features = Sequential(conv, norm, act, drop, res, drop, res)
    p["shared_in"] = _conv_norm_act(sd, f"{prefix}.shared_features.0", f"{prefix}.shared_features.1")
    p["shared_res0"] = _res_block(sd, f"{prefix}.shared_features.4")
    p["shared_res1"] = _res_block(sd, f"{prefix}.shared_features.6")
    p["bg_vs_fg_unet"] = convert_enhanced_unet(sd, f"{prefix}.bg_vs_fg_unet", depth=depth)
    # upsample_bg_fg = Sequential(deconv, norm, act, conv1x1)
    p["upsample_deconv"] = _deconv_p(sd, f"{prefix}.upsample_bg_fg.0")
    p["upsample_norm"] = _norm(sd, f"{prefix}.upsample_bg_fg.1")
    p["upsample_out"] = _conv_p(sd, f"{prefix}.upsample_bg_fg.3")
    # fg_gate = Sequential(conv, act, drop, conv, act, conv, sigmoid)
    p["gate0"] = _conv_p(sd, f"{prefix}.fg_gate.0")
    p["gate1"] = _conv_p(sd, f"{prefix}.fg_gate.3")
    p["gate2"] = _conv_p(sd, f"{prefix}.fg_gate.5")
    t = f"{prefix}.target_vs_nontarget_branch"
    if use_attention_module:
        # ModuleList(res, satt, drop, deconv, norm, act, catt, drop, res, conv)
        p["tnt_res0"] = _res_block(sd, f"{t}.0")
        p["tnt_satt"] = {"conv": _conv_p(sd, f"{t}.1.conv")}
        p["tnt_deconv"] = _deconv_p(sd, f"{t}.3")
        p["tnt_norm"] = _norm(sd, f"{t}.4")
        p["tnt_catt"] = {
            "fc1": _conv_p(sd, f"{t}.6.fc1"),
            "fc2": _conv_p(sd, f"{t}.6.fc2"),
        }
        p["tnt_res1"] = _res_block(sd, f"{t}.8")
        p["tnt_out"] = _conv_p(sd, f"{t}.9")
    else:
        # Sequential(res, drop, deconv, norm, act, drop, res, conv1x1)
        p["tnt_res0"] = _res_block(sd, f"{t}.0")
        p["tnt_deconv"] = _deconv_p(sd, f"{t}.2")
        p["tnt_norm"] = _norm(sd, f"{t}.3")
        p["tnt_res1"] = _res_block(sd, f"{t}.6")
        p["tnt_out"] = _conv_p(sd, f"{t}.7")
    return p


def convert_refined_head(
    sd: Dict[str, Any], prefix: str, depth: int = 3,
    use_attention_module: bool = False,
) -> Dict[str, Any]:
    """RefinedHierarchicalSegmentationHead
    (hierarchical_segmentation_refinement.py:609-804) ->
    models.heads.RefinedHierarchicalHead params. Converts whichever optional
    refinement modules are present in the state_dict."""
    p: Dict[str, Any] = {
        "base_head": convert_hierarchical_head_v2(
            sd, f"{prefix}.base_head", depth=depth,
            use_attention_module=use_attention_module),
    }
    if f"{prefix}.contour_branch.contour_branch.0.weight" in sd:
        c = f"{prefix}.contour_branch.contour_branch"
        p["contour"] = {
            "c0": _conv_norm_act(sd, f"{c}.0", f"{c}.1"),
            "c1": _conv_norm_act(sd, f"{c}.3", f"{c}.4"),
            "out": _conv_p(sd, f"{c}.6"),
        }
    if f"{prefix}.distance_decoder.distance_head.0.weight" in sd:
        d = f"{prefix}.distance_decoder.distance_head"
        p["distance"] = {
            "d0": _conv_norm_act(sd, f"{d}.0", f"{d}.1"),
            "d_res": _res_block(sd, f"{d}.3"),
            "out": _conv_p(sd, f"{d}.4"),
            "threshold": np.asarray(sd[f"{prefix}.distance_decoder.threshold"]),
        }
    if f"{prefix}.boundary_refiner.edge_conv.0.weight" in sd:
        b = f"{prefix}.boundary_refiner"
        p["boundary"] = {
            "edge0": _conv_p(sd, f"{b}.edge_conv.0"),
            "edge_norm0": _norm(sd, f"{b}.edge_conv.1"),
            "edge1": _conv_p(sd, f"{b}.edge_conv.3"),
            "edge_norm1": _norm(sd, f"{b}.edge_conv.4"),
            "edge_out": _conv_p(sd, f"{b}.edge_conv.6"),
            "blend_weight": np.asarray(sd[f"{b}.blend_weight"]),
        }
    return p


def convert_guided_head(sd: Dict[str, Any], prefix: str,
                        use_attention_module: bool = False) -> Dict[str, Any]:
    """PretrainedUNetGuidedSegmentationHead
    (hierarchical_segmentation_rgb.py:43-218) ->
    models.heads.PretrainedUNetGuidedHead params."""
    p: Dict[str, Any] = {
        "input_adjust": _conv_p(sd, f"{prefix}.input_adjust"),
        "fp_in": _conv_norm_act(sd, f"{prefix}.feature_processor.0", f"{prefix}.feature_processor.1"),
        "fp_res0": _res_block(sd, f"{prefix}.feature_processor.4"),
        "fp_res1": _res_block(sd, f"{prefix}.feature_processor.6"),
        "cls0": _conv_norm_act(sd, f"{prefix}.final_classifier.0", f"{prefix}.final_classifier.1"),
        "cls_out": _conv_p(sd, f"{prefix}.final_classifier.3"),
    }
    if use_attention_module and f"{prefix}.attention_module.0.weight" in sd:
        p["att0"] = _conv_p(sd, f"{prefix}.attention_module.0")
        p["att1"] = _conv_p(sd, f"{prefix}.attention_module.2")
    return p


def convert_rgb_extractor(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """The flagship's inline RGB patch extractor
    (hierarchical_segmentation_rgb.py:657-679, a Sequential of
    conv/norm/act/res x3 + 1x1 proj) ->
    models.assembly.RGBPatchFeatureExtractor params."""
    p: Dict[str, Any] = {}
    # Sequential indices: 0 conv,1 norm,(2 act),3 res, 4,5,(6),7, 8,9,(10),11, 12,13,(14)
    for i, (ci, ri) in enumerate(((0, 3), (4, 7), (8, 11))):
        p[f"conv{i}"] = _conv_norm_act(sd, f"{prefix}.{ci}", f"{prefix}.{ci + 1}")
        p[f"res{i}"] = _res_block(sd, f"{prefix}.{ri}")
    p["proj"] = _conv_norm_act(sd, f"{prefix}.12", f"{prefix}.13")
    return p


def convert_flagship_checkpoint(
    state_dict: Dict[str, Any],
    variant: Optional[str] = None,
    depth: int = 3,
    use_attention_module: bool = False,
) -> Dict[str, Any]:
    """Full deployed-assembly checkpoint
    (HierarchicalRGBSegmentationModelWithFullImagePretrainedUNet,
    hierarchical_segmentation_rgb.py:564-774) ->
    models.assembly.HierarchicalInstanceSegmenter variables.

    Layout: pretrained_unet.model.model.<smp keys> (wrapper at
    hierarchical_segmentation_unet.py:1919-1993), pretrained_unet.output_conv,
    rgb_feature_extractor.<seq>, feature_combiner,
    segmentation_head.<refined or guided head>.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    smp_sd = {k[len("pretrained_unet.model.model."):]: v
              for k, v in sd.items() if k.startswith("pretrained_unet.model.model.")}
    if not smp_sd:  # tolerate already-stripped single-wrap checkpoints
        smp_sd = {k[len("pretrained_unet.model."):]: v
                  for k, v in sd.items() if k.startswith("pretrained_unet.model.")
                  and not k.startswith("pretrained_unet.model.model.")}
    unet_vars = convert_people_seg_unet(smp_sd, variant)

    params: Dict[str, Any] = {"pretrained_unet": unet_vars["params"]}
    stats: Dict[str, Any] = {"pretrained_unet": unet_vars["batch_stats"]}

    params["unet_wrapper"] = {"output_conv": _conv_p(sd, "pretrained_unet.output_conv")}
    params["rgb_extractor"] = convert_rgb_extractor(sd, "rgb_feature_extractor")

    if "feature_combiner.weight" in sd:
        params["feature_combiner"] = _conv_p(sd, "feature_combiner")
        params["head"] = convert_refined_head(
            sd, "segmentation_head", depth=depth,
            use_attention_module=use_attention_module)
    else:
        params["head"] = convert_guided_head(
            sd, "segmentation_head", use_attention_module=use_attention_module)

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file to numpy (handles {'model_state_dict': ...} and
    raw state_dicts, like the reference's loader)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in ckpt.items()}


def main():
    import argparse
    import flax.serialization
    from pathlib import Path

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, help=".pth file")
    p.add_argument("--out", required=True, help="output params.msgpack")
    p.add_argument("--variant", default=None)
    args = p.parse_args()
    sd = load_torch_checkpoint(args.checkpoint)
    variables = convert_people_seg_unet(sd, args.variant)
    Path(args.out).write_bytes(flax.serialization.to_bytes(variables))
    # metadata sidecar mirroring the reference exporter's JSON sidecar
    # (export_hierarchical_instance_peopleseg_onnx.py:510-542); records the
    # decoder stencil converted checkpoints require
    import json

    Path(str(args.out) + ".json").write_text(json.dumps({
        "source": str(args.checkpoint),
        "variant": args.variant,
        "upsample_mode": "nearest",
        "note": "serve with PeopleSegmentationUNet(upsample_mode='nearest') "
                "/ stage1_upsample_mode='nearest' (smp decoder parity)",
    }, indent=2))
    n = sum(np.asarray(v).size for v in sd.values())
    print(f"converted {len(sd)} tensors ({n / 1e6:.1f}M params) -> {args.out}")


if __name__ == "__main__":
    main()
