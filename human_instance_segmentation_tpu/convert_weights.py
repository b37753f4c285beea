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
    PeopleSegmentationUNet(encoder_variant=variant)."""
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
    n = sum(np.asarray(v).size for v in sd.values())
    print(f"converted {len(sd)} tensors ({n / 1e6:.1f}M params) -> {args.out}")


if __name__ == "__main__":
    main()
