"""FULL stage-1 numerical oracle: timm-EfficientNet-B0 + smp-UNet end to end.

VERDICT r2 item 2 closure beyond the block level: compose the vendored timm
recipes (Conv2dSame stem, DepthwiseSeparableConv, InvertedResidual — see
tests/test_reference_parity.py) into the COMPLETE B0 encoder + smp UnetDecoder
+ segmentation head that the reference freezes as stage 1
(/root/reference/src/human_edge_detection/advanced/
hierarchical_segmentation_unet.py:1708-1916, smp.Unet with
encoder_name="timm-efficientnet-b0"), export a timm/smp-named state_dict from
it, push that through ``convert_people_seg_unet`` exactly as a real checkpoint
would be, and assert the Flax ``PeopleSegmentationUNet`` reproduces the torch
forward — through the plain path AND the fused S2D serving path.

This is the strongest stage-1 parity statement possible without smp/timm in
the image: every padding convention, BN epsilon, SE gate, residual rule,
upsample stencil, tap ordering and converter key traversed in one graph.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from human_instance_segmentation_tpu.convert_weights import (  # noqa: E402
    convert_people_seg_unet,
    detect_variant_by_key_count,
)
from human_instance_segmentation_tpu.models.efficientnet import (  # noqa: E402
    _B0_STAGES,
    round_repeats,
)
from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet  # noqa: E402

from test_reference_parity import (  # noqa: E402  (tests dir on sys.path)
    _randomize_bn,
    _SmpDecoderBlock,
    _TimmConv2dSame,
    _TimmMBConv,
    nchw,
    nhwc,
)

# Deliberately NOT slow-marked: ~18 s total, and it is the single strongest
# stage-1 correctness statement in the suite — worth having in the smoke tier.

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


class _TimmDSConv(torch.nn.Module):
    """timm DepthwiseSeparableConv (efficientnet_blocks.py, the expand==1
    stage-0 block): dw SAME -> BN(eps 1e-3) -> SiLU -> SE -> 1x1 project ->
    BN; residual when stride 1 and cin == cout."""

    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.conv_dw = _TimmConv2dSame(cin, cin, k, stride=stride, groups=cin)
        self.bn1 = torch.nn.BatchNorm2d(cin, eps=1e-3)
        sq = max(1, int(cin * 0.25))
        self.se_reduce = torch.nn.Conv2d(cin, sq, 1, bias=True)
        self.se_expand = torch.nn.Conv2d(sq, cin, 1, bias=True)
        self.conv_pw = _TimmConv2dSame(cin, cout, 1)
        self.bn2 = torch.nn.BatchNorm2d(cout, eps=1e-3)
        self.residual = stride == 1 and cin == cout

    def forward(self, x):
        h = torch.nn.functional.silu(self.bn1(self.conv_dw(x)))
        s = h.mean((2, 3), keepdim=True)
        s = torch.nn.functional.silu(self.se_reduce(s))
        h = h * torch.sigmoid(self.se_expand(s))
        h = self.bn2(self.conv_pw(h))
        if self.residual:
            h = h + x
        return h


class _TimmB0SmpUnet(torch.nn.Module):
    """Full stage-1 oracle: B0 encoder (16 blocks), smp decoder (5 blocks,
    nearest upsample), 3x3 segmentation head. Taps follow the smp encoder
    contract: stem@s2, stage1@s4, stage2@s8, stage4@s16, stage6@s32."""

    def __init__(self):
        super().__init__()
        self.conv_stem = _TimmConv2dSame(3, 32, 3, stride=2)
        self.bn1 = torch.nn.BatchNorm2d(32, eps=1e-3)
        self.blocks = torch.nn.ModuleList()
        cin = 32
        for (e, k, s, c, r) in _B0_STAGES:
            stage = torch.nn.ModuleList()
            for j in range(round_repeats(r, 1.0)):
                stride = s if j == 0 else 1
                if e == 1:
                    stage.append(_TimmDSConv(cin, c, k, stride))
                else:
                    stage.append(_TimmMBConv(cin, c, e, k, stride))
                cin = c
            self.blocks.append(stage)
        # smp UnetDecoder for encoder channels (32, 24, 40, 112, 320),
        # decoder_channels (256, 128, 64, 32, 16): head=320, skips reversed.
        dec_ch = (256, 128, 64, 32, 16)
        skip_ch = (112, 40, 24, 32, 0)
        in_ch = (320,) + dec_ch[:-1]
        self.dec = torch.nn.ModuleList(
            _SmpDecoderBlock(i, sk, o, mode="nearest")
            for i, sk, o in zip(in_ch, skip_ch, dec_ch))
        self.head = torch.nn.Conv2d(16, 1, 3, padding=1, bias=True)

    def forward(self, x01):
        mean = torch.tensor(_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(_STD).view(1, 3, 1, 1)
        h = (x01 - mean) / std
        h = torch.nn.functional.silu(self.bn1(self.conv_stem(h)))
        taps = [h]
        for stage_i, stage in enumerate(self.blocks):
            for blk in stage:
                h = blk(h)
            if stage_i in (1, 2, 4, 6):
                taps.append(h)
        skips = taps[:-1][::-1] + [None]  # s16, s8, s4, s2, (none)
        h = taps[-1]
        for blk, skip in zip(self.dec, skips):
            h = blk(h, skip)
        return self.head(h)

    def timm_smp_state_dict(self):
        """Export under the exact smp.Unet key layout the converter consumes
        (and a real `model.state_dict()` torch checkpoint would carry)."""
        sd = {}

        def put(key, tensor):
            sd[key] = tensor.detach().numpy()

        def put_bn(prefix, bn):
            put(f"{prefix}.weight", bn.weight)
            put(f"{prefix}.bias", bn.bias)
            put(f"{prefix}.running_mean", bn.running_mean)
            put(f"{prefix}.running_var", bn.running_var)

        put("encoder.conv_stem.weight", self.conv_stem.conv.weight)
        put_bn("encoder.bn1", self.bn1)
        for si, stage in enumerate(self.blocks):
            for j, blk in enumerate(stage):
                t = f"encoder.blocks.{si}.{j}"
                if isinstance(blk, _TimmDSConv):
                    put(f"{t}.conv_dw.weight", blk.conv_dw.conv.weight)
                    put_bn(f"{t}.bn1", blk.bn1)
                    put(f"{t}.conv_pw.weight", blk.conv_pw.conv.weight)
                    put_bn(f"{t}.bn2", blk.bn2)
                else:
                    put(f"{t}.conv_pw.weight", blk.conv_pw.conv.weight)
                    put_bn(f"{t}.bn1", blk.bn1)
                    put(f"{t}.conv_dw.weight", blk.conv_dw.conv.weight)
                    put_bn(f"{t}.bn2", blk.bn2)
                    put(f"{t}.conv_pwl.weight", blk.conv_pwl.conv.weight)
                    put_bn(f"{t}.bn3", blk.bn3)
                put(f"{t}.se.conv_reduce.weight", blk.se_reduce.weight)
                put(f"{t}.se.conv_reduce.bias", blk.se_reduce.bias)
                put(f"{t}.se.conv_expand.weight", blk.se_expand.weight)
                put(f"{t}.se.conv_expand.bias", blk.se_expand.bias)
        for i, blk in enumerate(self.dec):
            d = f"decoder.blocks.{i}"
            put(f"{d}.conv1.0.weight", blk.conv0.weight)
            put_bn(f"{d}.conv1.1", blk.bn0)
            put(f"{d}.conv2.0.weight", blk.conv1.weight)
            put_bn(f"{d}.conv2.1", blk.bn1)
        put("segmentation_head.0.weight", self.head.weight)
        put("segmentation_head.0.bias", self.head.bias)
        return sd


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(7)
    rng = np.random.default_rng(7)
    m = _TimmB0SmpUnet().eval()
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            _randomize_bn(mod, rng)
    x01 = rng.random((1, 3, 64, 96), dtype=np.float64).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x01))
    return m.timm_smp_state_dict(), x01, want.numpy()


def _flax_logits(sd, x01, **kw):
    variables = convert_people_seg_unet(sd)
    model = PeopleSegmentationUNet(encoder_variant="b0",
                                   upsample_mode="nearest", **kw)
    out = model.apply(variables, jnp.asarray(nhwc(x01)), train=False)
    return nchw(out)


def test_stage1_full_oracle_plain(oracle):
    sd, x01, want = oracle
    assert detect_variant_by_key_count(sd) == "b0"
    got = _flax_logits(sd, x01)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3,
                               err_msg="full stage-1 oracle, plain path")


def test_stage1_full_oracle_fused_serving(oracle):
    """The exact serving form (fused S2D tail + encoder S2D front) must also
    match the smp oracle — converted checkpoints are served this way."""
    sd, x01, want = oracle
    got = _flax_logits(sd, x01, fused_tail=3, encoder_s2d_front=True)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3,
                               err_msg="full stage-1 oracle, fused serving")
