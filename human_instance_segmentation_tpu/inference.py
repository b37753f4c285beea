"""Inference runtime: shape-bucketed jit cache + deployed output contract.

TPU-native replacement for the reference's ONNX Runtime deployment
(`RGBHierarchicalWrapper` in
/root/reference/src/human_edge_detection/export_onnx_advanced.py:353-473 and
the CLI harness test_hierarchical_instance_peopleseg_onnx.py).

Where ONNX uses *dynamic* batch/num_rois axes, XLA wants static shapes: ROI
counts are bucketed to powers of two and padded with sentinel rois
(batch_idx = -1); padded outputs are zero-masked in-graph. One compiled
executable is cached per (batch, roi-bucket) pair; everything — stage 1,
RoIAlign, stage 2, argmax/binarise, optional dilation epilogue — is a single
fused XLA program with no host synchronisation.

Deployed output contract (matches the reference ONNX graph):
  instance_masks: (N, mh, mw, 1)  1.0 where argmax(class) == target
  binary_masks:   (B, H, W, 1)    P(person) from the stage-1 UNet
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.assembly import HierarchicalInstanceSegmenter
from .models.postprocess import mask_dilation_logit_boost

# Default int8 denylist: the whole stage-1 encoder stays bf16. The r5
# per-stage re-litigation (scripts/results/serving_matrix.jsonl) found the
# int8 loss concentrated in the high-res stages 0-3 with stages 4-6
# NEUTRAL at mid256 (925.5 vs 924.3 img/s) — but at the served mid128
# config quantizing stages 4-6 LOSES 0.6 ms (986.3 vs 1005.8), so
# deny-all is the measured-best DEFAULT across configs. The per-stage
# probes remain available (bench_serving_matrix qonly/qallow tokens).
ENCODER_INT8_DENY = ("encoder/",)


def cast_floating(tree, dtype):
    """Cast floating leaves of a pytree (params) to ``dtype`` (bf16 serving)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def roi_bucket(n: int, min_bucket: int = 1, max_bucket: int = 64) -> int:
    """Round a ROI count up to the next power-of-two bucket."""
    b = min_bucket
    while b < n:
        b *= 2
    return min(b, max_bucket) if n <= max_bucket else ((n + max_bucket - 1) // max_bucket) * max_bucket


def pad_rois(rois: np.ndarray, bucket: int) -> np.ndarray:
    """Pad (N, 5) rois to (bucket, 5) with sentinel batch_idx = -1."""
    n = rois.shape[0]
    if n == bucket:
        return rois
    pad = np.zeros((bucket - n, 5), dtype=rois.dtype)
    pad[:, 0] = -1.0
    return np.concatenate([rois, pad], axis=0)


def deployed_outputs(
    logits: jnp.ndarray,
    full_image_logits,
    rois: jnp.ndarray,
    dilation_pixels: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convert model outputs to the deployed (instance_masks, binary_masks).

    Mirrors export_onnx_advanced.py:360-364 (argmax==1 binarise) and
    :386-387 (stage-1 softmax channel 0 = person probability), plus the
    optional dilation logit boost.

    ``full_image_logits`` may be the (B, H, W, 2) stage-1 logit map or the
    model's whole aux dict; with the aux dict, the nested-S2D(4) person
    probability (``person_prob_n4``, fused-tail serving) is preferred — the
    lane-padded full-res 2ch map is then dead code XLA eliminates.
    """
    if dilation_pixels > 0:
        logits = mask_dilation_logit_boost(logits, dilation_pixels)
    cls = jnp.argmax(logits, axis=-1)
    instance = (cls == 1).astype(logits.dtype)[..., None]
    valid = (rois[:, 0] >= 0).astype(logits.dtype)[:, None, None, None]
    instance = instance * valid
    if isinstance(full_image_logits, dict):
        aux = full_image_logits
        if "person_prob_dense" in aux:  # Pallas fused-tail serving (rank-3)
            return instance, aux["person_prob_dense"][..., None]
        if "person_prob_n4" in aux:
            from .ops.s2d import n4_to_plain
            binary = n4_to_plain(aux["person_prob_n4"], 1)
            return instance, binary
        full_image_logits = aux["full_image_logits"]
    binary = jax.nn.softmax(full_image_logits, axis=-1)[..., 0:1]
    return instance, binary


class InferenceEngine:
    """Shape-bucketed jitted inference for the flagship model."""

    def __init__(
        self,
        model: HierarchicalInstanceSegmenter,
        params: Any,
        dilation_pixels: int = 0,
        max_bucket: int = 64,
        dtype: jnp.dtype = jnp.float32,
        quantize: Optional[str] = None,
        fused_head: bool = False,
        const_params: bool = False,
        mesh: Optional[jax.sharding.Mesh] = None,
        int8_deny: Tuple[str, ...] = ENCODER_INT8_DENY,
    ):
        """``quantize="int8"`` runs the stage-2 QConv stack in s8xs8->s32 on
        the MXU (the TPU analogue of the reference's TensorRT int8 engines).
        Activation scales are calibrated automatically from the first batch
        (see :meth:`calibrate` to use a dedicated calibration set).
        ``int8_deny`` path substrings stay bf16 under int8 serving; the
        default denies the whole stage-1 encoder. Round-5 per-stage table
        (batch 32, r4 barriers in effect, scripts/results/
        serving_matrix.jsonl) at mid256: deny-all 924.3 img/s, quantize
        stages 4-6 925.5 (neutral), +stage3 912.4, all 895.6 — the int8
        loss concentrates where tensors are high-res/low-channel. At the
        SERVED mid128 config stages 4-6 flip to a 0.6 ms loss (986.3 vs
        1005.8), so deny-all stays the default.

        ``fused_head=True`` traces the stage-2 conv+LayerNorm2d+relu units
        through the fused Pallas kernel (ops/pallas_head.py) and runs the
        head's mask-resolution upsample branches in S2D form — exact math,
        fewer memory passes. Mutually exclusive with ``quantize`` (the int8
        path takes precedence where both apply).

        ``const_params=True`` bakes the weights into each compiled program
        as XLA constants (fixed-weights serving): the composed S2D kernels,
        BN folds and weight-layout prepacks constant-fold at compile time
        instead of re-deriving per call. Trades compile time and program
        size for step time; the engine's ``params`` can then no longer be
        swapped without clearing the compile cache.

        ``mesh`` enables multi-chip batch-data-parallel serving: stage 1 is
        sharded over images and stage 2 over ROIs along the mesh's first
        axis (params replicated); the GSPMD partitioner inserts the
        cross-shard gathers the ROI crops need, so collectives ride ICI.
        Axes whose extent doesn't divide the mesh stay replicated — the
        result is identical to single-device serving either way (the
        reference's deployment is single-GPU ORT; this is the TPU-native
        scale-out it lacks)."""
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.model = model
        self.params = params
        self.dilation_pixels = dilation_pixels
        self.max_bucket = max_bucket
        self.dtype = dtype
        self.quantize = quantize
        self.fused_head = fused_head
        self.const_params = const_params
        self.mesh = mesh
        self.int8_deny = tuple(int8_deny)
        self._np_params: Any = None
        self._scales: Optional[dict] = None
        self._compiled: Dict[Tuple[int, int], Any] = {}

    def calibrate(self, images: np.ndarray, rois: np.ndarray) -> None:
        """Record per-layer activation ranges from (images, rois) and fold
        them into the int8 serving graphs (pointwise max over calls)."""
        from .ops.quant import calibration, collect_scales, merge_scales

        bucket = roi_bucket(max(rois.shape[0], 1), max_bucket=self.max_bucket)
        rois_p = jnp.asarray(pad_rois(np.asarray(rois, np.float32), bucket))

        @jax.jit
        def run(params, images, rois):
            with calibration():
                return self.model.apply(params, images, rois, train=False,
                                        mutable=["calib"])

        _, cv = run(self.params, jnp.asarray(images, self.dtype), rois_p)
        scales = collect_scales(jax.tree.map(float, cv["calib"]))
        if self._scales:
            scales = merge_scales(self._scales, scales)
        self._scales = scales
        self._compiled.clear()

    def _fn(self, batch: int, bucket: int):
        key = (batch, bucket)
        if key not in self._compiled:
            dil = self.dilation_pixels
            from .ops.quant import int8_serving
            from .ops.pallas_head import head_fusion
            use_int8 = self.quantize == "int8"
            use_fusion = self.fused_head
            scales = self._scales
            deny = self.int8_deny

            def forward(params, images, rois):
                # the contexts are consulted at trace time
                with int8_serving(use_int8, scales, deny), head_fusion(use_fusion):
                    logits, aux = self.model.apply(params, images, rois, train=False)
                inst, binary = deployed_outputs(logits, aux, rois, dil)
                return inst, binary, logits

            if self.const_params:
                # numpy leaves close over the trace as XLA constants
                if self._np_params is None:
                    self._np_params = jax.tree.map(np.asarray, self.params)
                cp = self._np_params
                fwd = lambda params, images, rois: forward(cp, images, rois)
            else:
                fwd = forward

            if self.mesh is not None:
                import logging

                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                axis = self.mesh.axis_names[0]
                ndev = self.mesh.devices.size
                rep = NamedSharding(self.mesh, P())
                img_s = (NamedSharding(self.mesh, P(axis))
                         if batch % ndev == 0 else rep)
                roi_s = (NamedSharding(self.mesh, P(axis))
                         if bucket % ndev == 0 else rep)
                for name, extent, sh in (("batch", batch, img_s),
                                         ("roi bucket", bucket, roi_s)):
                    if sh is rep:
                        # outputs stay identical either way, but the axis
                        # runs replicated (quietly sequential) — surface it
                        logging.getLogger(__name__).warning(
                            "InferenceEngine mesh: %s=%d does not divide "
                            "%d devices; that axis serves REPLICATED",
                            name, extent, ndev)
                run = jax.jit(fwd, in_shardings=(rep, img_s, roi_s),
                              out_shardings=(roi_s, img_s, roi_s))
            else:
                run = jax.jit(fwd)

            self._compiled[key] = run
        return self._compiled[key]

    def __call__(self, images: np.ndarray, rois: np.ndarray):
        """images (B, H, W, 3) in [0,1]; rois (N, 5) normalised boxes.

        Returns (instance_masks (N, mh, mw, 1), binary_masks (B, H, W, 1)).
        """
        n = rois.shape[0]
        if self.quantize == "int8" and self._scales is None:
            self.calibrate(images, rois)
        bucket = roi_bucket(max(n, 1), max_bucket=self.max_bucket)
        rois_p = pad_rois(np.asarray(rois, np.float32), bucket)
        fn = self._fn(images.shape[0], bucket)
        inst, binary, _ = fn(self.params, jnp.asarray(images, self.dtype), jnp.asarray(rois_p))
        return np.asarray(inst[:n]), np.asarray(binary)

    def predict_nchw(self, images: np.ndarray, rois: np.ndarray):
        """Reference-compatible entry point: NCHW in, NCHW out.

        Mirrors the ONNX graph contract exactly
        (test_hierarchical_instance_peopleseg_onnx.py:570-573):
        images (B, 3, H, W) in [0,1], rois (N, 5) ->
        instance_masks (N, 1, mh, mw), binary_masks (B, 1, H, W).
        """
        inst, binary = self(np.transpose(np.asarray(images), (0, 2, 3, 1)), rois)
        return np.transpose(inst, (0, 3, 1, 2)), np.transpose(binary, (0, 3, 1, 2))

    def warmup(self, batch: int = 1, buckets: Tuple[int, ...] = (1, 2, 4, 8, 16)):
        ih, iw = self.model.image_size
        img = jnp.zeros((batch, ih, iw, 3), self.dtype)
        for b in buckets:
            rois = jnp.tile(jnp.asarray([[0.0, 0.25, 0.25, 0.75, 0.75]], jnp.float32), (b, 1))
            fn = self._fn(batch, b)
            jax.block_until_ready(fn(self.params, img, rois))


def create_flagship(
    variant: str = "b0",
    roi_size: Tuple[int, int] = (64, 48),
    mask_size: Tuple[int, int] = (128, 96),
    image_size: Tuple[int, int] = (480, 640),
    seed: int = 0,
    **kwargs,
) -> Tuple[HierarchicalInstanceSegmenter, Any]:
    """Build + init the flagship model (B0 standard config by default,
    matching SURVEY §7's minimum end-to-end slice)."""
    model = HierarchicalInstanceSegmenter(
        encoder_variant=variant, roi_size=roi_size, mask_size=mask_size,
        image_size=image_size, **kwargs,
    )
    rng = jax.random.PRNGKey(seed)
    images = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
    rois = jnp.asarray([[0.0, 0.25, 0.25, 0.75, 0.75]], jnp.float32)
    # jit the init: one compiled program instead of per-op dispatches (which
    # are pathologically slow over a remote-device tunnel). Init through the
    # non-Pallas model (identical parameter tree by construction) so the
    # kernel isn't compiled at tiny init shapes.
    init_model = model
    if kwargs.get("pallas_tail"):
        init_model = HierarchicalInstanceSegmenter(
            encoder_variant=variant, roi_size=roi_size, mask_size=mask_size,
            image_size=image_size, **{**kwargs, "pallas_tail": False},
        )
    params = jax.jit(lambda r: init_model.init(r, images, rois, train=False))(rng)
    return model, params
