"""Serving-config sweep: one run -> the full throughput matrix.

Times the flagship B0 480x640 batch-32 deployed-outputs program (the
bench.py shape) across serving modes so the best combination can be picked
with data:

  base          fused_tail=3 + encoder_s2d_front (the committed bench config)
  int8          + quantize="int8" (calibrated static scales)
  fused_head    + Pallas stage-2 conv+LN+act fusion (data-driven gates)
  const         + const_params=True (weights as XLA constants)
  int8+const    both

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_serving_matrix.py [modes]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(call, i1=5, i2=25):
    """Chained-iteration slope timing (see bench.py)."""

    def make_chain(iters):
        @jax.jit
        def chained(images, rois):
            def body(i, carry):
                inst, binary = call(images + carry, rois)
                return (jnp.mean(inst) * 1e-12).astype(images.dtype)
            return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0, images.dtype))
        return chained

    c1, c2 = make_chain(i1), make_chain(i2)
    float(c1(*ARGS))
    float(c2(*ARGS))
    best = []
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(*ARGS)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(c2(*ARGS)); d2 = time.perf_counter() - t0
        best.append((d2 - d1) / (i2 - i1))
    return min(best)


def main():
    global ARGS
    # persistent compile cache (the axon IFRT hook keys it by program
    # fingerprint): identical re-runs skip the multi-minute remote compiles
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from human_instance_segmentation_tpu.inference import (
        InferenceEngine, cast_floating, create_flagship)

    SHAPES = {
        "b0": dict(batch=32, ih=480, iw=640, roi=(64, 48), mask=(128, 96)),
        "b1": dict(batch=16, ih=640, iw=640, roi=(80, 60), mask=(160, 120)),
        "b7": dict(batch=8, ih=480, iw=640, roi=(128, 96), mask=(256, 192)),
    }
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variant", choices=sorted(SHAPES), default="b0",
                    help="flagship family at its BASELINE.md deployment shape "
                         "(reference README.md:540-575 / 446-449)")
    ap.add_argument("modes", nargs="*",
                    default=["base", "int8", "fused_head", "const", "int8+const"])
    ns = ap.parse_args()
    variant, modes = ns.variant, ns.modes
    sh = SHAPES[variant]
    batch, ih, iw = sh["batch"], sh["ih"], sh["iw"]

    model, params = create_flagship(
        variant=variant, roi_size=sh["roi"], mask_size=sh["mask"],
        image_size=(ih, iw), fused_tail=3, encoder_s2d_front=True)
    params = cast_floating(params, jnp.bfloat16)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, ih, iw, 3), np.float32), jnp.bfloat16)
    rois = jnp.asarray(np.concatenate([
        np.arange(batch, dtype=np.float32)[:, None],
        np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32), (batch, 1)),
    ], axis=1))
    ARGS = (images, rois)

    def parse_mode(mode):
        """'+'-separated tokens -> (engine kwargs, model kwargs).

        Tokens: base / int8 / fused_head (alias fused) / const / encN
        (Pallas fused MBConv for the first N blocks) / proi (Pallas
        RoIAlign for the RGB crop) / noqdeny (quantize the encoder too —
        the pre-denylist behaviour, kept measurable)."""
        kw, mkw = {}, {}
        for tok in mode.split("+"):
            if tok == "base":
                pass
            elif tok == "int8":
                kw["quantize"] = "int8"
            elif tok in ("fused", "fused_head"):
                kw["fused_head"] = True
            elif tok == "const":
                kw["const_params"] = True
            elif tok == "noqdeny":
                kw["int8_deny"] = ()
            elif tok == "denyenc":
                # the pre-r5 default: whole encoder bf16
                kw["int8_deny"] = ("encoder/",)
            elif tok.startswith("qonly"):
                # r5 per-stage encoder int8 probe: quantize ONLY encoder
                # stage <N> (deny every other stage), with the r4 producer-
                # side barrier in effect. qonly3 => stage 3 int8, rest bf16.
                keep = int(tok[5:])
                kw["int8_deny"] = tuple(
                    f"encoder/stage{s}_" for s in range(7) if s != keep)
            elif tok.startswith("qallow"):
                # allow a comma-free list of stages, e.g. qallow345
                keep = {int(c) for c in tok[6:]}
                kw["int8_deny"] = tuple(
                    f"encoder/stage{s}_" for s in range(7) if s not in keep)
            elif tok.startswith("enc"):
                mkw["encoder_fused_blocks"] = int(tok[3:])
            elif tok == "nested":
                mkw["nested_tail"] = True
            elif tok == "n4t":
                mkw["n4_tail"] = True
            elif tok == "proi":
                mkw["pallas_roi_align"] = True
            elif tok == "ptail":
                # d4 + seg head through the Pallas tail (bf16 kernel, or
                # the s8 kernel when combined with int8 — ops/pallas_tail_q)
                mkw["pallas_tail"] = True
            elif tok.startswith("mid"):
                # b0-fast serving rows: narrow stage-2 head (the config
                # registry's *_fast family; params are re-initialised since
                # the tree differs from the 256-wide flagship). mid128 /
                # mid96 / mid64 ...
                mkw["mid_channels"] = int(tok[3:])
            elif tok.startswith("fd"):
                # narrow RGB-extractor/feature dim (stage-2's other FLOP
                # axis; reference hardcodes 256 via feature_combiner,
                # hierarchical_segmentation_rgb.py:657-673)
                mkw["feature_dim"] = int(tok[2:])
            elif tok == "dec34":
                # stage-1 fast decoder: 3/4-width smp channels
                mkw["unet_decoder_channels"] = (192, 96, 48, 24, 16)
            elif tok == "dhalf":
                # stage-1 fast decoder: half-width smp channels (last stays
                # 16 - the seg head needs >= TAIL_QUANT_MIN_FEATURES and
                # <16 pads HBM lanes worse than it saves FLOPs)
                mkw["unet_decoder_channels"] = (128, 64, 32, 16, 16)
            elif tok.startswith("tq"):
                # lower the tail-quant feature gate (r4: re-measure d4/head
                # int8 — XLA's s8 conv lowering changed since the r2 numbers
                # that set TAIL_QUANT_MIN_FEATURES=32)
                from human_instance_segmentation_tpu.ops import quant as _q
                _q.TAIL_QUANT_MIN_FEATURES = int(tok[2:])
            else:
                raise ValueError(f"unknown mode token {tok!r}")
        return kw, mkw

    def model_for(mkw):
        # model variants share the parameter tree, so the same params
        # serve every model build
        if not mkw:
            return model
        from human_instance_segmentation_tpu.models.assembly import (
            HierarchicalInstanceSegmenter)
        return HierarchicalInstanceSegmenter(
            encoder_variant=variant, roi_size=sh["roi"], mask_size=sh["mask"],
            image_size=(ih, iw), fused_tail=3, encoder_s2d_front=True,
            **mkw)

    for mode in modes:
        kw, mkw = parse_mode(mode)
        mode_params = params
        if {"mid_channels", "feature_dim", "unet_decoder_channels"} & set(mkw):
            # different parameter tree: re-init
            _, mode_params = create_flagship(
                variant=variant, roi_size=sh["roi"], mask_size=sh["mask"],
                image_size=(ih, iw), fused_tail=3, encoder_s2d_front=True,
                **mkw)
            mode_params = cast_floating(mode_params, jnp.bfloat16)
        eng = InferenceEngine(model_for(mkw), mode_params, dilation_pixels=1,
                              dtype=jnp.bfloat16, **kw)
        if kw.get("quantize"):
            eng.calibrate(np.asarray(images, np.float32), np.asarray(rois))
        fn = eng._fn(batch, batch)
        p = eng.params

        def call(a, r, fn=fn, p=p):
            inst, binary, _ = fn(p, a, r)
            return inst, binary

        dt = slope_time(call)
        print(f"{variant} {mode:11s} {dt*1e3:8.3f} ms/batch  {batch/dt:7.1f} img/s", flush=True)
        record_result("serving_matrix", {
            "variant": variant, "mode": mode, "batch": batch,
            "image": [ih, iw], "roi": list(sh["roi"]), "mask": list(sh["mask"]),
            "ms_per_batch": round(dt * 1e3, 3),
            "images_per_sec": round(batch / dt, 1),
        })


def record_result(kind: str, row: dict) -> None:
    """Append a machine-readable result row to scripts/results/<kind>.jsonl.

    Every number quoted in README/commits must trace to one of these
    committed artifacts (round-5 evidence-hygiene contract)."""
    import json
    import os
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "results")
    os.makedirs(outdir, exist_ok=True)
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=here).stdout.strip()
    except Exception:
        rev = ""
    row = {"git": rev, **row}
    with open(os.path.join(outdir, f"{kind}.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
