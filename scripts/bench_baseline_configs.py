"""Record the BASELINE.json config benchmarks into BENCHMARKS.json.

Covers the three configs VERDICT r2 flagged as unrecorded:
  b7      — B7 ultra (ROI 128x96, mask 256x192) crowded-scene server batch
            (32 ROIs/image), int8+fused serving
  binary  — B0 binary-mask mode: stage-1 person probability with the
            dilation + bilateral + edge-smoothing epilogue fused IN-GRAPH
            (the reference ships these as separate ONNX graphs,
            export_edge_smoothing_onnx.py / export_bilateral_filter.py)
  distill — B0-from-B7 temperature-progression distillation train step
            (train_distillation_staged.py equivalent), single-chip record

plus re-recordable rows for B0 standard / B1 enhanced (bench.py and
scripts/bench_serving_matrix.py own those numbers).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_baseline_configs.py [items]
items: b7 binary distill
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def time_slope(fn, *args, perturb=1, i1=3, i2=9):
    def mk(iters):
        @jax.jit
        def chained(*a):
            def body(i, carry):
                ai = list(a)
                ai[perturb] = ai[perturb] + carry.astype(ai[perturb].dtype)
                out = fn(*ai)
                return sum((jnp.sum(l) * 1e-30).astype(jnp.float32)
                           for l in jax.tree.leaves(out))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return chained

    c1, c2 = mk(i1), mk(i2)
    float(c1(*args)); float(c2(*args))
    best = []
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(*args)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(c2(*args)); d2 = time.perf_counter() - t0
        best.append((d2 - d1) / (i2 - i1))
    return min(best)


def record(results: dict) -> None:
    path = Path(__file__).resolve().parent.parent / "BENCHMARKS.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    data.update(results)
    path.write_text(json.dumps(data, indent=2) + "\n")
    print(json.dumps(results))


def bench_b7():
    from human_instance_segmentation_tpu.inference import (
        InferenceEngine, cast_floating, create_flagship)

    b, ih, iw = 2, 480, 640
    rois_per_img = 32  # crowded scene (VERDICT: 16-32 ROIs/image)
    model, params = create_flagship(
        variant="b7", roi_size=(128, 96), mask_size=(256, 192),
        image_size=(ih, iw), fused_tail=3, encoder_s2d_front=True)
    params = cast_floating(params, jnp.bfloat16)
    rng = np.random.default_rng(0)
    images_np = rng.random((b, ih, iw, 3), np.float32)
    n = b * rois_per_img
    boxes = rng.random((n, 4), np.float32) * 0.4
    rois_np = np.concatenate([
        np.repeat(np.arange(b, dtype=np.float32), rois_per_img)[:, None],
        np.stack([boxes[:, 0], boxes[:, 1],
                  boxes[:, 0] + 0.3 + boxes[:, 2],
                  boxes[:, 1] + 0.3 + boxes[:, 3]], axis=1),
    ], axis=1)

    eng = InferenceEngine(model, params, dilation_pixels=1,
                          dtype=jnp.bfloat16, quantize="int8",
                          fused_head=True, max_bucket=n)
    eng.calibrate(images_np, rois_np)
    fn = eng._fn(b, n)
    p = eng.params
    images = jnp.asarray(images_np, jnp.bfloat16)
    rois = jnp.asarray(rois_np)

    def call(pp, a, r):
        inst, binary, _ = fn(pp, a, r)
        return inst, binary

    dt = time_slope(call, p, images, rois, perturb=1)
    record({"b7_ultra_crowded": {
        "config": "B7 r128x96 m256x192, 480x640, 2 imgs x 32 ROIs, int8+fused",
        "ms_per_batch": round(dt * 1e3, 2),
        "images_per_sec": round(b / dt, 1),
        "rois_per_sec": round(n / dt, 1),
    }})


def bench_binary():
    from human_instance_segmentation_tpu.inference import cast_floating, create_flagship
    from human_instance_segmentation_tpu.models.postprocess import (
        binary_mask_bilateral, edge_smooth_binary_mask)
    from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet
    from human_instance_segmentation_tpu.ops.s2d import n4_to_plain

    b, ih, iw = 32, 480, 640
    _, params = create_flagship(
        variant="b0", roi_size=(64, 48), mask_size=(128, 96),
        image_size=(ih, iw), fused_tail=3, encoder_s2d_front=True)
    params = cast_floating(params, jnp.bfloat16)
    unet = PeopleSegmentationUNet(encoder_variant="b0", fused_tail=3,
                                  encoder_s2d_front=True)
    uparams = {"params": params["params"]["pretrained_unet"],
               "batch_stats": params["batch_stats"]["pretrained_unet"]}
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, ih, iw, 3), np.float32), jnp.bfloat16)

    def binary_pipeline(up, x):
        form, y = unet.apply(up, x, train=False, raw=True)
        logit = n4_to_plain(y, 1) if form == "n4" else y
        prob = jax.nn.sigmoid(logit.astype(jnp.float32))
        # fused epilogue (reference: separate exported ONNX graphs):
        # bilateral edge-aware smooth -> edge smoothing -> 1px dilation
        m = binary_mask_bilateral(prob, kernel_size=7, num_iterations=2)
        m = edge_smooth_binary_mask(m)
        m = jax.lax.reduce_window(m, -jnp.inf, jax.lax.max,
                                  (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
        return m.astype(jnp.bfloat16)

    def binary_pipeline_n4(up, x):
        # same epilogue math on the stage-1 N4 phase form: the 128x
        # lane-padded C=1 full-res map never exists (models/postprocess.py
        # *_n4 variants, exact vs the plain ops)
        from human_instance_segmentation_tpu.models.postprocess import (
            binary_mask_bilateral_n4, dilate_binary_n4,
            edge_smooth_binary_mask_n4)

        form, y = unet.apply(up, x, train=False, raw=True)
        assert form == "n4"
        prob = jax.nn.sigmoid(y.astype(jnp.float32))
        m = binary_mask_bilateral_n4(prob, kernel_size=7, num_iterations=2)
        m = edge_smooth_binary_mask_n4(m)
        m = dilate_binary_n4(m, pixels=1)
        return n4_to_plain(m, 1).astype(jnp.bfloat16)

    dt = time_slope(binary_pipeline, uparams, images)
    dt_n4 = time_slope(binary_pipeline_n4, uparams, images)
    best = min(dt, dt_n4)
    record({"b0_binary_bilateral": {
        "config": "B0 480x640 binary mode, in-graph bilateral(k7 x2) + edge "
                  "smoothing + 1px dilation, batch 32 bf16",
        "ms_per_batch": round(best * 1e3, 2),
        "images_per_sec": round(b / best, 1),
        "plain_epilogue_ms": round(dt * 1e3, 2),
        "n4_epilogue_ms": round(dt_n4 * 1e3, 2),
    }})


def bench_distill():
    import optax

    from human_instance_segmentation_tpu.losses.distillation import DistillationConfig
    from human_instance_segmentation_tpu.training.distill import (
        build_student_teacher, make_distill_train_step)
    from human_instance_segmentation_tpu.training.state import TrainState
    from human_instance_segmentation_tpu.inference import cast_floating

    b, ih, iw = 8, 640, 640
    student, teacher = build_student_teacher("b0", "b7")
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, ih, iw, 3), jnp.float32)
    s_vars = jax.jit(lambda r: student.init(r, x0, train=False))(rng)
    t_vars = jax.jit(lambda r: teacher.init(r, x0, train=False))(
        jax.random.PRNGKey(1))
    t_vars = cast_floating(t_vars, jnp.bfloat16)
    tx = optax.adamw(1e-4)
    from human_instance_segmentation_tpu.training.state import DistillationState

    step = make_distill_train_step(student, teacher, t_vars, tx,
                                   DistillationConfig(),
                                   compute_dtype="bfloat16")

    def fresh_state():
        # the step DONATES its input state; every chain needs its own copy
        sv = jax.tree.map(jnp.array, s_vars)
        return TrainState.create(
            sv, tx, jax.random.PRNGKey(2),
            distill_state=DistillationState.create(temperature=10.0))

    rng_np = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng_np.random((b, ih, iw, 3), np.float32)),
        "masks": jnp.asarray(
            (rng_np.random((b, ih, iw, 1)) > 0.5).astype(np.float32)),
    }

    # state-threaded slope timing: chain steps through the carried state
    def run(state, batch):
        new_state, metrics = step(state, batch)
        return new_state

    import time as _t

    def chain(iters):
        s = fresh_state()
        jax.block_until_ready(jax.tree.leaves(s.params)[0])
        t0 = _t.perf_counter()
        for _ in range(iters):
            s = run(s, batch)
        jax.block_until_ready(jax.tree.leaves(s.params)[0])
        return _t.perf_counter() - t0

    run(fresh_state(), batch)  # compile
    chain(1)
    d1, d2 = chain(2), chain(6)
    dt = (d2 - d1) / 4
    record({"b0_from_b7_distill_step": {
        "config": "B0 student / B7 teacher, 640x640 batch 8, bf16 compute, "
                  "KL temp-progression step, single chip",
        "ms_per_step": round(dt * 1e3, 2),
        "images_per_sec": round(b / dt, 1),
    }})


def main():
    sel = sys.argv[1:] or ["b7", "binary", "distill"]
    if "b7" in sel:
        bench_b7()
    if "binary" in sel:
        bench_binary()
    if "distill" in sel:
        bench_distill()


if __name__ == "__main__":
    main()
