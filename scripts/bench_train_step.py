"""Train-step throughput: f32 vs bf16 compute dtype on the real chip.

Measures the full flagship B0 train step — forward + backward +
RefinedLossConfig loss + adamw update, the same program
``training/loop.py`` dispatches — at a realistic training shape, once with
``compute_dtype=None`` (f32 end to end) and once with ``"bfloat16"``
(activations/forward/backward bf16, master params + loss f32; the TPU
analogue of the reference's AMP+GradScaler, train_advanced.py:696-762).

Methodology matches bench.py: iterations chained in one XLA program via
``make_scanned_train_step`` and timed as the SLOPE between two scan
lengths, so fixed per-dispatch transport costs cancel.

Usage: python scripts/bench_train_step.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import optax

    from human_instance_segmentation_tpu.inference import create_flagship
    from human_instance_segmentation_tpu.losses.hierarchical import RefinedLossConfig
    from human_instance_segmentation_tpu.training.state import TrainState
    from human_instance_segmentation_tpu.training.steps import (
        make_scanned_train_step, stack_batches)

    B, H, W, K, MH, MW = 8, 480, 640, 4, 128, 96
    I1, I2 = 2, 10

    model, variables = create_flagship(
        variant="b0", roi_size=(64, 48), mask_size=(MH, MW),
        image_size=(H, W))
    tx = optax.adamw(1e-4)

    rng = np.random.default_rng(0)

    def mk():
        return {
            "images": rng.random((B, H, W, 3), np.float32),
            "boxes": np.tile(np.asarray([[0.2, 0.1, 0.8, 0.95]], np.float32),
                             (B, K, 1)),
            "masks": rng.integers(0, 3, (B, K, MH, MW)).astype(np.int32),
            "valid": np.ones((B, K), np.float32),
        }

    superbatches = {n: stack_batches([mk() for _ in range(n)])
                    for n in (I1, I2)}

    REPEATS = 4  # median-of-N per scan length: single samples are too
    # noise-sensitive on the tunnelled-chip transport for a slope of two
    results = {}
    for dtype in (None, "bfloat16"):
        times = {}
        for iters in (I1, I2):
            step = make_scanned_train_step(
                model, tx, RefinedLossConfig(), scan_steps=iters,
                donate=False, compute_dtype=dtype)
            sb = jax.device_put(superbatches[iters])
            state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
            _, m = step(state, sb)              # compile + warm
            _ = float(m["total_loss"])          # host round-trip as fence
            samples = []
            for _rep in range(REPEATS):
                t0 = time.perf_counter()
                _, m = step(state, sb)
                fence = float(m["total_loss"])
                samples.append(time.perf_counter() - t0)
            times[iters] = float(np.median(samples))
        ms = (times[I2] - times[I1]) / (I2 - I1) * 1e3
        key = dtype or "float32"
        # sanity_loss: NaN check only — the inputs are synthetic uniform
        # masks with identical boxes, so the value itself is meaningless
        results[key] = {"ms_per_step": round(ms, 2),
                        "imgs_per_sec": round(B / (ms / 1e3), 1),
                        "sanity_loss": round(fence, 4)}
        print(json.dumps({"dtype": key, **results[key]}))

    if "bfloat16" in results and "float32" in results:
        speedup = results["float32"]["ms_per_step"] / results["bfloat16"]["ms_per_step"]
        print(json.dumps({"metric": "train_step_bf16_speedup",
                          "value": round(speedup, 3),
                          "shape": f"B{B} {H}x{W} K{K} m{MH}x{MW}"}))


if __name__ == "__main__":
    main()
