"""Multi-chip dry run: jit the full DP train step over an n-device mesh.

Used by __graft_entry__.dryrun_multichip — the driver runs this with N
virtual CPU devices to validate that the sharded train step compiles and
executes without N real chips.
"""

from __future__ import annotations

import numpy as np


def run_dryrun(n_devices: int, verbose: bool = True) -> None:
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}").strip()

    import jax

    # This is a *dry run*: always execute on virtual CPU devices. The
    # container's axon sitecustomize pins the TPU backend regardless of the
    # JAX_PLATFORMS env var, so force the platform via config too.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import jax.numpy as jnp
    import optax

    from ..models.assembly import HierarchicalInstanceSegmenter
    from ..training.state import TrainState
    from ..training.steps import make_train_step, make_eval_step
    from ..losses.hierarchical import RefinedLossConfig
    from .mesh import create_mesh, replicate, shard_batch

    if jax.default_backend() != "cpu" and jax.device_count() < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {jax.device_count()} on "
            f"{jax.default_backend()}")

    # Tiny shapes — this validates sharding + collectives, not accuracy.
    ih, iw = 64, 64
    rh, rw = 16, 12
    mh, mw = 32, 24
    k = 2
    batch = n_devices  # one image per device

    model = HierarchicalInstanceSegmenter(
        encoder_variant="tiny", roi_size=(rh, rw), mask_size=(mh, mw),
        image_size=(ih, iw), base_channels=16, depth=2, mid_channels=32,
        feature_dim=32, unet_decoder_channels=(32, 24, 16, 16, 8))

    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((1, ih, iw, 3), jnp.float32)
    rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
    # jit the init: one compiled program instead of thousands of eager
    # dispatches (~10x faster on a loaded host).
    variables = jax.jit(lambda r: model.init(r, images, rois, train=False))(rng)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    mesh = create_mesh(n_devices)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    state = replicate(mesh, state)

    rng_np = np.random.default_rng(0)
    host_batch = {
        "images": rng_np.random((batch, ih, iw, 3), np.float32),
        "boxes": np.tile(np.asarray([[0.2, 0.2, 0.8, 0.8],
                                     [0.1, 0.1, 0.6, 0.9]], np.float32), (batch, 1, 1)),
        "masks": rng_np.integers(0, 3, (batch, k, mh, mw)).astype(np.int32),
        "valid": np.ones((batch, k), np.float32),
    }
    device_batch = shard_batch(mesh, host_batch)

    train_step = make_train_step(model, tx, RefinedLossConfig(), mesh=mesh, donate=False)
    new_state, metrics = train_step(state, device_batch)
    jax.block_until_ready(metrics)
    assert int(new_state.step) == 1, "train step did not advance"
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"

    eval_step = make_eval_step(model, mesh=mesh)
    sums = eval_step((new_state.params, new_state.batch_stats), device_batch)
    jax.block_until_ready(sums)

    if verbose:
        print(f"dryrun_multichip({n_devices}): OK — loss {loss:.4f}, "
              f"eval n={float(sums['n'])}, mean IoU {float(sums['iou_sum'])/max(float(sums['n']),1):.4f}")
