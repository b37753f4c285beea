"""Multi-host (multi-process) data-parallel exercise of ``init_distributed``.

The reference is single-GPU with no distributed layer at all (SURVEY §2.9);
the TPU-native scaling story is `jax.distributed.initialize` + a global
`Mesh` + `shard_map`, with XLA collectives over ICI/DCN. This module runs the
REAL train/eval steps under that topology: every process owns
``local_devices`` chips (virtual CPU devices in the test harness, real chips
on a pod slice), the mesh spans all processes, each host feeds only its local
batch shard via ``host_local_array_to_global_array``, and gradients `pmean`
across the full mesh.

Run one process per host:

    python -m human_instance_segmentation_tpu.parallel.multihost \
        --coordinator HOST:PORT --num_processes N --process_id I

On a real TPU pod slice drop ``--local_devices`` (real chips are discovered);
the CPU test harness (tests/test_multihost.py) passes it to carve virtual
devices.
"""

from __future__ import annotations

import argparse
import os
import sys


def run_worker(process_id: int, num_processes: int, coordinator: str,
               local_devices: int | None = None, verbose: bool = True) -> float:
    """Initialise the process group, run one global-mesh DP train step and
    one eval step on tiny shapes, assert cross-host agreement, return the
    (replicated) loss."""
    if local_devices is not None:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        # own the device count: the test harness env may carry another value
        flags = " ".join(f for f in flags.split()
                         if "xla_force_host_platform_device_count" not in f)
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()

    import jax

    if local_devices is not None:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from .mesh import init_distributed

    n_global = init_distributed(coordinator_address=coordinator,
                                num_processes=num_processes,
                                process_id=process_id)

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from ..losses.hierarchical import RefinedLossConfig
    from ..models.assembly import HierarchicalInstanceSegmenter
    from ..training.state import TrainState
    from ..training.steps import make_eval_step, make_train_step
    from .mesh import create_mesh

    if verbose:
        print(f"[proc {process_id}] {jax.process_count()} processes, "
              f"{n_global} global / {jax.local_device_count()} local devices",
              flush=True)
    assert jax.process_count() == num_processes

    # Tiny shapes — this validates the cross-host topology, not accuracy.
    ih, iw, rh, rw, mh, mw, k = 64, 64, 16, 12, 32, 24, 2
    local_batch = jax.local_device_count()

    model = HierarchicalInstanceSegmenter(
        encoder_variant="tiny", roi_size=(rh, rw), mask_size=(mh, mw),
        image_size=(ih, iw), base_channels=16, depth=2, mid_channels=32,
        feature_dim=32, unet_decoder_channels=(32, 24, 16, 16, 8))

    images = jnp.zeros((1, ih, iw, 3), jnp.float32)
    rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
    variables = jax.jit(lambda r: model.init(r, images, rois, train=False))(
        jax.random.PRNGKey(0))

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    mesh = create_mesh(n_global)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    # Same seed on every host -> identical leaves; promote the host-local
    # replicas to one global replicated array per leaf.
    state = multihost_utils.host_local_array_to_global_array(
        jax.device_get(state), mesh, P())

    # Each host contributes only ITS slice of the global batch (what a real
    # per-host input pipeline produces); distinct per host via the seed.
    rng_np = np.random.default_rng(100 + process_id)
    host_shard = {
        "images": rng_np.random((local_batch, ih, iw, 3), np.float32),
        "boxes": np.tile(np.asarray([[0.2, 0.2, 0.8, 0.8],
                                     [0.1, 0.1, 0.6, 0.9]], np.float32),
                         (local_batch, 1, 1)),
        "masks": rng_np.integers(0, 3, (local_batch, k, mh, mw)).astype(np.int32),
        "valid": np.ones((local_batch, k), np.float32),
    }
    device_batch = multihost_utils.host_local_array_to_global_array(
        host_shard, mesh, P("data"))

    train_step = make_train_step(model, tx, RefinedLossConfig(), mesh=mesh,
                                 donate=False)
    new_state, metrics = train_step(state, device_batch)
    jax.block_until_ready(metrics)
    assert int(new_state.step) == 1, "train step did not advance"
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"

    # The pmean'd loss must be bit-identical on every host.
    losses = np.asarray(multihost_utils.process_allgather(np.float32(loss)))
    assert losses.shape[0] == num_processes
    assert float(losses.max() - losses.min()) == 0.0, losses

    eval_step = make_eval_step(model, mesh=mesh)
    sums = eval_step((new_state.params, new_state.batch_stats), device_batch)
    jax.block_until_ready(sums)
    n_eval = float(sums["n"])
    # every global ROI (valid k per image, global batch) was scored once
    assert n_eval == k * local_batch * num_processes, n_eval

    if verbose:
        print(f"MULTIHOST OK proc={process_id} loss={loss:.6f} "
              f"eval_n={n_eval:.0f}", flush=True)
    return loss


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", required=True, help="host:port of process 0")
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--local_devices", type=int, default=None,
                    help="carve N virtual CPU devices (test harness); omit on real chips")
    args = ap.parse_args(argv)
    run_worker(args.process_id, args.num_processes, args.coordinator,
               local_devices=args.local_devices)
    return 0


if __name__ == "__main__":
    sys.exit(main())
