"""ROI-sharded inference: the context-parallelism analogue for this model.

The reference has no sequence/context parallelism to mirror (vision CNN;
SURVEY §2.9) — the scalable axis in crowded scenes is the ROI count N.
Stage 2 (per-ROI crops -> feature stack -> hierarchical head) is
embarrassingly parallel over ROIs, so for large-N scenes the ROI axis is
sharded over the device mesh: each device runs stage 1 on the (replicated)
image batch and stage 2 on its local ROI slice; instance masks come back
sharded, stage-1 binary masks replicated. No collectives are needed in the
steady state — the "communication" is the replicated stage-1 compute, which
is the right trade on ICI when N >> B (stage 2 dominates FLOPs ~10:1 per
ROI at flagship sizes).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..inference import deployed_outputs, pad_rois


def make_roi_sharded_infer(model, mesh: Mesh, dilation_pixels: int = 0):
    """Jitted (params, images, rois) -> (instance_masks, binary_masks) with
    rois sharded over the mesh's first axis. len(rois) must be a multiple of
    the mesh size (use `shard_rois` to pad + place)."""
    axis = mesh.axis_names[0]

    def local_infer(params, images, rois):
        logits, aux = model.apply(params, images, rois, train=False)
        inst, binary = deployed_outputs(logits, aux, rois,
                                        dilation_pixels)
        return inst, binary

    sharded = jax.shard_map(
        local_infer, mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_rois(mesh: Mesh, rois: np.ndarray) -> Tuple[jnp.ndarray, int]:
    """Pad rois to a multiple of the mesh size and place them sharded.
    Returns (device_rois, original_n)."""
    n = rois.shape[0]
    d = int(np.prod(mesh.devices.shape))
    bucket = max(((n + d - 1) // d) * d, d)
    padded = pad_rois(np.asarray(rois, np.float32), bucket)
    spec = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.device_put(jnp.asarray(padded), spec), n
