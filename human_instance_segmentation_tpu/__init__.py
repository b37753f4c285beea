"""TPU-native hierarchical human instance segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PINTO0309/human-instance-segmentation (reference mounted at /root/reference):
a two-stage, ROI-based hierarchical person instance segmenter.

Stage 1: a full-image binary person/background UNet (EfficientNet encoder).
Stage 2: per-ROI hierarchical 3-class head (background / target / non-target)
fed by a separable-matmul RoIAlign over both the RGB image and the stage-1
logit map.

Everything in the compute path is pure-functional JAX compiled by XLA;
the RoIAlign is expressed as dense separable interpolation matmuls that map
onto the TPU MXU (with an optional Pallas kernel for the large-feature-map
case), shapes are static (ROI-count bucketing), and multi-chip scaling is via
``jax.sharding.Mesh`` + collectives rather than any host-side loop.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
from . import models  # noqa: F401
from . import inference  # noqa: F401
