"""detect_to_track_tpu: a TPU-native (JAX/XLA/Pallas) framework for
*Detect to Track and Track to Detect* (Feichtenhofer et al., arXiv:1710.03958)
video object detection + tracking on ImageNet VID.

Re-designed from scratch for TPU hardware with the same capabilities as the
CUDA/PyTorch reference (jfc4050/detect-to-track):

- the three CUDA-only ops (ROIPool, PSROIPool, PointwiseCorrelation) become
  TPU-native kernels: summed-area-table pooling lowered to pure XLA
  (O(1) work per bin instead of the reference's O(bin-area) pixel loops), and
  a Pallas correlation kernel that keeps feature-map tiles resident in VMEM;
- the host<->device ping-pong of the reference trainer
  (reference: detect_to_track/trainer.py:133-256) collapses into ONE jitted
  train step with static shapes: proposals are fixed-size masked arrays, NMS
  runs on device, and label encoders are vectorized jnp functions;
- scaling is via jax.sharding Mesh + NamedSharding data parallelism rather
  than single-GPU `.cuda()` calls.
"""

__version__ = "0.1.0"

from . import boxes, anchors, encoding, losses
from .config import Config, load_config
