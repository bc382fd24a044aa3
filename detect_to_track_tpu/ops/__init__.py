"""TPU-native kernels for the three ops the reference implements in CUDA
(reference README.md:13-16: ROIPool, PSROIPool, PointwiseCorrelation).

Each op exists twice:
- `lax_ref`: a pure-lax oracle with the CUDA kernels' exact semantics
  (including documented quirks). Differentiable via autodiff, runs anywhere.
  The reference has no CPU fallback at all; these double as one.
- production path: `pooling` (summed-area-table + gather, pure XLA -- O(1)
  work per bin instead of the CUDA kernels' O(bin-area) pixel loops) and
  `correlation` (Pallas kernel holding feature-map tiles in VMEM, with a
  fused XLA fallback off-TPU).
"""

from .lax_ref import (
    pointwise_correlation_ref,
    ps_roi_pool_ref,
    roi_pool_ref,
)
from .pooling import ps_roi_pool, roi_pool
from .correlation import pointwise_correlation
from .nms import batched_proposal_filter, nms_mask, top_k_proposals
