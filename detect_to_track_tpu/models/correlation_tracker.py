"""correlation-based cross-frame tracking regressor
(https://arxiv.org/abs/1710.03958).

Behavioral parity with reference
detect_to_track/models/correlation_tracker.py:13-87:
- pointwise correlation volumes at c3 (nearest-downsampled x1/2 to match
  stride 16 -- torch interpolate's default mode is 'nearest', reference
  correlation_tracker.py:59-61), c4, c5;
- each (H, W, 2d+1, 2d+1) volume flattens to (2d+1)^2 channels with
  ci-major order (reference's view+permute at correlation_tracker.py:64-72);
- concat [reg_fm_0, reg_fm_1, corr_c3, corr_c4, corr_c5] on channels
  (correlation_tracker.py:74-80);
- ROIPool (plain average) over frame-0 rois, flatten in the reference's
  (C, k, k) order for weight compatibility, single Linear -> 4
  (correlation_tracker.py:82-86). fc_channels =
  (3*(2d+1)^2 + 2*reg_channels) * r_hw^2 (= 92,659 at defaults).

TPU re-design: batched over frame pairs; correlation via the Pallas kernel;
pooling via summed-area tables.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pointwise_correlation, roi_pool


class CorrelationTracker(nn.Module):
    """Args:
        d_max: maximum correlation displacement.
        r_hw: pooled map height/width.
        reg_channels: RPN feature channels (512).
        stride: correlation stride.
        corr_impl / corr_interpret: forwarded to ops.pointwise_correlation.
    """

    d_max: int = 8
    r_hw: int = 7
    reg_channels: int = 512
    stride: int = 1
    corr_impl: str = "auto"
    corr_interpret: bool = False
    dtype: Any = jnp.float32

    @property
    def fc_channels(self) -> int:
        k2 = (2 * self.d_max + 1) ** 2
        return (3 * k2 + 2 * self.reg_channels) * self.r_hw**2

    @nn.compact
    def __call__(
        self,
        fm_pyr_0: Dict[str, jnp.ndarray],
        fm_pyr_1: Dict[str, jnp.ndarray],
        reg_fm_0: jnp.ndarray,
        reg_fm_1: jnp.ndarray,
        rois: jnp.ndarray,
    ) -> jnp.ndarray:
        """
        Args:
            fm_pyr_0 / fm_pyr_1: {'c3','c4','c5'} NHWC pyramids for frames
                t and t+tau; c4/c5 at the working stride, c3 at half.
            reg_fm_0 / reg_fm_1: (B, H, W, Cr) RPN regression features.
            rois: (B, R, 4) frame-0 rois (padded).

        Returns:
            t_hat: (B, R, 4) predicted frame-0 -> frame-1 box transforms.
        """
        k2 = (2 * self.d_max + 1) ** 2

        def corr(a, b):
            out = pointwise_correlation(
                a,
                b,
                self.d_max,
                self.stride,
                impl=self.corr_impl,
                interpret=self.corr_interpret,
            )  # (B, H, W, 2d+1, 2d+1)
            return out.reshape(*out.shape[:3], k2)

        # nearest-neighbor 1/2 downsample of c3 (torch interpolate default).
        c3_0 = fm_pyr_0["c3"][:, ::2, ::2, :]
        c3_1 = fm_pyr_1["c3"][:, ::2, ::2, :]

        feats = jnp.concatenate(
            [
                reg_fm_0,
                reg_fm_1,
                corr(c3_0, c3_1),
                corr(fm_pyr_0["c4"], fm_pyr_1["c4"]),
                corr(fm_pyr_0["c5"], fm_pyr_1["c5"]),
            ],
            axis=-1,
        )  # (B, H, W, 2*Cr + 3*(2d+1)^2)

        pooled = jax.vmap(lambda fm, r: roi_pool(fm, r, self.r_hw))(
            feats, rois
        )  # (B, R, k, k, C)
        b, r = pooled.shape[:2]
        # flatten in the reference's (C, k, k) order so converted Linear
        # weights line up (correlation_tracker.py:83).
        pooled = jnp.transpose(pooled, (0, 1, 4, 2, 3)).reshape(b, r, -1)

        t_hat = nn.Dense(4, dtype=self.dtype, name="reg_fc")(
            pooled.astype(self.dtype)
        )
        return t_hat.astype(jnp.float32)
