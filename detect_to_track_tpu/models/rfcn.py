"""R-FCN detection head (https://arxiv.org/abs/1605.06409).

Behavioral parity with reference detect_to_track/models/rfcn.py:10-84:
channel_reduce = 3x3 conv, dilation 6, pad 6 -> 512 + ReLU; two heads
(classification over n_classes+1 targets with softmax, regression over 4
targets), each a 1x1 conv to n_targets*k^2 position-sensitive score maps ->
PSROIPool -> mean over the k x k grid.

TPU re-design: the head is BATCHED over frames (the reference processes one
(C, H, W) frame at a time, rfcn.py:36-38); pooling runs through ps_roi_pool's
default MXU mask-matmul path (ops/pooling.py; the SAT variant exists for
huge-roi regimes only) and vmaps over the batch. ROI slots carry a
validity mask downstream -- padding rois pool garbage that is masked in the
loss / filtered at inference.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import ps_roi_pool


class RFCN(nn.Module):
    """Args:
        n_classes: number of non-background classes.
        k: pooled grid height/width.
        paper_channel_layout: False replicates the reference's PSROIPool
            channel-selector quirk (ps_roipool_cuda.cu:58).
    """

    n_classes: int
    k: int = 7
    reduce_channels: int = 512
    paper_channel_layout: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, rois: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """
        Args:
            x: (B, H, W, C) backbone c5 feature map.
            rois: (B, R, 4) fractional ijhw region proposals (padded).

        Returns:
            c_hat: (B, R, n_classes+1) softmaxed class scores.
            b_hat: (B, R, 4) box offsets from rois.
        """
        k = self.k
        n_cls = self.n_classes + 1

        t = nn.relu(
            nn.Conv(
                self.reduce_channels,
                (3, 3),
                padding=[(6, 6), (6, 6)],
                kernel_dilation=(6, 6),
                dtype=self.dtype,
                name="channel_reduce",
            )(x)
        )
        cls_maps = nn.Conv(
            n_cls * k * k, (1, 1), dtype=self.dtype, name="cls_sm_conv"
        )(t).astype(jnp.float32)
        reg_maps = nn.Conv(
            4 * k * k, (1, 1), dtype=self.dtype, name="reg_sm_conv"
        )(t).astype(jnp.float32)

        pool = lambda fm, r, n: ps_roi_pool(
            fm, r, n, k, self.paper_channel_layout
        )
        pooled_cls = jax.vmap(lambda fm, r: pool(fm, r, n_cls))(cls_maps, rois)
        pooled_reg = jax.vmap(lambda fm, r: pool(fm, r, 4))(reg_maps, rois)

        c_hat = pooled_cls.mean(axis=(-2, -1))  # (B, R, n_cls)
        b_hat = pooled_reg.mean(axis=(-2, -1))  # (B, R, 4)
        c_hat = jax.nn.softmax(c_hat, axis=-1)
        return c_hat, b_hat
