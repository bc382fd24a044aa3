"""region proposal network (https://arxiv.org/abs/1506.01497).

Behavioral parity with reference detect_to_track/models/rpn.py:9-52:
3x3 conv -> 512 + ReLU, then 1x1 heads for objectness (2 per anchor,
softmaxed) and box offsets (4 per anchor); the 512-channel conv features are
returned as well -- the CorrelationTracker consumes them
(reference correlation_tracker.py:74-80).

Anchor flattening: NHWC conv outputs (B, H, W, a*t) reshape directly to
(B, H*W*a, t), which is byte-identical to the reference's
permute(0,2,3,1).view(...) flattening (rpn.py:23-29) -- anchors stay
anchor-major within each cell, matching anchors.build_anchors ordering.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class RPN(nn.Module):
    """Args:
        n_anchors: anchors per feature-map cell.
        conv_channels: hidden width (512 in the reference, rpn.py:19).
    """

    n_anchors: int
    conv_channels: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """
        Args:
            x: (B, H, W, C) backbone c4 feature map.

        Returns:
            o_hat: (B, H*W*a, 2) softmaxed objectness (not-object, object).
            b_hat: (B, H*W*a, 4) anchor offsets.
            fm_reg: (B, H, W, conv_channels) regression features (f32).
        """
        b = x.shape[0]
        t = nn.relu(
            nn.Conv(
                self.conv_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                name="conv",
            )(x)
        )
        o = nn.Conv(2 * self.n_anchors, (1, 1), dtype=self.dtype, name="cls_fc")(t)
        bx = nn.Conv(4 * self.n_anchors, (1, 1), dtype=self.dtype, name="reg_fc")(t)

        o = o.reshape(b, -1, 2).astype(jnp.float32)
        bx = bx.reshape(b, -1, 4).astype(jnp.float32)
        o = jax.nn.softmax(o, axis=-1)
        return o, bx, t.astype(jnp.float32)
