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

TPU re-design: batched over frame pairs; correlation via the Pallas kernel.

The head is algebraically REORDERED (fused_head=True, default): both the
bin average and the Linear are linear maps, so the fc weight contracts into
the feature pyramid FIRST -- per channel group g (no concat materialized):
    G[h,w,i,j,o] += FM_g[h,w,c] . W_g[c,i,j,o]
then ops.roi_pool_linear applies the per-roi bin masks to the tiny G
(38x75x7x7x4) instead of ROI-pooling a 2602-channel map (which costs a
~700 MB mask-matmul intermediate, a ~260 MB pooled tensor and ~8x the
FLOPs). Correlation volumes enter in the kernel's native (K2, H, W) layout,
skipping a 14 MB transpose per scale each direction. Same math, same
params, same converted weights; fused_head=False keeps the materialized
reference-shaped path as the equivalence oracle
(tests/test_models.py::test_tracker_fused_head_matches_materialized).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pointwise_correlation, roi_pool
from ..ops.pooling import roi_pool_linear


class _FCParams(nn.Module):
    """bare Linear params with nn.Dense's layout/init, so both head paths
    share one param pytree (c_tracker/reg_fc/{kernel,bias})."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class CorrelationTracker(nn.Module):
    """Args:
        d_max: maximum correlation displacement.
        r_hw: pooled map height/width.
        reg_channels: RPN feature channels (512).
        stride: correlation stride.
        corr_impl / corr_interpret: forwarded to ops.pointwise_correlation.
        fused_head: reordered pool/fc contraction (see module docstring).
    """

    d_max: int = 8
    r_hw: int = 7
    reg_channels: int = 512
    stride: int = 1
    corr_impl: str = "auto"
    corr_interpret: bool = False
    fused_head: bool = True
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
        khw = self.r_hw
        kernel, bias = _FCParams(4, self.fc_channels, name="reg_fc")()

        def corr(a, b, layout):
            return pointwise_correlation(
                a,
                b,
                self.d_max,
                self.stride,
                impl=self.corr_impl,
                interpret=self.corr_interpret,
                layout=layout,
            )

        # nearest-neighbor 1/2 downsample of c3 (torch interpolate default).
        # Callers SHOULD pass c3 already at c4's resolution (downsampled at
        # full batch, before pair splitting): a pair-split followed by this
        # spatial-stride-2 slice miscompiles on TPU at batch > 4 pairs (the
        # device faults at runtime; bisected in round 2 -- either op alone
        # is fine). Already-downsampled c3 is detected by shape and passed
        # through.
        if fm_pyr_0["c3"].shape[1:3] == fm_pyr_0["c4"].shape[1:3]:
            c3_0, c3_1 = fm_pyr_0["c3"], fm_pyr_1["c3"]
        else:
            c3_0 = fm_pyr_0["c3"][:, ::2, ::2, :]
            c3_1 = fm_pyr_1["c3"][:, ::2, ::2, :]

        if not self.fused_head:
            # materialized reference-shaped path (equivalence oracle).
            def corr_flat(a, b):
                out = corr(a, b, "nhwkk")
                return out.reshape(*out.shape[:3], k2)

            feats = jnp.concatenate(
                [
                    reg_fm_0,
                    reg_fm_1,
                    corr_flat(c3_0, c3_1),
                    corr_flat(fm_pyr_0["c4"], fm_pyr_1["c4"]),
                    corr_flat(fm_pyr_0["c5"], fm_pyr_1["c5"]),
                ],
                axis=-1,
            )  # (B, H, W, 2*Cr + 3*(2d+1)^2)
            pooled = jax.vmap(lambda fm, r: roi_pool(fm, r, khw))(feats, rois)
            b, r = pooled.shape[:2]
            # flatten in the reference's (C, k, k) order so converted Linear
            # weights line up (correlation_tracker.py:83).
            pooled = jnp.transpose(pooled, (0, 1, 4, 2, 3)).reshape(b, r, -1)
            t_hat = (
                pooled.astype(self.dtype) @ kernel.astype(self.dtype)
                + bias.astype(self.dtype)
            )
            return t_hat.astype(jnp.float32)

        # fused head: contract the fc weight into each channel group of the
        # (never materialized) concat. kernel rows are (C_total, k, k)-major,
        # so group c0's block is kernel[c0*k^2 : (c0+C_g)*k^2].
        cr = self.reg_channels
        f32 = self.dtype == jnp.float32
        prec = jax.lax.Precision.HIGHEST if f32 else jax.lax.Precision.DEFAULT

        def wslice(c0, c_g):
            w = kernel[c0 * khw * khw : (c0 + c_g) * khw * khw]
            return w.reshape(c_g, khw, khw, 4).astype(self.dtype)

        def proj_nhwc(fm, c0):
            return jnp.einsum(
                "bhwc,cijo->bhwijo",
                fm.astype(self.dtype),
                wslice(c0, fm.shape[-1]),
                precision=prec,
                preferred_element_type=jnp.float32,
            )

        def proj_corr(a, b, c0):
            vol = corr(a, b, "k2hw")  # (B, K2, H, W) f32, kernel-native
            return jnp.einsum(
                "bphw,pijo->bhwijo",
                vol.astype(self.dtype),
                wslice(c0, k2),
                precision=prec,
                preferred_element_type=jnp.float32,
            )

        g = proj_nhwc(reg_fm_0, 0)
        g += proj_nhwc(reg_fm_1, cr)
        g += proj_corr(c3_0, c3_1, 2 * cr)
        g += proj_corr(fm_pyr_0["c4"], fm_pyr_1["c4"], 2 * cr + k2)
        g += proj_corr(fm_pyr_0["c5"], fm_pyr_1["c5"], 2 * cr + 2 * k2)
        # g: (B, H, W, k, k, 4) f32 -- the fc-projected pyramid.

        t_hat = jax.vmap(lambda gm, r: roi_pool_linear(gm, r, khw))(g, rois)
        return (t_hat + bias.astype(jnp.float32)).astype(jnp.float32)