"""the DetectTrackModule container.

Mirrors reference detect_to_track/models/detect_track.py:11-61: groups
backbone / rpn / rcnn / c_tracker so they share one params pytree, while the
actual forward-pass composition lives in the trainer (training graph) and
the detector (inference graph) -- the same separation the reference chose
and documented (detect_track.py:17-27). Calling the module directly raises,
like the reference's forward().

Usage (linen):
    model = DetectTrackModule(cfg-ish args)
    variables = model.init(rng, images, rois)        # touches every head
    fmaps = model.apply(vars, x, method="backbone")
    o, b, fm_reg = model.apply(vars, fmaps["c4"], method="rpn")
    c, b2 = model.apply(vars, fmaps["c5"], rois, method="rcnn")
    t = model.apply(vars, pyr0, pyr1, r0, r1, rois, method="c_tracker")
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from .correlation_tracker import CorrelationTracker
from .resnet import ResNetBackbone
from .rfcn import RFCN
from .rpn import RPN


class DetectTrackModule(nn.Module):
    """Args mirror reference detect_track.py:41-55 (plus TPU knobs)."""

    backbone_arch: str = "resnet50"
    first_trainable_stage: int = 0  # 0 = no backward pruning
    remat: bool = False
    n_anchors: int = 15
    n_classes: int = 30
    k: int = 7
    d_max: int = 8
    r_hw: int = 7
    paper_channel_layout: bool = False
    corr_impl: str = "auto"
    corr_interpret: bool = False
    tracker_fused_head: bool = True
    dtype: Any = jnp.float32

    # stage output channels (hardcoded in the reference too,
    # detect_track.py:37-39).
    stage4_outchannels: int = 1024
    stage5_outchannels: int = 2048
    rpn_channels: int = 512

    @classmethod
    def from_config(cls, cfg, **overrides) -> "DetectTrackModule":
        """the ONE factory every entry point (train.py / evaluate.py /
        bench.py / examples / __graft_entry__) builds the module through,
        so config-driven knobs (e.g. FIX_PSROI_CHANNEL_MAP -> a different
        head channel layout) cannot silently drift between CLIs."""
        kwargs = dict(
            backbone_arch=cfg.BACKBONE_ARCH,
            first_trainable_stage=cfg.FIRST_TRAINABLE_STAGE,
            remat=cfg.REMAT,
            n_anchors=cfg.n_anchors_per_cell,
            n_classes=cfg.N_CLASSES,
            k=cfg.K,
            d_max=cfg.D_MAX,
            r_hw=cfg.K,
            paper_channel_layout=cfg.FIX_PSROI_CHANNEL_MAP,
            dtype=cfg.compute_dtype,
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    def init_variables(self, rng, cfg):
        """canonical `init`: a 2-frame zero batch + mid-image rois touches
        every head. Params are layout-identical for HOST_S2D inputs (the
        s2d stem is an exact regroup of the same stem weights), so C=3
        init covers both input layouts."""
        h, w = cfg.INPUT_SHAPE
        return self.init(
            rng,
            jnp.zeros((2, h, w, 3), jnp.float32),
            jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
        )

    def setup(self):
        self.backbone_mod = ResNetBackbone(
            arch=self.backbone_arch,
            dtype=self.dtype,
            first_trainable_stage=self.first_trainable_stage,
            remat=self.remat,
            name="backbone",
        )
        self.rpn_mod = RPN(
            n_anchors=self.n_anchors,
            conv_channels=self.rpn_channels,
            dtype=self.dtype,
            name="rpn",
        )
        self.rcnn_mod = RFCN(
            n_classes=self.n_classes,
            k=self.k,
            paper_channel_layout=self.paper_channel_layout,
            dtype=self.dtype,
            name="rcnn",
        )
        self.c_tracker_mod = CorrelationTracker(
            d_max=self.d_max,
            r_hw=self.r_hw,
            reg_channels=self.rpn_channels,
            corr_impl=self.corr_impl,
            corr_interpret=self.corr_interpret,
            fused_head=self.tracker_fused_head,
            dtype=self.dtype,
            name="c_tracker",
        )

    def backbone(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self.backbone_mod(x)

    def rpn(self, c4: jnp.ndarray):
        return self.rpn_mod(c4)

    def rcnn(self, c5: jnp.ndarray, rois: jnp.ndarray):
        return self.rcnn_mod(c5, rois)

    def c_tracker(self, pyr0, pyr1, reg0, reg1, rois):
        return self.c_tracker_mod(pyr0, pyr1, reg0, reg1, rois)

    def __call__(self, x: jnp.ndarray, rois: jnp.ndarray):
        """init-path only: composes all submodules once so `init` creates
        every param. Runtime forward logic lives in trainer/inference
        (see module docstring)."""
        fmaps = self.backbone(x)
        o_hat, b_hat, fm_reg = self.rpn(fmaps["c4"])
        c_hat, b2_hat = self.rcnn(fmaps["c5"], rois)
        t_hat = self.c_tracker(fmaps, fmaps, fm_reg, fm_reg, rois)
        return o_hat, b_hat, c_hat, b2_hat, t_hat
