"""inference: the "detect" part of detect-to-track.

Behavioral parity with reference detect_to_track/inference.py:21-121
(Detector), re-architected so that EVERYTHING between image upload and final
box download runs in ONE jitted graph on device:

    backbone -> RPN -> decode -> conf-gate/top-k/NMS (on device, see
    ops/nms.py) -> R-FCN -> decode -> non-background filter -> tracker

The reference round-trips through numpy four times per pair
(inference.py:78-84, 98-106, 115, 119); here a single device->host transfer
returns padded detections + masks, and the host wrapper trims them to the
reference's dynamic-shape API:

    confs0, confs1, bboxes0, bboxes1, tracks = detector(im0, im1)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .anchors import build_anchors
from .config import Config
from .encoding import frcnn_box_decode
from .models import DetectTrackModule
from .ops.nms import batched_proposal_filter
from .utils import split_pairs


class PairDetections(NamedTuple):
    """fixed-shape per-pair outputs (leading axis 2 = frames)."""

    confs: jnp.ndarray  # (2, D, C+1) softmaxed class confidences
    boxes: jnp.ndarray  # (2, D, 4) ijhw
    valid: jnp.ndarray  # (2, D) bool
    tracks: jnp.ndarray  # (D, 4) frame0->frame1 transforms (frame-0 slots)


def _detect_frames(model, variables, x, anchors, cfg):
    """shared per-frame pipeline for BOTH entry points (pair-batched and
    clip): backbone -> RPN -> decode -> on-device proposal filter -> R-FCN
    -> second decode -> non-background gate (reference inference.py:44-52)
    -> compact to MAX_DETS slots, highest fg-conf first. One definition so
    the pair and clip paths cannot drift apart.

    x: (N, H, W, 3|12) frames; uint8 normalizes ON DEVICE (4x less
    host->device transfer, exact for integer-valued sources).

    Returns (fmaps_t, fm_reg, confs, boxes, valid); fmaps_t has c3 already
    downsampled at FULL batch (the split-then-stride order faults the TPU
    at batch > 4, see trainer.py note).
    """
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    fmaps = model.apply(variables, x, method="backbone")

    o_hat, b_hat, fm_reg = model.apply(variables, fmaps["c4"], method="rpn")
    rboxes = frcnn_box_decode(anchors[None], b_hat)  # (N, |A|, 4)

    props = batched_proposal_filter(
        o_hat[:, :, 1],
        rboxes,
        cfg.pre_nms_topk_eval,
        cfg.EVAL_ROI_CONF_THRESH,
        cfg.EVAL_NMS_IOU_THRESH,
        cfg.MAX_ROIS,
        cfg.pre_nms_cap_eval,
    )  # boxes (N, R, 4), valid (N, R)

    c_hat, b2_hat = model.apply(
        variables, fmaps["c5"], props.boxes, method="rcnn"
    )  # (N, R, C+1), (N, R, 4)
    det_boxes = frcnn_box_decode(props.boxes, b2_hat)

    fg_conf = c_hat[:, :, 1:].sum(-1)  # (N, R)
    keep = (fg_conf > cfg.EVAL_RCNN_CONF_THRESH) & props.valid

    # compact the survivors to max_dets slots per frame (a capacity the
    # reference does not need host-side; fg_conf ordering preserves the
    # strongest detections).
    d = cfg.max_dets

    def compact(keep_f, conf_f, confs_f, boxes_f):
        key = jnp.where(keep_f, conf_f, -jnp.inf)
        top, idx = jax.lax.top_k(key, d)
        return confs_f[idx], boxes_f[idx], jnp.isfinite(top)

    confs, boxes, valid = jax.vmap(compact)(keep, fg_conf, c_hat, det_boxes)
    fmaps_t = {**fmaps, "c3": fmaps["c3"][:, ::2, ::2, :]}
    return fmaps_t, fm_reg, confs, boxes, valid


def detect_pairs_batched(
    model: DetectTrackModule,
    variables,
    images: jnp.ndarray,
    anchors: jnp.ndarray,
    cfg: Config,
) -> PairDetections:
    """jit-able forward for a BATCH of frame pairs (the reference can only
    process one pair per call, inference.py:54; here pairs fold into the
    frame batch exactly like the training step).

    Args:
        images: (P, 2, H, W, 3) float32 in [0, 1] OR uint8 in [0, 255]
            (uint8 normalizes on device -- 4x less host->device transfer,
            exact for integer-valued sources; same contract as detect_clip).
        anchors: (|A|, 4).

    Returns PairDetections with a leading P axis on every field.

    Mirrors reference inference.py:54-121 stage by stage.
    """
    p, two, h, w, c = images.shape  # c=12: host pre-s2d layout (HOST_S2D)
    assert two == 2
    x = images.reshape(p * 2, h, w, c)

    fmaps_t, fm_reg, confs, boxes, valid = _detect_frames(
        model, variables, x, anchors, cfg
    )
    d = cfg.max_dets

    # tracker on frame-0 final boxes (reference inference.py:108-118).
    split = {k: split_pairs(v) for k, v in fmaps_t.items()}
    pyr0 = {k: v[0] for k, v in split.items()}
    pyr1 = {k: v[1] for k, v in split.items()}
    tracks = model.apply(
        variables,
        pyr0,
        pyr1,
        *split_pairs(fm_reg),
        split_pairs(boxes)[0],
        method="c_tracker",
    )  # (P, D, 4)

    return PairDetections(
        confs=confs.reshape(p, 2, d, -1),
        boxes=boxes.reshape(p, 2, d, 4),
        valid=valid.reshape(p, 2, d),
        tracks=tracks,
    )


def detect_pair(
    model: DetectTrackModule,
    variables,
    images: jnp.ndarray,
    anchors: jnp.ndarray,
    cfg: Config,
) -> PairDetections:
    """single-pair forward: images (2, H, W, 3); fields without the P axis."""
    out = detect_pairs_batched(model, variables, images[None], anchors, cfg)
    return PairDetections(
        confs=out.confs[0], boxes=out.boxes[0], valid=out.valid[0],
        tracks=out.tracks[0],
    )


class ClipDetections(NamedTuple):
    """fixed-shape per-clip outputs (leading axis F = frames)."""

    confs: jnp.ndarray  # (F, D, C+1)
    boxes: jnp.ndarray  # (F, D, 4)
    valid: jnp.ndarray  # (F, D)
    tracks: jnp.ndarray  # (F-1, D, 4) frame t -> t+1 transforms


def detect_clip(
    model: DetectTrackModule,
    variables,
    frames: jnp.ndarray,
    anchors: jnp.ndarray,
    cfg: Config,
) -> ClipDetections:
    """jit-able forward for F CONSECUTIVE frames: the backbone/RPN/R-FCN run
    ONCE per frame and the tracker runs on every adjacent pair by slicing
    the shared feature batch -- the pair-based API recomputes every interior
    frame twice (as the reference must, inference.py:54).

    Args:
        frames: (F, H, W, 3) float32 in [0, 1] OR uint8 in [0, 255] -- uint8
            normalizes ON DEVICE, cutting the host->device clip upload 4x
            (the dominant cost through a remote-tunnel link; clip.py).
    """
    fmaps_t, fm_reg, confs, boxes, valid = _detect_frames(
        model, variables, frames, anchors, cfg
    )

    # tracker over all adjacent pairs, sharing the per-frame features.
    #
    # The optimization_barrier is LOAD-BEARING, not a hint: without it, the
    # composed graph (shared per-frame features -> [:-1]/[1:] offset slices
    # -> correlation tracker) miscompiles on TPU at F >= 8 and the dispatch
    # KILLS the TPU worker ("kernel fault"; reproduced deterministically,
    # round 4/5 -- tools/probe_clip.py --stage clip --chunk 8). Same
    # backend bug family as the round-2 "pair-split + strided slice"
    # fault (models/correlation_tracker.py:123-128). Every prefix of the
    # pipeline runs clean at F=8, the tracker alone runs clean at batch 7,
    # and this identity barrier (which only forces the feature maps to
    # materialize before the slices instead of fusing across them) fixes
    # the composition at F=8/16 with zero extra FLOPs -- all measured via
    # subprocess probes (PERF.md "The chunk-8 clip fault").
    fmaps_t = jax.lax.optimization_barrier(fmaps_t)
    fm_reg = jax.lax.optimization_barrier(fm_reg)
    pyr0 = {k: v[:-1] for k, v in fmaps_t.items()}
    pyr1 = {k: v[1:] for k, v in fmaps_t.items()}
    tracks = model.apply(
        variables,
        pyr0,
        pyr1,
        fm_reg[:-1],
        fm_reg[1:],
        boxes[:-1],
        method="c_tracker",
    )  # (F-1, D, 4)

    return ClipDetections(confs=confs, boxes=boxes, valid=valid, tracks=tracks)


class Detector:
    """host-facing detector with the reference's API
    (reference inference.py:21-121): __call__(im0, im1) ->
    (confs0, confs1, bboxes0, bboxes1, tracks) as trimmed numpy arrays.

    Accepts PIL images (resized per cfg.INPUT_SHAPE) or pre-sized numpy
    arrays (H, W, 3) in [0, 1].
    """

    def __init__(
        self, model: DetectTrackModule, variables, cfg: Config
    ) -> None:
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.anchors = jnp.asarray(
            build_anchors(cfg.fm_shape, cfg.ANCHOR_AREAS, cfg.ANCHOR_ASPECT_RATIOS)
        )
        self._fwd = jax.jit(
            functools.partial(detect_pair, model, cfg=cfg)
        )
        self._fwd_batched = jax.jit(
            functools.partial(detect_pairs_batched, model, cfg=cfg)
        )

    def _maybe_s2d(self, x):
        """HOST_S2D: space-to-depth on the HOST before upload (same bytes,
        no device transpose; Config.HOST_S2D). Already-transformed (C=12)
        inputs pass through; a 3-channel DEVICE array cannot be transformed
        here (the host never sees its bytes) and would otherwise crash deep
        in the 12-channel stem -- reject it at the guard."""
        if not getattr(self.cfg, "HOST_S2D", False):
            return x
        if x.shape[-1] == 3:
            if not isinstance(x, np.ndarray):
                raise ValueError(
                    "HOST_S2D is enabled but a 3-channel DEVICE array was "
                    "passed; provide host frames (numpy) or pre-apply "
                    "utils.space_to_depth2 before upload"
                )
            from .utils import space_to_depth2

            return space_to_depth2(x)
        return x

    def _pack_input(self, x):
        """shared ingestion guard for the raw batched APIs (detect_pairs /
        detect_clip). A HOST array gets HOST_S2D applied; a list of host
        arrays promotes mixed uint8/float entries WITH the /255 applied
        before stacking (stacking raw would smuggle 0-255 values into a
        float batch that skips the device /255 -- same guard as __call__);
        a list holding any device array stacks ON DEVICE with the same
        dtype promotion -- np.asarray would silently download every element
        through the tunnel."""
        if isinstance(x, np.ndarray):
            return self._maybe_s2d(x)
        if isinstance(x, (list, tuple)):
            from .utils import promote_mixed_image_dtypes

            if all(isinstance(p, np.ndarray) for p in x):
                return self._maybe_s2d(
                    np.asarray(promote_mixed_image_dtypes(list(x)))
                )
            parts = promote_mixed_image_dtypes(
                [jnp.asarray(p) for p in x], xp=jnp
            )
            # device arrays still pass the HOST_S2D guard: a 3-channel
            # device stack cannot be transformed host-side and must be
            # rejected (not silently run through a second, non-s2d graph).
            return self._maybe_s2d(jnp.stack(parts))
        return self._maybe_s2d(x)

    def detect_pairs(self, pairs) -> PairDetections:
        """batched raw API: pairs is (P, 2, H, W, 3) numpy/PIL-free input;
        returns padded PairDetections with leading P axis (host trimming is
        the caller's job -- see ClipTracker)."""
        pairs = self._pack_input(pairs)
        return self._fwd_batched(
            self.variables, jnp.asarray(pairs), self.anchors
        )

    def detect_clip(self, frames) -> ClipDetections:
        """consecutive-frame raw API: frames is (F, H, W, 3); backbone runs
        once per frame (see detect_clip).

        NOTE: jax.jit traces once per distinct F -- every new clip length
        recompiles (~20-40 s cold). ClipTracker avoids this by chunking
        clips to a fixed F (plus at most one tail size); callers feeding
        arbitrary-length clips directly should pad to a fixed F themselves.
        """
        if not hasattr(self, "_fwd_clip"):
            # one jitted function: jax.jit itself caches one compilation
            # per input shape, so no per-F bookkeeping is needed here.
            self._fwd_clip = jax.jit(
                functools.partial(detect_clip, self.model, cfg=self.cfg)
            )
        frames = self._pack_input(frames)
        return self._fwd_clip(self.variables, jnp.asarray(frames), self.anchors)

    def _to_array(self, im) -> np.ndarray:
        if isinstance(im, np.ndarray):
            # uint8 arrays stay uint8 (the jitted graph runs the /255 --
            # casting to float here WITHOUT dividing would feed 0-255
            # values into a [0,1] graph); floats are already normalized.
            return im if im.dtype == np.uint8 else im.astype(np.float32)
        from .utils import image_to_input

        # PIL sources upload as uint8; the jitted graph runs the /255
        return image_to_input(im, self.cfg.INPUT_SHAPE, as_uint8=True)

    def __call__(self, im0, im1) -> Tuple[np.ndarray, ...]:
        from .utils import promote_mixed_image_dtypes

        x = np.stack(
            promote_mixed_image_dtypes(
                [self._to_array(im0), self._to_array(im1)]
            )
        )
        out = self._fwd(
            self.variables, jnp.asarray(self._maybe_s2d(x)), self.anchors
        )
        confs = np.asarray(out.confs)
        boxes = np.asarray(out.boxes)
        valid = np.asarray(out.valid)
        tracks = np.asarray(out.tracks)
        v0, v1 = valid[0], valid[1]
        return (
            confs[0][v0],
            confs[1][v1],
            boxes[0][v0],
            boxes[1][v1],
            tracks[v0],
        )
