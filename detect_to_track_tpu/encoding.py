"""label encoders: human-readable labels -> network targets.

TPU-native re-design of reference detect_to_track/data/encoding.py. The
reference runs these per-instance in numpy on the host while the GPU idles
(reference trainer.py:159-163, 196-201); here they are pure jnp functions
over fixed-shape padded labels, so they live INSIDE the jitted train step and
vectorize over the batch with `jax.vmap`.

Padded-label convention (see data/types.py): every frame carries
    boxes   (L, 4) float  ijhw fractional
    classes (L,)   int32  1-based class ids (0 = background)
    track_ids (L,) int32
    mask    (L,)   bool   True for real labels; real labels packed FIRST
Packing real labels first preserves numpy's first-occurrence argmax
tie-breaking, so results match the reference bit-for-bit for any instance
within capacity.

Behavioral parity notes (each vs. the reference):
- empty-label path: loss_weights = !crosses_boundary, c*=0, b*=0
  (reference encoding.py:71-76, 135-139).
- loss ignored when |IoU - thresh| <= margin (boundary value INCLUSIVE --
  kept is `> margin`, matching the transcribed oracle) or anchor crosses
  the image boundary (reference encoding.py:84-87).
- positive anchor: IoU > thresh for some gt, OR argmax anchor of some gt
  (reference encoding.py:90-94).
- QUIRK (replicated by default, gated by cfg.FIX_REGION_MASK_POLARITY):
  RegionEncoder marks positives with `best_iou < thresh` -- inverted vs. its
  own docstring (reference encoding.py:147 vs :109-110).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import compute_ious


def frcnn_box_encode(anchors, boxes, xp=jnp):
    """Faster-RCNN box offsets (reference encoding.py:157-179).
        t_ij = (b_ij - a_ij) / a_hw ;  t_hw = log(b_hw / a_hw)

    Args:
        anchors: (..., 4) ijhw priors (precomputed anchors or predicted rois).
        boxes: (..., 4) ijhw target boxes.

    Returns:
        offsets: (..., 4).

    Deviation from the reference: BOTH sides' hw are floored at a tiny eps
    before the divide/log. Real anchors/rois are never smaller (>= 1 px
    fractional), but (a-side) region-slot PADDING can be all-zero boxes
    (ops/nms.py pad branch when fewer candidates than MAX_ROIS exist), and
    (b-side) real ILSVRC annotations occasionally carry DEGENERATE gt
    boxes (xmax == xmin -> w == 0, passed through by pascal.py): an
    unguarded log gives -inf b_star for that gt's is-best anchor -- a
    POSITIVE with loss weight 1 -- so one bad annotation turns the RPN
    bbox loss infinite and NaN-poisons the whole run. Even for masked
    slots, smooth-L1's quadratic-branch VJP turns a masked inf into
    0*inf = NaN parameter gradients.
    """
    a_ij, a_hw = anchors[..., :2], anchors[..., 2:]
    b_ij, b_hw = boxes[..., :2], boxes[..., 2:]
    a_hw = xp.maximum(a_hw, 1e-8)
    b_hw = xp.maximum(b_hw, 1e-8)
    t_ij = (b_ij - a_ij) / a_hw
    t_hw = xp.log(b_hw / a_hw)
    return xp.concatenate([t_ij, t_hw], axis=-1)


# max log-scale offset fed to exp() during decode. The reference decodes
# with an unclamped exp (encoding.py:182-206), so an untrained head or a
# garbage padding slot can produce inf/NaN boxes that poison downstream
# IoU/NMS keep-masks. log(1000/16) is the standard Faster-RCNN transform
# clip; no real target ever approaches it (62x anchor scale).
BBOX_XFORM_CLIP = float(np.log(1000.0 / 16.0))


def frcnn_box_decode(anchors, offsets, xp=jnp, clip=BBOX_XFORM_CLIP):
    """inverse of frcnn_box_encode (reference encoding.py:182-206).

    Deviation from the reference: t_hw is clamped to +/-`clip` before exp so
    decoded boxes are always finite (pass clip=None for the raw inverse).
    """
    a_ij, a_hw = anchors[..., :2], anchors[..., 2:]
    t_ij, t_hw = offsets[..., :2], offsets[..., 2:]
    if clip is not None:
        t_hw = xp.clip(t_hw, -clip, clip)
    b_ij = t_ij * a_hw + a_ij
    b_hw = xp.exp(t_hw) * a_hw
    return xp.concatenate([b_ij, b_hw], axis=-1)


class AnchorTargets(NamedTuple):
    loss_weights: jnp.ndarray  # (|A|,) float32
    c_star: jnp.ndarray  # (|A|,) int32
    b_star: jnp.ndarray  # (|A|, 4) float32


def anchor_encode(
    anchors: jnp.ndarray,
    crosses_boundary: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    iou_thresh: float = 0.5,
    iou_margin: float = 0.2,
) -> AnchorTargets:
    """anchorwise target assignment (reference encoding.py:21-101,
    AnchorEncoder.__call__), vectorized over padded labels.

    Args:
        anchors: (|A|, 4) ijhw fractional priors.
        crosses_boundary: (|A|,) bool, precomputed (anchors are static).
        gt_boxes: (L, 4); gt_classes: (L,); gt_mask: (L,).

    Returns:
        AnchorTargets(loss_weights (|A|,), c_star (|A|,), b_star (|A|,4)).
    """
    gt_mask = gt_mask.astype(bool)
    any_valid = jnp.any(gt_mask)

    ious = compute_ious(anchors, gt_boxes)  # (|A|, L)
    # invalid labels -> IoU below any real value so argmax prefers real ones;
    # real labels are packed first, preserving numpy tie-breaking.
    ious = jnp.where(gt_mask[None, :], ious, -1.0)

    best_gt = jnp.argmax(ious, axis=1)  # (|A|,)
    best_iou = jnp.max(ious, axis=1)  # (|A|,)

    # loss weights: ignore near-threshold and boundary-crossing anchors
    # (reference encoding.py:84-87); empty-label path ignores the margin term
    # entirely (reference encoding.py:72).
    margin_ok = jnp.abs(best_iou - iou_thresh) > iou_margin
    loss_weights = jnp.where(any_valid, margin_ok, True) & ~crosses_boundary

    # per-gt best anchor (reference encoding.py:90-91): ious.argmax(0) but
    # only for valid gt columns.
    col_best = jnp.argmax(ious, axis=0)  # (L,)
    a_idx = jnp.arange(anchors.shape[0], dtype=col_best.dtype)
    is_best_anchor = jnp.any(
        (a_idx[:, None] == col_best[None, :]) & gt_mask[None, :], axis=1
    )  # (|A|,)

    pos = (best_iou > iou_thresh) | is_best_anchor

    # the assigned-gt lookups run as one-hot matmuls instead of gathers: a
    # (|A|,)-indexed gather serializes on the TPU (~2 ms/step at 342k
    # anchors in the joint step's device trace) while the (|A|, L) one-hot
    # contraction is two small MXU passes. Exact: one row of onehot is 1.
    onehot = (
        best_gt[:, None] == jnp.arange(gt_boxes.shape[0])[None, :]
    ).astype(jnp.float32)  # (|A|, L)
    # HIGHEST keeps f32 passes so box coords come through bit-exact (one
    # term is x*1.0, the rest x*0.0).
    best_boxes = jnp.matmul(
        onehot, gt_boxes, precision=jax.lax.Precision.HIGHEST
    )  # == gt_boxes[best_gt]
    best_classes = jnp.matmul(
        onehot,
        gt_classes.astype(jnp.float32)[:, None],
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0]
    c_star = jnp.where(pos, best_classes, 0.0).astype(jnp.int32)

    # b_star: encode against assigned gt box; when there are no labels the
    # reference returns zeros (encoding.py:74) -- encoding an anchor against
    # itself gives exactly zeros.
    assigned = jnp.where(any_valid, best_boxes, anchors)
    b_star = frcnn_box_encode(anchors, assigned)

    return AnchorTargets(loss_weights.astype(jnp.float32), c_star, b_star)


class RegionTargets(NamedTuple):
    c_star: jnp.ndarray  # (|R|,) int32
    b_star: jnp.ndarray  # (|R|, 4) float32


def region_encode(
    regions: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    iou_thresh: float = 0.5,
    fix_mask_polarity: bool = False,
) -> RegionTargets:
    """regionwise target assignment (reference encoding.py:104-154,
    RegionEncoder.__call__).

    Args:
        regions: (|R|, 4) predicted proposal boxes (padding rows allowed;
            their targets are garbage and must be masked in the loss).
        fix_mask_polarity: False replicates the reference quirk
            (pos = best_iou < thresh, encoding.py:147); True uses > as the
            docstring intended.
    """
    gt_mask = gt_mask.astype(bool)
    any_valid = jnp.any(gt_mask)

    ious = compute_ious(regions, gt_boxes)  # (|R|, L)
    ious = jnp.where(gt_mask[None, :], ious, -1.0)
    best_gt = jnp.argmax(ious, axis=1)
    best_iou = jnp.max(ious, axis=1)

    if fix_mask_polarity:
        pos = best_iou > iou_thresh
    else:
        pos = best_iou < iou_thresh  # reference quirk (encoding.py:147)

    c_star = jnp.where(pos & any_valid, gt_classes[best_gt], 0).astype(jnp.int32)

    assigned = jnp.where(any_valid, gt_boxes[best_gt], regions)
    b_star = jnp.where(any_valid, frcnn_box_encode(regions, assigned), 0.0)

    return RegionTargets(c_star, b_star)


class TrackTargets(NamedTuple):
    rois: jnp.ndarray  # (L, 4) frame-0 gt boxes
    t_star: jnp.ndarray  # (L, 4) box transforms frame0 -> frame1
    valid: jnp.ndarray  # (L,) bool: object exists in BOTH frames


def track_encode(
    boxes_0: jnp.ndarray,
    classes_0: jnp.ndarray,
    track_ids_0: jnp.ndarray,
    mask_0: jnp.ndarray,
    boxes_1: jnp.ndarray,
    classes_1: jnp.ndarray,
    track_ids_1: jnp.ndarray,
    mask_1: jnp.ndarray,
) -> TrackTargets:
    """track regression targets (reference encoding.py:209-245).

    An object is identified by its (class_id, track_id) pair; targets are
    produced only for objects present in both frames, assigned to the
    frame-0 gt box. Fixed-shape: one slot per frame-0 label with a validity
    mask instead of the reference's dynamic intersection.

    Duplicate (class_id, track_id) pairs within a frame (malformed
    annotations) follow the reference's dict construction exactly: the
    LAST occurrence wins on both sides (reference encoding.py:229-238
    builds {pair: box} dicts), so one duplicate pair yields ONE target.
    """
    m0 = mask_0.astype(bool)
    m1 = mask_1.astype(bool)
    match = (
        m0[:, None]
        & m1[None, :]
        & (classes_0[:, None] == classes_1[None, :])
        & (track_ids_0[:, None] == track_ids_1[None, :])
    )  # (L, L)
    l = boxes_0.shape[0]
    idx = jnp.arange(l)
    # dict semantics: a frame-0 slot is dead if a LATER slot carries the
    # same pair; the frame-1 assignment takes the LAST matching slot.
    same_0 = (
        m0[:, None]
        & m0[None, :]
        & (classes_0[:, None] == classes_0[None, :])
        & (track_ids_0[:, None] == track_ids_0[None, :])
    )
    later_dup = jnp.any(same_0 & (idx[None, :] > idx[:, None]), axis=1)
    valid = jnp.any(match, axis=1) & ~later_dup  # (L,)
    j = (l - 1) - jnp.argmax(match[:, ::-1], axis=1)  # last match in frame 1

    # invalid slots encode a unit box against itself -> exact zeros; padding
    # boxes are all-zero and would otherwise divide by hw = 0.
    unit = jnp.array([0.5, 0.5, 1.0, 1.0], boxes_0.dtype)
    safe_0 = jnp.where(valid[:, None], boxes_0, unit)
    safe_1 = jnp.where(valid[:, None], boxes_1[j], unit)
    t_star = frcnn_box_encode(safe_0, safe_1)

    return TrackTargets(boxes_0, t_star, valid)


# ---------------------------------------------------------------------------
# host-side (numpy, dynamic-shape) equivalents for parity testing & tooling
# ---------------------------------------------------------------------------


def track_encode_np(labels_0, labels_1):
    """dynamic-shape host version with the reference's exact dict semantics
    (reference encoding.py:229-245), for parity tests and host tooling.

    Args: sequences of data.types.ObjectLabel.
    Returns: (rois (|R|,4), t_star (|R|,4)) numpy arrays.
    """
    d0 = {(l.class_id, l.track_id): l for l in labels_0}
    d1 = {(l.class_id, l.track_id): l for l in labels_1}
    both = set(d0).intersection(d1)

    boxes_0 = np.array([d0[k].box for k in both]).reshape(-1, 4)
    boxes_1 = np.array([d1[k].box for k in both]).reshape(-1, 4)
    t_star = frcnn_box_encode(boxes_0, boxes_1, xp=np)
    return boxes_0, t_star
