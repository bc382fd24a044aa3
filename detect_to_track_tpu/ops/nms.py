"""on-device proposal filtering: confidence gate -> top-k -> greedy NMS.

The reference filters proposals on the HOST through numpy
(ml_utils PredictionFilterPipeline = ConfidenceFilter -> MaxDetFilter ->
NMSFilter, used at reference trainer.py:98-102 / inference.py:37-41), forcing
a device->host->device round-trip per frame (trainer.py:178-207). Here the
whole pipeline is fixed-shape jnp running inside the jitted step:

- ConfidenceFilter(thresh):   scores <= thresh are masked out
- MaxDetFilter(n):            lax.top_k with n = pre_nms_topk
- NMSFilter(iou):             exact greedy NMS as a fori_loop over the
                              score-sorted candidates (O(k^2) work, k^2 IoU
                              matrix computed once on the VPU)

plus a post-NMS capacity cap (max_rois) that the reference does not have --
XLA needs a static bound; survivors beyond it (rare at working thresholds)
are dropped lowest-score-first.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..boxes import compute_ious


class Proposals(NamedTuple):
    boxes: jnp.ndarray  # (k, 4) ijhw, score-descending
    scores: jnp.ndarray  # (k,)
    valid: jnp.ndarray  # (k,) bool


def top_k_proposals(
    scores: jnp.ndarray, boxes: jnp.ndarray, conf_thresh: float, k: int
) -> Proposals:
    """confidence gate + top-k (ConfidenceFilter -> MaxDetFilter).

    Args:
        scores: (|A|,) objectness scores.
        boxes: (|A|, 4) decoded ijhw boxes.
    """
    k = min(k, scores.shape[-1])
    gated = jnp.where(scores > conf_thresh, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(gated, k)
    return Proposals(
        boxes=boxes[idx],
        scores=top_scores,
        valid=jnp.isfinite(top_scores),
    )


def nms_mask(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
) -> jnp.ndarray:
    """exact greedy NMS keep-mask over score-DESCENDING candidates.

    Greedy NMS keeps i iff valid[i] and no kept higher-priority j overlaps
    it -- a recursion that is well-founded by index order. Instead of the
    textbook O(k) sequential scan (k = 3072 at the reference working point,
    a serial fori_loop being the slowest thing a TPU can do), iterate the
    whole-vector operator
        F(keep)[i] = valid[i] & ~any_{j<i}(keep[j] & overlaps[j, i])
    from keep = valid. After t iterations every index whose suppression-
    chain depth is <= t has its final value, so the fixed point IS the
    greedy result; chains are short in practice (<~15 at the working point)
    and each iteration is one (k, k) masked any-reduction on the VPU.

    Args:
        boxes: (k, 4) ijhw boxes sorted by descending score.
        valid: (k,) bool.

    Returns:
        keep: (k,) bool.
    """
    k = boxes.shape[0]
    overlaps = compute_ious(boxes, boxes) > iou_thresh  # (k, k)
    order = jnp.arange(k)
    # suppressor must be strictly higher priority (lower index).
    sup = overlaps & (order[:, None] < order[None, :])  # (k, k) j -> i

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(keep[:, None] & sup, axis=0)
        return new, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.zeros((), jnp.int32))
    )
    return keep


@partial(jax.jit, static_argnums=(2, 5, 6))
def proposal_filter(
    scores: jnp.ndarray,
    boxes: jnp.ndarray,
    pre_nms_topk: int,
    conf_thresh: float,
    nms_iou_thresh: float,
    max_rois: int,
    pre_nms_cap: Optional[int] = None,
) -> Proposals:
    """full pipeline for one frame: gate -> top-k -> NMS -> cap.

    pre_nms_cap, when set below pre_nms_topk, invalidates the score-
    descending slots beyond it -- pre_nms_topk stays a lane multiple (128)
    for shape efficiency while NMS sees EXACTLY the reference's
    MaxDetFilter(cap) candidate set (reference trainer.py:98-102 caps at
    TRAIN_MAX_ROIS=3000, not 3072).

    Returns Proposals with (max_rois, 4) boxes (score-descending) + mask.
    """
    p = top_k_proposals(scores, boxes, conf_thresh, pre_nms_topk)
    if pre_nms_cap is not None and pre_nms_cap < p.valid.shape[0]:
        in_cap = jnp.arange(p.valid.shape[0]) < pre_nms_cap
        p = Proposals(
            boxes=p.boxes,
            scores=jnp.where(in_cap, p.scores, -jnp.inf),
            valid=p.valid & in_cap,
        )
    keep = nms_mask(p.boxes, p.valid, nms_iou_thresh)

    # compact survivors to the front, preserving score order: kept entries
    # get their own index as sort key, dropped entries get +inf.
    k = keep.shape[0]  # == min(pre_nms_topk, |A|)
    key = jnp.where(keep, jnp.arange(k), k)
    order = jnp.argsort(key)[:max_rois]
    out = Proposals(
        boxes=p.boxes[order],
        scores=jnp.where(keep[order], p.scores[order], 0.0),
        valid=keep[order],
    )
    if out.boxes.shape[0] < max_rois:  # tiny-config edge: |A| < max_rois
        pad = max_rois - out.boxes.shape[0]
        out = Proposals(
            boxes=jnp.pad(out.boxes, ((0, pad), (0, 0))),
            scores=jnp.pad(out.scores, (0, pad)),
            valid=jnp.pad(out.valid, (0, pad)),
        )
    return out


def batched_proposal_filter(
    scores: jnp.ndarray,
    boxes: jnp.ndarray,
    pre_nms_topk: int,
    conf_thresh: float,
    nms_iou_thresh: float,
    max_rois: int,
    pre_nms_cap: Optional[int] = None,
) -> Proposals:
    """vmap of proposal_filter over a leading batch axis.

    Args:
        scores: (B, |A|); boxes: (B, |A|, 4).
    """
    return jax.vmap(
        lambda s, b: proposal_filter(
            s, b, pre_nms_topk, conf_thresh, nms_iou_thresh, max_rois,
            pre_nms_cap,
        )
    )(scores, boxes)


def nms_np(scores, boxes, iou_thresh):
    """host-side numpy greedy NMS (ml_utils.prediction_filtering.NMSFilter
    parity); returns indices of kept boxes in score-descending order."""
    import numpy as np

    from ..boxes import compute_ious_np

    order = np.argsort(-scores, kind="stable")
    ious = compute_ious_np(boxes, boxes)
    kept = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        kept.append(i)
        suppressed |= ious[i] > iou_thresh
    return np.asarray(kept, np.int64)
