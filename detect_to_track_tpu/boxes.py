"""bounding-box geometry.

Rebuilds the `ml_utils.boundingboxes` surface the reference depends on but
does not vendor (used at reference detect_to_track/data/encoding.py:7 and
viterbi.py:7): `ijhw_to_ijij` and `compute_ious`.

Boxes are (i, j, h, w): fractional center coordinates plus height/width,
exactly the convention of the reference (see e.g. reference
detect_to_track/utils.py:114-163 anchor construction).

Every function is written against a pluggable array namespace `xp` so the
same code serves as the on-device jnp implementation (vectorized, jit-safe)
and the host numpy implementation (used by the Viterbi linker and the data
pipeline without staging tiny ops onto the TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def ijhw_to_ijij(boxes, xp=jnp):
    """(…, 4) center-size -> corner boxes (i0, j0, i1, j1)."""
    ij = boxes[..., :2]
    hw_half = boxes[..., 2:] / 2
    return xp.concatenate([ij - hw_half, ij + hw_half], axis=-1)


def ijij_to_ijhw(boxes, xp=jnp):
    """(…, 4) corner -> center-size boxes."""
    ij0 = boxes[..., :2]
    ij1 = boxes[..., 2:]
    return xp.concatenate([(ij0 + ij1) / 2, ij1 - ij0], axis=-1)


def box_areas(boxes, xp=jnp):
    """(…, 4) ijhw boxes -> (…,) areas."""
    return boxes[..., 2] * boxes[..., 3]


def compute_ious(boxes_a, boxes_b, xp=jnp):
    """pairwise IoU matrix.

    Args:
        boxes_a: (|A|, 4) ijhw boxes.
        boxes_b: (|B|, 4) ijhw boxes.

    Returns:
        ious: (|A|, |B|); zero where the union is empty.

    Form note (round 3, measured): this (A,B,2)-stacked form materializes
    a large minor-dim-2 intermediate (f32[16,3072,3072,2] in the b8 step
    trace) -- but a dimension-split rewrite that avoids it made the FULL
    train step 9 ms/step SLOWER (140.4 -> 149.5 ms at b8, same night,
    bit-identical values; see git 0cfc49f and its revert). XLA schedules
    the stacked form into fewer passes over the 3072x3072 matrices. Keep
    this form unless a full-step measurement says otherwise.
    """
    a = ijhw_to_ijij(boxes_a, xp)[:, None, :]  # (|A|, 1, 4)
    b = ijhw_to_ijij(boxes_b, xp)[None, :, :]  # (1, |B|, 4)

    lo = xp.maximum(a[..., :2], b[..., :2])  # (|A|, |B|, 2)
    hi = xp.minimum(a[..., 2:], b[..., 2:])  # (|A|, |B|, 2)
    inter_hw = xp.clip(hi - lo, 0.0, None)  # (|A|, |B|, 2)
    inter = inter_hw[..., 0] * inter_hw[..., 1]  # (|A|, |B|)

    union = (
        box_areas(boxes_a, xp)[:, None] + box_areas(boxes_b, xp)[None, :] - inter
    )
    return xp.where(union > 0, inter / xp.where(union > 0, union, 1.0), 0.0)


def compute_ious_np(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """host-side numpy IoU (ml_utils.boundingboxes.compute_ious parity)."""
    return compute_ious(boxes_a, boxes_b, xp=np)


def ijhw_to_ijij_np(boxes: np.ndarray) -> np.ndarray:
    return ijhw_to_ijij(boxes, xp=np)
