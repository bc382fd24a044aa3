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

    Dimension-split on purpose: stacking the per-dimension lo/hi into
    (|A|, |B|, 2) arrays forces XLA onto a minor-dim-2 layout that blocks
    fusion -- at NMS capacity (3072^2 x batch) the stacked form materialized
    a >1 GB f32 intermediate (measured, PERF.md r3). Split per dimension,
    the whole chain fuses into one pass over (|A|, |B|) tiles. Values are
    bit-identical to the stacked form.

    Args:
        boxes_a: (|A|, 4) ijhw boxes.
        boxes_b: (|B|, 4) ijhw boxes.

    Returns:
        ious: (|A|, |B|); zero where the union is empty.
    """
    ai0, ai1 = boxes_a[..., 0] - boxes_a[..., 2] / 2, boxes_a[..., 0] + boxes_a[..., 2] / 2
    aj0, aj1 = boxes_a[..., 1] - boxes_a[..., 3] / 2, boxes_a[..., 1] + boxes_a[..., 3] / 2
    bi0, bi1 = boxes_b[..., 0] - boxes_b[..., 2] / 2, boxes_b[..., 0] + boxes_b[..., 2] / 2
    bj0, bj1 = boxes_b[..., 1] - boxes_b[..., 3] / 2, boxes_b[..., 1] + boxes_b[..., 3] / 2

    ih = xp.clip(
        xp.minimum(ai1[..., :, None], bi1[..., None, :])
        - xp.maximum(ai0[..., :, None], bi0[..., None, :]),
        0.0,
        None,
    )
    iw = xp.clip(
        xp.minimum(aj1[..., :, None], bj1[..., None, :])
        - xp.maximum(aj0[..., :, None], bj0[..., None, :]),
        0.0,
        None,
    )
    inter = ih * iw  # (|A|, |B|)

    union = (
        box_areas(boxes_a, xp)[..., :, None]
        + box_areas(boxes_b, xp)[..., None, :]
        - inter
    )
    return xp.where(union > 0, inter / xp.where(union > 0, union, 1.0), 0.0)


def compute_ious_np(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """host-side numpy IoU (ml_utils.boundingboxes.compute_ious parity)."""
    return compute_ious(boxes_a, boxes_b, xp=np)


def ijhw_to_ijij_np(boxes: np.ndarray) -> np.ndarray:
    return ijhw_to_ijij(boxes, xp=np)
