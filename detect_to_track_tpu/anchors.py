"""anchor grid construction.

Behavioral parity with reference detect_to_track/utils.py:114-163
(`build_anchors`): h = sqrt(area * ratio), w = area / h; cell-centered
fractional grid; flattened output is (H * W * |areas x ratios|, 4) ijhw with
the per-cell anchor index fastest -- this ordering must match the RPN head's
channel-flattening (reference rpn.py:23-29) so targets line up with
predictions.

Computed once on host in float64 then cast; anchors are compile-time
constants folded into the jitted step.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import numpy as np


def build_anchors(
    fm_shape: Union[int, Tuple[int, int]],
    anchor_areas: Sequence[float],
    aspect_ratios: Sequence[float],
    flatten: bool = True,
    dtype=np.float32,
) -> np.ndarray:
    """build an (optionally flattened) anchor grid.

    Args:
        fm_shape: prediction map height and width.
        anchor_areas: fractional anchor areas.
        aspect_ratios: anchor aspect ratios (h/w).

    Returns:
        anchors: (H*W*|AxR|, 4) if flatten else (H, W, |AxR|, 4); ijhw,
            fractional, read-only.
    """
    if isinstance(fm_shape, int):
        fm_shape = (fm_shape, fm_shape)
    fm_h, fm_w = (int(d) for d in fm_shape)

    areas = np.asarray(list(anchor_areas), dtype=np.float64)  # (|A|,)
    ratios = np.asarray(list(aspect_ratios), dtype=np.float64)  # (|R|,)

    h = np.sqrt(areas[:, None] * ratios[None, :])  # (|A|, |R|)
    w = areas[:, None] / h  # (|A|, |R|)
    anchor_dims = np.stack([h, w], axis=-1).reshape(-1, 2)  # (|AxR|, 2)

    # cell-centered fractional coordinates (reference utils.py:143-149).
    iv = (np.arange(fm_h, dtype=np.float64) + 0.5) / fm_h  # (H,)
    jv = (np.arange(fm_w, dtype=np.float64) + 0.5) / fm_w  # (W,)
    ij_grid = np.stack(np.meshgrid(iv, jv, indexing="ij"), axis=-1)  # (H, W, 2)

    n = anchor_dims.shape[0]
    target = (fm_h, fm_w, n, 2)
    ij = np.broadcast_to(ij_grid[:, :, None, :], target)
    hw = np.broadcast_to(anchor_dims[None, None, :, :], target)
    anchors = np.concatenate([ij, hw], axis=3).astype(dtype)  # (H, W, |AxR|, 4)

    if flatten:
        anchors = anchors.reshape(-1, 4)
    anchors.flags.writeable = False
    return anchors


def anchor_boundary_mask(anchors: np.ndarray) -> np.ndarray:
    """(|A|,) bool: True where an anchor crosses the image boundary.
    Parity with reference encoding.py:42-45 (inclusive comparisons:
    touching the boundary counts as crossing)."""
    ij0 = anchors[:, :2] - anchors[:, 2:] / 2
    ij1 = anchors[:, :2] + anchors[:, 2:] / 2
    ijij = np.concatenate([ij0, ij1], axis=1)
    return np.logical_or(np.any(ijij <= 0, axis=1), np.any(ijij >= 1, axis=1))
