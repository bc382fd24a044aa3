"""tests for box encode/decode and the padded label encoders.

Includes numpy oracle implementations transcribed from the reference
semantics (reference detect_to_track/data/encoding.py) to pin parity of the
vectorized, fixed-shape jnp encoders — including the documented quirks.
"""

import numpy as np
import pytest

from detect_to_track_tpu.anchors import anchor_boundary_mask, build_anchors
from detect_to_track_tpu.boxes import compute_ious_np
from detect_to_track_tpu.encoding import (
    anchor_encode,
    frcnn_box_decode,
    frcnn_box_encode,
    region_encode,
    track_encode,
)


# --- shape-stability (reference tests/test_encoding.py:7-24) ---


@pytest.mark.parametrize("n_anchors", [0, 1, 2])
def test_frcnn_box_encode_handles_variable_anchors(n_anchors, rng):
    anchors = rng.rand(n_anchors, 4)
    boxes = rng.rand(n_anchors, 4)
    offsets = np.asarray(frcnn_box_encode(anchors, boxes))
    assert offsets.shape == (n_anchors, 4)


@pytest.mark.parametrize("n_anchors", [0, 1, 2])
def test_frcnn_box_decode_handles_variable_anchors(n_anchors, rng):
    anchors = rng.rand(n_anchors, 4)
    offsets = rng.rand(n_anchors, 4)
    boxes = np.asarray(frcnn_box_decode(anchors, offsets))
    assert boxes.shape == (n_anchors, 4)


def test_encode_decode_roundtrip(rng):
    anchors = rng.rand(64, 4) + 0.05
    boxes = rng.rand(64, 4) + 0.05
    rec = np.asarray(frcnn_box_decode(anchors, frcnn_box_encode(anchors, boxes)))
    np.testing.assert_allclose(rec, boxes, rtol=1e-5, atol=1e-6)


# --- numpy oracles (reference AnchorEncoder / RegionEncoder semantics) ---


def _anchor_encode_ref(anchors, crosses, boxes, classes, thresh, margin):
    """transcription of reference encoding.py:47-101."""
    if classes.size == 0:
        return (
            np.logical_not(crosses).astype(np.float32),
            np.zeros(len(anchors)),
            np.zeros((len(anchors), 4)),
        )
    ious = compute_ious_np(anchors, boxes)
    best_gt = ious.argmax(1)
    best_iou = ious.max(1)
    lw = np.logical_and(np.abs(best_iou - thresh) > margin, np.logical_not(crosses))
    is_best = np.zeros(len(anchors))
    is_best[ious.argmax(0)] = 1
    pos = np.logical_or(best_iou > thresh, is_best)
    c_star = pos * classes[best_gt]
    b_star = np.asarray(frcnn_box_encode(anchors, boxes[best_gt], xp=np))
    return lw.astype(np.float32), c_star, b_star


def _pad(boxes, classes, tids, capacity):
    L = capacity
    n = len(classes)
    pb = np.zeros((L, 4), np.float32)
    pc = np.zeros((L,), np.int32)
    pt = np.full((L,), -1, np.int32)
    pm = np.zeros((L,), bool)
    pb[:n] = boxes
    pc[:n] = classes
    pt[:n] = tids
    pm[:n] = True
    return pb, pc, pt, pm


@pytest.mark.parametrize("n_labels", [0, 1, 3, 8])
def test_anchor_encode_matches_reference_semantics(n_labels, rng):
    anchors = build_anchors((6, 9), [0.01, 0.05], [0.5, 1.0, 2.0])
    crosses = anchor_boundary_mask(anchors)
    boxes = np.abs(rng.rand(n_labels, 4)).astype(np.float32) * 0.5 + 0.1
    classes = rng.randint(1, 30, size=n_labels)

    lw_ref, c_ref, b_ref = _anchor_encode_ref(
        anchors, crosses, boxes, classes, 0.5, 0.2
    )

    pb, pc, pt, pm = _pad(boxes, classes, np.arange(n_labels), 8)
    out = anchor_encode(anchors, crosses, pb, pc, pm, 0.5, 0.2)

    np.testing.assert_array_equal(np.asarray(out.loss_weights), lw_ref)
    np.testing.assert_array_equal(np.asarray(out.c_star), c_ref)
    np.testing.assert_allclose(np.asarray(out.b_star), b_ref, rtol=1e-5, atol=1e-6)


def _region_encode_ref(regions, boxes, classes, thresh):
    """transcription of reference encoding.py:116-154 incl. the inverted
    pos_mask quirk at :147."""
    if classes.size == 0:
        return np.zeros(len(regions)), np.zeros((len(regions), 4))
    ious = compute_ious_np(regions, boxes)
    best_gt = ious.argmax(1)
    best_iou = ious.max(1)
    pos = best_iou < thresh  # QUIRK
    c_star = pos * classes[best_gt]
    b_star = np.asarray(frcnn_box_encode(regions, boxes[best_gt], xp=np))
    return c_star, b_star


@pytest.mark.parametrize("n_labels", [0, 1, 4])
def test_region_encode_matches_reference_quirk(n_labels, rng):
    regions = rng.rand(20, 4).astype(np.float32) * 0.5 + 0.1
    boxes = rng.rand(n_labels, 4).astype(np.float32) * 0.5 + 0.1
    classes = rng.randint(1, 30, size=n_labels)

    c_ref, b_ref = _region_encode_ref(regions, boxes, classes, 0.5)

    pb, pc, pt, pm = _pad(boxes, classes, np.arange(n_labels), 8)
    out = region_encode(regions, pb, pc, pm, 0.5, fix_mask_polarity=False)

    np.testing.assert_array_equal(np.asarray(out.c_star), c_ref)
    np.testing.assert_allclose(np.asarray(out.b_star), b_ref, rtol=1e-5, atol=1e-6)


def test_region_encode_fixed_polarity_flips_positives(rng):
    regions = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
    boxes = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)  # IoU = 1 > 0.5
    classes = np.array([7])
    pb, pc, pt, pm = _pad(boxes, classes, [0], 4)

    quirk = region_encode(regions, pb, pc, pm, 0.5, fix_mask_polarity=False)
    fixed = region_encode(regions, pb, pc, pm, 0.5, fix_mask_polarity=True)
    assert int(quirk.c_star[0]) == 0  # reference marks perfect match negative
    assert int(fixed.c_star[0]) == 7


# --- track encoding ---


def test_track_encode_matches_intersection(rng):
    # frame 0: objects (cls, tid) = (1,0), (2,1), (3,2)
    # frame 1: objects             (2,1), (3,5), (1,0)
    # intersection: (1,0) and (2,1)
    b0 = rng.rand(3, 4).astype(np.float32) * 0.3 + 0.2
    b1 = rng.rand(3, 4).astype(np.float32) * 0.3 + 0.2
    pb0, pc0, pt0, pm0 = _pad(b0, [1, 2, 3], [0, 1, 2], 8)
    pb1, pc1, pt1, pm1 = _pad(b1, [2, 3, 1], [1, 5, 0], 8)

    out = track_encode(pb0, pc0, pt0, pm0, pb1, pc1, pt1, pm1)
    valid = np.asarray(out.valid)
    assert valid.tolist() == [True, True, False, False, False, False, False, False]

    t_star = np.asarray(out.t_star)
    exp0 = np.asarray(frcnn_box_encode(b0[0], b1[2], xp=np))  # (1,0) -> frame1 idx 2
    exp1 = np.asarray(frcnn_box_encode(b0[1], b1[0], xp=np))  # (2,1) -> frame1 idx 0
    np.testing.assert_allclose(t_star[0], exp0, rtol=1e-5)
    np.testing.assert_allclose(t_star[1], exp1, rtol=1e-5)


def test_track_encode_empty_frames():
    z = np.zeros((4, 4), np.float32)
    zc = np.zeros((4,), np.int32)
    zm = np.zeros((4,), bool)
    out = track_encode(z, zc, zc, zm, z, zc, zc, zm)
    assert not np.asarray(out.valid).any()


# --- anchors ---


def test_build_anchors_matches_reference_construction():
    """pin the construction math of reference utils.py:114-163."""
    areas, ratios = [0.004, 0.016], [0.5, 1.0, 2.0]
    fm_h, fm_w = 4, 6
    anchors = build_anchors((fm_h, fm_w), areas, ratios)
    assert anchors.shape == (fm_h * fm_w * 6, 4)

    # first cell center must be at (0.5/H, 0.5/W)
    np.testing.assert_allclose(anchors[0, :2], [0.5 / fm_h, 0.5 / fm_w])
    # anchor dims: h = sqrt(a*r), w = a/h
    h = np.sqrt(areas[0] * ratios[0])
    np.testing.assert_allclose(anchors[0, 2:], [h, areas[0] / h])
    # anchor-index fastest, then W, then H (reference reshape(-1, 4))
    np.testing.assert_allclose(anchors[6, :2], [0.5 / fm_h, 1.5 / fm_w])
    assert not anchors.flags.writeable


def test_anchor_boundary_mask():
    anchors = np.array(
        [
            [0.5, 0.5, 0.2, 0.2],  # interior
            [0.05, 0.5, 0.2, 0.2],  # crosses top
            [0.5, 0.5, 1.0, 1.0],  # touches all edges (>= / <= counts)
        ],
        np.float32,
    )
    np.testing.assert_array_equal(
        anchor_boundary_mask(anchors), [False, True, True]
    )


def test_track_encode_duplicate_pairs_last_wins(rng):
    """duplicate (class, track) pairs within a frame follow the reference's
    dict construction: the LAST occurrence wins on both sides and the pair
    yields exactly ONE target (reference encoding.py:229-238)."""
    b0 = rng.rand(3, 4).astype(np.float32) * 0.3 + 0.2
    b1 = rng.rand(3, 4).astype(np.float32) * 0.3 + 0.2
    # frame 0: (1,0) appears at slots 0 AND 2; frame 1: (1,0) at slots 0 AND 1
    pb0, pc0, pt0, pm0 = _pad(b0, [1, 2, 1], [0, 9, 0], 8)
    pb1, pc1, pt1, pm1 = _pad(b1, [1, 1, 2], [0, 0, 9], 8)

    out = track_encode(pb0, pc0, pt0, pm0, pb1, pc1, pt1, pm1)
    valid = np.asarray(out.valid)
    # slot 0's pair is superseded by slot 2 (dict last-wins); slot 1 ((2,9))
    # matches frame-1 slot 2; slot 2 is the surviving (1,0)
    assert valid.tolist() == [False, True, True, False, False, False, False, False]

    t_star = np.asarray(out.t_star)
    exp_10 = np.asarray(frcnn_box_encode(b0[2], b1[1], xp=np))  # last<->last
    exp_29 = np.asarray(frcnn_box_encode(b0[1], b1[2], xp=np))
    np.testing.assert_allclose(t_star[2], exp_10, rtol=1e-5)
    np.testing.assert_allclose(t_star[1], exp_29, rtol=1e-5)


def test_zero_size_padding_region_encodes_finite_with_finite_grads(rng):
    """all-zero padding region rows (ops/nms.py pad branch when fewer
    candidates than MAX_ROIS exist) must encode to FINITE b_star: an inf
    target makes smooth-L1's masked forward fine but its VJP computes
    0*inf = NaN, silently NaN-ing the regression head's gradients."""
    import jax
    import jax.numpy as jnp

    from detect_to_track_tpu.losses import rcnn_loss

    regions = np.array(
        [[0.4, 0.4, 0.3, 0.3], [0.0, 0.0, 0.0, 0.0]], np.float32
    )
    boxes = np.array([[0.45, 0.4, 0.3, 0.3]], np.float32)
    pb, pc, pt, pm = _pad(boxes, [7], [0], 4)

    rt = region_encode(regions, pb, pc, pm, 0.5, False)
    assert np.isfinite(np.asarray(rt.b_star)).all()

    valid = jnp.asarray([True, False])
    c_hat = jnp.full((2, 31), 1.0 / 31)

    def loss(b_hat):
        c_l, b_l = rcnn_loss(
            c_hat, rt.c_star, b_hat, rt.b_star, valid, 0.25, 2.0
        )
        return c_l + b_l

    g = jax.grad(loss)(jnp.zeros((2, 4), jnp.float32))
    assert np.isfinite(np.asarray(g)).all(), np.asarray(g)
