"""mAP evaluation tests."""

import numpy as np

from detect_to_track_tpu.evaluation import average_precision, detection_map


def _onehotish(c, n_classes, conf):
    v = np.full(n_classes + 1, (1 - conf) / n_classes, np.float32)
    v[c] = conf
    return v


def test_perfect_detections_have_map_1():
    n_classes = 3
    gt_c = [np.array([1, 2]), np.array([3])]
    gt_b = [
        np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]], np.float32),
        np.array([[0.5, 0.5, 0.3, 0.3]], np.float32),
    ]
    det_c = [
        np.stack([_onehotish(1, n_classes, 0.9), _onehotish(2, n_classes, 0.8)]),
        np.stack([_onehotish(3, n_classes, 0.95)]),
    ]
    res = detection_map(det_c, gt_b, gt_c, gt_b, n_classes)
    assert res["mAP"] == 1.0


def test_missed_detection_lowers_map():
    n_classes = 2
    gt_c = [np.array([1, 1])]
    gt_b = [np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]], np.float32)]
    # only one of the two objects detected
    det_c = [np.stack([_onehotish(1, n_classes, 0.9)])]
    det_b = [gt_b[0][:1]]
    res = detection_map(det_c, det_b, gt_c, gt_b, n_classes)
    assert 0.0 < res["mAP"] < 1.0
    np.testing.assert_allclose(res["AP_1"], 0.5)


def test_false_positive_lowers_precision():
    n_classes = 1
    gt_c = [np.array([1])]
    gt_b = [np.array([[0.3, 0.3, 0.2, 0.2]], np.float32)]
    det_b = [
        np.array(
            [[0.3, 0.3, 0.2, 0.2], [0.8, 0.8, 0.1, 0.1]], np.float32
        )  # second is a FP
    ]
    det_c = [
        np.stack(
            [_onehotish(1, n_classes, 0.9), _onehotish(1, n_classes, 0.8)]
        )
    ]
    res = detection_map(det_c, det_b, gt_c, gt_b, n_classes)
    assert res["AP_1"] == 1.0  # FP ranked below the TP: AP unaffected at r=1
    # FP ranked above -> AP drops
    det_c2 = [
        np.stack(
            [_onehotish(1, n_classes, 0.5), _onehotish(1, n_classes, 0.8)]
        )
    ]
    res2 = detection_map(det_c2, det_b, gt_c, gt_b, n_classes)
    assert res2["AP_1"] < 1.0


def test_average_precision_shape():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 0.5])
    ap = average_precision(r, p)
    assert 0.5 < ap <= 1.0
