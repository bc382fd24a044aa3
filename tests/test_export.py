"""serialized inference export roundtrip."""

import numpy as np

from detect_to_track_tpu.export import export_detector, load_detector
from tests.test_inference import detector  # fixture  # noqa: F401


def test_export_roundtrip(detector, tmp_path, rng):
    det, cfg = detector
    path = tmp_path / "detector.stablehlo"
    export_detector(det.model, det.variables, cfg, str(path), pair_batch=1)
    assert path.stat().st_size > 0

    served = load_detector(str(path))
    h, w = cfg.INPUT_SHAPE
    images = rng.rand(1, 2, h, w, 3).astype(np.float32)
    confs, boxes, valid, tracks = served(images)
    ref = det.detect_pairs(images)
    np.testing.assert_allclose(
        np.asarray(confs), np.asarray(ref.confs), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))


def test_export_roundtrip_host_s2d(detector, tmp_path, rng):
    """HOST_S2D export: the artifact's input spec is the pre-s2d host
    layout; serving it on s2d frames equals the plain artifact on the raw
    frames."""
    from detect_to_track_tpu.utils import space_to_depth2

    det, cfg = detector
    cfg_s = cfg.replace(HOST_S2D=True)
    path = tmp_path / "detector_s2d.stablehlo"
    export_detector(det.model, det.variables, cfg_s, str(path), pair_batch=1)
    served = load_detector(str(path))
    h, w = cfg.INPUT_SHAPE
    images = rng.rand(1, 2, h, w, 3).astype(np.float32)
    confs, boxes, valid, tracks = served(space_to_depth2(images))
    ref = det.detect_pairs(images)
    np.testing.assert_allclose(
        np.asarray(confs), np.asarray(ref.confs), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))
