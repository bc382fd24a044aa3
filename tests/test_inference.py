"""inference tests: on-device NMS vs host filter-pipeline parity, Detector
API contract, full-clip tracking on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detect_to_track_tpu.config import Config
from detect_to_track_tpu.filtering import (
    ConfidenceFilter,
    MaxDetFilter,
    NMSFilter,
    PredictionFilterPipeline,
)
from detect_to_track_tpu.ops.nms import proposal_filter


@pytest.mark.parametrize("seed", range(4))
def test_device_nms_matches_host_pipeline(seed):
    """the on-device gate->topk->NMS pipeline must keep exactly the boxes
    the host ConfidenceFilter->MaxDetFilter->NMSFilter pipeline keeps
    (reference trainer.py:98-102 semantics), up to the static post-NMS cap."""
    rng = np.random.RandomState(seed)
    n = 200
    scores = rng.rand(n).astype(np.float32)
    boxes = np.stack(
        [
            rng.rand(n) * 0.8 + 0.1,
            rng.rand(n) * 0.8 + 0.1,
            rng.rand(n) * 0.3 + 0.05,
            rng.rand(n) * 0.3 + 0.05,
        ],
        axis=1,
    ).astype(np.float32)

    conf_t, iou_t, max_rois = 0.3, 0.5, 64
    host = PredictionFilterPipeline(
        ConfidenceFilter(conf_t), MaxDetFilter(3000), NMSFilter(iou_t)
    )
    h_scores, h_boxes = host(scores, boxes)

    dev = proposal_filter(
        jnp.asarray(scores), jnp.asarray(boxes), n, conf_t, iou_t, max_rois
    )
    d_boxes = np.asarray(dev.boxes)[np.asarray(dev.valid)]
    d_scores = np.asarray(dev.scores)[np.asarray(dev.valid)]

    k = min(len(h_boxes), max_rois)
    np.testing.assert_allclose(d_scores, h_scores[:k], rtol=1e-6)
    np.testing.assert_allclose(d_boxes, h_boxes[:k], rtol=1e-6)


@pytest.fixture(scope="module")
def detector():
    from detect_to_track_tpu.inference import Detector
    from detect_to_track_tpu.models import DetectTrackModule

    cfg = Config(
        N_CLASSES=6,
        INPUT_SHAPE=(64, 96),
        ANCHOR_AREAS=(0.02, 0.08),
        ANCHOR_ASPECT_RATIOS=(0.5, 1.0, 2.0),
        MAX_LABELS=8,
        PRE_NMS_TOPK=64,
        MAX_ROIS=16,
        MAX_DETS=8,
        D_MAX=2,
        K=3,
        COMPUTE_DTYPE="float32",
        EVAL_ROI_CONF_THRESH=0.2,
        EVAL_RCNN_CONF_THRESH=0.0,  # untrained net: keep everything valid
    )
    model = DetectTrackModule(
        backbone_arch="resnet50",
        n_anchors=cfg.n_anchors_per_cell,
        n_classes=cfg.N_CLASSES,
        k=cfg.K,
        d_max=cfg.D_MAX,
        r_hw=cfg.K,
        corr_impl="xla",
        dtype=jnp.float32,
    )
    h, w = cfg.INPUT_SHAPE
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
    )
    return Detector(model, variables, cfg), cfg


def test_detector_api_contract(detector, rng):
    """__call__(im0, im1) -> (confs0, confs1, bboxes0, bboxes1, tracks) with
    the reference's shape relationships (reference inference.py:54-68):
    tracks align with frame-0 detections."""
    det, cfg = detector
    h, w = cfg.INPUT_SHAPE
    im0 = rng.rand(h, w, 3).astype(np.float32)
    im1 = rng.rand(h, w, 3).astype(np.float32)
    confs0, confs1, boxes0, boxes1, tracks = det(im0, im1)

    assert confs0.shape[1] == cfg.N_CLASSES + 1
    assert confs0.shape[0] == boxes0.shape[0] == tracks.shape[0]
    assert confs1.shape[0] == boxes1.shape[0]
    assert boxes0.shape[1] == 4 and tracks.shape[1] == 4
    assert confs0.shape[0] <= cfg.MAX_DETS
    assert np.isfinite(tracks).all()


def test_detector_accepts_pil(detector, rng):
    from PIL import Image

    det, cfg = detector
    im = Image.fromarray((rng.rand(50, 70, 3) * 255).astype(np.uint8))
    out = det(im, im)
    assert len(out) == 5


def test_clip_tracker_runs(detector, rng):
    from detect_to_track_tpu.clip import ClipTracker

    det, cfg = detector
    h, w = cfg.INPUT_SHAPE
    frames = [rng.rand(h, w, 3).astype(np.float32) for _ in range(4)]
    tracker = ClipTracker(det, link_iou_thresh=0.5, min_len=1)
    tubelets = tracker(frames)
    for (start, end), boxes in tubelets:
        assert 0 <= start <= end <= 3
        assert boxes.shape == (end - start + 1, 4)


def test_clip_tracker_uint8_upload_exact_on_quantized_frames(detector, rng):
    """for frames that are exact 1/255 multiples (every PIL/uint8 source),
    the uint8 upload path must produce the same tubelets as the float
    path (XLA lowers /255 as a reciprocal multiply, so values may differ
    in the last ulp -- near-exact, not bitwise)."""
    from detect_to_track_tpu.clip import ClipTracker

    det, cfg = detector
    h, w = cfg.INPUT_SHAPE
    frames = [
        (rng.randint(0, 256, (h, w, 3)).astype(np.float32) / 255.0)
        for _ in range(4)
    ]
    a = ClipTracker(det, min_len=1, uint8_upload=False)(frames)
    b = ClipTracker(det, min_len=1, uint8_upload=True)(frames)
    assert len(a) == len(b)
    for (span_a, boxes_a), (span_b, boxes_b) in zip(a, b):
        assert span_a == span_b
        np.testing.assert_allclose(boxes_a, boxes_b, rtol=1e-4, atol=1e-5)


def test_clip_tracker_device_linking_matches_host(detector, rng):
    """the on-device lax.scan linker (viterbi_device.py) must produce the
    same tubelets as the host/native linker on a real clip forward."""
    from detect_to_track_tpu.clip import ClipTracker

    det, cfg = detector
    h, w = cfg.INPUT_SHAPE
    frames = [rng.rand(h, w, 3).astype(np.float32) for _ in range(5)]
    dev = ClipTracker(det, link_iou_thresh=0.5, min_len=1,
                      device_linking=True)(frames)
    host = ClipTracker(det, link_iou_thresh=0.5, min_len=1,
                       device_linking=False)(frames)
    assert len(dev) == len(host)
    for (span_a, boxes_a), (span_b, boxes_b) in zip(dev, host):
        assert span_a == span_b
        np.testing.assert_allclose(boxes_a, boxes_b, rtol=1e-6, atol=1e-7)


def test_clip_tracker_pil_frames_not_saturated(detector, rng):
    """PIL frames arrive from _to_array as uint8 ALREADY; the uint8_upload
    path must not rescale them again (regression: a second *255 saturated
    ~100% of pixels to 255, so every PIL-sourced clip ran on white
    frames). Pin: PIL frames == the equivalent float frames."""
    from PIL import Image

    from detect_to_track_tpu.clip import ClipTracker

    det, cfg = detector
    h, w = cfg.INPUT_SHAPE
    raw = [rng.randint(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(4)]
    pil = [Image.fromarray(a) for a in raw]
    flt = [a.astype(np.float32) / 255.0 for a in raw]
    a = ClipTracker(det, min_len=1, uint8_upload=True)(pil)
    b = ClipTracker(det, min_len=1, uint8_upload=False)(flt)
    assert len(a) == len(b) and len(a) > 0
    for (span_a, boxes_a), (span_b, boxes_b) in zip(a, b):
        assert span_a == span_b
        np.testing.assert_allclose(boxes_a, boxes_b, rtol=1e-4, atol=1e-5)


def test_detector_host_s2d_matches_plain(detector, rng):
    """HOST_S2D: space-to-depth on the host + the 4x4/s1 stem must produce
    the same detections as the plain path (identity rewrite; see
    Config.HOST_S2D and utils.space_to_depth2)."""
    from detect_to_track_tpu.inference import Detector

    det, cfg = detector
    det_s2d = Detector(det.model, det.variables, cfg.replace(HOST_S2D=True))
    h, w = cfg.INPUT_SHAPE
    im0 = rng.rand(h, w, 3).astype(np.float32)
    im1 = rng.rand(h, w, 3).astype(np.float32)
    out_p = det(im0, im1)
    out_s = det_s2d(im0, im1)
    for a, b in zip(out_p, out_s):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_host_s2d_rejects_device_input(detector, rng):
    """a 3-channel DEVICE array under HOST_S2D cannot be transformed on the
    host (its bytes never visit the host) -- detect_pairs must reject it at
    the ingestion guard rather than silently compile a second, non-s2d
    graph variant (inference._pack_input -> _maybe_s2d)."""
    import jax.numpy as jnp
    import pytest

    from detect_to_track_tpu.inference import Detector

    det, cfg = detector
    det_s2d = Detector(det.model, det.variables, cfg.replace(HOST_S2D=True))
    h, w = cfg.INPUT_SHAPE
    pairs_dev = jnp.asarray(rng.rand(1, 2, h, w, 3).astype(np.float32))
    with pytest.raises(ValueError, match="HOST_S2D"):
        det_s2d.detect_pairs(pairs_dev)
    # a list holding device frames hits the same guard on the stacked batch
    with pytest.raises(ValueError, match="HOST_S2D"):
        det_s2d.detect_pairs([pairs_dev[0], pairs_dev[0]])


def test_clip_tracker_host_s2d_matches_plain(detector, rng):
    """HOST_S2D through the clip path: chunked uploads ship the pre-s2d
    layout and detect_clip consumes it; tubelets must match the plain
    path."""
    from detect_to_track_tpu.clip import ClipTracker
    from detect_to_track_tpu.inference import Detector

    det, cfg = detector
    det_s2d = Detector(det.model, det.variables, cfg.replace(HOST_S2D=True))
    h, w = cfg.INPUT_SHAPE
    frames = [rng.rand(h, w, 3).astype(np.float32) for _ in range(4)]
    a = ClipTracker(det, min_len=1, uint8_upload=False)(frames)
    b = ClipTracker(det_s2d, min_len=1, uint8_upload=False)(frames)
    assert len(a) == len(b)
    for (span_a, boxes_a), (span_b, boxes_b) in zip(a, b):
        assert span_a == span_b
        np.testing.assert_allclose(boxes_a, boxes_b, rtol=1e-4, atol=1e-5)
