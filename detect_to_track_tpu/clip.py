"""full-clip inference: batched frame-pair detection + Viterbi tubelet
linking (BASELINE.json config 5).

The reference has no clip driver -- users call Detector frame-pair by
frame-pair and feed viterbi_tracking manually (reference inference.py +
viterbi.py). This module provides that composition: adjacent frame pairs run
through the jitted pair-forward (device), per-frame detections accumulate on
host, and tubelets come out of the (native C++ or numpy) Viterbi linker.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .config import Config
from .inference import Detector
from .viterbi import viterbi_tracking


class ClipTracker:
    """detect + track over a whole clip.

    Args:
        detector: a Detector (jitted pair-forward).
        link_iou_thresh: IoU threshold for track-link scoring psi.
        min_len: minimum tubelet length to keep.
    """

    def __init__(
        self,
        detector: Detector,
        link_iou_thresh: float = 0.5,
        min_len: int = 2,
    ) -> None:
        self.detector = detector
        self.link_iou_thresh = link_iou_thresh
        self.min_len = min_len

    def __call__(
        self, frames: Sequence
    ) -> List[Tuple[Tuple[int, int], np.ndarray]]:
        """frames: sequence of PIL images or (H, W, 3) [0,1] arrays.

        Returns tubelets [((start_ts, end_ts), boxes (len, 4))].
        """
        if len(frames) < 2:
            raise ValueError("need at least 2 frames")

        conf_seq: List[np.ndarray] = []
        bbox_seq: List[np.ndarray] = []
        track_seq: List[np.ndarray] = []

        from .encoding import frcnn_box_decode

        prev = None  # (confs1, boxes1) of the previous pair's 2nd frame
        for t in range(len(frames) - 1):
            confs0, confs1, boxes0, boxes1, tracks = self.detector(
                frames[t], frames[t + 1]
            )
            if t == 0:
                conf_seq.append(confs0[:, 1:].sum(-1))
                bbox_seq.append(boxes0)
            # predicted frame-(t+1) positions of frame-t detections:
            # decode the track transform against the frame-t boxes
            # (tracks are frcnn offsets frame-t -> frame-t+1).
            track_boxes = np.asarray(
                frcnn_box_decode(boxes0, tracks, xp=np)
            ).reshape(-1, 4)
            track_seq.append(track_boxes)
            conf_seq.append(confs1[:, 1:].sum(-1))
            bbox_seq.append(boxes1)
            prev = (confs1, boxes1)

        return viterbi_tracking(
            conf_seq, bbox_seq, track_seq, self.link_iou_thresh, self.min_len
        )
