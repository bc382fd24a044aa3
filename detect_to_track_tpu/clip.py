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
        pair_batch: int = 4,
    ) -> None:
        self.detector = detector
        self.link_iou_thresh = link_iou_thresh
        self.min_len = min_len
        self.pair_batch = pair_batch

    def __call__(
        self, frames: Sequence
    ) -> List[Tuple[Tuple[int, int], np.ndarray]]:
        """frames: sequence of PIL images or (H, W, 3) [0,1] arrays.

        Adjacent frame pairs are processed `pair_batch` at a time through
        the vmapped pair-forward, then detections feed the Viterbi linker.

        Returns tubelets [((start_ts, end_ts), boxes (len, 4))].
        """
        if len(frames) < 2:
            raise ValueError("need at least 2 frames")

        from .encoding import frcnn_box_decode

        arrs = [self.detector._to_array(f) for f in frames]
        n_pairs = len(frames) - 1

        conf_seq: List[np.ndarray] = []
        bbox_seq: List[np.ndarray] = []
        track_seq: List[np.ndarray] = []

        for s in range(0, n_pairs, self.pair_batch):
            idx = range(s, min(s + self.pair_batch, n_pairs))
            pairs = np.stack(
                [np.stack([arrs[t], arrs[t + 1]]) for t in idx]
            )  # (P, 2, H, W, 3)
            out = self.detector.detect_pairs(pairs)
            confs = np.asarray(out.confs)  # (P, 2, D, C+1)
            boxes = np.asarray(out.boxes)  # (P, 2, D, 4)
            valid = np.asarray(out.valid)  # (P, 2, D)
            tracks = np.asarray(out.tracks)  # (P, D, 4)

            for p, t in enumerate(idx):
                v0, v1 = valid[p, 0], valid[p, 1]
                boxes0 = boxes[p, 0][v0]
                if t == 0:
                    conf_seq.append(confs[p, 0][v0][:, 1:].sum(-1))
                    bbox_seq.append(boxes0)
                # predicted frame-(t+1) positions of frame-t detections:
                # decode the track transform against the frame-t boxes.
                track_boxes = np.asarray(
                    frcnn_box_decode(boxes0, tracks[p][v0], xp=np)
                ).reshape(-1, 4)
                track_seq.append(track_boxes)
                conf_seq.append(confs[p, 1][v1][:, 1:].sum(-1))
                bbox_seq.append(boxes[p, 1][v1])

        return viterbi_tracking(
            conf_seq, bbox_seq, track_seq, self.link_iou_thresh, self.min_len
        )
