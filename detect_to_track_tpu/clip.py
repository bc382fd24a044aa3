"""full-clip inference: per-frame shared-backbone detection + Viterbi
tubelet linking (BASELINE.json config 5).

The reference has no clip driver -- users call Detector frame-pair by
frame-pair, recomputing every interior frame's backbone twice, and feed
viterbi_tracking manually (reference inference.py + viterbi.py). Here the
clip runs through `detect_clip` in fixed-size chunks with one-frame overlap:
the backbone/RPN/R-FCN execute ONCE per frame, the tracker covers every
adjacent pair by slicing the shared feature batch, and tubelets come out of
the (native C++ or numpy) Viterbi linker.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .inference import Detector
from .viterbi import viterbi_tracking


class ClipTracker:
    """detect + track over a whole clip.

    Args:
        detector: a Detector (jitted clip-forward).
        link_iou_thresh: IoU threshold for track-link scoring psi.
        min_len: minimum tubelet length to keep.
        frame_chunk: frames per device dispatch (static shape; clips longer
            than this are processed in overlapping chunks).
    """

    def __init__(
        self,
        detector: Detector,
        link_iou_thresh: float = 0.5,
        min_len: int = 2,
        frame_chunk: int = 8,
        pair_batch: int = None,  # back-compat alias for frame_chunk
    ) -> None:
        self.detector = detector
        self.link_iou_thresh = link_iou_thresh
        self.min_len = min_len
        self.frame_chunk = max(pair_batch or frame_chunk, 2)

    def __call__(
        self, frames: Sequence
    ) -> List[Tuple[Tuple[int, int], np.ndarray]]:
        """frames: sequence of PIL images or (H, W, 3) [0,1] arrays.

        Returns tubelets [((start_ts, end_ts), boxes (len, 4))].
        """
        if len(frames) < 2:
            raise ValueError("need at least 2 frames")

        from .encoding import frcnn_box_decode

        arrs = [self.detector._to_array(f) for f in frames]
        n = len(arrs)
        chunk = min(self.frame_chunk, n)

        conf_seq: List[np.ndarray] = [None] * n
        bbox_seq: List[np.ndarray] = [None] * n
        track_seq: List[np.ndarray] = [None] * (n - 1)

        # overlapping chunks: each covers frames [s, s+chunk); consecutive
        # chunks share one frame so every adjacent pair gets a track. The
        # final chunk is aligned to end exactly at the last frame.
        starts = list(range(0, n - chunk, chunk - 1)) + [n - chunk]

        # double-buffered uploads: jax.device_put is async, so the NEXT
        # window's host->device transfer rides the tunnel while the CURRENT
        # window computes (uploads dominate clip fps through the tunnel).
        import jax

        def upload(s):
            return jax.device_put(np.stack(arrs[s : s + chunk]))

        pending = upload(starts[0])
        for si, s in enumerate(starts):
            window = pending
            if si + 1 < len(starts):
                pending = upload(starts[si + 1])
            out = self.detector.detect_clip(window)
            confs = np.asarray(out.confs)  # (F, D, C+1)
            boxes = np.asarray(out.boxes)
            valid = np.asarray(out.valid)
            tracks = np.asarray(out.tracks)  # (F-1, D, 4)

            for fi in range(chunk):
                t = s + fi
                if conf_seq[t] is None:
                    v = valid[fi]
                    conf_seq[t] = confs[fi][v][:, 1:].sum(-1)
                    bbox_seq[t] = boxes[fi][v]
                if fi < chunk - 1 and track_seq[t] is None:
                    v = valid[fi]
                    # predicted frame-(t+1) positions of frame-t detections
                    track_seq[t] = np.asarray(
                        frcnn_box_decode(boxes[fi][v], tracks[fi][v], xp=np)
                    ).reshape(-1, 4)

        return viterbi_tracking(
            conf_seq, bbox_seq, track_seq, self.link_iou_thresh, self.min_len
        )
