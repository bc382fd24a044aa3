"""full-clip inference: per-frame shared-backbone detection + Viterbi
tubelet linking (BASELINE.json config 5).

The reference has no clip driver -- users call Detector frame-pair by
frame-pair, recomputing every interior frame's backbone twice, and feed
viterbi_tracking manually (reference inference.py + viterbi.py). Here the
clip runs through `detect_clip` in fixed-size chunks with one-frame overlap:
the backbone/RPN/R-FCN execute ONCE per frame, the tracker covers every
adjacent pair by slicing the shared feature batch, and tubelets come out of
the Viterbi linker.

Two linker paths:
- device (default): link scoring AND the multi-path Viterbi DP run on
  device (viterbi_device.py, lax.scan) -- between chunks only the (D, D)
  link-score matrices stay on device; the host sees nothing until the final
  integer paths come back (north star: DP as a jax.lax.scan).
- host: per-frame detections are downloaded and the numpy / native C++
  linker runs (viterbi.py) -- the oracle path, exact-equality pinned.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

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
        device_linking: run link scoring + Viterbi DP on device
            (viterbi_device.py); False downloads detections and uses the
            host/native linker. Results are pinned equal in tests.
        uint8_upload: ship frames to the device as uint8 and normalize
            there -- 4x less transfer than float32 (exact for PIL/uint8
            sources, <=1/510 quantization for float input). The upload is
            the bottleneck through a remote-tunnel device link.
    """

    def __init__(
        self,
        detector: Detector,
        link_iou_thresh: float = 0.5,
        min_len: int = 2,
        frame_chunk: int = 8,
        pair_batch: Optional[int] = None,  # back-compat: PAIRS per dispatch
        device_linking: bool = True,
        uint8_upload: bool = True,
    ) -> None:
        self.detector = detector
        self.link_iou_thresh = link_iou_thresh
        self.min_len = min_len
        # pair_batch predates frame_chunk and counts PAIRS: a chunk of F
        # consecutive frames holds F-1 adjacent pairs, so honoring the old
        # unit means frame_chunk = pair_batch + 1 (not pair_batch).
        self.frame_chunk = max(
            pair_batch + 1 if pair_batch else frame_chunk, 2
        )
        self.device_linking = device_linking
        self.uint8_upload = uint8_upload
        self._chunk_scores_fn = None
        self.last_upload_s = 0.0  # cumulative device_put wait, last call

    # -- device path ------------------------------------------------------

    def _chunk_scores(self):
        """jitted: ClipDetections -> ((F-1, D, D) link scores, (D,) frame-0
        init scores). One compile per chunk shape."""
        if self._chunk_scores_fn is None:
            import jax

            from .encoding import frcnn_box_decode
            from .viterbi_device import clip_link_scores

            def fn(out, iou):
                # iou is a TRACED argument, not baked into the closure:
                # mutating tracker.link_iou_thresh between calls must affect
                # the device path exactly like the host path (no stale jit).
                confs = out.confs[:, :, 1:].sum(-1)  # (F, D) class-summed
                track_boxes = frcnn_box_decode(out.boxes[:-1], out.tracks)
                # init comes from clip_link_scores so the padded-slot
                # convention has exactly one owner (viterbi_device.py).
                return clip_link_scores(
                    confs, out.boxes, track_boxes, out.valid, iou
                )

            self._chunk_scores_fn = jax.jit(fn)
        return self._chunk_scores_fn

    def _link_device(
        self, seq_slots, init, bbox_host
    ) -> List[Tuple[Tuple[int, int], np.ndarray]]:
        import jax
        import jax.numpy as jnp

        from .viterbi_device import viterbi_multi_link_scan

        # bucket the transition count to the next power of two with all
        # -inf matrices: trailing padded timesteps extract nothing (the DP's
        # inner while guard sees no finite incoming entry, and the scan's
        # prefix rows are truncation-exact -- pinned by
        # test_viterbi_device.py), so results match the unpadded call while
        # the jit cache holds O(log n) entries per D instead of one per
        # distinct clip length.
        seq = jnp.stack(seq_slots)  # (n-1, D, D), still on device
        m = seq.shape[0]
        t1 = max(4, 1 << (m - 1).bit_length())
        if t1 > m:
            from .viterbi_device import NEG_INF

            seq = jnp.concatenate(
                [seq, jnp.full((t1 - m,) + seq.shape[1:], NEG_INF, seq.dtype)]
            )
        out = jax.device_get(viterbi_multi_link_scan(seq, init))

        tubelets = []
        for i in range(int(out.n_paths)):
            s, e = int(out.spans[i, 0]), int(out.spans[i, 1])
            if e - s + 1 < self.min_len:
                continue
            boxes = np.array(
                [
                    bbox_host[ts][int(out.nodes[i, ts])]
                    for ts in range(s, e + 1)
                ]
            )
            tubelets.append(((s, e), boxes))
        return tubelets

    # -- shared chunking loop ---------------------------------------------

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
        if self.uint8_upload:
            # _to_array returns PIL/uint8 sources as uint8 ALREADY (0-255):
            # only float [0,1] arrays need the rescale (rescaling uint8
            # again would saturate nearly every pixel to 255).
            arrs = [
                a
                if a.dtype == np.uint8
                else np.clip(np.rint(a * 255.0), 0, 255).astype(np.uint8)
                for a in arrs
            ]
        else:
            # mixed PIL/float sources: np.stack would promote the uint8
            # frames' 0-255 VALUES into the float batch, skipping the
            # device /255 (same guard as Detector.__call__).
            from .utils import promote_mixed_image_dtypes

            arrs = promote_mixed_image_dtypes(arrs)
        # HOST_S2D: space-to-depth each frame on the host before upload
        # (same bytes; detect_clip consumes the (H/2, W/2, 12) layout).
        arrs = [self.detector._maybe_s2d(a) for a in arrs]
        n = len(arrs)
        chunk = min(self.frame_chunk, n)

        bbox_seq: List[np.ndarray] = [None] * n
        if self.device_linking:
            seq_slots = [None] * (n - 1)  # device (D, D) link-score mats
            chunk_boxes = []  # (chunk start, device (F, D, 4)) per chunk
            init_scores = None
        else:
            conf_seq: List[np.ndarray] = [None] * n
            track_seq: List[np.ndarray] = [None] * (n - 1)

        # overlapping chunks: each covers frames [s, s+chunk); consecutive
        # chunks share one frame so every adjacent pair gets a track. The
        # final chunk is aligned to end exactly at the last frame.
        starts = list(range(0, n - chunk, chunk - 1)) + [n - chunk]

        # double-buffered uploads: jax.device_put is async, so the NEXT
        # window's host->device transfer rides the tunnel while the CURRENT
        # window computes (uploads dominate clip fps through the tunnel).
        import jax

        self.last_upload_s = 0.0

        def upload(s):
            import time

            t0 = time.perf_counter()
            buf = jax.device_put(np.stack(arrs[s : s + chunk]))
            # device_put is async; this records the host-side enqueue cost
            # only (stall time shows up as detect_clip latency instead).
            self.last_upload_s += time.perf_counter() - t0
            return buf

        pending = upload(starts[0])
        for si, s in enumerate(starts):
            window = pending
            if si + 1 < len(starts):
                pending = upload(starts[si + 1])
            out = self.detector.detect_clip(window)

            if self.device_linking:
                seq, init = self._chunk_scores()(
                    out, np.float32(self.link_iou_thresh)
                )
                if s == 0:
                    init_scores = init
                for fi in range(chunk - 1):
                    t = s + fi
                    if seq_slots[t] is None:
                        seq_slots[t] = seq[fi]
                # boxes stay ON DEVICE until after the loop: a per-chunk
                # np.asarray would block on this chunk's compute before the
                # next chunk even dispatches, stalling the pipeline the
                # double-buffered uploads exist to keep full.
                chunk_boxes.append((s, out.boxes))
                continue

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

        if self.device_linking:
            # one blocking download for all chunks' boxes (they are tiny:
            # F x D x 4), after every chunk has been dispatched.
            got = jax.device_get([b for _, b in chunk_boxes])
            for (cs, _), boxes in zip(chunk_boxes, got):
                for fi in range(chunk):
                    if bbox_seq[cs + fi] is None:
                        bbox_seq[cs + fi] = boxes[fi]
            return self._link_device(seq_slots, init_scores, bbox_seq)

        return viterbi_tracking(
            conf_seq, bbox_seq, track_seq, self.link_iou_thresh, self.min_len
        )
