"""data types.

Human-readable types mirror reference detect_to_track/data/types.py:10-68
(ObjectLabel / RawImageInstance / ImageInstance / DataSampler / DataManager /
DataManagerWrapper) so datasets written against the reference port directly.

The TPU-specific additions are the PADDED batch types: XLA needs static
shapes, so every frame's variable-length label list is packed into fixed
(MAX_LABELS,) arrays + a validity mask (real labels first -- the encoders
rely on that ordering for argmax tie-break parity, see encoding.py).
"""

from __future__ import annotations

import abc
from pathlib import Path
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np


class ObjectLabel(NamedTuple):
    """one ground-truth object (box is fractional ijhw)."""

    class_id: int
    class_name: str
    box: Tuple[float, float, float, float]
    track_id: Optional[int] = None


class RawImageInstance(NamedTuple):
    """unprocessed instance: paths only, loaded lazily."""

    impath: Path
    labelpath: Path


class ImageInstance(NamedTuple):
    """decoded image + labels (im is a PIL.Image)."""

    im: object
    labels: Tuple[ObjectLabel, ...]


class DataSampler(abc.ABC):
    """non-deterministic sampler; handles IO + conversion to common format."""

    @abc.abstractmethod
    def sample(self):
        raise NotImplementedError


class DataManager(abc.ABC):
    """deterministic, indexable dataset view."""

    @abc.abstractmethod
    def __getitem__(self, i):
        raise NotImplementedError

    @abc.abstractmethod
    def __len__(self):
        raise NotImplementedError


class DataManagerWrapper(DataManager):
    """adapts a DataSampler to the DataManager interface with a nominal
    length (reference types.py:57-68)."""

    def __init__(self, sampler: DataSampler, nominal_len: int) -> None:
        self.sampler = sampler
        self.nominal_len = nominal_len

    def __getitem__(self, i: int):
        return self.sampler.sample()

    def __len__(self) -> int:
        return self.nominal_len

    def reseed(self, salt: int) -> None:
        """resume support: salt the wrapped sampler's stream (if seeded) so
        a rebuilt process does not replay already-trained instances."""
        if hasattr(self.sampler, "reseed"):
            self.sampler.reseed(salt)


# ---------------------------------------------------------------------------
# fixed-shape batch types
# ---------------------------------------------------------------------------


class PaddedFrame(NamedTuple):
    """one frame's labels, padded to capacity L (leading axes allowed)."""

    boxes: np.ndarray  # (..., L, 4) float32 ijhw
    classes: np.ndarray  # (..., L) int32, 1-based; 0 = background/pad
    track_ids: np.ndarray  # (..., L) int32; -1 = none
    mask: np.ndarray  # (..., L) bool


class PaddedPairBatch(NamedTuple):
    """a batch of frame pairs ready for the jitted train/eval step."""

    images: np.ndarray  # (B, 2, H, W, 3) float32 in [0,1] OR uint8 [0,255]
    #   (uint8 batches are normalized on device by forward_losses; PIL
    #    sources pack as uint8 for 4x less host->device transfer)
    labels: PaddedFrame  # arrays shaped (B, 2, L, ...)


def pack_labels(
    labels: Sequence[ObjectLabel], capacity: int
) -> PaddedFrame:
    """pack a variable-length label list into fixed-shape arrays (real
    labels first). Labels beyond capacity are dropped (warn-free: capacity
    should be chosen >= dataset max; ImageNet VID frames rarely exceed ~20
    objects)."""
    n = min(len(labels), capacity)
    boxes = np.zeros((capacity, 4), np.float32)
    classes = np.zeros((capacity,), np.int32)
    track_ids = np.full((capacity,), -1, np.int32)
    mask = np.zeros((capacity,), bool)
    for i, lbl in enumerate(labels[:n]):
        boxes[i] = lbl.box
        classes[i] = lbl.class_id
        track_ids[i] = -1 if lbl.track_id is None else lbl.track_id
        mask[i] = True
    return PaddedFrame(boxes, classes, track_ids, mask)
