"""data layer: types, pascal parsing, ImageNet VID/DET samplers, host
pipeline producing fixed-shape device batches."""

from .types import (
    DataManager,
    DataManagerWrapper,
    DataSampler,
    ImageInstance,
    ObjectLabel,
    PaddedFrame,
    PaddedPairBatch,
    RawImageInstance,
    pack_labels,
)
