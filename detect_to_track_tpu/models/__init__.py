"""flax model components (NHWC, TPU-native).

Mirrors the reference's model surface (reference
detect_to_track/models/__init__.py): backbone, RPN, RFCN,
CorrelationTracker, DetectTrackModule -- with the three CUDA ops replaced by
the TPU kernels in detect_to_track_tpu.ops.
"""

from .resnet import ResNetBackbone, resnet_trainable_mask
from .rpn import RPN
from .rfcn import RFCN
from .correlation_tracker import CorrelationTracker
from .detect_track import DetectTrackModule
