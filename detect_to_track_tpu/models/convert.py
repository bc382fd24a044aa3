"""full-model weight conversion: reference torch state_dict -> flax params.

The reference trainer saves `torch.save(model.state_dict(), "weights.pt")`
(reference trainer.py:358) for a DetectTrackModule whose submodules are
backbone / rpn / rcnn / c_tracker (reference models/detect_track.py:41-55).
This module maps that state_dict onto detect_to_track_tpu's params so a
reference-trained model can run here directly (detection parity).

Layout notes (why this is a pure re-indexing, no re-training needed):
- conv kernels go OIHW -> HWIO; NHWC conv output channels therefore line up
  with the reference's NCHW channel axis, and every flatten/reshape in this
  framework was chosen channel-compatible (see models/rpn.py docstring for
  the anchor-major proof, models/correlation_tracker.py for the (C, k, k)
  pooled flatten).
- frozen BatchNorm folds into scale/bias (see resnet.convert_torch_state_dict).
- the reference backbone is Sequential(Normalizer, IntermediateLayerGetter)
  so its keys carry a "backbone.1." prefix (reference resnet.py:34-37).
- torch Linear weights are (out, in) -> Dense kernels (in, out).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .resnet import convert_torch_state_dict


def _conv(sd: Dict, prefix: str) -> Dict:
    out = {"kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _dense(sd: Dict, prefix: str) -> Dict:
    out = {"kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]), (1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def convert_reference_state_dict(
    state_dict: Dict[str, "np.ndarray"], backbone_arch: str = "resnet50"
) -> Dict:
    """reference DetectTrackModule.state_dict() -> params pytree.

    Accepts numpy arrays or torch tensors (anything np.asarray handles).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    # backbone keys live under the Sequential's index-1 child
    bb_sd = {
        k[len("backbone.1.") :]: v
        for k, v in sd.items()
        if k.startswith("backbone.1.")
    }
    params: Dict = {"backbone": convert_torch_state_dict(bb_sd, backbone_arch)}

    params["rpn"] = {
        "conv": _conv(sd, "rpn.conv"),
        "cls_fc": _conv(sd, "rpn.cls_fc"),
        "reg_fc": _conv(sd, "rpn.reg_fc"),
    }
    params["rcnn"] = {
        "channel_reduce": _conv(sd, "rcnn.channel_reduce"),
        "cls_sm_conv": _conv(sd, "rcnn.cls_head.sm_conv"),
        "reg_sm_conv": _conv(sd, "rcnn.reg_head.sm_conv"),
    }
    params["c_tracker"] = {
        "reg_fc": _dense(sd, "c_tracker.reg_fc"),
    }
    return params
