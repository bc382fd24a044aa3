"""full-model (DetectTrackModule) weight converter structure test."""

import jax
import jax.numpy as jnp
import numpy as np

from detect_to_track_tpu.models import DetectTrackModule
from detect_to_track_tpu.models.convert import convert_reference_state_dict
from tests.test_models import _fake_torch_state_dict


def _fake_reference_state_dict(n_anchors, n_classes, k, d_max, reg_ch=512):
    rng = np.random.RandomState(0)
    sd = {}
    for key, v in _fake_torch_state_dict("resnet50").items():
        sd[f"backbone.1.{key}"] = v

    def conv(name, cin, cout, kk):
        sd[f"{name}.weight"] = rng.randn(cout, cin, kk, kk).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = rng.randn(cout).astype(np.float32) * 0.01

    conv("rpn.conv", 1024, reg_ch, 3)
    conv("rpn.cls_fc", reg_ch, 2 * n_anchors, 1)
    conv("rpn.reg_fc", reg_ch, 4 * n_anchors, 1)
    conv("rcnn.channel_reduce", 2048, reg_ch, 3)
    conv("rcnn.cls_head.sm_conv", reg_ch, (n_classes + 1) * k * k, 1)
    conv("rcnn.reg_head.sm_conv", reg_ch, 4 * k * k, 1)
    fc_ch = (3 * (2 * d_max + 1) ** 2 + 2 * reg_ch) * k * k
    sd["c_tracker.reg_fc.weight"] = rng.randn(4, fc_ch).astype(np.float32) * 0.001
    sd["c_tracker.reg_fc.bias"] = rng.randn(4).astype(np.float32) * 0.01
    return sd


def test_reference_state_dict_converts_and_runs(rng):
    n_anchors, n_classes, k, d_max = 3, 4, 3, 2
    sd = _fake_reference_state_dict(n_anchors, n_classes, k, d_max)
    params = convert_reference_state_dict(sd, "resnet50")

    model = DetectTrackModule(
        backbone_arch="resnet50",
        n_anchors=n_anchors,
        n_classes=n_classes,
        k=k,
        d_max=d_max,
        r_hw=k,
        corr_impl="xla",
    )
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    rois = jnp.asarray(rng.rand(2, 4, 4) * 0.4 + 0.2, jnp.float32)
    init_params = model.init(jax.random.PRNGKey(0), x, rois)["params"]

    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        init_params
    )
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(init_params),
    ):
        assert a.shape == b.shape, (jax.tree_util.keystr(ka), a.shape, b.shape)

    out = model.apply({"params": params}, x, rois)
    for o in out:
        assert np.isfinite(np.asarray(o)).all()
