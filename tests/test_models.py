"""model component tests: backbone stride contract (reference
tests/test_resnet.py analogue), head shapes, weight conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from detect_to_track_tpu.models import (
    RFCN,
    RPN,
    CorrelationTracker,
    DetectTrackModule,
    ResNetBackbone,
    resnet_trainable_mask,
)
from detect_to_track_tpu.models.resnet import (
    ARCHS,
    convert_torch_state_dict,
)


@pytest.mark.parametrize("arch", ["resnet50", "resnet101", "resnext50_32x4d"])
def test_resnet_fm_strides(arch, rng):
    """c3/c4/c5 strides must be exactly 8/16/16 (the dilation trick;
    reference tests/test_resnet.py:9-29). Run at reduced resolution --
    stride contracts are resolution-independent."""
    h, w = 64, 128
    rn = ResNetBackbone(arch=arch)
    x = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    variables = jax.eval_shape(lambda: rn.init(jax.random.PRNGKey(0), x))
    out = jax.eval_shape(
        lambda v: rn.apply(v, x), variables
    )  # shape-only: no heavy compute
    for key, stride in [("c3", 8), ("c4", 16), ("c5", 16)]:
        fm = out[key]
        assert fm.shape[0] == 1
        assert h / fm.shape[1] == stride, (key, fm.shape)
        assert w / fm.shape[2] == stride, (key, fm.shape)
    assert out["c4"].shape[-1] == 1024
    assert out["c5"].shape[-1] == 2048


def _fake_torch_state_dict(arch):
    """random torchvision-shaped state_dict (no torchvision needed)."""
    blocks, groups, base_width = ARCHS[arch]
    rng = np.random.RandomState(0)
    sd = {}

    def add_conv(name, cin, cout, k, groups=1):
        sd[f"{name}.weight"] = rng.randn(cout, cin // groups, k, k).astype(
            np.float32
        ) * 0.05

    def add_bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    add_conv("conv1", 3, 64, 7)
    add_bn("bn1", 64)
    cin = 64
    for li, n in enumerate(blocks, start=1):
        planes = 64 * 2 ** (li - 1)
        width = int(planes * base_width / 64) * groups
        cout = planes * 4
        for bi in range(n):
            p = f"layer{li}.{bi}"
            add_conv(f"{p}.conv1", cin if bi == 0 else cout, width, 1)
            add_bn(f"{p}.bn1", width)
            add_conv(f"{p}.conv2", width, width, 3, groups)
            add_bn(f"{p}.bn2", width)
            add_conv(f"{p}.conv3", width, cout, 1)
            add_bn(f"{p}.bn3", cout)
            if bi == 0:
                add_conv(f"{p}.downsample.0", cin, cout, 1)
                add_bn(f"{p}.downsample.1", cout)
        cin = cout
    return sd


def test_torch_weight_conversion_loads_and_runs(rng):
    arch = "resnet50"
    sd = _fake_torch_state_dict(arch)
    params = convert_torch_state_dict(sd, arch)

    rn = ResNetBackbone(arch=arch)
    x = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    init_params = rn.init(jax.random.PRNGKey(0), x)["params"]
    # converted tree must structurally match the module's own params
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        init_params
    )
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(init_params),
    ):
        assert a.shape == b.shape, (ka, a.shape, b.shape)
    out = rn.apply({"params": params}, x)
    assert np.isfinite(np.asarray(out["c5"])).all()


def test_space_to_depth_stem_matches_plain(rng):
    """the 4x4/s1 space-to-depth stem must equal the 7x7/s2 stem exactly
    (same params; the kernel regrouping is an identity rewrite). Includes
    boundary pixels -- zero padding must be preserved by the transform."""
    x = jnp.asarray(rng.rand(2, 32, 48, 3), jnp.float32)
    plain = ResNetBackbone(arch="resnet50", space_to_depth_stem=False)
    s2d = ResNetBackbone(arch="resnet50", space_to_depth_stem=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    # identical param trees (same names, shapes, init values)
    params_s2d = s2d.init(jax.random.PRNGKey(0), x)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params_s2d),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))
    out_p = plain.apply(params, x)
    out_s = s2d.apply(params, x)
    for key in ("c3", "c4", "c5"):
        np.testing.assert_allclose(
            np.asarray(out_s[key]), np.asarray(out_p[key]), rtol=1e-4, atol=1e-5
        )


def test_space_to_depth_stem_odd_size_falls_back(rng):
    """odd H or W cannot space-to-depth; the stem silently uses the plain
    path and still meets the stride contract."""
    x = jnp.asarray(rng.rand(1, 33, 47, 3), jnp.float32)
    rn = ResNetBackbone(arch="resnet50", space_to_depth_stem=True)
    variables = jax.eval_shape(lambda: rn.init(jax.random.PRNGKey(0), x))
    out = jax.eval_shape(lambda v: rn.apply(v, x), variables)
    assert out["c4"].shape[1:3] == (np.ceil(33 / 16), np.ceil(47 / 16))


def test_frozen_bn_fold_matches_torch_eval_bn(rng):
    """scale/bias folding must reproduce torch BatchNorm2d.eval()."""
    c = 8
    gamma = rng.rand(c).astype(np.float32) + 0.5
    beta = rng.randn(c).astype(np.float32)
    mean = rng.randn(c).astype(np.float32)
    var = rng.rand(c).astype(np.float32) + 0.5
    x = rng.randn(2, c, 5, 5).astype(np.float32)

    bn = torch.nn.BatchNorm2d(c, eps=1e-5).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(gamma))
        bn.bias.copy_(torch.from_numpy(beta))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
        ref = bn(torch.from_numpy(x)).numpy()

    scale = gamma / np.sqrt(var + 1e-5)
    bias = beta - mean * scale
    ours = x * scale[None, :, None, None] + bias[None, :, None, None]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_trainable_mask_freezes_early_stages():
    params = {
        "backbone": {
            "conv1": {"kernel": 0},
            "bn1": {"scale": 0, "bias": 0},
            "layer2_0": {"conv1": {"kernel": 0}, "bn1": {"scale": 0}},
            "layer3_0": {"conv1": {"kernel": 0}},
            "layer4_0": {"conv1": {"kernel": 0}},
        },
        "rpn": {"conv": {"kernel": 0, "bias": 0}},
    }
    mask = resnet_trainable_mask(params, first_trainable_stage=3)
    assert mask["backbone"]["conv1"]["kernel"] is False
    assert mask["backbone"]["bn1"]["scale"] is False
    assert mask["backbone"]["layer2_0"]["conv1"]["kernel"] is False
    assert mask["backbone"]["layer3_0"]["conv1"]["kernel"] is True
    assert mask["backbone"]["layer4_0"]["conv1"]["kernel"] is True
    assert mask["backbone"]["layer2_0"]["bn1"]["scale"] is False  # frozen BN
    assert mask["rpn"]["conv"]["kernel"] is True


def test_rpn_shapes_and_softmax(rng):
    n_anchors = 15
    rpn = RPN(n_anchors=n_anchors)
    x = jnp.asarray(rng.rand(2, 4, 6, 32), jnp.float32)
    variables = rpn.init(jax.random.PRNGKey(0), x)
    o, b, fm = rpn.apply(variables, x)
    assert o.shape == (2, 4 * 6 * n_anchors, 2)
    assert b.shape == (2, 4 * 6 * n_anchors, 4)
    assert fm.shape == (2, 4, 6, 512)
    np.testing.assert_allclose(np.asarray(o.sum(-1)), 1.0, rtol=1e-5)


def test_rpn_flatten_is_anchor_major(rng):
    """cell (i, j), anchor a must land at flat index (i*W + j)*A + a --
    the order build_anchors flattens to (reference rpn.py:23-29)."""
    B, H, W, A = 1, 2, 3, 4
    x = rng.rand(B, H, W, 2 * A).astype(np.float32)
    flat = x.reshape(B, H * W * A, 2)  # the RPN's reshape
    for i in range(H):
        for j in range(W):
            for a in range(A):
                np.testing.assert_array_equal(
                    flat[0, (i * W + j) * A + a], x[0, i, j, 2 * a : 2 * a + 2]
                )


def test_rfcn_shapes(rng):
    n_classes, k = 5, 3
    rfcn = RFCN(n_classes=n_classes, k=k)
    x = jnp.asarray(rng.rand(2, 8, 10, 64), jnp.float32)
    rois = jnp.asarray(rng.rand(2, 7, 4) * 0.5 + 0.2, jnp.float32)
    variables = rfcn.init(jax.random.PRNGKey(0), x, rois)
    c, b = rfcn.apply(variables, x, rois)
    assert c.shape == (2, 7, n_classes + 1)
    assert b.shape == (2, 7, 4)
    np.testing.assert_allclose(np.asarray(c.sum(-1)), 1.0, rtol=1e-5)


def test_correlation_tracker_shapes(rng):
    d_max, r_hw, cr = 2, 3, 16
    ct = CorrelationTracker(
        d_max=d_max, r_hw=r_hw, reg_channels=cr, corr_impl="xla"
    )
    B, H, W = 2, 6, 8
    pyr = lambda: {
        "c3": jnp.asarray(rng.rand(B, 2 * H, 2 * W, 8), jnp.float32),
        "c4": jnp.asarray(rng.rand(B, H, W, 12), jnp.float32),
        "c5": jnp.asarray(rng.rand(B, H, W, 12), jnp.float32),
    }
    reg = lambda: jnp.asarray(rng.rand(B, H, W, cr), jnp.float32)
    rois = jnp.asarray(rng.rand(B, 5, 4) * 0.5 + 0.2, jnp.float32)
    p0, p1, r0, r1 = pyr(), pyr(), reg(), reg()
    variables = ct.init(jax.random.PRNGKey(0), p0, p1, r0, r1, rois)
    t = ct.apply(variables, p0, p1, r0, r1, rois)
    assert t.shape == (B, 5, 4)
    # fc input width matches the reference formula
    k2 = (2 * d_max + 1) ** 2
    assert variables["params"]["reg_fc"]["kernel"].shape == (
        (3 * k2 + 2 * cr) * r_hw**2,
        4,
    )


def test_detect_track_module_init(rng):
    """all four submodules share one params tree (reference
    detect_track.py:11-30); direct init path touches every head."""
    m = DetectTrackModule(
        backbone_arch="resnet50", n_anchors=3, n_classes=4, k=3, d_max=2,
        r_hw=3, corr_impl="xla",
    )
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    rois = jnp.asarray(rng.rand(2, 4, 4) * 0.4 + 0.2, jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, rois)
    assert set(variables["params"].keys()) == {
        "backbone",
        "rpn",
        "rcnn",
        "c_tracker",
    }
    fmaps = m.apply(variables, x, method="backbone")
    assert fmaps["c3"].shape[1:3] == (8, 8)
    o, b, fm_reg = m.apply(variables, fmaps["c4"], method="rpn")
    assert o.shape[-1] == 2 and fm_reg.shape[-1] == 512


def test_tracker_fused_head_matches_materialized(rng):
    """the fused (fc-into-pyramid) head must reproduce the materialized
    concat -> roi_pool -> flatten -> Linear reference path exactly."""
    import jax
    import jax.numpy as jnp

    from detect_to_track_tpu.models.correlation_tracker import (
        CorrelationTracker,
    )

    kw = dict(d_max=2, r_hw=3, reg_channels=8, corr_impl="xla")
    fused = CorrelationTracker(fused_head=True, **kw)
    mat = CorrelationTracker(fused_head=False, **kw)

    b, h, w = 2, 8, 12
    pyr0 = {
        "c3": jnp.asarray(rng.rand(b, 2 * h, 2 * w, 8), jnp.float32),
        "c4": jnp.asarray(rng.rand(b, h, w, 12), jnp.float32),
        "c5": jnp.asarray(rng.rand(b, h, w, 16), jnp.float32),
    }
    pyr1 = {k: v + 0.1 for k, v in pyr0.items()}
    reg0 = jnp.asarray(rng.rand(b, h, w, 8), jnp.float32)
    reg1 = reg0 * 0.5
    rois = jnp.asarray(
        np.stack([np.full((5, 4), 0.4), np.full((5, 4), 0.3)]), jnp.float32
    )

    variables = fused.init(jax.random.PRNGKey(0), pyr0, pyr1, reg0, reg1, rois)
    out_f = fused.apply(variables, pyr0, pyr1, reg0, reg1, rois)
    out_m = mat.apply(variables, pyr0, pyr1, reg0, reg1, rois)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_m), rtol=2e-5, atol=2e-6
    )

    # gradients agree too (both heads train identically)
    def loss(mod):
        def f(params):
            o = mod.apply({"params": params}, pyr0, pyr1, reg0, reg1, rois)
            return jnp.sum(o**2)
        return f

    g_f = jax.grad(loss(fused))(variables["params"])
    g_m = jax.grad(loss(mat))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g_f,
        g_m,
    )


def test_backbone_accepts_host_s2d_input(rng):
    """a (B, H/2, W/2, 12) input (utils.space_to_depth2 host layout) must
    run the 4x4/s1 stem with NO device transpose and match the plain
    (B, H, W, 3) path exactly -- including the tiled ImageNet
    normalization constants."""
    from detect_to_track_tpu.utils import space_to_depth2

    x = np.asarray(rng.rand(2, 32, 48, 3), np.float32)
    rn = ResNetBackbone(arch="resnet50")
    params = rn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_p = rn.apply(params, jnp.asarray(x))
    out_s = rn.apply(params, jnp.asarray(space_to_depth2(x)))
    for key in ("c3", "c4", "c5"):
        np.testing.assert_allclose(
            np.asarray(out_s[key]), np.asarray(out_p[key]), rtol=1e-4, atol=1e-5
        )
