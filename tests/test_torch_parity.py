"""numerical parity of the flax backbone vs a torch reconstruction of
torchvision's ResNet (built inline from the same state_dict -- torchvision
itself is not installed in this environment). Validates NHWC conv semantics,
padding, the dilation trick, BN folding and the converter end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from detect_to_track_tpu.models import ResNetBackbone
from detect_to_track_tpu.models.resnet import ARCHS, convert_torch_state_dict
from tests.test_models import _fake_torch_state_dict


class _TorchBottleneck(tnn.Module):
    """torchvision.models.resnet.Bottleneck reconstruction."""

    def __init__(self, cin, planes, stride, dilation, groups, base_width,
                 downsample):
        super().__init__()
        width = int(planes * base_width / 64) * groups
        out = planes * 4
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(
            width, width, 3, stride=stride, padding=dilation,
            dilation=dilation, groups=groups, bias=False,
        )
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, out, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(out),
            )
        self.relu = tnn.ReLU()

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(idt + y)


class _TorchResNet(tnn.Module):
    def __init__(self, arch):
        super().__init__()
        blocks, groups, base_width = ARCHS[arch]
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        cfgs = [(64, 1, 1), (128, 2, 1), (256, 2, 1), (512, 1, 2)]
        cin = 64
        prev_dil = 1
        for li, ((planes, stride, dil), n) in enumerate(zip(cfgs, blocks), 1):
            layers = []
            for bi in range(n):
                layers.append(
                    _TorchBottleneck(
                        cin if bi == 0 else planes * 4,
                        planes,
                        stride if bi == 0 else 1,
                        # torchvision: first block of a dilated layer uses
                        # previous_dilation (1), only blocks 1+ dilate
                        prev_dil if bi == 0 else dil,
                        groups,
                        base_width,
                        downsample=(bi == 0),
                    )
                )
            prev_dil = dil
            setattr(self, f"layer{li}", tnn.Sequential(*layers))
            cin = planes * 4

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


import pytest


@pytest.mark.parametrize("arch", ["resnet50", "resnext50_32x4d"])
def test_backbone_matches_torch_forward(arch, rng):
    """resnext exercises grouped convs (feature_group_count) end to end --
    the reference supports resnext archs too (reference models/resnet.py:14-16)."""
    sd = _fake_torch_state_dict(arch)

    tmodel = _TorchResNet(arch).eval()
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
        strict=False,
    )
    # only BN bookkeeping buffers may be absent from the fake dict
    assert not unexpected
    assert all("num_batches_tracked" in k for k in missing)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        t3, t4, t5 = (t.numpy() for t in tmodel(torch.from_numpy(x)))

    params = convert_torch_state_dict(sd, arch)
    fmodel = ResNetBackbone(arch=arch, normalize_input=False)
    out = fmodel.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))

    for got, exp, name in [
        (out["c3"], t3, "c3"),
        (out["c4"], t4, "c4"),
        (out["c5"], t5, "c5"),
    ]:
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert got.shape == exp.shape, name
        np.testing.assert_allclose(got, exp, rtol=1e-3, atol=1e-3, err_msg=name)
