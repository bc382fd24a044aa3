"""stride-reduced ResNet / ResNeXt backbone in flax (NHWC).

Re-implements the behavior of reference detect_to_track/models/resnet.py
(which wraps torchvision) TPU-first:

- torchvision `replace_stride_with_dilation=(False, False, 2)` semantics
  (reference resnet.py:19-23): layer4 keeps stride 1 with dilation-2 convs,
  so the pyramid strides are c3=8, c4=16, c5=16 (contract test:
  reference tests/test_resnet.py:9-29).
- FrozenBatchNorm2d (reference resnet.py:18) becomes a fixed per-channel
  affine (scale/bias params excluded from the optimizer); batch statistics
  never update, matching the frozen/eval behavior the reference relies on.
  The reference uses live BatchNorm2d for resnext archs only as a
  torchvision-bug workaround (resnet.py:14-16); we use the frozen affine for
  all archs and document the deviation -- with stage freezing + eval-mode
  backbones the running stats never update in the reference either.
- stage freezing via an optimizer mask (`resnet_trainable_mask`) instead of
  requires_grad_ flags (reference resnet.py:27-30): a param is trainable iff
  it lives in layerN with N >= first_trainable_stage; the stem never matches
  the reference's `layer(\\d)` regex and is always frozen.
- input normalization (ml_utils Normalizer prepended at reference
  resnet.py:34-37): ImageNet mean/std on [0,1] RGB.

Weights: `convert_torch_state_dict` maps a torchvision ResNet state_dict
(e.g. saved from torchvision.models.resnet50(pretrained=True).state_dict())
onto this module's params, folding BN stats into the frozen affine. No
network access is assumed.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# arch name -> (block counts, groups, width_per_group)
ARCHS: Dict[str, Tuple[Sequence[int], int, int]] = {
    "resnet50": ((3, 4, 6, 3), 1, 64),
    "resnet101": ((3, 4, 23, 3), 1, 64),
    "resnet152": ((3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": ((3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": ((3, 4, 23, 3), 32, 8),
}


class FrozenBatchNorm(nn.Module):
    """per-channel affine y = x * scale + bias with non-updating params
    (the folded form of torchvision FrozenBatchNorm2d)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class _StemConvKernel(nn.Module):
    """holds the stem conv kernel as a bare param so the apply-time path can
    reshape it (space-to-depth) while the param tree stays byte-identical to
    the plain `nn.Conv(name="conv1")` layout (conv1/kernel, HWIO 7x7x3x64) --
    checkpoints and `convert_torch_state_dict` need no changes."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class Bottleneck(nn.Module):
    """torchvision-compatible bottleneck block (1x1 -> 3x3 -> 1x1, x4)."""

    planes: int
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4

        y = nn.Conv(
            width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        y = FrozenBatchNorm(width, self.dtype, name="bn1")(y)
        y = nn.relu(y)

        d = self.dilation
        y = nn.Conv(
            width,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=[(d, d), (d, d)],
            kernel_dilation=(d, d),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = FrozenBatchNorm(width, self.dtype, name="bn2")(y)
        y = nn.relu(y)

        y = nn.Conv(
            out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = FrozenBatchNorm(out_ch, self.dtype, name="bn3")(y)

        if self.has_downsample:
            x = nn.Conv(
                out_ch,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            x = FrozenBatchNorm(out_ch, self.dtype, name="downsample_bn")(x)

        return nn.relu(x + y)


class ResNetBackbone(nn.Module):
    """backbone returning the {c3, c4, c5} pyramid at strides {8, 16, 16}.

    Args:
        arch: one of ARCHS (reference supports resnet*/resnext*,
            resnet.py:12-23).
        dtype: compute dtype (params stay float32).
        normalize_input: apply ImageNet normalization to [0,1] RGB inputs.
    """

    arch: str = "resnet50"
    dtype: Any = jnp.float32
    normalize_input: bool = True
    # gradient pruning at the freeze boundary: with first_trainable_stage=N,
    # a stop_gradient is inserted before layer{N}, replicating what torch
    # autograd does for requires_grad=False stages (reference resnet.py:27-30
    # freezes them; torch then never backprops through them at all). 0
    # disables the cut (gradients flow everywhere; the optimizer mask alone
    # enforces freezing -- same updates either way, more backward compute).
    first_trainable_stage: int = 0
    # rematerialize bottleneck blocks in the backward pass (trade FLOPs for
    # activation memory; enables bigger per-chip batches at 608x1200).
    remat: bool = False
    # run the stem as a 4x4/s1 conv over a 2x2 space-to-depth input instead
    # of 7x7/s2 over (H,W,3). Exactly equivalent math (the 7x7 kernel is
    # zero-padded to 8x8 and regrouped), but the MXU sees a 12-channel input
    # at half spatial. MEASURED SLOWER on this XLA version: the
    # (B,H/2,2,W/2,2,3)->(...,12) transpose lowers to a minor-dim-2 copy
    # chain costing ~46 ms/step at b8 -- far more than the ~6.4 ms input
    # pipeline it was meant to remove (PERF.md round 3). Kept off by
    # default; the exact-equivalence rewrite and its tests remain as the
    # basis for a host-side or conv-engine s2d. Falls back to the plain
    # stem when H or W is odd.
    space_to_depth_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """x: (B, H, W, 3) in [0, 1] -> {'c3','c4','c5'} NHWC feature maps.

        A (B, H/2, W/2, 12) input is accepted as a PRE-space-to-depth
        image (utils.space_to_depth2's host layout, channel = vi*6+vj*3+c):
        the stem then runs as the equivalent 4x4/s1 conv with no device
        transpose at all -- the fast form of `space_to_depth_stem` (whose
        on-device transpose is the measured regression, PERF.md round 3).
        Output dims match the plain stem exactly.
        """
        blocks, groups, base_width = ARCHS[self.arch]

        pre_s2d = x.shape[-1] == 12
        if self.normalize_input:
            # per-RGB-channel normalization; for pre-s2d input the RGB
            # channel is minor within each (vi, vj) group, so the (3,)
            # constants tile to (12,).
            mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(IMAGENET_STD, x.dtype)
            if pre_s2d:
                mean, std = jnp.tile(mean, 4), jnp.tile(std, 4)
            x = (x - mean) / std
        x = x.astype(self.dtype)

        # stem (always frozen; never matches the reference's layer regex)
        stem_w = _StemConvKernel((7, 7, 3, 64), name="conv1")()
        B, H, W = x.shape[0], x.shape[1], x.shape[2]
        if pre_s2d or (
            self.space_to_depth_stem and H % 2 == 0 and W % 2 == 0
        ):
            # y[p,q] = sum_{i,j<7} w[i,j] x[2p+i-3, 2q+j-3]. Zero-pad w to
            # 8x8 at the leading edge (w8[i']=w[i'-1]) so the tap offset
            # i'-4 = 2u+v factors exactly into a block index u in {-2..1}
            # and an intra-block index v in {0,1}: the conv becomes 4x4/s1
            # with asymmetric padding (2,1) over z[a,b,(vi,vj,c)] =
            # x[2a+vi, 2b+vj, c]. Zero padding is preserved: the only taps
            # reaching x rows < -3 carry the zero kernel row.
            if pre_s2d:
                z = x  # host already produced the (H/2, W/2, 12) layout
            else:
                z = x.reshape(B, H // 2, 2, W // 2, 2, 3)
                z = z.transpose(0, 1, 3, 2, 4, 5).reshape(
                    B, H // 2, W // 2, 12
                )
            w8 = jnp.pad(stem_w, ((1, 0), (1, 0), (0, 0), (0, 0)))
            wz = (
                w8.reshape(4, 2, 4, 2, 3, 64)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(4, 4, 12, 64)
            )
            x = jax.lax.conv_general_dilated(
                z,
                wz.astype(self.dtype),
                window_strides=(1, 1),
                padding=[(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            x = jax.lax.conv_general_dilated(
                x,
                stem_w.astype(self.dtype),
                window_strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        x = FrozenBatchNorm(64, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

        # (planes, stride, dilation) per layer; layer4 is stride-reduced with
        # dilation 2 (replace_stride_with_dilation=(False, False, 2)).
        # torchvision's _make_layer gives the FIRST block of a dilated layer
        # previous_dilation (= 1 here) -- only blocks 1+ run dilated. Getting
        # this wrong is silent (shapes match) but diverges converted real
        # torchvision/reference weights numerically.
        layer_cfg = [(64, 1, 1), (128, 2, 1), (256, 2, 1), (512, 1, 2)]
        feats = {}
        prev_dilation = 1
        for li, ((planes, stride, dilation), n_blocks) in enumerate(
            zip(layer_cfg, blocks), start=1
        ):
            if li == self.first_trainable_stage:
                # freeze boundary: everything below never receives gradients
                x = jax.lax.stop_gradient(x)
            block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
            for bi in range(n_blocks):
                x = block_cls(
                    planes=planes,
                    strides=stride if bi == 0 else 1,
                    dilation=prev_dilation if bi == 0 else dilation,
                    groups=groups,
                    base_width=base_width,
                    has_downsample=(bi == 0),
                    dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )(x)
            prev_dilation = dilation
            if li >= 2:
                out = x
                if 0 < self.first_trainable_stage and li < self.first_trainable_stage:
                    # a pyramid level produced entirely by frozen stages:
                    # consumers (e.g. the tracker's c3 correlation) cannot
                    # influence any trainable param through it, so torch
                    # never backprops there -- neither do we.
                    out = jax.lax.stop_gradient(out)
                feats[f"c{li + 1}"] = out
        return feats


def resnet_trainable_mask(params: Dict, first_trainable_stage: int) -> Dict:
    """pytree of bools: True where a backbone param is trainable.

    Parity with reference resnet.py:27-30: trainable iff the param path
    contains layerN with N >= first_trainable_stage; everything else
    (stem convs, frozen BN affines) is frozen. Non-backbone params (heads)
    are always trainable.
    """
    import re

    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path) -> bool:
        names = [getattr(p, "key", str(p)) for p in path]
        in_backbone = any(isinstance(n, str) and n == "backbone" for n in names)
        if not in_backbone:
            return True
        is_bn = any(
            isinstance(n, str) and ("bn" in n or n.endswith("_bn"))
            for n in names
        )
        if is_bn:
            return False  # frozen batch norm never trains
        for n in names:
            if isinstance(n, str):
                m = re.match(r"layer(\d)_", n)
                if m:
                    return int(m.group(1)) >= first_trainable_stage
        return False  # stem

    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [decide(path) for path, _ in flat],
    )


def convert_torch_state_dict(
    state_dict: Dict[str, "np.ndarray"], arch: str, eps: float = 1e-5
) -> Dict:
    """torchvision ResNet state_dict -> params for ResNetBackbone.

    Conv kernels go OIHW -> HWIO; BatchNorm (weight, bias, running_mean,
    running_var) folds into the FrozenBatchNorm affine:
        scale = gamma / sqrt(var + eps);  bias = beta - mean * scale.

    Accepts numpy arrays or anything np.asarray can handle (e.g. torch
    tensors via .numpy()).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    blocks, _, _ = ARCHS[arch]

    def conv(prefix):
        return {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))}

    def bn(prefix):
        gamma = sd[f"{prefix}.weight"]
        beta = sd[f"{prefix}.bias"]
        mean = sd[f"{prefix}.running_mean"]
        var = sd[f"{prefix}.running_var"]
        scale = gamma / np.sqrt(var + eps)
        return {"scale": scale, "bias": beta - mean * scale}

    params: Dict[str, Any] = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    for li, n_blocks in enumerate(blocks, start=1):
        for bi in range(n_blocks):
            p = f"layer{li}.{bi}"
            blk: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = conv(f"{p}.conv{ci}")
                blk[f"bn{ci}"] = bn(f"{p}.bn{ci}")
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample_conv"] = conv(f"{p}.downsample.0")
                blk["downsample_bn"] = bn(f"{p}.downsample.1")
            params[f"layer{li}_{bi}"] = blk
    return params
