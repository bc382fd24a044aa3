"""misc utilities (reference detect_to_track/utils.py equivalents that are
not covered by anchors.py / losses.py)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Tuple, Union

import numpy as np


def enable_compilation_cache() -> None:
    """point jax at a persistent compilation cache directory.

    The full joint graph compiles in ~10-15 min through a remote-compile
    tunnel; a warm cache turns repeat runs into seconds of setup. Harmless
    locally. Directory: $JAX_COMPILATION_CACHE_DIR, else
    <tempdir>/d2t_jaxcache. Single shared implementation for bench.py,
    __graft_entry__.py and the tools/ benches."""
    import os
    import tempfile

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(tempfile.gettempdir(), "d2t_jaxcache"),
            ),
        )
    except Exception:
        pass  # older jax without the option: cold compiles, still correct


def image_to_input(
    im, net_input_shape: Union[int, Tuple[int, int]], as_uint8: bool = False
) -> np.ndarray:
    """PIL image -> (H, W, 3) network input.

    as_uint8=False: float32 in [0, 1] (the reference's torchvision
    Resize + ToTensor, reference utils.py:171-178; normalization lives in
    the backbone, matching the reference's Normalizer placement).
    as_uint8=True: the resized uint8 array itself -- the /255 runs on
    device (forward_losses), which is the exact same fp32 op, with 4x less
    host->device transfer.
    """
    from PIL import Image

    if isinstance(net_input_shape, int):
        net_input_shape = (net_input_shape, net_input_shape)
    h, w = net_input_shape
    im = im.convert("RGB").resize((w, h), Image.BILINEAR)
    if as_uint8:
        return np.asarray(im, np.uint8)
    return np.asarray(im, np.float32) / 255.0


def promote_mixed_image_dtypes(arrays, xp=np):
    """normalize a mixed uint8/float image-array list to a single dtype:
    uint8 entries become float32/255. np.stack on a mixed list would
    silently promote uint8 VALUES 0-255 into the float batch. The
    single-dtype case passes through untouched (uint8 stays uint8 for the
    transfer-lean device-/255 path). xp=jnp applies the same rule to
    device arrays without downloading them (Detector._pack_input)."""
    if len({a.dtype for a in arrays}) <= 1:
        return arrays
    u8 = xp.uint8
    return [
        a.astype(xp.float32) / xp.float32(255.0)
        if a.dtype == u8
        else a.astype(xp.float32)
        for a in arrays
    ]


def get_subset_lengths(dataset_length: int, subset_length: int):
    """lengths of dataset splits (reference utils.py:181-187).

    QUIRK (reference-faithful): an evenly-divisible length appends a
    trailing 0-length subset, exactly like the reference (which also never
    calls this function anywhere)."""
    n_full = dataset_length // subset_length
    return n_full * [subset_length] + [dataset_length % subset_length]


@contextlib.contextmanager
def step_timer(store: dict, key: str) -> Iterator[None]:
    """wall-clock timing of trainer phases (the reference has no profiling
    at all, SURVEY.md §5); pairs with jax.profiler traces in the trainer."""
    t0 = time.perf_counter()
    yield
    store[key] = store.get(key, 0.0) + time.perf_counter() - t0


def split_pairs(x):
    """(2B, ...) interleaved frame pairs -> ((B, ...), (B, ...)) via
    reshape+index instead of x[0::2]/x[1::2].

    Equivalent math, but a batch-stride-2 slice composed with the tracker's
    spatial-stride-2 c3 downsample miscompiles on TPU at batch > 4 pairs
    (the device faults at runtime; isolated by bisection -- either strided
    slice alone is fine). The reshape groups adjacent frames without any
    strided access, and is cheaper anyway.
    """
    r = x.reshape(x.shape[0] // 2, 2, *x.shape[1:])
    return r[:, 0], r[:, 1]


def space_to_depth2(x):
    """host-side 2x2 space-to-depth: (..., H, W, 3) -> (..., H/2, W/2, 12).

    Channel layout contract (shared with ResNetBackbone's pre-s2d stem):
    z[..., a, b, vi*6 + vj*3 + c] = x[..., 2a+vi, 2b+vj, c]. Runs on the
    HOST (numpy) so the device never sees the (B,H/2,2,W/2,2,3) transpose,
    which lowers to a minor-dim-2 copy chain on this XLA version
    (PERF.md round 3, space-to-depth stem). dtype is preserved (uint8
    frames stay uint8 -- same bytes through the tunnel as the plain
    layout).
    """
    *lead, h, w, c = x.shape
    if h % 2 or w % 2 or c != 3:
        raise ValueError(f"space_to_depth2 needs even HxW and C=3, got {x.shape}")
    z = np.asarray(x).reshape(*lead, h // 2, 2, w // 2, 2, c)
    z = np.moveaxis(z, -4, -3)  # (..., h/2, w/2, 2, 2, c)
    return np.ascontiguousarray(z).reshape(*lead, h // 2, w // 2, 4 * c)


def depth_to_space2(z):
    """inverse of space_to_depth2: (..., H/2, W/2, 12) -> (..., H, W, 3)."""
    *lead, h2, w2, c12 = z.shape
    if c12 != 12:
        raise ValueError(f"depth_to_space2 needs C=12, got {z.shape}")
    x = np.asarray(z).reshape(*lead, h2, w2, 2, 2, 3)
    x = np.moveaxis(x, -3, -4)  # (..., h2, 2, w2, 2, 3)
    return np.ascontiguousarray(x).reshape(*lead, h2 * 2, w2 * 2, 3)


def host_value(x):
    """host (numpy) value of a pytree of arrays, multi-process safe.

    `jax.device_get` requires fully-addressable arrays; under a multi-host
    runtime a REPLICATED global array is not (other hosts' devices are
    remote) but every local shard already holds the full value, so it is
    read instead. Single-process (and plain host values) this is exactly
    `jax.device_get`. Used by the trainer's metric/checkpoint reads and
    re-exported as `parallel.local_value`.
    """
    import jax  # lazy: keep this module importable host-side without jax

    def leaf(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            if not a.sharding.is_fully_replicated:
                # a local shard of a batch-SHARDED global array is not the
                # value; returning it would be silent data loss.
                raise ValueError(
                    "host_value needs a replicated (or fully addressable) "
                    f"array; got sharding {a.sharding} -- gather sharded "
                    "results with jax.experimental.multihost_utils."
                    "process_allgather instead"
                )
            return np.asarray(a.addressable_data(0))
        return jax.device_get(a)

    return jax.tree_util.tree_map(leaf, x)
