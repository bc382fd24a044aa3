"""serialized inference export (serving path).

Exports the full jitted pair-detection graph (backbone -> RPN -> NMS ->
R-FCN -> tracker, weights baked in) as a portable StableHLO artifact via
jax.export. A serving process can load and run it without the model code --
a deployment story the reference (research-script-only) does not have.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from .anchors import build_anchors
from .config import Config
from .inference import detect_pairs_batched
from .models import DetectTrackModule


def export_detector(
    model: DetectTrackModule,
    variables,
    cfg: Config,
    path: str,
    pair_batch: int = 1,
    platforms=None,
) -> None:
    """serialize the batched pair-detection graph to `path`.

    The exported function signature is images (P, 2, H, W, 3) float32 ->
    PairDetections tuple (confs, boxes, valid, tracks); weights and anchors
    are closed over as constants. Under cfg.HOST_S2D the input spec is the
    host pre-s2d layout (P, 2, H/2, W/2, 12) instead (the serving host
    applies utils.space_to_depth2 before the call, like Detector does).
    """
    from jax import export as jexport

    anchors = jnp.asarray(
        build_anchors(cfg.fm_shape, cfg.ANCHOR_AREAS, cfg.ANCHOR_ASPECT_RATIOS)
    )

    def fn(images):
        out = detect_pairs_batched(model, variables, images, anchors, cfg)
        return tuple(out)

    h, w = cfg.INPUT_SHAPE
    if getattr(cfg, "HOST_S2D", False):
        spec = jax.ShapeDtypeStruct(
            (pair_batch, 2, h // 2, w // 2, 12), jnp.float32
        )
    else:
        spec = jax.ShapeDtypeStruct((pair_batch, 2, h, w, 3), jnp.float32)
    # platforms: jax.export pins the artifact to the exporting machine's
    # backend by default -- exporting on a TPU host for CPU serving (or
    # vice versa) needs an explicit list, e.g. platforms=("tpu", "cpu").
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exported = jexport.export(jax.jit(fn), **kw)(spec)
    Path(path).write_bytes(exported.serialize())


def load_detector(path: str):
    """load an exported detector; returns a callable
    images (P, 2, H, W, 3) -> (confs, boxes, valid, tracks)."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())

    def call(images):
        images = jnp.asarray(images)
        if jnp.issubdtype(images.dtype, jnp.integer):
            # the artifact was traced for float32 [0,1] inputs; the live
            # Detector's on-device uint8-normalize branch does NOT exist in
            # it, so a bare float cast would feed 0-255 values into a [0,1]
            # graph with no error. ANY integer dtype (uint8 frames, int32
            # decoded video) means 0-255 values.
            images = images.astype(jnp.float32) / 255.0
        return exported.call(images.astype(jnp.float32))

    return call
