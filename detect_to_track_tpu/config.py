"""configuration system.

Accepts the reference's flat UPPER_CASE YAML schema (reference:
cfg/default.yaml:1-50, loaded at train.py:17-20) and extends it with the
static-shape knobs a TPU build needs (padded label / ROI / track capacities)
plus mesh/parallelism settings. Unknown keys raise, so a reference config file
is always valid here and typos are caught early.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional, Tuple

import yaml


@dataclasses.dataclass
class Config:
    """all hyperparameters. Defaults match reference cfg/default.yaml."""

    # --- data (reference cfg/default.yaml:1-10) ---
    DATA_ROOT: str = ""
    VID_PARTITION_SIZES: Tuple[float, float] = (0.8, 0.2)
    TRN_SIZE: int = 10000
    VAL_SIZE: int = 5000
    REP_SIZE: int = 15
    P_DET: float = 0.5  # probability of sampling from DET instead of VID
    A: float = 0.8  # shape parameter for discrete laplacian distribution
    N_CLASSES: int = 30
    BATCH_SIZE: int = 4

    # --- anchors (cfg/default.yaml:12-14) ---
    ANCHOR_AREAS: Tuple[float, ...] = (0.001, 0.004, 0.016, 0.064, 0.256)
    ANCHOR_ASPECT_RATIOS: Tuple[float, ...] = (0.5, 1.0, 2.0)

    # --- encoding (cfg/default.yaml:16-18) ---
    ENCODER_IOU_THRESH: float = 0.5
    ENCODER_IOU_MARGIN: float = 0.2

    # --- region filtering (cfg/default.yaml:20-23) ---
    TRAIN_ROI_CONF_THRESH: float = 0.3
    TRAIN_MAX_ROIS: int = 3000
    TRAIN_NMS_IOU_THRESH: float = 0.5

    # --- detector settings (cfg/default.yaml:25-29) ---
    EVAL_ROI_CONF_THRESH: float = 0.3
    EVAL_MAX_ROIS: int = 3000
    EVAL_NMS_IOU_THRESH: float = 0.3
    EVAL_RCNN_CONF_THRESH: float = 0.3

    # --- loss (cfg/default.yaml:31-34) ---
    ALPHA: float = 0.25
    GAMMA: float = 2.0
    COEFS: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0e-4)

    # --- optimizer (cfg/default.yaml:36-39) ---
    SGD_KWARGS: Dict[str, float] = dataclasses.field(
        default_factory=lambda: {"lr": 1e-2, "weight_decay": 1e-4, "momentum": 0.9}
    )

    PATIENCE: int = 1000  # iterations with no improvement before quitting

    # --- model (cfg/default.yaml:43-50) ---
    BACKBONE_ARCH: str = "resnet50"
    FIRST_TRAINABLE_STAGE: int = 3
    INPUT_SHAPE: Tuple[int, int] = (608, 1200)
    FM_STRIDE: int = 16
    D_MAX: int = 8  # max displacement for pointwise correlation
    K: int = 7  # pooled map height and width

    # =====================================================================
    # TPU-native extensions (not in the reference). The reference keeps
    # dynamic numbers of labels/proposals/tracks and round-trips them through
    # numpy (reference trainer.py:178-207); XLA needs static shapes, so these
    # are the padded capacities. All downstream math carries validity masks
    # so results are unchanged for instances within capacity.
    # =====================================================================
    MAX_LABELS: int = 32  # per-frame ground-truth object capacity
    # proposals entering on-device NMS. None (default) honors the reference's
    # capacity keys: TRAIN_MAX_ROIS for training, EVAL_MAX_ROIS for eval
    # (the reference applies MaxDetFilter(max_rois) BEFORE NMS, reference
    # trainer.py:98-102 / inference.py:37-41), rounded up to a lane multiple
    # and capped at |A|. Set explicitly to trade recall for speed.
    PRE_NMS_TOPK: Optional[int] = None
    MAX_ROIS: int = 256  # NMS survivors entering RCNN (static cap; the
    # reference keeps ALL survivors -- see DESIGN.md "ROI capacity" for the
    # survivor-count measurement justifying this bound)
    MAX_DETS: int = 128  # final detections per frame after RCNN filtering
    # (effective capacity is min(MAX_DETS, MAX_ROIS) -- see `max_dets`)

    # quirk flags: the reference has documented bugs/quirks; each can be
    # replicated (default, for parity) or fixed.
    # reference encoding.py:147 uses `best_iou < thresh` where the docstring
    # says `>`. False -> replicate the reference; True -> use `>`.
    FIX_REGION_MASK_POLARITY: bool = False
    # reference ps_roipool_cuda.cu:58 indexes channel (t+1)*(i*k+j) instead of
    # the paper's t*k^2 + i*k + j. False -> replicate; True -> paper layout.
    FIX_PSROI_CHANNEL_MAP: bool = False

    # compute precision: "float32" or "bfloat16" for backbone/head matmuls.
    COMPUTE_DTYPE: str = "bfloat16"
    # input pipeline: when True the HOST packs frames 2x2 space-to-depth
    # (utils.space_to_depth2, (B,2,H,W,3) -> (B,2,H/2,W/2,12), uint8) and
    # the backbone runs its exactly-equivalent 4x4/s1 stem on the pre-s2d
    # layout. Removes the device-side (B,H,W,3) layout copy AND the
    # layout-bound 3-channel 7x7/s2 stem conv from the step without the
    # on-device transpose that made `space_to_depth_stem` a regression
    # (PERF.md round 3). Same bytes through the tunnel. Requires even
    # INPUT_SHAPE.
    HOST_S2D: bool = False
    # BatchLoader decode fan-out: JPEG decode + resize threads per batch.
    # 0 = auto (min(BATCH_SIZE, cpus)), 1 = serial. Warm-cache pack is
    # ~10 ms/frame/core at 608x1200 vs ~9 ms/frame device step at b8: a
    # 1-core host is input-bound even with the prefetch overlap, so
    # multi-core hosts should fan out (PIL decode/resize release the GIL).
    LOADER_WORKERS: int = 0
    # rematerialize backbone blocks in backward (memory for FLOPs).
    REMAT: bool = False
    # gradient accumulation: split each batch into GRAD_ACCUM microbatches
    # scanned sequentially inside the ONE jitted step (only one
    # microbatch's activations live at a time -> effective batches beyond
    # HBM; combine with REMAT for the biggest headroom). Dense-mean loss
    # components compose exactly; masked-mean ones (RCNN/track) weight
    # microbatches equally, like the reference's per-instance loop.
    # BATCH_SIZE must divide by it.
    GRAD_ACCUM: int = 1
    # failure detection: what to do when a training step yields a non-finite
    # loss ("warn" | "raise" | "skip"). The reference would train on NaNs
    # silently (no checks anywhere, SURVEY.md §5).
    NAN_POLICY: str = "warn"
    # failure PREVENTION: host-RSS watchdog. After each epoch the trainer
    # compares the process peak RSS against this bound (GB); past it, it
    # checkpoints and invokes `trainer.on_host_memory_limit` (train.py
    # re-execs itself with --resume). Guards long runs against host-side
    # memory growth outside our control -- measured: the remote-TPU (axon
    # tunnel) client retains EVERY host->device transfer's bytes until
    # process exit (~batch-size per step; PERF.md "host memory"), which
    # OOM-killed a 2000-step run at 130 GB. -1 = auto (70% of MemTotal),
    # 0 = disabled, >0 = explicit bound in GB.
    HOST_RSS_LIMIT_GB: float = -1.0

    # parallelism: data-parallel mesh size (1 = single chip).
    NUM_DEVICES: int = 1
    MESH_AXES: Tuple[str, ...] = ("data",)
    # >1 calls jax.distributed.initialize() at startup so the data mesh
    # spans hosts (DCN). The multi-process runtime is validated by
    # tests/test_multihost.py (2 processes, gloo collectives); see train.py.
    NUM_HOSTS: int = 1

    # observability / checkpointing
    OUTPUT_DIR: str = "output"
    LOG_EVERY: int = 10
    CHECKPOINT_KEEP: int = 3
    # when set, the trainer wraps each training epoch in a jax.profiler
    # trace written to this directory (perfetto-compatible).
    PROFILE_DIR: str = ""

    def __post_init__(self) -> None:
        # value validation (unknown KEYS already raise in load_config; bad
        # VALUES must fail here, not surface as a shape error deep inside
        # the first jitted step or a silent float32 fallback).
        h, w = self.INPUT_SHAPE
        if h % self.FM_STRIDE or w % self.FM_STRIDE:
            raise ValueError(
                f"INPUT_SHAPE {self.INPUT_SHAPE} must be a multiple of "
                f"FM_STRIDE {self.FM_STRIDE}: the anchor grid is built from "
                f"INPUT_SHAPE // FM_STRIDE and would mismatch the backbone's "
                f"actual feature map"
            )
        if self.HOST_S2D and (h % 2 or w % 2):
            raise ValueError(
                f"HOST_S2D requires even INPUT_SHAPE, got {self.INPUT_SHAPE}"
            )
        if self.COMPUTE_DTYPE not in ("float32", "bfloat16"):
            raise ValueError(
                f"COMPUTE_DTYPE must be 'float32' or 'bfloat16', got "
                f"{self.COMPUTE_DTYPE!r} (e.g. 'bf16' would silently train "
                f"in float32 otherwise)"
            )
        if self.NAN_POLICY not in ("warn", "raise", "skip"):
            raise ValueError(
                f"NAN_POLICY must be 'warn', 'raise' or 'skip', got "
                f"{self.NAN_POLICY!r}"
            )
        if not self.A > 0:
            raise ValueError(
                f"A (discrete-Laplacian stride shape) must be > 0, got "
                f"{self.A}: a=0 overflows the inverse-CDF draw mid-training "
                f"and a<0 is not a distribution"
            )

    @property
    def compute_dtype(self):
        """the jnp dtype for COMPUTE_DTYPE (one definition for the decode
        that was previously copy-pasted across every entry point)."""
        import jax.numpy as jnp

        return jnp.bfloat16 if self.COMPUTE_DTYPE == "bfloat16" else jnp.float32

    @property
    def n_anchors_per_cell(self) -> int:
        return len(self.ANCHOR_AREAS) * len(self.ANCHOR_ASPECT_RATIOS)

    @property
    def fm_shape(self) -> Tuple[int, int]:
        h, w = self.INPUT_SHAPE
        return (h // self.FM_STRIDE, w // self.FM_STRIDE)

    @property
    def n_anchors(self) -> int:
        fh, fw = self.fm_shape
        return fh * fw * self.n_anchors_per_cell

    @property
    def max_dets(self) -> int:
        """effective per-frame detection capacity. At most MAX_ROIS proposals
        survive NMS, so compacting to more than MAX_ROIS slots is impossible
        (lax.top_k requires k <= input size) and pointless; small configs can
        shrink MAX_ROIS without also having to lower MAX_DETS."""
        return min(self.MAX_DETS, self.MAX_ROIS)

    def _derived_topk(self, max_rois: int) -> int:
        if self.PRE_NMS_TOPK is not None:
            return min(self.PRE_NMS_TOPK, self.n_anchors)
        return min(-(-max_rois // 128) * 128, self.n_anchors)

    @property
    def pre_nms_topk_train(self) -> int:
        """proposals entering NMS during training (honors TRAIN_MAX_ROIS)."""
        return self._derived_topk(self.TRAIN_MAX_ROIS)

    @property
    def pre_nms_topk_eval(self) -> int:
        """proposals entering NMS at inference (honors EVAL_MAX_ROIS)."""
        return self._derived_topk(self.EVAL_MAX_ROIS)

    def _derived_cap(self, max_rois: int) -> int:
        """the EXACT MaxDetFilter capacity (reference trainer.py:98-102):
        pre_nms_topk_* is lane-padded (3000 -> 3072 slots) but only this
        many score-descending slots may enter NMS."""
        if self.PRE_NMS_TOPK is not None:
            return min(self.PRE_NMS_TOPK, self.n_anchors)
        return min(max_rois, self.n_anchors)

    @property
    def pre_nms_cap_train(self) -> int:
        return self._derived_cap(self.TRAIN_MAX_ROIS)

    @property
    def pre_nms_cap_eval(self) -> int:
        return self._derived_cap(self.EVAL_MAX_ROIS)

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


_TUPLE_FIELDS = {
    "VID_PARTITION_SIZES",
    "ANCHOR_AREAS",
    "ANCHOR_ASPECT_RATIOS",
    "COEFS",
    "INPUT_SHAPE",
    "MESH_AXES",
}


def load_config(path: Optional[str] = None, **overrides) -> Config:
    """load a Config from a flat-key YAML file (reference schema) plus
    keyword overrides."""
    raw: Dict = {}
    if path is not None:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
    raw.update(overrides)

    valid = {f.name for f in dataclasses.fields(Config)}
    unknown = set(raw) - valid
    if unknown:
        raise KeyError(f"unknown config keys: {sorted(unknown)}")

    for k in list(raw):
        if k in _TUPLE_FIELDS and isinstance(raw[k], (list, tuple)):
            raw[k] = tuple(raw[k])
    return Config(**raw)


def save_config(cfg: Config, path: str) -> None:
    d = dataclasses.asdict(cfg)
    for k in _TUPLE_FIELDS:
        d[k] = list(d[k])
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)
