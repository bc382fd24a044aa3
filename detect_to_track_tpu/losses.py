"""losses for detection + tracking, and the DTLoss accumulator.

Parity with reference detect_to_track/loss.py and utils.py:12-111, re-shaped
for fixed-size masked arrays so everything runs inside one jitted step:

- FocalLoss (loss.py:13-47): operates on ALREADY-SOFTMAXED probabilities
  (the reference subclasses nn.BCELoss); log terms are clamped at -100 to
  match torch.nn.BCELoss semantics.
- BBoxLoss (loss.py:50-70): smooth-L1 (beta=1) meaned over the 4 coords,
  zeroed at negative anchors (c_star == 0).
- RPNLoss (loss.py:73-108): (lw * focal).mean() + bbox.mean() over all
  anchors of the batch.
- RCNNLoss (loss.py:111-156): masked mean over valid regions (the reference
  concatenates the pair's dynamic region lists; we carry a validity mask);
  zero when no region is valid (loss.py:137-138).
- TrackLoss (loss.py:159-182): masked smooth-L1 mean, zero when empty.
- DTLoss (utils.py:12-111): pytree accumulator with the same component
  names, scalar reduction and compact scientific-notation repr.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

_LOG_CLAMP = -100.0  # torch.nn.BCELoss clamps log terms at -100


def _safe_log(x: jnp.ndarray) -> jnp.ndarray:
    """log clamped at -100 (torch BCELoss semantics) with a NaN-free
    gradient at x == 0: maximum() alone still evaluates d(log)/dx = 1/x
    there, and 0 * inf = NaN would poison the backward."""
    safe = jnp.where(x <= 0.0, 1.0, x)
    return jnp.where(x <= 0.0, _LOG_CLAMP, jnp.maximum(jnp.log(safe), _LOG_CLAMP))


def _bce(p: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """elementwise binary cross-entropy on probabilities, torch-compatible."""
    return -(y * _safe_log(p) + (1.0 - y) * _safe_log(1.0 - p))


def focal_loss(
    c_hat: jnp.ndarray, c_star: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0
) -> jnp.ndarray:
    """focal loss on class PROBABILITIES (https://arxiv.org/abs/1708.02002).

    Args:
        c_hat: (..., C) softmaxed class scores.
        c_star: (...,) int ground-truth classes.

    Returns:
        fl: (...,) mean focal loss across classes (reference loss.py:45).
    """
    n_classes = c_hat.shape[-1]
    onehot = jax.nn.one_hot(c_star, n_classes, dtype=c_hat.dtype)
    pt = jnp.where(onehot == 1, 1.0 - c_hat, c_hat)
    at = jnp.where(onehot == 1, 1.0 - alpha, alpha)
    bce = _bce(c_hat, onehot)
    fl = (pt**gamma) * at * bce
    return fl.mean(axis=-1)


def smooth_l1(x: jnp.ndarray, y: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """elementwise smooth-L1 (torch.nn.SmoothL1Loss, reduction='none')."""
    d = jnp.abs(x - y)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def bbox_loss(
    b_hat: jnp.ndarray, b_star: jnp.ndarray, c_star: jnp.ndarray
) -> jnp.ndarray:
    """(..., 4) offsets -> (...,) smooth-L1 meaned over coords, zeroed at
    negative anchors (reference loss.py:56-70)."""
    l1 = smooth_l1(b_hat, b_star).mean(axis=-1)
    return jnp.where(c_star == 0, 0.0, l1)


def rpn_loss(
    lw: jnp.ndarray,
    o_hat: jnp.ndarray,
    o_star: jnp.ndarray,
    b_hat: jnp.ndarray,
    b_star: jnp.ndarray,
    alpha: float,
    gamma: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RPN objectness + regression loss (reference loss.py:73-108).

    Args:
        lw: (B, |A|) anchorwise loss weights.
        o_hat: (B, |A|, 2) softmaxed objectness.
        o_star: (B, |A|) int objectness targets in {0, 1}.
        b_hat / b_star: (B, |A|, 4).
    """
    o_l = (lw * focal_loss(o_hat, o_star, alpha, gamma)).mean()
    b_l = bbox_loss(b_hat, b_star, o_star).mean()
    return o_l, b_l


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean over entries where mask is True; 0 if nothing is valid.
    NaN-proof: masked-out entries are dropped with `where`, not multiplied,
    so garbage in padding slots (e.g. targets encoded against zero-size
    padding boxes) cannot poison the mean."""
    mask = mask.astype(bool)
    count = mask.sum().astype(x.dtype)
    total = jnp.where(mask, x, 0.0).sum()
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def rcnn_loss(
    c_hat: jnp.ndarray,
    c_star: jnp.ndarray,
    b_hat: jnp.ndarray,
    b_star: jnp.ndarray,
    valid: jnp.ndarray,
    alpha: float,
    gamma: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RCNN classification + regression loss over regions pooled from all
    frames of the batch (reference loss.py:111-156; the reference gets its
    cross-frame pooling by concatenation at trainer.py:202-211, we get it by
    flattening the padded region axis and masking).

    Args:
        c_hat: (N, C) softmaxed class scores.
        c_star: (N,) int class targets.
        b_hat / b_star: (N, 4).
        valid: (N,) bool -- True for real (non-padding) regions.
    """
    c_l = _masked_mean(focal_loss(c_hat, c_star, alpha, gamma), valid)
    b_l = _masked_mean(bbox_loss(b_hat, b_star, c_star), valid)
    return c_l, b_l


def track_loss(t_hat: jnp.ndarray, t_star: jnp.ndarray, valid: jnp.ndarray):
    """smooth-L1 track regression loss (reference loss.py:159-182); mean over
    all coords of valid tracks, 0 when no track is valid."""
    l1 = smooth_l1(t_hat, t_star).mean(axis=-1)  # (N,)
    return _masked_mean(l1, valid)


@struct.dataclass
class DTLoss:
    """the five named loss components + instance count
    (reference utils.py:12-111). A jit-friendly pytree: accumulate with `+`,
    reduce with `to_scalar(coefs)`."""

    o: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(()))
    b_rpn: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(()))
    c: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(()))
    b_rcnn: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(()))
    t: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(()))
    count: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(()))

    @classmethod
    def single(cls, o, b_rpn, c, b_rcnn, t) -> "DTLoss":
        """one instance's losses (count = 1)."""
        return cls(o=o, b_rpn=b_rpn, c=c, b_rcnn=b_rcnn, t=t, count=jnp.ones(()))

    def __add__(self, other: "DTLoss") -> "DTLoss":
        return jax.tree_util.tree_map(lambda a, b: a + b, self, other)

    def to_scalar(self, coefs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """linear combination / count (reference utils.py:65-75)."""
        vec = jnp.stack([self.o, self.b_rpn, self.c, self.b_rcnn, self.t])
        if coefs is None:
            coefs = jnp.ones((5,), vec.dtype)
        coefs = jnp.asarray(coefs, vec.dtype)
        # empty accumulator (count==0) reduces to 0, not 0/0=NaN: an empty
        # validation split must not poison logged metrics or best-ckpt
        # comparisons (NaN compares False against everything).
        return jnp.where(
            self.count > 0, jnp.dot(coefs, vec) / jnp.maximum(self.count, 1), 0.0
        )

    def asdict(self) -> dict:
        """component dict with the reference's short keys
        (reference utils.py:90-98)."""
        return {
            "o": self.o,
            "a": self.b_rpn,
            "c": self.c,
            "r": self.b_rcnn,
            "t": self.t,
        }

    def __repr__(self) -> str:
        """compact scientific notation (reference utils.py:100-111)."""
        count = max(float(self.count), 1.0)
        return " ".join(
            re.sub(
                r"e([+-])0(\d)",
                lambda m: f"e{m.group(1)}{m.group(2)}",
                f"{k}:{float(v) / count:.2e}",
            )
            for k, v in self.asdict().items()
        )
