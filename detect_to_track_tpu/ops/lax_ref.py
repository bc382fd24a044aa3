"""pure-lax oracle implementations of the three native ops.

These pin the exact semantics of the reference CUDA kernels (cited below) in
portable, differentiable jnp code. They are the golden references the fast
paths are tested against, and a CPU fallback the reference never had.

Replicated quirks (see SURVEY.md §2 #8-10):
- PSROIPool channel selector is (t+1)*(i*k + j), NOT the paper's
  t*k^2 + i*k + j (reference ps_roipool_cuda.cu:58); channels are reused
  across targets and channel 0 only feeds bin (0, 0). Gated by `paper_layout`.
- PSROIPool guards the bin average with numel > 0 so fully out-of-bounds
  rois pool to exactly zero (ps_roipool_cuda.cu:67-69); the reference ROIPool
  kernel does NOT guard (roipool_cuda.cu:61 divides unconditionally -> NaN for
  degenerate bins). We guard BOTH and document the deviation: NaN poisoning
  of the training step is never desirable, and no reference test exercises
  the NaN path.
- ROIPool clamps the roi's top-left corner to [0,1] BEFORE laying out bins
  (roipool_cuda.cu:41-42); PSROIPool does not (ps_roipool_cuda.cu:45-46).
- PointwiseCorrelation's displacement window is
  di in [max(0, i-d), min(i+d, H)) stepping by `stride` from the lower bound
  (pointwise_correlation_cuda.cu:92-93): the +d displacement row/col of the
  (2d+1)^2 output stays zero, and for stride > 1 the sampled displacement
  phase shifts near the top/left image boundary.

Layout: feature maps are NHWC / HWC (TPU-native); the channel axis is last.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bin_bounds(rois, r_hw: int, fm_h: int, fm_w: int, clamp_corner: bool):
    """fractional ijhw rois -> integer bin pixel bounds.

    Returns i0, i1 (|R|, k) and j0, j1 (|R|, k) int32 arrays, following the
    floor/ceil-of-clamped-coordinate geometry of roipool_cuda.cu:38-50 /
    ps_roipool_cuda.cu:42-54.
    """
    r_i, r_j, r_h, r_w = (rois[:, n] for n in range(4))  # (|R|,)
    b_h = (r_h / r_hw)[:, None]  # (|R|, 1)
    b_w = (r_w / r_hw)[:, None]

    top = r_i - r_h / 2
    left = r_j - r_w / 2
    if clamp_corner:  # ROIPool only (roipool_cuda.cu:41-42)
        top = jnp.clip(top, 0.0, 1.0)
        left = jnp.clip(left, 0.0, 1.0)

    steps = jnp.arange(r_hw, dtype=rois.dtype) + 0.5  # (k,)
    b_i = top[:, None] + steps[None, :] * b_h  # (|R|, k) bin centers
    b_j = left[:, None] + steps[None, :] * b_w

    # epsilon-robust floor/ceil: a bin edge landing EXACTLY on a pixel
    # boundary (e.g. 0.25 * 8 = 2.0) is 1-ulp unstable under XLA fusion --
    # the same expression gave ceil=2 eagerly and ceil=3 jitted. Nudging by
    # eps makes knife-edge bins deterministic; eps is far below any real
    # geometry difference (the CUDA reference is equally arbitrary at these
    # edges, roipool_cuda.cu:38-50).
    eps = 1e-5
    i0 = jnp.floor(jnp.clip(b_i - b_h / 2, 0.0, 1.0) * fm_h + eps).astype(jnp.int32)
    i1 = jnp.ceil(jnp.clip(b_i + b_h / 2, 0.0, 1.0) * fm_h - eps).astype(jnp.int32)
    j0 = jnp.floor(jnp.clip(b_j - b_w / 2, 0.0, 1.0) * fm_w + eps).astype(jnp.int32)
    j1 = jnp.ceil(jnp.clip(b_j + b_w / 2, 0.0, 1.0) * fm_w - eps).astype(jnp.int32)
    return i0, i1, j0, j1


def _range_masks(i0, i1, size: int):
    """(|R|, k) int bounds -> (|R|, k, size) {0,1} membership masks."""
    p = jnp.arange(size)[None, None, :]
    return ((p >= i0[:, :, None]) & (p < i1[:, :, None])).astype(jnp.float32)


def roi_pool_ref(fm: jnp.ndarray, rois: jnp.ndarray, r_hw: int) -> jnp.ndarray:
    """average ROI pooling oracle (reference roipool_cuda.cu:6-63).

    NOTE: despite the reference's Fast-R-CNN citation this is AVERAGE (not
    max) pooling -- the CUDA kernel accumulates then divides.

    Args:
        fm: (H, W, C) feature map.
        rois: (|R|, 4) fractional ijhw rois.

    Returns:
        out: (|R|, r_hw, r_hw, C) pooled features (reference returns
            (|R|, C, k, k); we keep channels last).
    """
    fm_h, fm_w, _ = fm.shape
    i0, i1, j0, j1 = _bin_bounds(rois, r_hw, fm_h, fm_w, clamp_corner=True)
    rmask = _range_masks(i0, i1, fm_h)  # (|R|, k, H)
    cmask = _range_masks(j0, j1, fm_w)  # (|R|, k, W)

    sums = jnp.einsum("rih,hwc,rjw->rijc", rmask, fm.astype(jnp.promote_types(fm.dtype, jnp.float32)), cmask)
    numel = ((i1 - i0)[:, :, None] * (j1 - j0)[:, None, :]).astype(jnp.float32)
    # deviation: reference divides unconditionally (NaN for empty bins,
    # roipool_cuda.cu:61); we return 0 like the PSROIPool kernel does.
    safe = jnp.maximum(numel, 1.0)[..., None]
    return jnp.where(numel[..., None] > 0, sums / safe, 0.0)


def ps_roi_pool_channel_map(n_targets: int, r_hw: int, paper_layout: bool):
    """(t, i, j) -> feature-map channel. Default replicates the reference
    quirk (ps_roipool_cuda.cu:58); paper_layout=True gives R-FCN's
    t*k^2 + i*k + j."""
    t = jnp.arange(n_targets)[:, None, None]
    i = jnp.arange(r_hw)[None, :, None]
    j = jnp.arange(r_hw)[None, None, :]
    if paper_layout:
        return (t * r_hw * r_hw + i * r_hw + j).astype(jnp.int32)
    return ((t + 1) * (i * r_hw + j)).astype(jnp.int32)


def ps_roi_pool_ref(
    fm: jnp.ndarray,
    rois: jnp.ndarray,
    n_targets: int,
    r_hw: int,
    paper_layout: bool = False,
) -> jnp.ndarray:
    """position-sensitive average ROI pooling oracle
    (reference ps_roipool_cuda.cu:10-71).

    Args:
        fm: (H, W, n_targets * r_hw^2) feature map (channels last).
        rois: (|R|, 4) fractional ijhw rois.

    Returns:
        out: (|R|, n_targets, r_hw, r_hw).
    """
    fm_h, fm_w, _ = fm.shape
    i0, i1, j0, j1 = _bin_bounds(rois, r_hw, fm_h, fm_w, clamp_corner=False)
    rmask = _range_masks(i0, i1, fm_h)  # (|R|, k, H)
    cmask = _range_masks(j0, j1, fm_w)  # (|R|, k, W)

    ch = ps_roi_pool_channel_map(n_targets, r_hw, paper_layout)  # (T, k, k)
    fm_g = fm.astype(jnp.promote_types(fm.dtype, jnp.float32))[:, :, ch]  # (H, W, T, k, k)

    sums = jnp.einsum("rih,hwtij,rjw->rtij", rmask, fm_g, cmask)
    numel = ((i1 - i0)[:, :, None] * (j1 - j0)[:, None, :]).astype(jnp.float32)
    numel = numel[:, None, :, :]  # (|R|, 1, k, k)
    return jnp.where(numel > 0, sums / jnp.maximum(numel, 1.0), 0.0)


def correlation_window_masks(
    size: int, offset: int, d_max: int, stride: int
) -> jnp.ndarray:
    """(size,) {0,1} mask over source positions i for displacement offset
    o = ci - d_max, replicating the window of
    pointwise_correlation_cuda.cu:92-93:
        di in [max(0, i-d), min(i+d, size)), di step stride, di = i + o.
    """
    i = jnp.arange(size)
    di = i + offset
    in_range = (di >= 0) & (di < size) & (di < i + d_max)  # excludes +d itself
    start = jnp.maximum(0, i - d_max)
    on_phase = (di - start) % stride == 0
    return (in_range & on_phase & (di >= start)).astype(jnp.float32)


def pointwise_correlation_ref(
    fm0: jnp.ndarray, fm1: jnp.ndarray, d_max: int, stride: int = 1
) -> jnp.ndarray:
    """pointwise local correlation oracle
    (reference pointwise_correlation_cuda.cu:63-111).

    out[b, i, j, ci, cj] = <FM0[b, i, j, :], FM1[b, i+ci-d, j+cj-d, :]>
    over the truncated displacement window (raw dot product, no /C
    normalization).

    Args:
        fm0, fm1: (B, H, W, C) feature maps (channels last).

    Returns:
        out: (B, H, W, 2*d_max+1, 2*d_max+1).
    """
    b, h, w, c = fm0.shape
    chw = 2 * d_max + 1
    dt = jnp.promote_types(fm0.dtype, jnp.float32)
    f0 = fm0.astype(dt)
    f1 = fm1.astype(dt)
    f1p = jnp.pad(f1, ((0, 0), (d_max, d_max), (d_max, d_max), (0, 0)))

    planes = []
    for ci in range(chw):
        oi = ci - d_max
        rmask = correlation_window_masks(h, oi, d_max, stride)  # (H,)
        for cj in range(chw):
            oj = cj - d_max
            cmask = correlation_window_masks(w, oj, d_max, stride)  # (W,)
            # shifted[b, i, j] == FM1[b, i+oi, j+oj] with zeros outside
            shifted = f1p[
                :, d_max + oi : d_max + oi + h, d_max + oj : d_max + oj + w, :
            ]
            val = (f0 * shifted).sum(-1)  # (B, H, W)
            planes.append(val * rmask[None, :, None] * cmask[None, None, :])
    out = jnp.stack(planes, axis=-1)  # (B, H, W, chw*chw)
    return out.reshape(b, h, w, chw, chw)
