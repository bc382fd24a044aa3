"""production ROI pooling: separable mask matmuls on the MXU.

TPU-first re-design of the reference's CUDA pooling kernels
(roipool_cuda.cu:6-127, ps_roipool_cuda.cu:10-141). The CUDA kernels walk
every pixel of every bin (O(bin-area) per output element, atomicAdd scatter
backward). Two TPU formulations live here:

1. `impl="einsum"` (default): a bin average is a separable mask contraction

       out[r, i, j, c] = rmask[r, i, :] @ FM[:, :, c] @ cmask[r, j, :]^T / n

   evaluated as two batched matmuls on the MXU. No gathers, no scatters --
   the backward is just more matmuls via autodiff, and the arithmetic is
   exact (no cancellation). ~2 GFLOP/frame-head at the working point, which
   the MXU eats in ~0.1 ms; the previous gather-based version cost ~29 ms
   per frame-head in its scalar gathers + scatter-add backward.
   For PSROIPool the position-sensitive channel map becomes ONE static
   channel gather up front (fm[:, :, ch(t,i,j)]), so the contraction output
   IS the (t, i, j)-indexed result.

2. `impl="sat"`: summed-area table + 4-corner gathers -- O(1) per bin
   independent of roi size. Kept for huge-roi / huge-k regimes where the
   mask matmul's O(H) per bin-row would dominate; measured slower at the
   38x75 working point because TPU scalar gathers/scatters serialize.

Bin geometry (floor/ceil of clamped fractional coords) and the quirks
(PSROIPool channel map, ROIPool corner clamp, out-of-bounds-roi -> 0) follow
lax_ref.py, which is the tested oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .lax_ref import _bin_bounds, _range_masks, ps_roi_pool_channel_map

# matmul precision for the mask contractions: HIGHEST keeps f32 accumulation
# on the MXU so results match the oracle bit-for-bit-ish; the FLOP cost is
# negligible at these sizes.
_PREC = jax.lax.Precision.HIGHEST


def _sat(fm: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H+1, W+1, C) inclusive summed-area table with a zero
    top/left border."""
    s = jnp.cumsum(jnp.cumsum(fm.astype(jnp.promote_types(fm.dtype, jnp.float32)), axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0), (0, 0)))


def _bin_numel(i0, i1, j0, j1):
    return ((i1 - i0)[:, :, None] * (j1 - j0)[:, None, :]).astype(jnp.float32)


def _roi_pool_einsum(fm, rois, r_hw):
    fm_h, fm_w, c = fm.shape
    i0, i1, j0, j1 = _bin_bounds(rois, r_hw, fm_h, fm_w, clamp_corner=True)
    rmask = _range_masks(i0, i1, fm_h)  # (|R|, k, H)
    cmask = _range_masks(j0, j1, fm_w)  # (|R|, k, W)

    f = fm.astype(jnp.promote_types(fm.dtype, jnp.float32))
    # contract the larger spatial dim (W) first: the intermediate is
    # (|R|, k, H, C) instead of (|R|, k, W, C), ~halving peak memory at the
    # 38x75 working point (this runs vmapped over the frame batch).
    p1 = jnp.einsum("rjw,hwc->rjhc", cmask, f, precision=_PREC)
    sums = jnp.einsum("rih,rjhc->rijc", rmask, p1, precision=_PREC)

    numel = _bin_numel(i0, i1, j0, j1)[..., None]
    return jnp.where(numel > 0, sums / jnp.maximum(numel, 1.0), 0.0)


def _roi_pool_sat(fm, rois, r_hw):
    fm_h, fm_w, c = fm.shape
    i0, i1, j0, j1 = _bin_bounds(rois, r_hw, fm_h, fm_w, clamp_corner=True)

    s = _sat(fm).reshape((fm_h + 1) * (fm_w + 1), c)

    def flat(i, j):  # (|R|, k, 1), (|R|, 1, k) -> (|R|, k, k)
        return i[:, :, None] * (fm_w + 1) + j[:, None, :]

    sums = (
        jnp.take(s, flat(i1, j1), axis=0)
        - jnp.take(s, flat(i0, j1), axis=0)
        - jnp.take(s, flat(i1, j0), axis=0)
        + jnp.take(s, flat(i0, j0), axis=0)
    )  # (|R|, k, k, C)

    numel = _bin_numel(i0, i1, j0, j1)[..., None]
    return jnp.where(numel > 0, sums / jnp.maximum(numel, 1.0), 0.0)


@partial(jax.jit, static_argnums=(2, 3))
def roi_pool(
    fm: jnp.ndarray, rois: jnp.ndarray, r_hw: int, impl: str = "einsum"
) -> jnp.ndarray:
    """average ROI pooling (semantics of reference roipool_cuda.cu:6-63,
    oracle: lax_ref.roi_pool_ref).

    Args:
        fm: (H, W, C) feature map.
        rois: (|R|, 4) fractional ijhw rois (padding rows are fine -- any
            roi with empty bins yields zeros).
        r_hw: pooled height/width k.
        impl: "einsum" (MXU mask matmuls, default) or "sat" (integral image).

    Returns:
        out: (|R|, r_hw, r_hw, C).
    """
    if impl == "sat":
        return _roi_pool_sat(fm, rois, r_hw)
    if impl != "einsum":
        raise ValueError(f"unknown impl {impl!r} (use 'einsum' or 'sat')")
    return _roi_pool_einsum(fm, rois, r_hw)


def roi_pool_linear(g: jnp.ndarray, rois: jnp.ndarray, r_hw: int) -> jnp.ndarray:
    """ROI-pool a PRE-PROJECTED map: the exact reordering of
    `flatten(roi_pool(fm, rois, k), (C,k,k)-order) @ W` with
    `g[h,w,i,j,o] = sum_c fm[h,w,c] * W[c*k*k + i*k + j, o]`.

    Both the bin average and the linear head are linear, so the O(C)-wide
    channel dim contracts BEFORE pooling: at the tracker working point
    (C=2602, R=256, k=7) this removes the (R,k,H,C) ~700 MB mask-matmul
    intermediate and the (R,k,k,C) pooled tensor entirely -- intermediates
    shrink to (R,H,k,k,O) ~7.6 MB (the W dim contracts first, like the
    sibling kernels) and FLOPs drop ~8x. Bin geometry is identical to
    roi_pool (corner-clamped; empty bins contribute 0).

    Args:
        g: (H, W, k, k, O) projected map.
        rois: (|R|, 4) fractional ijhw rois.
        r_hw: pooled height/width k.

    Returns:
        out: (|R|, O) == flatten(roi_pool(fm, rois, k)) @ W.
    """
    fm_h, fm_w = g.shape[:2]
    i0, i1, j0, j1 = _bin_bounds(rois, r_hw, fm_h, fm_w, clamp_corner=True)
    rmask = _range_masks(i0, i1, fm_h)  # (|R|, k, H)
    cmask = _range_masks(j0, j1, fm_w)  # (|R|, k, W)

    gf = g.astype(jnp.promote_types(g.dtype, jnp.float32))
    # contract the larger W dim first: intermediate (|R|, H, k, k, O) beats
    # (|R|, W, k, k, O) on peak memory at the 38x75 working point.
    t1 = jnp.einsum("rjw,hwijo->rhijo", cmask, gf, precision=_PREC)
    t2 = jnp.einsum("rih,rhijo->rijo", rmask, t1, precision=_PREC)
    numel = _bin_numel(i0, i1, j0, j1)[..., None]  # (|R|, k, k, 1)
    per_bin = jnp.where(numel > 0, t2 / jnp.maximum(numel, 1.0), 0.0)
    return per_bin.sum(axis=(1, 2))  # (|R|, O)


def _ps_roi_pool_einsum(fm, rois, n_targets, r_hw, paper_layout):
    fm_h, fm_w, c = fm.shape
    i0, i1, j0, j1 = _bin_bounds(rois, r_hw, fm_h, fm_w, clamp_corner=False)
    rmask = _range_masks(i0, i1, fm_h)  # (|R|, k, H)
    cmask = _range_masks(j0, j1, fm_w)  # (|R|, k, W)

    # the position-sensitive channel map is static: ONE channel gather turns
    # fm into (H, W, T, k, k) so the mask contraction's output indexes are
    # already (t, i, j).
    ch = ps_roi_pool_channel_map(n_targets, r_hw, paper_layout)  # (T, k, k)
    f = fm.astype(jnp.promote_types(fm.dtype, jnp.float32))
    fg = f[:, :, ch]  # (H, W, T, k, k)

    # contract W first (see _roi_pool_einsum): intermediate (|R|, H, T, k, k)
    # beats (|R|, W, T, k, k) on peak memory.
    p1 = jnp.einsum("rjw,hwtij->rhtij", cmask, fg, precision=_PREC)
    sums = jnp.einsum("rih,rhtij->rtij", rmask, p1, precision=_PREC)

    numel = _bin_numel(i0, i1, j0, j1)[:, None, :, :]
    return jnp.where(numel > 0, sums / jnp.maximum(numel, 1.0), 0.0)


def _ps_roi_pool_sat(fm, rois, n_targets, r_hw, paper_layout):
    fm_h, fm_w, c = fm.shape
    i0, i1, j0, j1 = _bin_bounds(rois, r_hw, fm_h, fm_w, clamp_corner=False)

    s = _sat(fm).reshape(-1)  # ((H+1)*(W+1)*C,)
    ch = ps_roi_pool_channel_map(n_targets, r_hw, paper_layout)  # (T, k, k)

    # flat index into the SAT for corner (i, j) of output element (r,t,i,j):
    # rows broadcast over (|R|, 1, k, 1), cols over (|R|, 1, 1, k),
    # channels over (1, T, k, k).
    def flat(i, j):
        rows = i[:, None, :, None].astype(jnp.int32)
        cols = j[:, None, None, :].astype(jnp.int32)
        return (rows * (fm_w + 1) + cols) * c + ch[None]

    sums = (
        jnp.take(s, flat(i1, j1))
        - jnp.take(s, flat(i0, j1))
        - jnp.take(s, flat(i1, j0))
        + jnp.take(s, flat(i0, j0))
    )  # (|R|, T, k, k)

    numel = _bin_numel(i0, i1, j0, j1)[:, None, :, :]
    return jnp.where(numel > 0, sums / jnp.maximum(numel, 1.0), 0.0)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def ps_roi_pool(
    fm: jnp.ndarray,
    rois: jnp.ndarray,
    n_targets: int,
    r_hw: int,
    paper_layout: bool = False,
    impl: str = "einsum",
) -> jnp.ndarray:
    """position-sensitive average ROI pooling (semantics of reference
    ps_roipool_cuda.cu:10-71, oracle: lax_ref.ps_roi_pool_ref).

    Args:
        fm: (H, W, n_targets * r_hw^2) score maps (channels last).
        rois: (|R|, 4) fractional ijhw rois.
        paper_layout: False replicates the (t+1)*(i*k+j) channel quirk
            (ps_roipool_cuda.cu:58), True uses the R-FCN paper layout.
        impl: "einsum" (MXU mask matmuls, default) or "sat" (integral image).

    Returns:
        out: (|R|, n_targets, r_hw, r_hw).
    """
    if fm.shape[-1] != n_targets * r_hw * r_hw:
        raise ValueError(
            f"expected {n_targets * r_hw ** 2} channels, got feature map "
            f"of shape {fm.shape}"
        )
    if impl == "sat":
        return _ps_roi_pool_sat(fm, rois, n_targets, r_hw, paper_layout)
    if impl != "einsum":
        raise ValueError(f"unknown impl {impl!r} (use 'einsum' or 'sat')")
    return _ps_roi_pool_einsum(fm, rois, n_targets, r_hw, paper_layout)
