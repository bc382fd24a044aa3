"""pointwise local correlation (FlowNet-style) as a Pallas TPU kernel.

Semantics match reference pointwise_correlation_cuda.cu:63-111 (oracle:
lax_ref.pointwise_correlation_ref), including the window-truncation quirk
(the +d_max displacement row/col of the (2d+1)^2 output is always zero) and
the stride phase behavior near the top/left boundary.

TPU-first design (vs. the CUDA one-thread-per-pixel kernel):
- feature maps are NHWC; a (TILE_H+2d, W+2d, C_BLK) halo window of FM1 is
  DMA'd from HBM into VMEM once per tile, then ALL (2d)^2 displacement
  planes are computed from VMEM. HBM traffic is ~one read of each feature
  map instead of one read per displacement (289x less than a naive XLA
  unrolling).
- per row displacement, the channel contraction runs as ONE batched matmul
  on the MXU; the (2d) needed diagonals are extracted with iota masks.
- channels are blocked (grid dim, sequentially revisited) so c4/c5-sized
  maps (1024/2048 ch) stay inside VMEM; partial dot products accumulate
  into the revisited f32 output block. Tiles are as large as VMEM allows
  (whole-height at the working point) -- grid-step overhead dominates this
  kernel before arithmetic does.
- the backward is two gather-style Pallas kernels (each output element owns
  its full sum) -- no atomicAdd scatter like the CUDA backward
  (pointwise_correlation_cuda.cu:154-171). dFM0 uses the banded-matmul MXU
  form; dFM1 keeps small tiles (its fully-unrolled displacement loops
  multiply live registers).

Off-TPU (tests, CPU) the same custom_vjp wraps interpret-mode kernels, or
`impl="xla"` falls back to the differentiable lax oracle.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lax_ref import pointwise_correlation_ref


def _env_cap(name: str, default: int) -> int:
    """channel-block / alignment override (perf tuning: larger blocks cut
    the per-revisit VPU work but inflate Mosaic compile time). Values are
    validated against the alignment the kernels require -- a misaligned
    knob would otherwise surface as a cryptic Mosaic DMA error (or silent
    grid under-coverage) far from the misconfiguration."""
    try:
        v = int(os.environ[name])
    except (KeyError, ValueError):
        return default
    align = 8 if name == "D2T_CORR_W8_ALIGN" else 128
    if v < align or v % align:
        raise ValueError(
            f"{name}={v} must be a positive multiple of {align} "
            f"(lane/sublane alignment of the kernels' DMA slices)"
        )
    return v


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _row_mask(h0, tile_h: int, size: int, offset: int, d_max: int, stride: int):
    """in-kernel stride/range mask over a tile's global source rows
    (see lax_ref.correlation_window_masks)."""
    gi = h0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0)
    di = gi + offset
    in_range = (di >= 0) & (di < size) & (di < gi + d_max)
    start = jnp.maximum(0, gi - d_max)
    on_phase = (di - start) % stride == 0
    return (in_range & on_phase).astype(jnp.float32)  # (tile_h, 1)


def _col_mask(size: int, offset: int, d_max: int, stride: int):
    gj = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1)
    dj = gj + offset
    in_range = (dj >= 0) & (dj < size) & (dj < gj + d_max)
    start = jnp.maximum(0, gj - d_max)
    on_phase = (dj - start) % stride == 0
    return (in_range & on_phase).astype(jnp.float32)  # (1, size)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    fm0_ref,  # (1, TH, W, CB) VMEM
    fm1_ref,  # (B, HP+2d, W+2d, C) HBM/ANY
    out_ref,  # (1, K2, TH, W) VMEM (f32, revisited over channel blocks)
    halo,  # (TH+2d, W+2d, CB) VMEM scratch
    sem,
    *,
    d_max: int,
    stride: int,
    tile_h: int,
    h: int,
    w: int,
    c_blk: int,
):
    b = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)
    k = 2 * d_max + 1

    dma = pltpu.make_async_copy(
        fm1_ref.at[
            b,
            pl.ds(hi * tile_h, tile_h + 2 * d_max),
            slice(None),
            pl.ds(ci * c_blk, c_blk),
        ],
        halo,
        sem,
    )
    dma.start()

    @pl.when(ci == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    dma.wait()

    f0 = fm0_ref[0]  # (TH, W, CB), native dtype (bf16 in training)
    h0 = hi * tile_h
    w8 = halo.shape[1]

    # MXU formulation: for each row displacement di, ONE batched matmul
    # contracts the channel block -- M[t, j, v] = <f0[t, j, :], rows[t, v, :]>
    # -- and the (2d) needed diagonals (v = j + dj) are extracted with iota
    # masks on the VPU. ~6x more FLOPs than the banded product, but they run
    # on the systolic array instead of the vector unit (~10x net).
    # di is a dynamic fori index (halo dim 0 is untiled); dj is unrolled.
    jcol = jax.lax.broadcasted_iota(jnp.int32, (w, w8), 0)
    vcol = jax.lax.broadcasted_iota(jnp.int32, (w, w8), 1)

    # extraction dtype: the diagonal "reduction" SELECTS one product per
    # (t, j, dj) -- no accumulation -- so for bf16 features the whole
    # extract runs in bf16 (half the VPU work; single final rounding, and
    # the tracker's fused head casts volumes to bf16 immediately anyway).
    bf16 = f0.dtype == jnp.bfloat16
    ext_t = jnp.bfloat16 if bf16 else jnp.float32

    def body(di, _):
        rows = halo[pl.ds(di, tile_h)]  # (TH, W+2d pad, CB)
        m = jax.lax.dot_general(
            f0,
            rows,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            # Mosaic requires a 32-bit matmul accumulator; the bf16 path
            # rounds once AFTER the dot so the 16 extraction passes below
            # run at half the vreg width.
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST
            ),
        ).astype(ext_t)  # (TH, W, W8)
        rmask = None
        if stride > 1:
            rmask = _row_mask(h0, tile_h, h, di - d_max, d_max, stride)
        for dj in range(2 * d_max):
            # multiplicative band mask (a bf16 where() on an i1 mask hits a
            # Mosaic relayout bug; multiply selects the same single element)
            bm = (vcol == jcol + dj).astype(ext_t)  # (W, W8)
            diag = jnp.sum(
                m * bm[None], axis=-1, dtype=ext_t
            )  # (TH, W) == M[t, j, j+dj]
            if stride > 1:
                diag = diag * rmask.astype(ext_t)
                diag = diag * _col_mask(w, dj - d_max, d_max, stride).astype(ext_t)
            out_ref[0, di * k + dj] += diag.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, 2 * d_max, body, 0)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bwd_fm0_kernel(
    g_ref,  # (1, K2, TH, W) VMEM
    fm1_ref,  # (B, HP+2d, W+2d, C) HBM
    out_ref,  # (1, TH, W, CB) VMEM (native dtype)
    halo,  # (TH+2d, W+2d, CB) VMEM scratch
    acc,  # (TH, W, CB) f32 VMEM scratch (di accumulator)
    sem,
    *,
    d_max: int,
    stride: int,
    tile_h: int,
    h: int,
    w: int,
    c_blk: int,
):
    """dFM0[i,j,:] = sum_planes g[i,j,p] * FM1[i+oi, j+oj, :]  (gather)."""
    b = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)
    k = 2 * d_max + 1

    dma = pltpu.make_async_copy(
        fm1_ref.at[
            b,
            pl.ds(hi * tile_h, tile_h + 2 * d_max),
            slice(None),
            pl.ds(ci * c_blk, c_blk),
        ],
        halo,
        sem,
    )
    dma.start()
    acc[...] = jnp.zeros_like(acc)
    dma.wait()

    h0 = hi * tile_h
    w8 = halo.shape[1]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (w, w8), 0)
    vcol = jax.lax.broadcasted_iota(jnp.int32, (w, w8), 1)

    # MXU formulation: scatter the (2d) gradient planes for this row
    # displacement into a banded matrix Gb[t, j, v] (v = j + dj), then ONE
    # batched matmul against the halo rows contracts the band:
    #   dFM0[t, j, :] += sum_v Gb[t, j, v] * rows[t, v, :].
    # banded scatter is pure placement (disjoint bands), so for bf16
    # features gb builds directly in bf16: half the VPU work and no
    # separate pre-matmul cast. f32 oracles keep the f32 build.
    bf16 = fm1_ref.dtype == jnp.bfloat16
    ext_t = jnp.bfloat16 if bf16 else jnp.float32

    def body(di, _):
        rows = halo[pl.ds(di, tile_h)]  # (TH, W8, CB)
        rmask = None
        if stride > 1:
            rmask = _row_mask(h0, tile_h, h, di - d_max, d_max, stride)
        gb = jnp.zeros((tile_h, w, w8), ext_t)
        for dj in range(2 * d_max):
            g = g_ref[0, di * k + dj].astype(jnp.float32)  # (TH, W)
            if stride > 1:
                g = g * rmask
                g = g * _col_mask(w, dj - d_max, d_max, stride)
            bm = (vcol == jcol + dj).astype(ext_t)  # (W, W8)
            gb = gb + bm[None] * g[:, :, None].astype(ext_t)
        acc[...] += jax.lax.dot_general(
            gb,
            rows if bf16 else rows.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            # bf16 training features take fast MXU passes (grads already
            # flow through bf16 convs); f32 oracles keep full precision.
            precision=(
                jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST
            ),
        )  # (TH, W, CB)
        return 0

    jax.lax.fori_loop(0, 2 * d_max, body, 0)
    out_ref[0] = acc[...].astype(out_ref.dtype)


def _bwd_fm1_kernel(
    g_ref,  # (B, K2, HP+2d, W+2d) HBM (zero-padded grads)
    fm0_ref,  # (B, HP+2d, W+2d, C) HBM (zero-padded)
    out_ref,  # (1, TH, W, CB) VMEM
    g_halo,  # (K2, TH+2d, W+2d) VMEM scratch
    f_halo,  # (TH+2d, W+2d, CB) VMEM scratch
    sems,  # (2,) DMA semaphores
    *,
    d_max: int,
    stride: int,
    tile_h: int,
    h: int,
    w: int,
    c_blk: int,
):
    """dFM1[p,q,:] = sum_planes g[p-oi, q-oj, plane] * FM0[p-oi, q-oj, :].

    Source-centric banded-matmul form of the reference's atomicAdd scatter
    (pointwise_correlation_cuda.cu:169), generalized to multiple row tiles
    with halo'd source windows: for each row displacement di, the SOURCE
    rows whose targets land in this tile are exactly the halo slice
    [2d - di, 2d - di + th) (target p = i + di - d), so this di's gradient
    planes scatter into a banded matrix Gb[t, j, v] (v = j + dj = target
    col + d), ONE MXU matmul contracts the source column j against FM0, and
    the central w columns accumulate straight into the output block -- no
    apron, no (2d)^2 unrolled displacement products (the old form's
    statically-unrolled 256-term loop at d_max=8 spilled registers and
    forced tiny tiles).
    """
    b = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)
    k = 2 * d_max + 1
    th = tile_h

    # the g halo's row count lands on a TILED dim of the 3D scratch
    # (k^2, rows, w128), so the DMA slice size must be a sublane multiple --
    # with d_max=8 (th+2d = 24) that held by luck; align explicitly.
    th2d8 = _round_up(th + 2 * d_max, 8)
    cp_g = pltpu.make_async_copy(
        g_ref.at[b, slice(None), pl.ds(hi * th, th2d8), slice(None)],
        g_halo,
        sems.at[0],
    )
    cp_f = pltpu.make_async_copy(
        fm0_ref.at[
            b,
            pl.ds(hi * th, th + 2 * d_max),
            slice(None),
            pl.ds(ci * c_blk, c_blk),
        ],
        f_halo,
        sems.at[1],
    )
    # the gradient halo is channel-independent: fetch it only on the first
    # channel block (scratch persists across the sequential grid steps of
    # the innermost channel dimension).
    @pl.when(ci == 0)
    def _():
        cp_g.start()

    cp_f.start()
    out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(ci == 0)
    def _():
        cp_g.wait()

    cp_f.wait()

    h0 = hi * th
    w2d8 = _round_up(w + 2 * d_max, 8)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (w, w2d8), 0)
    vcol = jax.lax.broadcasted_iota(jnp.int32, (w, w2d8), 1)

    # di is statically unrolled: the slice offset 2d - di lands on TILED
    # scratch dims (sublane rows), where dynamic unaligned offsets are not
    # supported -- but the expensive op (the matmul) runs once per di
    # (2d total), not once per (di, dj) pair like the old 256-term unroll.
    bf16 = fm0_ref.dtype == jnp.bfloat16
    ext_t = jnp.bfloat16 if bf16 else jnp.float32

    for di in range(2 * d_max):
        # source rows for this di: halo rows [2d - di, 2d - di + th).
        r0 = 2 * d_max - di
        f0 = f_halo[r0 : r0 + th, d_max : d_max + w, :]  # (TH, W, CB) source
        rmask = None
        if stride > 1:
            # mask at the source row i = h0 - d + (2d - di) + t = h0+d-di+t
            rmask = _row_mask(h0 + d_max - di, th, h, di - d_max, d_max, stride)
        gb = jnp.zeros((th, w, w2d8), ext_t)
        for dj in range(2 * d_max):
            g = g_halo[di * k + dj, r0 : r0 + th, d_max : d_max + w]
            g = g.astype(jnp.float32)  # (TH, W) at source rows/cols
            if stride > 1:
                g = g * rmask
                g = g * _col_mask(w, dj - d_max, d_max, stride)
            bm = (vcol == jrow + dj).astype(ext_t)  # (W, W2D8)
            gb = gb + bm[None] * g[:, :, None].astype(ext_t)
        contrib = jax.lax.dot_general(
            gb,
            f0 if bf16 else f0.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST
            ),
        )  # (TH, V, CB); target row p - tile_origin = t, target col q = v - d
        out_ref[0] += contrib[:, d_max : d_max + w, :]


def _bwd_fm1_single_tile_kernel(
    g_ref,  # (1, K2, TH, W) VMEM (pipeline block; TH == HP, single row tile)
    fm0_ref,  # (1, TH, W, CB) VMEM (pipeline block)
    out_ref,  # (1, TH, W, CB) VMEM
    acc,  # (TH + 2d, W2D8, CB) f32 VMEM scratch (target apron)
    *,
    d_max: int,
    stride: int,
    tile_h: int,
    h: int,
    w: int,
    c_blk: int,
):
    """dFM1 as a SOURCE-centric banded matmul (used when the whole height
    fits one tile, which holds at the working point):

    for each row displacement di, scatter this di's gradient planes into a
    banded matrix Gb[t, j, v] (v = target col), contract the source column j
    against FM0 on the MXU, and accumulate into target rows t + di of an
    apron'd scratch. No halo DMAs, no unrolled displacement products -- the
    dynamic row index lands on the scratch's untiled leading dim.
    """
    k = 2 * d_max + 1
    th = tile_h
    w2d8 = acc.shape[1]

    f0 = fm0_ref[0]  # (TH, W, CB)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (w, w2d8), 0)
    vcol = jax.lax.broadcasted_iota(jnp.int32, (w, w2d8), 1)

    acc[...] = jnp.zeros_like(acc)

    bf16 = f0.dtype == jnp.bfloat16
    ext_t = jnp.bfloat16 if bf16 else jnp.float32

    def body(di, _):
        gb = jnp.zeros((th, w, w2d8), ext_t)
        rmask = None
        if stride > 1:
            rmask = _row_mask(0, th, h, di - d_max, d_max, stride)
        for dj in range(2 * d_max):
            g = g_ref[0, di * k + dj].astype(jnp.float32)  # (TH, W) at source
            if stride > 1:
                g = g * rmask
                g = g * _col_mask(w, dj - d_max, d_max, stride)
            # target col v = j + dj (apron origin: v == q + d)
            bm = (vcol == jrow + dj).astype(ext_t)  # (W, W2D8)
            gb = gb + bm[None] * g[:, :, None].astype(ext_t)
        contrib = jax.lax.dot_general(
            gb,
            f0 if bf16 else f0.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST
            ),
        )  # (TH, V, CB), contracted over source col j
        # target row p = t + di - d -> apron row t + di
        acc[pl.ds(di, th)] += contrib
        return 0

    jax.lax.fori_loop(0, 2 * d_max, body, 0)
    out_ref[0] = acc[pl.ds(d_max, th), pl.ds(d_max, w), :].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _plan(b, h, w, c, d_max, c_cap=512):
    # big tiles: grid-step and loop overhead dominate this kernel well before
    # VMEM does (v5e has ~100 MB usable), so take the whole height when it
    # fits and large channel blocks. tile_h must stay sublane-aligned for
    # the halo DMAs.
    #
    # c_cap sets the channel-block ceiling PER KERNEL: every VPU-side cost
    # (diagonal extraction, banded scatter, stride masks) repeats once per
    # channel block, so blocks should be as large as the kernel's VMEM
    # budget allows -- at the working point (c4 = 1024, c5 = 2048 channels)
    # doubling the block halves the non-MXU work.
    tile_h = _round_up(min(h, 40), 8)
    hp = _round_up(h, tile_h)
    # channel blocks must be lane-aligned for the halo DMAs (and small
    # channel counts are padded up to one lane tile).
    c_blk = min(_round_up(c, 128), c_cap)
    cp = _round_up(c, c_blk)
    grid = (b, hp // tile_h, cp // c_blk)
    # manual-DMA'd buffers need tiling-aligned shapes: the apron'd width is
    # padded to a sublane multiple (feature maps; W+2d is second-minor) or a
    # lane multiple (gradient planes; W+2d is minor). The alignment is
    # env-overridable (D2T_CORR_W8_ALIGN=128 pads the halo width to a full
    # lane tile: the per-displacement dot's N dim then fully utilizes the
    # MXU output tile at the cost of ~33% more halo DMA traffic; zero-padded
    # columns contribute zero to every extracted band, so results are
    # unchanged -- pinned by the oracle tests under this env).
    w8 = _round_up(w + 2 * d_max, _env_cap("D2T_CORR_W8_ALIGN", 8))
    w128 = _round_up(w + 2 * d_max, 128)
    return tile_h, hp, c_blk, cp, grid, w8, w128


def _pad_to(x, h_to, w_to, *, h_axis=1, w_axis=2):
    pads = [(0, 0)] * x.ndim
    pads[h_axis] = (0, h_to - x.shape[h_axis])
    pads[w_axis] = (0, w_to - x.shape[w_axis])
    return jnp.pad(x, pads)


def _corr_fwd_pallas(fm0, fm1, d_max, stride, interpret):
    b, h, w, c = fm0.shape
    k = 2 * d_max + 1
    # one channel block for every working-point size (c3d/c4/c5 = 512/1024/
    # 2048 bf16): the 16x16 diagonal-extraction passes then run ONCE per row
    # tile instead of once per channel revisit.
    c_cap = _env_cap(
        "D2T_CORR_FWD_CCAP", 2048 if fm0.dtype == jnp.bfloat16 else 1024
    )
    tile_h, hp, c_blk, cp, grid, w8, w128 = _plan(b, h, w, c, d_max, c_cap)

    fm0_p = _pad_to(fm0, hp, w)
    if cp != c:
        fm0_p = jnp.pad(fm0_p, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    # fm1 zero-padded with a d-wide apron (plus row padding to the tile grid).
    fm1_p = jnp.pad(
        fm1,
        (
            (0, 0),
            (d_max, hp - h + d_max),
            (d_max, w8 - w - d_max),
            (0, cp - c),
        ),
    )

    kernel = functools.partial(
        _fwd_kernel,
        d_max=d_max,
        stride=stride,
        tile_h=tile_h,
        h=h,
        w=w,
        c_blk=c_blk,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, w, c_blk),
                lambda bb, hh, cc: (bb, hh, 0, cc),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, k * k, tile_h, w),
            lambda bb, hh, cc: (bb, 0, hh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, k * k, hp, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * d_max, w8, c_blk), fm0.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(fm0_p, fm1_p)

    return out[:, :, :h, :]  # (B, K2, H, W) -- the kernel's native layout


def _corr_bwd_pallas(fm0, fm1, g, d_max, stride, interpret):
    """g arrives in the kernel's native (B, K2, H, W) layout."""
    b, h, w, c = fm0.shape
    k = 2 * d_max + 1
    # larger channel blocks than the fwd budget allows f32 accumulators for:
    # the banded gradient scatter (16 masked passes per row displacement)
    # repeats per channel block, so 1024-wide blocks halve it at c5.
    tile_h, hp, c_blk, cp, grid, w8, w128 = _plan(
        b, h, w, c, d_max, _env_cap("D2T_CORR_BWD_CCAP", 1024)
    )

    g = g.astype(jnp.float32)
    g_tiles = _pad_to(g, hp, w, h_axis=2, w_axis=3)

    fm1_p = jnp.pad(
        fm1,
        ((0, 0), (d_max, hp - h + d_max), (d_max, w8 - w - d_max), (0, cp - c)),
    )

    common = dict(
        d_max=d_max, stride=stride, tile_h=tile_h, h=h, w=w, c_blk=c_blk
    )

    dfm0 = pl.pallas_call(
        functools.partial(_bwd_fm0_kernel, **common),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, k * k, tile_h, w),
                lambda bb, hh, cc: (bb, 0, hh, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, c_blk),
            lambda bb, hh, cc: (bb, hh, 0, cc),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, cp), fm0.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * d_max, w8, c_blk), fm1.dtype),
            pltpu.VMEM((tile_h, w, c_blk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(g_tiles, fm1_p)

    if hp == tile_h:
        # fast path (always taken at the working point): the whole height is
        # one tile, so dFM1 runs as a source-centric banded matmul with a
        # target-row apron -- no halo DMAs at all.
        w2d8 = _round_up(w + 2 * d_max, 8)
        fm0_t = jnp.pad(fm0, ((0, 0), (0, hp - h), (0, 0), (0, cp - c)))
        dfm1 = pl.pallas_call(
            functools.partial(_bwd_fm1_single_tile_kernel, **common),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, k * k, tile_h, w),
                    lambda bb, hh, cc: (bb, 0, hh, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, tile_h, w, c_blk),
                    lambda bb, hh, cc: (bb, hh, 0, cc),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_h, w, c_blk),
                lambda bb, hh, cc: (bb, hh, 0, cc),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, hp, w, cp), fm1.dtype),
            scratch_shapes=[
                pltpu.VMEM((tile_h + 2 * d_max, w2d8, c_blk), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(g_tiles, fm0_t)
        dfm0 = dfm0[:, :h, :, :c].astype(fm0.dtype)
        dfm1 = dfm1[:, :h, :, :c].astype(fm1.dtype)
        return dfm0, dfm1

    # general path (H spans several tiles): the halo'd banded-matmul dfm1
    # kernel -- one MXU contraction per row displacement over halo'd source
    # windows. Row tiles are bounded by the f32 gb/contrib temporaries.
    tile_b = min(32, tile_h)
    c_blk_b = min(256, c_blk)
    hp_b = _round_up(h, tile_b)
    # the channel padding must be re-derived for THIS kernel's block size:
    # cp was rounded up to c_blk, and cp // c_blk_b floors -- for c_blk >
    # c_blk_b with c not a multiple of c_blk_b (e.g. C=384) the grid would
    # under-cover the output and leave the tail channels uninitialized.
    cp_b = _round_up(c, c_blk_b)
    grid_b = (b, hp_b // tile_b, cp_b // c_blk_b)
    common_b = dict(common, tile_h=tile_b, c_blk=c_blk_b)

    # rows padded so every tile's sublane-aligned halo DMA (th2d8 rows, see
    # _bwd_fm1_kernel) stays in bounds: last tile reads up to
    # (hp_b - tile_b) + round_up(tile_b + 2d, 8).
    th2d8 = _round_up(tile_b + 2 * d_max, 8)
    g_rows_pad = (hp_b - tile_b + th2d8) - h - d_max
    g_pad = jnp.pad(
        g, ((0, 0), (0, 0), (d_max, g_rows_pad), (d_max, w128 - w - d_max))
    )  # (B, K2, HP_aligned, W128)
    fm0_p = jnp.pad(
        fm0,
        (
            (0, 0),
            (d_max, hp_b - h + d_max),
            (d_max, w8 - w - d_max),
            (0, cp_b - c),
        ),
    )

    dfm1 = pl.pallas_call(
        functools.partial(_bwd_fm1_kernel, **common_b),
        grid=grid_b,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_b, w, c_blk_b),
            lambda bb, hh, cc: (bb, hh, 0, cc),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp_b, w, cp_b), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k * k, th2d8, w128), jnp.float32),
            pltpu.VMEM((tile_b + 2 * d_max, w8, c_blk_b), fm0.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(g_pad, fm0_p)

    dfm0 = dfm0[:, :h, :, :c].astype(fm0.dtype)
    dfm1 = dfm1[:, :h, :, :c].astype(fm1.dtype)
    return dfm0, dfm1


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _corr_pallas(fm0, fm1, d_max, stride, interpret):
    return _corr_fwd_pallas(fm0, fm1, d_max, stride, interpret)


def _corr_pallas_fwd(fm0, fm1, d_max, stride, interpret):
    return _corr_fwd_pallas(fm0, fm1, d_max, stride, interpret), (fm0, fm1)


def _corr_pallas_bwd(d_max, stride, interpret, res, g):
    fm0, fm1 = res
    return _corr_bwd_pallas(fm0, fm1, g, d_max, stride, interpret)


_corr_pallas.defvjp(_corr_pallas_fwd, _corr_pallas_bwd)


def pointwise_correlation(
    fm0: jnp.ndarray,
    fm1: jnp.ndarray,
    d_max: int,
    stride: int = 1,
    impl: str = "auto",
    interpret: bool = False,
    layout: str = "nhwkk",
) -> jnp.ndarray:
    """pointwise local correlation between two feature maps.

    Args:
        fm0, fm1: (B, H, W, C) feature maps at times t and t+tau (NHWC).
        d_max: maximum displacement.
        stride: displacement stride.
        impl: "pallas" | "xla" | "auto" (pallas on TPU backends).
        interpret: run the Pallas kernels in interpreter mode (CPU testing).
        layout: "nhwkk" -> (B, H, W, 2d+1, 2d+1) (reference layout);
            "k2hw" -> (B, (2d+1)^2, H, W), the Pallas kernel's NATIVE layout
            -- consumers that contract the displacement dim (the tracker's
            fused head) take this to skip a 14 MB transpose per scale in
            BOTH directions.

    Returns:
        out: f32 correlation volumes in the requested layout.
    """
    if fm0.dtype != fm1.dtype:
        raise ValueError(
            f"fm0/fm1 dtype mismatch: {fm0.dtype} vs {fm1.dtype} (the halo "
            "DMAs and MXU contractions require one compute dtype)"
        )
    if layout not in ("nhwkk", "k2hw"):
        raise ValueError(f"unknown layout {layout!r}")
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    k = 2 * d_max + 1
    if impl == "xla":
        out = pointwise_correlation_ref(fm0, fm1, d_max, stride)
        if layout == "k2hw":
            b, h, w = out.shape[:3]
            out = jnp.transpose(out.reshape(b, h, w, k * k), (0, 3, 1, 2))
        return out
    out = _corr_pallas(fm0, fm1, d_max, stride, interpret)  # (B, K2, H, W)
    if layout == "nhwkk":
        b, _, h, w = out.shape
        out = jnp.transpose(out, (0, 2, 3, 1)).reshape(b, h, w, k, k)
    return out
