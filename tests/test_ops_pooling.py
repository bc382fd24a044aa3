"""tests for ROI pooling ops: oracle semantics + SAT fast-path parity +
gradients (the jax analogue of reference tests/test_roipool.py and
tests/test_ps_roipool.py)."""

import jax
from jax.test_util import check_grads
import jax.numpy as jnp
import numpy as np
import pytest

from detect_to_track_tpu.ops import (
    ps_roi_pool,
    ps_roi_pool_ref,
    roi_pool,
    roi_pool_ref,
)

# note: roi coordinates are chosen off any exact bin-boundary grid point --
# when a fractional bin edge lands exactly on a pixel boundary, fp32 rounding
# may legitimately differ between jit/non-jit float paths (a one-pixel bin
# shift), just as it may differ from the CUDA kernel's own fp path.
ROIS = np.array(
    [
        [0.5071, 0.5133, 0.5027, 0.4943],
        [0.1037, 0.1091, 0.2013, 0.3087],
        [0.5233, 0.4677, 0.1109, 0.8313],
        [0.9041, 0.9087, 0.4031, 0.4017],  # partially out of bounds
    ],
    np.float32,
)


def _direct_roipool(fm, rois, r_hw):
    """scalar-loop transcription of roipool_cuda.cu:17-62 (numpy)."""
    H, W, C = fm.shape
    out = np.zeros((len(rois), r_hw, r_hw, C), np.float32)
    for r, (rI, rJ, rH, rW) in enumerate(rois):
        bH, bW = rH / r_hw, rW / r_hw
        for i in range(r_hw):
            for j in range(r_hw):
                bI = np.clip(rI - rH / 2, 0, 1) + (i + 0.5) * bH
                bJ = np.clip(rJ - rW / 2, 0, 1) + (j + 0.5) * bW
                I0 = int(np.floor(np.clip(bI - bH / 2, 0, 1) * H))
                J0 = int(np.floor(np.clip(bJ - bW / 2, 0, 1) * W))
                I1 = int(np.ceil(np.clip(bI + bH / 2, 0, 1) * H))
                J1 = int(np.ceil(np.clip(bJ + bW / 2, 0, 1) * W))
                n = (I1 - I0) * (J1 - J0)
                if n > 0:
                    out[r, i, j] = fm[I0:I1, J0:J1].sum((0, 1)) / n
    return out


def _direct_psroipool(fm, rois, n_targets, r_hw, paper=False):
    """scalar-loop transcription of ps_roipool_cuda.cu:21-70 (numpy)."""
    H, W, C = fm.shape
    out = np.zeros((len(rois), n_targets, r_hw, r_hw), np.float32)
    for r, (rI, rJ, rH, rW) in enumerate(rois):
        cH, cW = rH / r_hw, rW / r_hw
        for t in range(n_targets):
            for i in range(r_hw):
                for j in range(r_hw):
                    cI = rI - rH / 2 + (i + 0.5) * cH
                    cJ = rJ - rW / 2 + (j + 0.5) * cW
                    I0 = int(np.floor(np.clip(cI - cH / 2, 0, 1) * H))
                    J0 = int(np.floor(np.clip(cJ - cW / 2, 0, 1) * W))
                    I1 = int(np.ceil(np.clip(cI + cH / 2, 0, 1) * H))
                    J1 = int(np.ceil(np.clip(cJ + cW / 2, 0, 1) * W))
                    ch = (
                        t * r_hw**2 + i * r_hw + j
                        if paper
                        else (t + 1) * (i * r_hw + j)
                    )
                    n = (I1 - I0) * (J1 - J0)
                    if n > 0:
                        out[r, t, i, j] = fm[I0:I1, J0:J1, ch].sum() / n
    return out


@pytest.mark.parametrize("r_hw", [5, 6])
@pytest.mark.parametrize("fm_hw", [(10, 10), (11, 10), (10, 11)])
def test_roi_pool_ref_matches_cuda_semantics(r_hw, fm_hw, rng):
    fm = rng.rand(*fm_hw, 2).astype(np.float32)
    expected = _direct_roipool(fm, ROIS, r_hw)
    got = np.asarray(roi_pool_ref(fm, ROIS, r_hw))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("r_hw", [5, 7])
@pytest.mark.parametrize("impl", ["einsum", "sat"])
def test_roi_pool_fast_matches_ref(r_hw, impl, rng):
    fm = rng.rand(13, 17, 8).astype(np.float32)
    ref = np.asarray(roi_pool_ref(fm, ROIS, r_hw))
    fast = np.asarray(roi_pool(fm, ROIS, r_hw, impl))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_targets", [1, 2])
@pytest.mark.parametrize("r_hw", [6, 7])
@pytest.mark.parametrize("fm_hw", [(10, 10), (11, 11)])
@pytest.mark.parametrize("paper", [False, True])
def test_ps_roi_pool_ref_matches_cuda_semantics(n_targets, r_hw, fm_hw, paper, rng):
    fm = rng.rand(*fm_hw, n_targets * r_hw**2).astype(np.float32)
    rois = ROIS[:3]
    expected = _direct_psroipool(fm, rois, n_targets, r_hw, paper)
    got = np.asarray(ps_roi_pool_ref(fm, rois, n_targets, r_hw, paper))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_targets", [1, 3])
@pytest.mark.parametrize("r_hw", [7])
@pytest.mark.parametrize("impl", ["einsum", "sat"])
def test_ps_roi_pool_fast_matches_ref(n_targets, r_hw, impl, rng):
    fm = rng.rand(12, 19, n_targets * r_hw**2).astype(np.float32)
    ref = np.asarray(ps_roi_pool_ref(fm, ROIS, n_targets, r_hw))
    fast = np.asarray(ps_roi_pool(fm, ROIS, n_targets, r_hw, False, impl))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-5)


def test_ps_roi_pool_oob_roi_pools_to_zero(rng):
    """a roi centered far outside the image must pool to exactly zeros
    (reference tests/test_ps_roipool.py:33-44)."""
    n_targets, r_hw = 2, 7
    fm = np.full((10, 10, n_targets * r_hw**2), 10.0, np.float32)
    rois = np.array([[3.0, 3.0, 0.5, 0.5]], np.float32)
    for fn in (ps_roi_pool_ref, ps_roi_pool):
        out = np.asarray(fn(fm, rois, n_targets, r_hw))
        np.testing.assert_array_equal(out, np.zeros_like(out))


def test_roi_pool_oob_roi_is_finite(rng):
    """deviation from the reference: degenerate bins yield 0, not NaN
    (reference roipool_cuda.cu:61 divides by zero)."""
    fm = rng.rand(10, 10, 2).astype(np.float32)
    rois = np.array([[3.0, 3.0, 0.5, 0.5]], np.float32)
    for fn in (roi_pool_ref, roi_pool):
        assert np.isfinite(np.asarray(fn(fm, rois, 5))).all()


@pytest.mark.parametrize("fn", [roi_pool_ref, roi_pool])
def test_roi_pool_gradients(fn, rng):
    """finite-difference gradient check in float64 (jax analogue of the
    double-precision torch gradcheck in reference tests/test_roipool.py)."""
    with jax.enable_x64(True):
        fm = rng.rand(10, 11, 2)
        rois = ROIS[:2].astype(np.float64)
        check_grads(
            lambda f: fn(f, rois, 5).sum(), (fm,), order=1, modes=["rev"],
            rtol=1e-5, atol=1e-5,
        )


@pytest.mark.parametrize("fn", [ps_roi_pool_ref, ps_roi_pool])
def test_ps_roi_pool_gradients(fn, rng):
    n_targets, r_hw = 2, 6
    with jax.enable_x64(True):
        fm = rng.rand(10, 11, n_targets * r_hw**2)
        rois = ROIS[:3].astype(np.float64)
        check_grads(
            lambda f: fn(f, rois, n_targets, r_hw).sum(),
            (fm,),
            order=1,
            modes=["rev"],
            rtol=1e-5,
            atol=1e-5,
        )


def test_roi_pool_sat_grad_matches_ref_grad(rng):
    fm = rng.rand(9, 12, 4).astype(np.float32)
    g_ref = jax.grad(lambda f: (roi_pool_ref(f, ROIS, 5) ** 2).sum())(fm)
    g_fast = jax.grad(lambda f: (roi_pool(f, ROIS, 5) ** 2).sum())(fm)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), rtol=1e-3, atol=1e-4
    )


def test_unknown_impl_raises(rng):
    fm = rng.rand(8, 8, 4).astype(np.float32)
    rois = np.array([[0.5, 0.5, 0.4, 0.4]], np.float32)
    with pytest.raises(ValueError, match="unknown impl"):
        roi_pool(jnp.asarray(fm), jnp.asarray(rois), 2, impl="stat")
    fmp = rng.rand(8, 8, 2 * 4).astype(np.float32)
    with pytest.raises(ValueError, match="unknown impl"):
        ps_roi_pool(jnp.asarray(fmp), jnp.asarray(rois), 2, 2, impl="SAT")
