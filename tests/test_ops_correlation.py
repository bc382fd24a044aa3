"""tests for pointwise correlation: oracle semantics vs a scalar-loop numpy
transcription of the CUDA kernel, Pallas (interpret mode) vs oracle, and
gradient parity (jax analogue of reference
tests/test_pointwise_correlation.py)."""

import jax
from jax.test_util import check_grads
import jax.numpy as jnp
import numpy as np
import pytest

from detect_to_track_tpu.ops import pointwise_correlation, pointwise_correlation_ref


def _direct_corr(fm0, fm1, d_max, stride):
    """scalar-loop transcription of pointwise_correlation_cuda.cu:75-110
    (numpy, NHWC inputs)."""
    B, H, W, C = fm0.shape
    k = 2 * d_max + 1
    out = np.zeros((B, H, W, k, k), np.float32)
    for b in range(B):
        for i in range(H):
            for j in range(W):
                for di in range(max(0, i - d_max), min(i + d_max, H), stride):
                    for dj in range(
                        max(0, j - d_max), min(j + d_max, W), stride
                    ):
                        out[b, i, j, di - i + d_max, dj - j + d_max] = np.dot(
                            fm0[b, i, j], fm1[b, di, dj]
                        )
    return out


@pytest.mark.parametrize("d_max", [2, 3])
@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("hw", [(7, 7), (8, 6)])
def test_corr_ref_matches_cuda_semantics(d_max, stride, hw, rng):
    fm0 = rng.rand(2, *hw, 3).astype(np.float32)
    fm1 = rng.rand(2, *hw, 3).astype(np.float32)
    expected = _direct_corr(fm0, fm1, d_max, stride)
    got = np.asarray(pointwise_correlation_ref(fm0, fm1, d_max, stride))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_corr_truncation_quirk(rng):
    """the +d_max displacement row/col must be exactly zero
    (pointwise_correlation_cuda.cu:92-93 upper bound excludes i+d)."""
    fm0 = rng.rand(1, 9, 9, 4).astype(np.float32) + 1
    fm1 = rng.rand(1, 9, 9, 4).astype(np.float32) + 1
    out = np.asarray(pointwise_correlation_ref(fm0, fm1, 2, 1))
    assert (out[..., -1, :] == 0).all()
    assert (out[..., :, -1] == 0).all()
    assert (out[..., :-1, :-1] != 0).any()


@pytest.mark.parametrize("d_max", [2, 3])
@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("b", [1, 2])
@pytest.mark.parametrize("hw", [(10, 10), (11, 9)])
def test_corr_pallas_matches_ref(d_max, stride, b, hw, rng):
    fm0 = rng.rand(b, *hw, 5).astype(np.float32)
    fm1 = rng.rand(b, *hw, 5).astype(np.float32)
    ref = np.asarray(pointwise_correlation_ref(fm0, fm1, d_max, stride))
    got = np.asarray(
        pointwise_correlation(fm0, fm1, d_max, stride, impl="pallas", interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_corr_ref_gradcheck(rng):
    fm0 = rng.rand(1, 6, 6, 2).astype(np.float32)
    fm1 = rng.rand(1, 6, 6, 2).astype(np.float32)
    check_grads(
        lambda a, b: (pointwise_correlation_ref(a, b, 2, 1) ** 2).sum(),
        (fm0, fm1),
        order=1,
        modes=["rev"],
        rtol=1e-2,
        atol=1e-2,
    )


@pytest.mark.parametrize("stride", [1, 2])
def test_corr_pallas_grads_match_ref_grads(stride, rng):
    """custom-VJP Pallas backward must agree with autodiff through the
    oracle (the TPU analogue of reference gradcheck,
    tests/test_pointwise_correlation.py:8-22)."""
    d_max = 2
    fm0 = rng.rand(2, 9, 8, 3).astype(np.float32)
    fm1 = rng.rand(2, 9, 8, 3).astype(np.float32)

    def loss_ref(a, b):
        return (pointwise_correlation_ref(a, b, d_max, stride) ** 2).sum()

    def loss_pallas(a, b):
        out = pointwise_correlation(
            a, b, d_max, stride, impl="pallas", interpret=True
        )
        return (out**2).sum()

    g0_ref, g1_ref = jax.grad(loss_ref, argnums=(0, 1))(fm0, fm1)
    g0_p, g1_p = jax.grad(loss_pallas, argnums=(0, 1))(fm0, fm1)
    np.testing.assert_allclose(
        np.asarray(g0_p), np.asarray(g0_ref), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g1_p), np.asarray(g1_ref), rtol=1e-3, atol=1e-4
    )


def test_corr_pallas_multi_tile_height(rng):
    """H > one row tile exercises the general (halo'd) backward path."""
    d_max = 2
    fm0 = rng.rand(1, 48, 9, 4).astype(np.float32)
    fm1 = rng.rand(1, 48, 9, 4).astype(np.float32)
    ref = np.asarray(pointwise_correlation_ref(fm0, fm1, d_max, 1))
    got = np.asarray(
        pointwise_correlation(fm0, fm1, d_max, 1, impl="pallas", interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def loss(fn):
        def f(a, b):
            return (fn(a, b) ** 2).sum()
        return f

    g_ref = jax.grad(
        loss(lambda a, b: pointwise_correlation_ref(a, b, d_max, 1)),
        argnums=(0, 1),
    )(fm0, fm1)
    g_pal = jax.grad(
        loss(
            lambda a, b: pointwise_correlation(
                a, b, d_max, 1, impl="pallas", interpret=True
            )
        ),
        argnums=(0, 1),
    )(fm0, fm1)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_corr_pallas_multi_tile_dmax8(rng):
    """the general (halo'd, banded-matmul) backward at the REAL displacement
    (d_max=8) with H spanning several row tiles -- the configuration the c3
    correlation hits at the working point (76x150 spans 2 tiles)."""
    d_max = 8
    fm0 = rng.rand(1, 48, 20, 8).astype(np.float32)
    fm1 = rng.rand(1, 48, 20, 8).astype(np.float32)
    ref = np.asarray(pointwise_correlation_ref(fm0, fm1, d_max, 1))
    got = np.asarray(
        pointwise_correlation(fm0, fm1, d_max, 1, impl="pallas", interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def loss(fn):
        def f(a, b):
            return (fn(a, b) ** 2).sum()
        return f

    g_ref = jax.grad(
        loss(lambda a, b: pointwise_correlation_ref(a, b, d_max, 1)),
        argnums=(0, 1),
    )(fm0, fm1)
    g_pal = jax.grad(
        loss(
            lambda a, b: pointwise_correlation(
                a, b, d_max, 1, impl="pallas", interpret=True
            )
        ),
        argnums=(0, 1),
    )(fm0, fm1)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_corr_pallas_multi_tile_stride2(rng):
    """stride masks through the general backward path (source-row mask
    origins shift per displacement)."""
    d_max = 3
    fm0 = rng.rand(1, 44, 12, 4).astype(np.float32)
    fm1 = rng.rand(1, 44, 12, 4).astype(np.float32)

    def loss(fn):
        def f(a, b):
            return (fn(a, b) ** 2).sum()
        return f

    g_ref = jax.grad(
        loss(lambda a, b: pointwise_correlation_ref(a, b, d_max, 2)),
        argnums=(0, 1),
    )(fm0, fm1)
    g_pal = jax.grad(
        loss(
            lambda a, b: pointwise_correlation(
                a, b, d_max, 2, impl="pallas", interpret=True
            )
        ),
        argnums=(0, 1),
    )(fm0, fm1)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_corr_pallas_multi_channel_blocks(rng, monkeypatch):
    """C spanning SEVERAL channel blocks (forced via the CCAP env knobs):
    exercises the forward's revisited-output accumulation over the channel
    grid dim, the backward kernels' per-block scratch reuse, and the
    channel-grid derivation. All other tests use C <= one block, which let a
    real grid under-coverage bug (general dFM1 at C not a multiple of the
    backward block) pass the whole suite."""
    monkeypatch.setenv("D2T_CORR_FWD_CCAP", "128")
    monkeypatch.setenv("D2T_CORR_BWD_CCAP", "128")
    d_max = 2
    fm0 = rng.rand(1, 8, 7, 256).astype(np.float32)
    fm1 = rng.rand(1, 8, 7, 256).astype(np.float32)
    ref = np.asarray(pointwise_correlation_ref(fm0, fm1, d_max, 1))
    got = np.asarray(
        pointwise_correlation(fm0, fm1, d_max, 1, impl="pallas", interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)

    def loss(fn):
        def f(a, b):
            return (fn(a, b) ** 2).sum()
        return f

    g_ref = jax.grad(
        loss(lambda a, b: pointwise_correlation_ref(a, b, d_max, 1)),
        argnums=(0, 1),
    )(fm0, fm1)
    g_pal = jax.grad(
        loss(
            lambda a, b: pointwise_correlation(
                a, b, d_max, 1, impl="pallas", interpret=True
            )
        ),
        argnums=(0, 1),
    )(fm0, fm1)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-2
        )


def test_corr_pallas_general_bwd_partial_last_channel_block(rng):
    """C=384 with the default backward block of 256 on the GENERAL (multi-
    tile-height) path: the dFM1 grid must be derived from the BACKWARD
    block size, not the forward one -- the regression left channels
    [256, 384) of dFM1 uninitialized (NaN) while every C<=block test
    passed."""
    d_max = 2
    fm0 = rng.rand(1, 48, 9, 384).astype(np.float32)
    fm1 = rng.rand(1, 48, 9, 384).astype(np.float32)

    def loss(fn):
        def f(a, b):
            return (fn(a, b) ** 2).sum()
        return f

    g_ref = jax.grad(
        loss(lambda a, b: pointwise_correlation_ref(a, b, d_max, 1)),
        argnums=(0, 1),
    )(fm0, fm1)
    g_pal = jax.grad(
        loss(
            lambda a, b: pointwise_correlation(
                a, b, d_max, 1, impl="pallas", interpret=True
            )
        ),
        argnums=(0, 1),
    )(fm0, fm1)
    for a, b in zip(g_pal, g_ref):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-2
        )


def test_corr_pallas_bf16_matches_ref(rng):
    """bf16 inputs (the working-point dtype) through fwd+bwd: the extraction
    / scatter paths have bf16-specific code (f32 VMEM accumulators,
    native-dtype outputs) that no other test touches."""
    d_max = 2
    a32 = rng.rand(1, 8, 7, 8).astype(np.float32)
    b32 = rng.rand(1, 8, 7, 8).astype(np.float32)
    fm0 = jnp.asarray(a32, jnp.bfloat16)
    fm1 = jnp.asarray(b32, jnp.bfloat16)
    ref = np.asarray(
        pointwise_correlation_ref(
            fm0.astype(jnp.float32), fm1.astype(jnp.float32), d_max, 1
        )
    )
    got = np.asarray(
        pointwise_correlation(fm0, fm1, d_max, 1, impl="pallas", interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)

    def loss_p(a, b):
        out = pointwise_correlation(
            a, b, d_max, 1, impl="pallas", interpret=True
        )
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_r(a, b):
        out = pointwise_correlation_ref(
            a.astype(jnp.float32), b.astype(jnp.float32), d_max, 1
        )
        return (out**2).sum()

    g_p = jax.grad(loss_p, argnums=(0, 1))(fm0, fm1)
    g_r = jax.grad(loss_r, argnums=(0, 1))(fm0, fm1)
    for a, b in zip(g_p, g_r):
        assert a.dtype == jnp.bfloat16  # native-dtype grads
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.1, atol=0.1,
        )


def test_corr_env_knob_validation(rng, monkeypatch):
    """misaligned CCAP / W8_ALIGN knobs fail fast with a named error instead
    of a cryptic Mosaic DMA failure (or silent grid under-coverage)."""
    import pytest as _pytest

    fm = rng.rand(1, 8, 7, 8).astype(np.float32)
    monkeypatch.setenv("D2T_CORR_FWD_CCAP", "300")
    with _pytest.raises(ValueError, match="D2T_CORR_FWD_CCAP"):
        pointwise_correlation(fm, fm, 2, 1, impl="pallas", interpret=True)
    monkeypatch.delenv("D2T_CORR_FWD_CCAP")
    monkeypatch.setenv("D2T_CORR_W8_ALIGN", "4")
    with _pytest.raises(ValueError, match="D2T_CORR_W8_ALIGN"):
        pointwise_correlation(fm, fm, 2, 1, impl="pallas", interpret=True)
