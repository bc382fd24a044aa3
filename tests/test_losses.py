"""tests for losses + DTLoss accumulator.

Numerical parity is pinned against torch (CPU) transcriptions of the
reference loss modules (reference detect_to_track/loss.py), since torch is
available in the test environment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from detect_to_track_tpu.losses import (
    DTLoss,
    bbox_loss,
    focal_loss,
    rcnn_loss,
    rpn_loss,
    smooth_l1,
    track_loss,
)


def _torch_focal(c_hat, c_star, alpha=0.25, gamma=2.0):
    """transcription of reference loss.py:27-47."""
    c_hat = torch.as_tensor(c_hat)
    c_star = torch.as_tensor(c_star, dtype=torch.int64)
    oh = torch.zeros_like(c_hat)
    oh.scatter_(-1, c_star.unsqueeze(-1), 1)
    pt = torch.where(oh == 1, 1 - c_hat, c_hat)
    at = torch.where(oh == 1, 1 - alpha, alpha)
    bce = torch.nn.functional.binary_cross_entropy(c_hat, oh, reduction="none")
    return (pt.pow(gamma) * at * bce).mean(-1)


@pytest.mark.parametrize("n_classes", [2, 31])
def test_focal_loss_matches_torch(n_classes, rng):
    logits = rng.randn(3, 50, n_classes).astype(np.float32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    c_star = rng.randint(0, n_classes, size=(3, 50))

    ours = np.asarray(focal_loss(jnp.asarray(probs), jnp.asarray(c_star)))
    ref = _torch_focal(probs, c_star).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_smooth_l1_matches_torch(rng):
    x = rng.randn(100).astype(np.float32) * 2
    y = rng.randn(100).astype(np.float32)
    ours = np.asarray(smooth_l1(jnp.asarray(x), jnp.asarray(y)))
    ref = torch.nn.functional.smooth_l1_loss(
        torch.as_tensor(x), torch.as_tensor(y), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_bbox_loss_zeroes_negative_anchors(rng):
    b_hat = rng.randn(4, 10, 4).astype(np.float32)
    b_star = rng.randn(4, 10, 4).astype(np.float32)
    c_star = rng.randint(0, 2, size=(4, 10))
    out = np.asarray(bbox_loss(jnp.asarray(b_hat), jnp.asarray(b_star), c_star))
    assert (out[c_star == 0] == 0).all()
    assert (out[c_star != 0] > 0).all()


def test_rpn_loss_scalar_and_weighting(rng):
    B, A = 2, 30
    o_hat = np.asarray(jax.nn.softmax(jnp.asarray(rng.randn(B, A, 2)), -1))
    o_star = rng.randint(0, 2, (B, A))
    b_hat = rng.randn(B, A, 4).astype(np.float32)
    b_star = rng.randn(B, A, 4).astype(np.float32)
    lw = np.zeros((B, A), np.float32)

    o_l, b_l = rpn_loss(lw, o_hat, o_star, b_hat, b_star, 0.25, 2.0)
    assert float(o_l) == 0.0  # all anchors masked out
    assert float(b_l) > 0.0  # bbox loss is NOT lw-weighted (reference :106)


def test_rcnn_loss_empty_regions_is_zero(rng):
    N, C = 8, 31
    c_hat = np.asarray(jax.nn.softmax(jnp.asarray(rng.randn(N, C)), -1))
    c_star = rng.randint(0, C, (N,))
    b = rng.randn(N, 4).astype(np.float32)
    valid = np.zeros((N,), bool)
    c_l, b_l = rcnn_loss(c_hat, c_star, b, b * 2, valid, 0.25, 2.0)
    assert float(c_l) == 0.0 and float(b_l) == 0.0


def test_rcnn_loss_masked_mean_equals_dense_mean(rng):
    """loss over [valid subset] must equal dense loss computed on only the
    valid rows (parity with the reference's dynamic concatenation)."""
    N, C = 16, 31
    c_hat = np.asarray(jax.nn.softmax(jnp.asarray(rng.randn(N, C)), -1))
    c_star = rng.randint(0, C, (N,))
    b_hat = rng.randn(N, 4).astype(np.float32)
    b_star = rng.randn(N, 4).astype(np.float32)
    valid = rng.rand(N) > 0.5

    c_m, b_m = rcnn_loss(c_hat, c_star, b_hat, b_star, valid, 0.25, 2.0)
    c_d, b_d = rcnn_loss(
        c_hat[valid],
        c_star[valid],
        b_hat[valid],
        b_star[valid],
        np.ones(valid.sum(), bool),
        0.25,
        2.0,
    )
    np.testing.assert_allclose(float(c_m), float(c_d), rtol=1e-5)
    np.testing.assert_allclose(float(b_m), float(b_d), rtol=1e-5)


def test_track_loss_empty_and_masked(rng):
    t = rng.randn(6, 4).astype(np.float32)
    assert float(track_loss(t, t * 2, np.zeros(6, bool))) == 0.0
    full = track_loss(t, t * 2, np.ones(6, bool))
    half = track_loss(t, t * 2, np.array([1, 1, 1, 0, 0, 0], bool))
    ref = torch.nn.functional.smooth_l1_loss(
        torch.as_tensor(t[:3]), torch.as_tensor(t[:3] * 2)
    ).numpy()
    np.testing.assert_allclose(float(half), float(ref), rtol=1e-5)
    assert float(full) != float(half)


# --- DTLoss accumulator (reference tests/test_loss_accumulator.py:6-22) ---


def test_loss_accumulator_gradients(rng):
    """gradients of the reduced scalar wrt each component must equal
    coef / count — the JAX analogue of the reference's += / backward test."""
    a_vals = [float(v) for v in rng.rand(5)]
    b_vals = [float(v) for v in rng.rand(5)]

    def reduced(a_losses, b_losses):
        acc = DTLoss.single(*a_losses) + DTLoss.single(
            *[2 * l for l in b_losses]
        )
        return acc.to_scalar()

    ga, gb = jax.grad(reduced, argnums=(0, 1))(
        [jnp.asarray(v) for v in a_vals], [jnp.asarray(v) for v in b_vals]
    )
    for g in ga:
        np.testing.assert_allclose(float(g), 1 / 2, rtol=1e-6)
    for g in gb:
        np.testing.assert_allclose(float(g), 2 / 2, rtol=1e-6)


def test_dtloss_to_scalar_coefs():
    l = DTLoss.single(*(jnp.asarray(float(i)) for i in range(1, 6)))
    coefs = jnp.asarray([1.0, 1.0, 1.0, 1.0, 1e-4])
    expected = (1 + 2 + 3 + 4 + 5e-4) / 1
    np.testing.assert_allclose(float(l.to_scalar(coefs)), expected, rtol=1e-6)


def test_dtloss_empty_accumulator_is_zero_not_nan():
    """an empty accumulator (count=0, e.g. a zero-batch validation split)
    must reduce to 0.0, not 0/0=NaN — NaN would silently poison logged val
    metrics and best-checkpoint comparisons."""
    empty = DTLoss()
    assert float(empty.count) == 0.0
    val = float(empty.to_scalar())
    assert val == 0.0 and not np.isnan(val)
    # and with explicit coefs
    assert float(empty.to_scalar(jnp.ones((5,)))) == 0.0


def test_dtloss_repr_format():
    l = DTLoss.single(*(jnp.asarray(v) for v in [0.012, 3.4, 0.5, 6e-5, 2.0]))
    s = repr(l)
    assert s.startswith("o:1.20e-2")  # exponent zero-stripping like reference
    assert " a:" in s and " c:" in s and " r:" in s and " t:" in s
