"""batched pair detection must agree with the single-pair path."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_inference import detector  # fixture reuse  # noqa: F401


def test_batched_matches_single(detector, rng):
    det, cfg = detector
    h, w = cfg.INPUT_SHAPE
    pairs = rng.rand(3, 2, h, w, 3).astype(np.float32)

    batched = det.detect_pairs(pairs)
    for p in range(3):
        single = det._fwd(det.variables, jnp.asarray(pairs[p]), det.anchors)
        np.testing.assert_array_equal(
            np.asarray(batched.valid[p]), np.asarray(single.valid)
        )
        # an untrained net produces many tied confidences, and top-k may
        # order ties differently under vmap -- compare detection SETS
        # (sorted rows), not element order.
        for f in range(2):
            v = np.asarray(single.valid[f])
            a = np.sort(np.asarray(batched.boxes[p, f])[v], axis=0)
            b = np.sort(np.asarray(single.boxes[f])[v], axis=0)
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
            a = np.sort(np.asarray(batched.confs[p, f])[v], axis=0)
            b = np.sort(np.asarray(single.confs[f])[v], axis=0)
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        v0 = np.asarray(single.valid[0])
        assert np.isfinite(np.asarray(batched.tracks[p])[v0]).all()


def test_detect_pairs_mixed_dtype_list_normalizes(detector, rng):
    """a list mixing uint8 and float pairs must behave like the all-float
    list: stacking without promotion would smuggle 0-255 values into a
    float batch that skips the device /255."""
    det, cfg = detector
    h, w = cfg.INPUT_SHAPE
    f0 = rng.rand(2, h, w, 3).astype(np.float32)
    f1 = rng.rand(2, h, w, 3).astype(np.float32)
    u1 = np.clip(np.rint(f1 * 255.0), 0, 255).astype(np.uint8)

    ref = det.detect_pairs([f0, u1.astype(np.float32) / 255.0])
    got = det.detect_pairs([f0, u1])
    np.testing.assert_array_equal(
        np.asarray(got.valid), np.asarray(ref.valid)
    )
    np.testing.assert_allclose(
        np.asarray(got.boxes), np.asarray(ref.boxes), rtol=1e-4, atol=1e-5
    )


def test_detect_clip_mixed_dtype_list_normalizes(detector, rng):
    """detect_clip must run list inputs through the same ingestion guard as
    detect_pairs: a list mixing uint8 and float frames previously went
    straight to jnp.asarray, silently promoting 0-255 values into a float
    batch that skips the device /255."""
    det, cfg = detector
    h, w = cfg.INPUT_SHAPE
    f = rng.rand(3, h, w, 3).astype(np.float32)
    u1 = np.clip(np.rint(f[1] * 255.0), 0, 255).astype(np.uint8)
    frames_f = [f[0], u1.astype(np.float32) / 255.0, f[2]]
    frames_m = [f[0], u1, f[2]]

    ref = det.detect_clip(np.stack(frames_f))
    got = det.detect_clip(frames_m)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_allclose(
        np.asarray(got.boxes), np.asarray(ref.boxes), rtol=1e-4, atol=1e-5
    )


def test_detect_clip_mixed_dtype_device_list_normalizes(detector, rng):
    """a list holding DEVICE arrays takes _pack_input's on-device branch
    (no tunnel download); mixed uint8/float entries must promote with the
    /255 there too (utils.promote_mixed_image_dtypes with xp=jnp), matching
    the all-host-float result exactly."""
    det, cfg = detector
    h, w = cfg.INPUT_SHAPE
    f = rng.rand(3, h, w, 3).astype(np.float32)
    u1 = np.clip(np.rint(f[1] * 255.0), 0, 255).astype(np.uint8)
    frames_f = [f[0], u1.astype(np.float32) / 255.0, f[2]]
    # one device array in the list forces the jnp.stack branch
    frames_d = [jnp.asarray(f[0]), jnp.asarray(u1), f[2]]

    packed = det._pack_input(frames_d)
    assert isinstance(packed, jax.Array) and packed.dtype == jnp.float32

    ref = det.detect_clip(np.stack(frames_f))
    got = det.detect_clip(frames_d)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_allclose(
        np.asarray(got.boxes), np.asarray(ref.boxes), rtol=1e-4, atol=1e-5
    )
