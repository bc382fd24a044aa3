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
        np.testing.assert_allclose(
            np.asarray(batched.confs[p]),
            np.asarray(single.confs),
            rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(batched.valid[p]), np.asarray(single.valid)
        )
        # track slots beyond the valid frame-0 detections hold garbage
        # (pooled from padding boxes) and may differ between fusions.
        v = np.asarray(single.valid[0])
        np.testing.assert_allclose(
            np.asarray(batched.tracks[p])[v],
            np.asarray(single.tracks)[v],
            rtol=1e-3,
            atol=1e-4,
        )
