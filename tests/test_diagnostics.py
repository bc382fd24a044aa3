"""checkify diagnostics tests."""

import jax.numpy as jnp
import pytest

from detect_to_track_tpu.diagnostics import checked_loss_fn
from detect_to_track_tpu.losses import DTLoss


def test_checked_loss_passes_on_finite():
    fn = checked_loss_fn(
        lambda p, b: DTLoss.single(*(jnp.asarray(float(i)) for i in range(5)))
    )
    err, dtl = fn(None, None)
    err.throw()  # no error
    assert float(dtl.o) == 0.0


def test_checked_loss_names_bad_component():
    def bad(p, b):
        return DTLoss.single(
            jnp.asarray(1.0),
            jnp.asarray(jnp.nan),  # b_rpn ('a') is bad
            jnp.asarray(1.0),
            jnp.asarray(1.0),
            jnp.asarray(1.0),
        )

    err, _ = checked_loss_fn(bad)(None, None)
    with pytest.raises(Exception) as e:
        err.throw()
    assert "'a'" in str(e.value) or "non-finite" in str(e.value) or "nan" in str(e.value).lower()
