"""numerical diagnostics.

The reference's only correctness guards are input-validation macros on the
CUDA ops (reference models/common/cpp_common.hpp:1-3) and a channel-count
check (ps_roipool.py:44-49); nothing detects NaN/Inf during training
(SURVEY.md §5). Here:

- ops carry shape validation (ops/pooling.py) and the trainer enforces
  cfg.NAN_POLICY on every step's losses;
- this module adds jax.experimental.checkify instrumentation that localizes
  WHICH loss component first went non-finite, for debugging runs.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax.experimental import checkify


def checked_loss_fn(loss_fn: Callable) -> Callable:
    """wrap a loss function (params, batch) -> DTLoss with float checks on
    each component; returns (error, DTLoss). Call error.throw() on host to
    raise with the failing component named."""

    def inner(params, batch):
        dtl = loss_fn(params, batch)
        for name, v in dtl.asdict().items():
            checkify.check(
                jnp.isfinite(v), f"loss component '{name}' is non-finite"
            )
        return dtl

    return checkify.checkify(
        inner, errors=checkify.user_checks | checkify.float_checks
    )
