"""ROI / PS-ROI pooling kernel timing at the working point.

BASELINE metric 2 evidence (PSRoI kernel time, MXU-bound): times the MXU
mask-matmul pooling (ops/pooling.py, default "einsum" impl) and the SAT
variant, forward and forward+backward, at the R-FCN working point
(38x75 score maps, k=7, 31 targets, 256 rois), pinned against the lax
oracle on the same device. Chained (dependency-forced) timing -- see
PERF.md for why naive repeated-call timing lies through the async tunnel.

Usage: python tools/pool_bench.py [n_rois]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from _timing import chain_time_ms as chain_time  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from detect_to_track_tpu.ops.lax_ref import ps_roi_pool_ref, roi_pool_ref
    from detect_to_track_tpu.ops.pooling import ps_roi_pool, roi_pool

    print("devices:", jax.devices(), flush=True)
    n_rois = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    h, w, k, n_targets = 38, 75, 7, 31
    rng = np.random.RandomState(0)
    fm = jnp.asarray(rng.randn(h, w, n_targets * k * k), jnp.float32)
    rois = jnp.asarray(
        np.stack(
            [
                rng.rand(n_rois) * 0.7,
                rng.rand(n_rois) * 0.7,
                rng.rand(n_rois) * 0.3 + 0.02,
                rng.rand(n_rois) * 0.3 + 0.02,
            ],
            axis=1,
        ),
        jnp.float32,
    )

    # correctness vs oracle
    out = jax.jit(
        lambda f: ps_roi_pool(f, rois, n_targets, k)
    )(fm)
    ref = jax.jit(
        lambda f: ps_roi_pool_ref(f, rois, n_targets, k)
    )(fm)
    diff = np.abs(np.asarray(out) - np.asarray(ref)).max()
    print(f"ps_roi_pool vs oracle: max abs diff {diff:.2e}", flush=True)

    for impl in ("einsum", "sat"):
        t_f = chain_time(
            lambda f, impl=impl: ps_roi_pool(
                f, rois, n_targets, k, False, impl
            ).mean(),
            fm,
        )
        grad = jax.grad(
            lambda f, impl=impl: ps_roi_pool(
                f, rois, n_targets, k, False, impl
            ).sum()
        )
        t_fb = chain_time(lambda f, g=grad: g(f).mean(), fm)
        print(
            f"ps_roi_pool[{impl}] ({n_rois} rois): fwd {t_f:.3f} ms  "
            f"fwd+bwd {t_fb:.3f} ms",
            flush=True,
        )

    # plain roi_pool at the tracker working point (concat pyramid width)
    c = 1891
    fm2 = jnp.asarray(rng.randn(h, w, c), jnp.float32)
    out = jax.jit(lambda f: roi_pool(f, rois[:32], k))(fm2)
    ref = jax.jit(lambda f: roi_pool_ref(f, rois[:32], k))(fm2)
    diff = np.abs(np.asarray(out) - np.asarray(ref)).max()
    print(f"roi_pool vs oracle: max abs diff {diff:.2e}", flush=True)
    t_f = chain_time(lambda f: roi_pool(f, rois[:32], k).mean(), fm2)
    grad2 = jax.grad(lambda f: roi_pool(f, rois[:32], k).sum())
    t_fb = chain_time(lambda f: grad2(f).mean(), fm2)
    print(
        f"roi_pool (32 rois, {c} ch): fwd {t_f:.3f} ms  fwd+bwd {t_fb:.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
