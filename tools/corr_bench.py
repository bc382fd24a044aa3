"""real-TPU correlation kernel correctness + timing at working shapes.

BASELINE metric 2 evidence (correlation kernel time, MXU-bound): runs the
Pallas pointwise-correlation forward and backward at the reference working
point (38x75 feature maps, d_max=8) for c3d/c4/c5 channel widths, pinned
against the lax oracle on the SAME chip, with chained (dependency-forced)
timing -- naive repeated-call timing is meaningless through the async
remote tunnel (PERF.md).

Usage: python tools/corr_bench.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from detect_to_track_tpu.ops import pointwise_correlation
from detect_to_track_tpu.ops.lax_ref import pointwise_correlation_ref

D_MAX, STRIDE = 8, 1
H, W = 38, 75
B = 8

from _timing import chain_time_ms as chain_time  # noqa: E402

rng = np.random.RandomState(0)
for c in (512, 1024, 2048):
    a = jnp.asarray(rng.randn(B, H, W, c), jnp.bfloat16)

    # correctness vs oracle (bf16)
    out = jax.jit(lambda x: pointwise_correlation(x, x * 0.5 + 0.1, D_MAX, STRIDE, impl="pallas"))(a[:1])
    ref = jax.jit(lambda x: pointwise_correlation_ref(x, x * 0.5 + 0.1, D_MAX, STRIDE))(a[:1])
    diff = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).max() + 1e-6
    print(f"c={c}: fwd reldiff {diff.max()/scale:.2e}", flush=True)

    t_fwd = chain_time(
        lambda x: pointwise_correlation(x, x * 0.5, D_MAX, STRIDE, impl="pallas").astype(jnp.float32).mean(),
        a,
    )
    gradf = jax.grad(
        lambda x: pointwise_correlation(
            x.astype(jnp.bfloat16), x.astype(jnp.bfloat16) * 0.5, D_MAX, STRIDE, impl="pallas"
        ).astype(jnp.float32).sum()
    )
    t_fb = chain_time(lambda x: gradf(x).mean(), a.astype(jnp.float32))
    print(f"c={c}: fwd {t_fwd:.3f} ms  fwd+bwd {t_fb:.3f} ms  (B={B})", flush=True)

    g1 = jax.jit(jax.grad(lambda x: pointwise_correlation(x, x * 0.5, D_MAX, STRIDE, impl="pallas").astype(jnp.float32).sum()))(a[:1])
    g2 = jax.jit(jax.grad(lambda x: pointwise_correlation_ref(x, x * 0.5, D_MAX, STRIDE).astype(jnp.float32).sum()))(a[:1])
    gd = np.abs(np.asarray(g1, np.float32) - np.asarray(g2, np.float32))
    gs = np.abs(np.asarray(g2, np.float32)).max() + 1e-6
    print(f"c={c}: grad reldiff {gd.max()/gs:.2e}", flush=True)
