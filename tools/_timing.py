"""honest device timing through the axon remote tunnel.

Three hazards, each OBSERVED on this link (PERF.md "Timing through the
remote tunnel"):

1. dispatch is fire-and-forget AND ``Array.block_until_ready()`` is a
   NO-OP (~0.1 ms returned on a chained program whose real execution takes
   >100 ms) -- only a value FETCH (``float(...)`` / ``np.asarray``) waits
   for execution;
2. identical (executable, args) re-dispatches can be served from a
   tunnel-side result cache -- every timed call must get at least one
   distinct operand;
3. arrays captured by closure inline as HLO constants, and the serialized
   program can exceed the remote-compile body limit (HTTP 413) -- large
   operands must be explicit jit arguments.

``chain_time_ms`` times a lax.scan chain of the workload (each iteration's
scalar summary perturbs the next iteration's input, so the device must run
every iteration) and cancels the fetch RTT / fixed per-call overhead with a
two-point slope: per-iter = (t[1+n iters] - t[1 iter]) / n.
"""

import time

import numpy as np


def chain_time_ms(make_scalar, x, n=20, reps=3, extra=()):
    """median per-iteration milliseconds of ``make_scalar(x_perturbed)``.

    make_scalar: maps an array shaped like ``x`` (plus ``extra`` operands,
    passed through untouched as explicit jit arguments — hazard 3) to a
    SCALAR (e.g. ``lambda v: kernel(v).mean()``); it is traced inside a
    scan whose carry perturbs the input each iteration.
    """
    import jax
    import jax.numpy as jnp

    def g_fn(c0, xx, *rest_and_length):
        rest, length = rest_and_length[:-1], rest_and_length[-1]

        def body(carry, _):
            # cast the perturbation back to x's dtype: a f32 carry would
            # otherwise promote a bf16 workload to f32 and time the wrong
            # kernel.
            s = make_scalar(xx * (1.0 + carry).astype(xx.dtype), *rest)
            return carry + 1e-30 * s.astype(jnp.float32), None

        return jax.lax.scan(body, c0, None, length=length)[0]

    g = jax.jit(g_fn, static_argnums=2 + len(extra))
    c0s = [jax.device_put(np.float32(i * 1e-8)) for i in range(2 * reps + 2)]
    jax.block_until_ready(c0s)  # harmless if no-op; c0s are tiny
    ci = iter(c0s)
    float(g(next(ci), x, *extra, 1))  # compile + drain
    float(g(next(ci), x, *extra, 1 + n))
    ds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(next(ci), x, *extra, 1))
        t1 = time.perf_counter()
        float(g(next(ci), x, *extra, 1 + n))
        t2 = time.perf_counter()
        ds.append(((t2 - t1) - (t1 - t0)) / n)
    return float(np.median(ds)) * 1e3


def dispatch_chain_time_ms(make_scalar, x, n=8, reps=3, extra=()):
    """median per-dispatch milliseconds of the PRODUCTION executable of
    ``make_scalar`` -- repeated real dispatches, chained through a tiny
    on-device input update, ending in a value fetch; slope = (t[1+n
    dispatches] - t[1]) / n.

    Use this instead of ``chain_time_ms`` for large composed graphs: the
    scan wrapper is a DIFFERENT program than production serving, and on
    the TPU backend the scanned detect_clip composition miscompiles and
    kills the worker at chunk >= 8 (rounds 4-5; single dispatches of the
    same graph are clean -- PERF.md "The chunk-8 clip fault"). Dispatch
    chaining times exactly the executable a serving caller runs.

    Each iteration runs ONE jitted program that returns the scalar
    summary AND the perturbed next input (x_{i+1} = x_i * (1 + 1e-30 *
    s_i)), so iterations are dependency-chained (no tunnel result-cache
    replay, no pipelined overlap being hidden) at the cost of one extra
    HBM read+write of x per iteration (~0.2 ms at serving shapes --
    subtract nothing: it is the same for both slope legs and cancels).
    """
    import jax
    import jax.numpy as jnp

    def g_fn(xx, *rest):
        s = make_scalar(xx, *rest).astype(jnp.float32)
        nxt = xx * (1.0 + 1e-30 * s).astype(xx.dtype)
        return s, nxt

    g = jax.jit(g_fn)

    def run(k, x0):
        s = None
        xx = x0
        t0 = time.perf_counter()
        for _ in range(k):
            s, xx = g(xx, *extra)
        float(s)  # drains every queued dispatch
        return time.perf_counter() - t0

    # compile + drain (also stages x on device)
    run(1, x)
    ds = []
    for _ in range(reps):
        t1 = run(1, x)
        tb = run(1 + n, x)
        d = (tb - t1) / n
        if d > 0:
            ds.append(d)
    if not ds:
        raise RuntimeError("no positive slope sample in dispatch chain")
    return float(np.median(ds)) * 1e3
