"""chained-step training throughput bench (the PERF.md methodology).

Times the FULL jitted joint train step (donated state, dependency-chained
so the axon tunnel's async dispatch can't hide device time) at the
reference working point, on synthetic data.

Usage:
    python tools/step_bench.py [batch] [--s2d] [--trace DIR]

    batch    frame pairs per step (default 8)
    --s2d    enable Config.HOST_S2D (host space-to-depth input layout)
    --trace  also capture a 3-step jax.profiler trace into DIR
             (inspect with tools/parse_trace.py)

Prints `train step bN [tag]: X ms = Y pairs/s`. First call compiles
(~10-15 min through the remote-compile tunnel; set
JAX_COMPILATION_CACHE_DIR to make reruns fast).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.models import DetectTrackModule
    from detect_to_track_tpu.trainer import (
        BatchLoader,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    args = sys.argv[1:]
    bs = int(args[0]) if args and not args[0].startswith("-") else 8
    s2d = "--s2d" in args
    trace_dir = None
    if "--trace" in args:
        i = args.index("--trace")
        if i + 1 >= len(args) or args[i + 1].startswith("-"):
            # a missing operand must not crash (or, worse, silently eat the
            # next flag as a directory name literally called "--s2d")
            sys.exit("usage: --trace DIR (missing trace directory)")
        trace_dir = args[i + 1]

    from detect_to_track_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config(BATCH_SIZE=bs, HOST_S2D=s2d)
    # the ONE module factory (detect_track.py): benches must measure the
    # exact module train.py/evaluate.py build from this cfg.
    model = DetectTrackModule.from_config(cfg)
    manager = SyntheticVIDManager(
        n_samples=bs, image_hw=cfg.INPUT_SHAPE, n_classes=cfg.N_CLASSES
    )
    batch = jax.device_put(next(iter(BatchLoader(manager, bs, cfg, seed=0))))
    print("images:", batch.images.shape, batch.images.dtype, flush=True)

    variables = model.init_variables(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    tx = make_optimizer(cfg, params)
    step = make_train_step(model, cfg, tx)
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )

    t0 = time.perf_counter()
    state, dtl = step(state, batch)
    # dispatch through the tunnel is async and block_until_ready is a NO-OP
    # (tools/_timing.py); only a value fetch waits. float(state.step)
    # depends on every enqueued step, so it both syncs and drains.
    float(state.step)
    print(f"compile+first step: {time.perf_counter() - t0:.0f} s", flush=True)

    def timed(state, k):
        t0 = time.perf_counter()
        for _ in range(k):
            state, _ = step(state, batch)
        float(state.step)
        return time.perf_counter() - t0, state

    n = 10
    t1, state = timed(state, 1)
    tb, state = timed(state, 1 + n)
    dt = (tb - t1) / n * 1e3
    tag = "s2d" if s2d else "plain"
    print(
        f"train step b{bs} [{tag}]: {dt:.1f} ms = {bs / dt * 1e3:.1f} pairs/s",
        flush=True,
    )

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                state, dtl = step(state, batch)
            jax.block_until_ready(state.params)
        print(f"trace at {trace_dir} (3 steps)", flush=True)


if __name__ == "__main__":
    main()
