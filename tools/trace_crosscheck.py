"""slope-vs-trace cross-validation on a SERVING graph (VERDICT r4 weak #3).

The train-side chained-timing numbers were anchored against server-side
jax.profiler device traces in r2/r3 (PERF.md); this does the same for the
serving side: slope-time a serving graph by production-dispatch chaining
(tools/_timing.dispatch_chain_time_ms), then trace the SAME chained run
and sum per-op device time per dispatch. The two must agree within ~10%
for the slope methodology to stand.

    python tools/trace_crosscheck.py [--graph clip|batched] [--chunk 8]

Prints one JSON line: {"slope_ms": ..., "trace_ms": ..., "ratio": ...}.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def device_ms_per_dispatch(root: str, n_dispatch: int) -> float:
    """sum of TPU-device per-op durations in the newest trace under root,
    divided by n_dispatch.

    Counts ONLY the "XLA Ops" thread of the TPU pid: the profile carries
    each program twice -- an "XLA Modules" row (whole-executable span) AND
    an "XLA Ops" row (per-op spans) -- and summing both double-counts
    every microsecond (measured: exactly 2.01x the slope time; ops-only
    agrees with the slope within 1.3%)."""
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {root}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    threads = {
        (e["pid"], e.get("tid")): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    total = 0.0
    for e in events:
        if (
            e.get("ph") == "X"
            and "dur" in e
            and "TPU" in names.get(e.get("pid"), "")
            and threads.get((e.get("pid"), e.get("tid"))) == "XLA Ops"
        ):
            total += e["dur"]
    return total / n_dispatch / 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="clip", choices=["clip", "batched"])
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--trace-dispatches", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from detect_to_track_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from detect_to_track_tpu.anchors import build_anchors
    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.inference import (
        detect_clip,
        detect_pairs_batched,
    )
    from detect_to_track_tpu.models import DetectTrackModule
    from tools._timing import dispatch_chain_time_ms

    cfg = Config()
    model = DetectTrackModule.from_config(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(
        build_anchors(cfg.fm_shape, cfg.ANCHOR_AREAS, cfg.ANCHOR_ASPECT_RATIOS)
    )
    h, w = cfg.INPUT_SHAPE
    rng = np.random.RandomState(0)

    def _leafsum(out):
        return sum(
            jnp.sum(t).astype(jnp.float32)
            for t in jax.tree_util.tree_leaves(out)
        )

    if args.graph == "clip":
        x = jax.device_put(rng.rand(args.chunk, h, w, 3).astype(np.float32))
        fn = lambda x, v, a: _leafsum(detect_clip(model, v, x, a, cfg=cfg))
        n_frames = args.chunk
    else:
        x = jax.device_put(
            rng.rand(args.pairs, 2, h, w, 3).astype(np.float32)
        )
        fn = lambda x, v, a: _leafsum(
            detect_pairs_batched(model, v, x, a, cfg=cfg)
        )
        n_frames = args.pairs * 2

    slope_ms = dispatch_chain_time_ms(
        fn, x, n=8, reps=3, extra=(variables, anchors)
    )

    # trace the same chained-dispatch program (the perturb-update adds one
    # ~0.2 ms HBM pass per dispatch -- noted, not subtracted).
    def g_fn(xx, v, a):
        s = fn(xx, v, a)
        return s, xx * (1.0 + 1e-30 * s).astype(xx.dtype)

    g = jax.jit(g_fn)
    s, xx = g(x, variables, anchors)  # compile outside the trace
    float(s)

    root = os.environ.get("PROFILE_DIR") or tempfile.mkdtemp(
        prefix="d2t_crosscheck_"
    )
    k = args.trace_dispatches
    with jax.profiler.trace(root):
        s, xx = g(x, variables, anchors)
        for _ in range(k - 1):
            s, xx = g(xx, variables, anchors)
        float(s)  # fetch-sync inside the trace so device work is captured

    trace_ms = device_ms_per_dispatch(root, k)
    print(
        json.dumps(
            {
                "graph": args.graph,
                "frames_per_dispatch": n_frames,
                "slope_ms": round(slope_ms, 2),
                "trace_ms": round(trace_ms, 2),
                "ratio": round(trace_ms / slope_ms, 3),
                "slope_ms_per_frame": round(slope_ms / n_frames, 3),
                "trace_dir": root,
            }
        )
    )


if __name__ == "__main__":
    main()
