"""serving-side throughput attribution (VERDICT r3 next #1).

The train step runs at ~120 frames/s at b16 INCLUDING backward, yet the
round-3 clip bench recorded 64.5 frames/s forward-only -- this tool measures
where the forward-only graph spends its time, by timing PREFIXES of the
serving pipeline (backbone -> +RPN+decode -> +NMS -> +RCNN -> +compact ->
full clip graph with tracker) at several frame chunks, each pre-staged on
device (no tunnel uploads in the timed region).

Run on the real chip:   python tools/serve_bench.py [--chunks 4 8 16 32]
Optional trace:         PROFILE_DIR=/tmp/trace python tools/serve_bench.py \
                            --chunks 16 --trace

Prints one JSON line per (stage, chunk): ms/frame and fps.
"""

import argparse
import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="+", default=[4, 8, 16, 32])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=5)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument(
        "--stages",
        nargs="+",
        default=["backbone", "rpn", "nms", "rcnn", "compact", "clip"],
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from detect_to_track_tpu.utils import enable_compilation_cache
    from tools._timing import dispatch_chain_time_ms

    enable_compilation_cache()

    from detect_to_track_tpu.anchors import build_anchors
    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.encoding import frcnn_box_decode
    from detect_to_track_tpu.inference import detect_clip
    from detect_to_track_tpu.models import DetectTrackModule
    from detect_to_track_tpu.ops.nms import batched_proposal_filter

    cfg = Config()
    model = DetectTrackModule.from_config(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(
        build_anchors(cfg.fm_shape, cfg.ANCHOR_AREAS, cfg.ANCHOR_ASPECT_RATIOS)
    )
    h, w = cfg.INPUT_SHAPE

    # pipeline PREFIXES: each returns a small summary so nothing is DCE'd.
    def run_backbone(v, x, a):
        fm = model.apply(v, x, method="backbone")
        return {k: jnp.sum(t) for k, t in fm.items()}

    def run_rpn(v, x, a):
        fm = model.apply(v, x, method="backbone")
        o_hat, b_hat, fm_reg = model.apply(v, fm["c4"], method="rpn")
        rboxes = frcnn_box_decode(a[None], b_hat)
        return jnp.sum(o_hat) + jnp.sum(rboxes) + jnp.sum(fm_reg)

    def _props(v, x, a):
        fm = model.apply(v, x, method="backbone")
        o_hat, b_hat, fm_reg = model.apply(v, fm["c4"], method="rpn")
        rboxes = frcnn_box_decode(a[None], b_hat)
        props = batched_proposal_filter(
            o_hat[:, :, 1],
            rboxes,
            cfg.pre_nms_topk_eval,
            cfg.EVAL_ROI_CONF_THRESH,
            cfg.EVAL_NMS_IOU_THRESH,
            cfg.MAX_ROIS,
            cfg.pre_nms_cap_eval,
        )
        return fm, fm_reg, props

    def run_nms(v, x, a):
        fm, fm_reg, props = _props(v, x, a)
        return jnp.sum(props.boxes) + jnp.sum(props.valid)

    def run_rcnn(v, x, a):
        fm, fm_reg, props = _props(v, x, a)
        c_hat, b2_hat = model.apply(v, fm["c5"], props.boxes, method="rcnn")
        return jnp.sum(c_hat) + jnp.sum(b2_hat)

    def run_compact(v, x, a):
        fm, fm_reg, props = _props(v, x, a)
        c_hat, b2_hat = model.apply(v, fm["c5"], props.boxes, method="rcnn")
        det_boxes = frcnn_box_decode(props.boxes, b2_hat)
        fg_conf = c_hat[:, :, 1:].sum(-1)
        keep = (fg_conf > cfg.EVAL_RCNN_CONF_THRESH) & props.valid
        d = cfg.max_dets

        def compact(keep_f, conf_f, confs_f, boxes_f):
            key = jnp.where(keep_f, conf_f, -jnp.inf)
            top, idx = jax.lax.top_k(key, d)
            return confs_f[idx], boxes_f[idx], jnp.isfinite(top)

        confs, boxes, valid = jax.vmap(compact)(keep, fg_conf, c_hat, det_boxes)
        return jnp.sum(confs) + jnp.sum(boxes)

    def run_clip(v, x, a):
        out = detect_clip(model, v, x, a, cfg=cfg)
        return (
            jnp.sum(out.confs) + jnp.sum(out.boxes) + jnp.sum(out.tracks)
        )

    stages = {
        "backbone": run_backbone,
        "rpn": run_rpn,
        "nms": run_nms,
        "rcnn": run_rcnn,
        "compact": run_compact,
        "clip": run_clip,
    }

    def chain_time(fn, window, n, reps):
        """per-dispatch device time of fn's PRODUCTION executable, via
        tools._timing.dispatch_chain_time_ms (repeated real dispatches,
        dependency-chained inputs, fetch-synced two-point slope).

        Formerly a lax.scan chain; the scanned detect_clip composition
        miscompiles on this backend and kills the TPU worker at
        chunk >= 8 (single dispatches of the same graph are clean --
        PERF.md "The chunk-8 clip fault"), and the scan wrapper is a
        different program than production serving dispatch anyway."""

        def make_scalar(x, v, a):
            out = fn(v, x, a)
            return sum(
                jnp.sum(t).astype(jnp.float32)
                for t in jax.tree_util.tree_leaves(out)
            )

        return dispatch_chain_time_ms(
            make_scalar, window, n=n, reps=reps,
            extra=(variables, anchors),
        ) / 1e3

    rng = np.random.RandomState(0)
    rows = []
    for chunk in args.chunks:
        window = jax.device_put(
            rng.rand(chunk, h, w, 3).astype(np.float32)
        )
        for name in args.stages:
            dt = chain_time(stages[name], window, args.inner, args.reps)
            row = {
                "stage": name,
                "chunk": chunk,
                "ms_per_frame": round(dt / chunk * 1e3, 3),
                "fps": round(chunk / dt, 2),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

        if args.trace and os.environ.get("PROFILE_DIR"):
            import jax.profiler

            fn = jax.jit(stages[args.stages[-1]])
            with jax.profiler.trace(os.environ["PROFILE_DIR"]):
                out = fn(variables, window, anchors)
                jax.block_until_ready(out)

    # incremental attribution at the largest chunk
    biggest = max(args.chunks)
    per = {
        r["stage"]: r["ms_per_frame"] for r in rows if r["chunk"] == biggest
    }
    order = [s for s in ("backbone", "rpn", "nms", "rcnn", "compact", "clip")
             if s in per]
    deltas = {}
    prev = 0.0
    for s in order:
        deltas[s] = round(per[s] - prev, 3)
        prev = per[s]
    print(json.dumps({"incremental_ms_per_frame": deltas, "chunk": biggest}))


if __name__ == "__main__":
    main()
