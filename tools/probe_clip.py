"""single-dispatch probe of one serving-pipeline stage at one chunk size.

Chip-fault containment tool (VERDICT r4 weak #4 / next #1): a composed
detect_clip graph at chunk >= 8 deterministically crashed the TPU worker in
round 4, and a crash wedges the chip for every subsequent process for
minutes. This probe runs EXACTLY ONE (stage, chunk) combination and prints
one JSON line, so an orchestrator (tools/probe_sweep.sh, bench.py's
subprocess guard) can run it under `timeout`, survive the crash, and wait
for worker recovery before the next probe.

    python tools/probe_clip.py --stage clip --chunk 8 [--corr xla] [--memonly]

Stages: backbone | rpn | nms | rcnn | compact  (serving-pipeline prefixes,
same definitions as tools/serve_bench.py), plus
    tracker   -- the c_tracker subgraph ALONE on random pyramids at
                 batch = chunk-1 (the clip path's adjacent-pair batch);
    clip      -- full detect_clip (reference inference.py:21-121 scaled to
                 clips);
    clip_roll -- detect_clip variant pairing frames via jnp.roll instead of
                 [:-1]/[1:] slices (candidate workaround for the round-2
                 "pair-split + strided slice faults at batch > 4" backend
                 bug family, models/correlation_tracker.py:123-128).

--memonly compiles and prints the XLA memory analysis without dispatching
(safe: the round-4 fault was a RUN-time kernel fault, not a compile error).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--corr", default="auto", choices=["auto", "pallas", "xla"])
    ap.add_argument("--memonly", action="store_true")
    ap.add_argument("--dtype", default=None, help="override COMPUTE_DTYPE")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from detect_to_track_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from detect_to_track_tpu.anchors import build_anchors
    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.encoding import frcnn_box_decode
    from detect_to_track_tpu.inference import detect_clip
    from detect_to_track_tpu.models import DetectTrackModule
    from detect_to_track_tpu.ops.nms import batched_proposal_filter

    cfg = Config()
    if args.dtype:
        cfg = cfg.replace(COMPUTE_DTYPE=args.dtype)
    model = DetectTrackModule.from_config(cfg, corr_impl=args.corr)
    variables = model.init_variables(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(
        build_anchors(cfg.fm_shape, cfg.ANCHOR_AREAS, cfg.ANCHOR_ASPECT_RATIOS)
    )
    h, w = cfg.INPUT_SHAPE
    fh, fw = cfg.fm_shape

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

    def run_backbone(v, x, a):
        fm = model.apply(v, x, method="backbone")
        return sum(jnp.sum(t) for t in fm.values())

    def run_rpn(v, x, a):
        fm = model.apply(v, x, method="backbone")
        o_hat, b_hat, fm_reg = model.apply(v, fm["c4"], method="rpn")
        return jnp.sum(o_hat) + jnp.sum(frcnn_box_decode(a[None], b_hat))

    def run_nms(v, x, a):
        _, _, props = _props(v, x, a)
        return jnp.sum(props.boxes) + jnp.sum(props.valid)

    def run_rcnn(v, x, a):
        fm, _, props = _props(v, x, a)
        c_hat, b2 = model.apply(v, fm["c5"], props.boxes, method="rcnn")
        return jnp.sum(c_hat) + jnp.sum(b2)

    def run_compact(v, x, a):
        fm, _, props = _props(v, x, a)
        c_hat, b2 = model.apply(v, fm["c5"], props.boxes, method="rcnn")
        det_boxes = frcnn_box_decode(props.boxes, b2)
        fg = c_hat[:, :, 1:].sum(-1)
        keep = (fg > cfg.EVAL_RCNN_CONF_THRESH) & props.valid
        d = cfg.max_dets

        def compact(keep_f, conf_f, confs_f, boxes_f):
            key = jnp.where(keep_f, conf_f, -jnp.inf)
            top, idx = jax.lax.top_k(key, d)
            return confs_f[idx], boxes_f[idx], jnp.isfinite(top)

        confs, boxes, valid = jax.vmap(compact)(keep, fg, c_hat, det_boxes)
        return jnp.sum(confs) + jnp.sum(boxes)

    def run_clip(v, x, a):
        out = detect_clip(model, v, x, a, cfg=cfg)
        return jnp.sum(out.confs) + jnp.sum(out.boxes) + jnp.sum(out.tracks)

    def run_clip_unfixed(v, x, a):
        # the round-4 faulting composition, PRESERVED for regression
        # probing: shared features -> [:-1]/[1:] slices -> tracker with NO
        # optimization barrier (detect_clip's fix). Expected: kills the
        # TPU worker at chunk >= 8 on the affected backend.
        from detect_to_track_tpu.inference import _detect_frames

        fmaps_t, fm_reg, confs, boxes, valid = _detect_frames(
            model, v, x, a, cfg
        )
        pyr0 = {k: t[:-1] for k, t in fmaps_t.items()}
        pyr1 = {k: t[1:] for k, t in fmaps_t.items()}
        tracks = model.apply(
            v, pyr0, pyr1, fm_reg[:-1], fm_reg[1:], boxes[:-1],
            method="c_tracker",
        )
        return jnp.sum(confs) + jnp.sum(boxes) + jnp.sum(tracks)

    def run_clip_barrier(v, x, a):
        from detect_to_track_tpu.inference import _detect_frames

        fmaps_t, fm_reg, confs, boxes, valid = _detect_frames(
            model, v, x, a, cfg
        )
        fmaps_t = jax.lax.optimization_barrier(fmaps_t)
        fm_reg = jax.lax.optimization_barrier(fm_reg)
        pyr0 = {k: t[:-1] for k, t in fmaps_t.items()}
        pyr1 = {k: t[1:] for k, t in fmaps_t.items()}
        tracks = model.apply(
            v, pyr0, pyr1, fm_reg[:-1], fm_reg[1:], boxes[:-1],
            method="c_tracker",
        )
        return jnp.sum(confs) + jnp.sum(boxes) + jnp.sum(tracks)

    def run_clip_roll(v, x, a):
        from detect_to_track_tpu.inference import _detect_frames

        fmaps_t, fm_reg, confs, boxes, valid = _detect_frames(
            model, v, x, a, cfg
        )
        roll = lambda t: jnp.roll(t, -1, axis=0)
        pyr1 = {k: roll(t) for k, t in fmaps_t.items()}
        tracks = model.apply(
            v, fmaps_t, pyr1, fm_reg, roll(fm_reg), boxes,
            method="c_tracker",
        )[:-1]
        return jnp.sum(confs) + jnp.sum(boxes) + jnp.sum(tracks)

    def run_clip_s2d(v, x, a):
        # same graph as "clip" but fed the host-s2d input layout
        # ((F, H/2, W/2, 12) -- utils.space_to_depth2); the backbone's
        # 4x4/s1 12-channel stem consumes it without the 3-channel stem
        # conv or the input layout copy (PERF.md "Serving roofline
        # verdict": together 16% of the chunk-8 dispatch).
        out = detect_clip(model, v, x, a, cfg=cfg)
        return jnp.sum(out.confs) + jnp.sum(out.boxes) + jnp.sum(out.tracks)

    stages = {
        "backbone": run_backbone,
        "rpn": run_rpn,
        "nms": run_nms,
        "rcnn": run_rcnn,
        "compact": run_compact,
        "clip": run_clip,
        "clip_s2d": run_clip_s2d,
        "clip_unfixed": run_clip_unfixed,
        "clip_barrier": run_clip_barrier,
        "clip_roll": run_clip_roll,
    }

    rng = np.random.RandomState(0)
    if args.stage == "tracker":
        b = args.chunk - 1
        pyr0 = {
            "c3": jnp.asarray(rng.rand(b, fh, fw, 512), jnp.float32),
            "c4": jnp.asarray(rng.rand(b, fh, fw, 1024), jnp.float32),
            "c5": jnp.asarray(rng.rand(b, fh, fw, 2048), jnp.float32),
        }
        pyr1 = jax.tree_util.tree_map(lambda t: t + 0.5, pyr0)
        reg0 = jnp.asarray(rng.rand(b, fh, fw, 512), jnp.float32)
        rois = jnp.asarray(
            np.tile([[0.4, 0.4, 0.2, 0.2]], (b, cfg.max_dets, 1)), jnp.float32
        )

        def fn(v, p0, p1, r0, r1, rs):
            return jnp.sum(
                model.apply(v, p0, p1, r0, r1, rs, method="c_tracker")
            )

        jfn = jax.jit(fn)
        fargs = (variables, pyr0, pyr1, reg0, reg0 + 0.25, rois)
    else:
        frames = rng.rand(args.chunk, h, w, 3).astype(np.float32)
        if args.stage == "clip_s2d":
            from detect_to_track_tpu.utils import space_to_depth2

            frames = space_to_depth2(frames)
        window = jnp.asarray(frames)
        jfn = jax.jit(stages[args.stage])
        fargs = (variables, window, anchors)

    t0 = time.perf_counter()
    lowered = jfn.lower(*fargs)
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    mem = None
    try:
        ma = compiled.memory_analysis()
        mem = {
            "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
            "peak_mb": round(
                (
                    ma.argument_size_in_bytes
                    + ma.output_size_in_bytes
                    + ma.temp_size_in_bytes
                )
                / 2**20,
                1,
            ),
        }
    except Exception as e:  # noqa: BLE001
        mem = {"error": repr(e)[:200]}

    rec = {
        "stage": args.stage,
        "chunk": args.chunk,
        "corr": args.corr,
        "compile_s": round(t_compile, 1),
        "mem": mem,
    }
    if args.memonly:
        rec["ok"] = "memonly"
        print(json.dumps(rec), flush=True)
        return

    t0 = time.perf_counter()
    val = float(np.asarray(compiled(*fargs)).sum())
    rec["run_s"] = round(time.perf_counter() - t0, 1)
    rec["value_finite"] = bool(np.isfinite(val))
    rec["ok"] = True
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
