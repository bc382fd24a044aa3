"""failure-detection and validation paths."""

import numpy as np
import pytest

from detect_to_track_tpu.config import Config
from detect_to_track_tpu.losses import DTLoss


class _Trainerish:
    """just enough of DetectTrackTrainer to exercise _check_finite."""

    from detect_to_track_tpu.trainer import DetectTrackTrainer as _T

    _check_finite = _T._check_finite

    def __init__(self, policy):
        self.cfg = Config(NAN_POLICY=policy)
        self.n_iters = 0


def _nan_loss():
    import jax.numpy as jnp

    return DTLoss.single(*(jnp.asarray(v) for v in [1.0, np.nan, 1.0, 1.0, 1.0]))


def test_nan_policy_raise():
    t = _Trainerish("raise")
    with pytest.raises(FloatingPointError):
        t._check_finite(_nan_loss())


def test_nan_policy_warn(capsys):
    t = _Trainerish("warn")
    assert t._check_finite(_nan_loss()) is False  # no raise
    assert "non-finite" in capsys.readouterr().out


def test_nan_policy_skip_reports_rollback(capsys):
    t = _Trainerish("skip")
    assert t._check_finite(_nan_loss()) is False
    assert "skipping update" in capsys.readouterr().out


class _RestorePickerish:
    """just enough of DetectTrackTrainer to exercise _pick_restore_path."""

    from detect_to_track_tpu.trainer import DetectTrackTrainer as _T

    _pick_restore_path = _T._pick_restore_path

    def __init__(self, output_dir):
        self.output_dir = output_dir


def test_restore_prefers_most_recent_not_highest_step(tmp_path):
    """a stale ckpt_autosave from a PREVIOUS run in a reused OUTPUT_DIR can
    carry a higher step than this run's own fresh ckpt; selection must go by
    write recency, not step, or a resume silently restores the other run's
    params."""
    import json
    import os

    def fake_ckpt(name, step, mtime):
        p = tmp_path / name
        p.mkdir()
        meta = tmp_path / f"{name}.meta.json"
        meta.write_text(json.dumps({"step": step}))
        os.utime(meta, (mtime, mtime))
        return p

    stale_auto = fake_ckpt("ckpt_autosave", step=1500, mtime=1_000_000.0)
    fresh_ckpt = fake_ckpt("ckpt", step=150, mtime=2_000_000.0)
    t = _RestorePickerish(tmp_path)
    assert t._pick_restore_path() == fresh_ckpt.absolute()

    # ...but after a watchdog autosave (newest write), the autosave wins
    os.utime(tmp_path / "ckpt_autosave.meta.json", (3_000_000.0, 3_000_000.0))
    assert t._pick_restore_path() == stale_auto.absolute()

    # equal mtimes tie to `ckpt` (the best model)
    os.utime(tmp_path / "ckpt_autosave.meta.json", (2_000_000.0, 2_000_000.0))
    assert t._pick_restore_path() == fresh_ckpt.absolute()


class _WatchdogTrainerish:
    """just enough of DetectTrackTrainer to exercise the host-RSS
    watchdog (_check_host_memory): real limit derivation, stubbed
    checkpoint, recorded callback."""

    from detect_to_track_tpu.trainer import DetectTrackTrainer as _T

    _check_host_memory = _T._check_host_memory
    _host_rss_limit_gb = _T._host_rss_limit_gb
    _host_rss_gb = staticmethod(_T._host_rss_gb)

    def __init__(self, limit_gb):
        from pathlib import Path

        import jax.numpy as jnp

        self.cfg = Config(HOST_RSS_LIMIT_GB=limit_gb)
        self.state = type("S", (), {"step": jnp.asarray(3)})()
        self.output_dir = Path("/tmp")
        self.checkpoints = 0
        self.restarts = 0
        self.on_host_memory_limit = self._restart

    def checkpoint(self, path=None):
        self.checkpoints += 1
        self.checkpoint_path = path

    def _restart(self):
        self.restarts += 1


def test_host_rss_watchdog_triggers_checkpoint_and_restart(capsys):
    """any live process exceeds a 1 MB limit: the watchdog must autosave
    FIRST (to ckpt_autosave, never clobbering the latest-best ckpt), then
    invoke the restart hook."""
    t = _WatchdogTrainerish(limit_gb=0.001)
    t._check_host_memory()
    assert t.checkpoints == 1 and t.restarts == 1
    assert str(t.checkpoint_path).endswith("ckpt_autosave")
    assert "HOST_RSS_LIMIT_GB" in capsys.readouterr().out


def test_host_rss_watchdog_disarms_without_handler(capsys):
    """library use (no on_host_memory_limit handler): RSS never drops once
    the remote client's transfer retention trips the limit, so the watchdog
    must autosave ONCE and disarm instead of re-checkpointing at every
    LOG_EVERY window forever."""
    t = _WatchdogTrainerish(limit_gb=0.001)
    t.on_host_memory_limit = None
    t._check_host_memory()
    t._check_host_memory()
    t._check_host_memory()
    assert t.checkpoints == 1 and t.restarts == 0
    assert "disarmed" in capsys.readouterr().out


def test_host_rss_watchdog_fires_mid_epoch_with_logging_disabled(tmp_path):
    """the mid-epoch watchdog must run on EVERY batch, not only inside the
    LOG_EVERY logging branch: a user silencing metrics (LOG_EVERY=0) must
    not silently lose OOM protection (the motivating failure was killed
    MID-epoch at step ~910; PERF.md 'host memory')."""
    import jax

    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.trainer import DetectTrackTrainer
    from tests.test_train_step import TINY, tiny_model

    cfg = TINY.replace(
        LOG_EVERY=0,
        HOST_RSS_LIMIT_GB=0.001,  # any live process exceeds 1 MB
        OUTPUT_DIR=str(tmp_path),
    )
    model = tiny_model(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0), cfg)
    mgr = SyntheticVIDManager(n_samples=8, image_hw=cfg.INPUT_SHAPE,
                              n_classes=cfg.N_CLASSES)
    trainer = DetectTrackTrainer(model, variables, mgr, mgr, None, cfg)

    class _Fired(Exception):
        pass

    def handler():
        raise _Fired  # stop immediately; train.py would exec-restart here

    trainer.on_host_memory_limit = handler
    trainer._max_iters = float("inf")
    with pytest.raises(_Fired):
        trainer.train()  # must trip on the FIRST batch, mid-epoch
    assert (tmp_path / "ckpt_autosave").exists()


def test_watchdog_mid_validation_resumes_into_validation(tmp_path):
    """a watchdog autosave fired INSIDE validate() must mark val_pending in
    its meta sidecar, and a restored trainer must finish that epoch's
    interrupted validation (run()'s pre-loop path) instead of silently
    skipping it: otherwise a val split that trips the RSS bound on every
    pass would starve early stopping and the best-`ckpt` save forever,
    while training runs on to --max-iters."""
    import json

    import jax

    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.trainer import DetectTrackTrainer
    from tests.test_train_step import TINY, tiny_model

    cfg = TINY.replace(
        LOG_EVERY=0,
        HOST_RSS_LIMIT_GB=0,  # disabled while training the first epoch
        OUTPUT_DIR=str(tmp_path),
    )
    model = tiny_model(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0), cfg)
    mgr = SyntheticVIDManager(n_samples=cfg.BATCH_SIZE,
                              image_hw=cfg.INPUT_SHAPE,
                              n_classes=cfg.N_CLASSES)
    trainer = DetectTrackTrainer(model, variables, mgr, mgr, None, cfg)
    trainer._max_iters = cfg.BATCH_SIZE
    trainer.train()

    # arm the watchdog by changing cfg alone: the limit cache is keyed on
    # the cfg value (ADVICE r3), so no reach-in reset is needed
    trainer.cfg = trainer.cfg.replace(HOST_RSS_LIMIT_GB=0.001)

    class _Fired(Exception):
        pass

    def handler():
        raise _Fired  # train.py would exec-restart here

    trainer.on_host_memory_limit = handler
    with pytest.raises(_Fired):
        trainer.validate()
    meta = json.loads((tmp_path / "ckpt_autosave.meta.json").read_text())
    assert meta["val_pending"] is True

    # fresh trainer = the exec-restarted process: restore picks the
    # autosave, and run() must complete the pending validation (improving
    # on best_val_loss=inf -> best-`ckpt` save) BEFORE any training.
    variables2 = model.init_variables(jax.random.PRNGKey(1), cfg)
    trainer2 = DetectTrackTrainer(model, variables2, mgr, mgr, None, cfg)
    trainer2.restore()
    assert trainer2._val_pending

    def fail_train():
        raise AssertionError("trained before finishing the pending val")

    trainer2.train = fail_train  # max_iters below blocks the loop anyway
    trainer2.run(max_iters=trainer2.n_iters)
    assert not trainer2._val_pending
    assert trainer2.best_val_loss < float("inf")
    ckpt_meta = json.loads((tmp_path / "ckpt.meta.json").read_text())
    assert ckpt_meta["val_pending"] is False
    # clean completion drops the autosave so it can't shadow future runs...
    assert not (tmp_path / "ckpt_autosave").exists()
    # ...and saves the run's ENDPOINT: a bounded run whose val loss
    # plateaus must not end with its final weights existing nowhere.
    final_meta = json.loads((tmp_path / "ckpt_final.meta.json").read_text())
    assert final_meta["n_iters"] == trainer2.n_iters


def test_host_rss_reads_current_not_peak():
    """the watchdog must read CURRENT RSS: ru_maxrss (lifetime peak)
    survives execve, so a restarted process would re-trip forever."""
    import resource

    cur = _WatchdogTrainerish._host_rss_gb()
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert 0 < cur <= peak * 1.05


def test_host_rss_unreadable_disables_watchdog(monkeypatch):
    """no /proc (macOS etc.): the fallback must be 0.0 (watchdog inert),
    NOT ru_maxrss -- peak semantics re-trip after every exec-restart and
    the unit differs by platform (KB Linux, bytes macOS), which would turn
    the watchdog into an infinite checkpoint/restart loop."""
    import os

    def boom(_name):
        raise ValueError("no SC_PAGE_SIZE")

    monkeypatch.setattr(os, "sysconf", boom)
    assert _WatchdogTrainerish._host_rss_gb() == 0.0
    t = _WatchdogTrainerish(limit_gb=0.001)
    t._check_host_memory()
    assert t.checkpoints == 0 and t.restarts == 0


def test_host_rss_watchdog_disabled_and_auto():
    t = _WatchdogTrainerish(limit_gb=0)  # 0 = disabled
    t._check_host_memory()
    assert t.checkpoints == 0 and t.restarts == 0
    assert t._host_rss_limit_gb() == float("inf")
    auto = _WatchdogTrainerish(limit_gb=-1)  # auto: 70% of MemTotal
    lim = auto._host_rss_limit_gb()
    assert 0 < lim < float("inf")
    auto._check_host_memory()  # tests run far below 70% of RAM
    assert auto.checkpoints == 0


def test_prefetch_propagates_producer_exception():
    """a crash in decode/packing must abort training with the original
    error, not silently end the epoch (VERDICT r1 weak #6)."""
    from detect_to_track_tpu.trainer import prefetch

    def bad_iterator():
        yield 1
        raise RuntimeError("corrupt file mid-epoch")

    it = prefetch(bad_iterator())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="corrupt file mid-epoch"):
        next(it)


def test_box_decode_extreme_offsets_finite():
    """garbage/untrained offsets must decode to finite boxes
    (VERDICT r1 weak #5): t_hw is clamped before exp."""
    from detect_to_track_tpu.encoding import frcnn_box_decode

    anchors = np.array([[0.5, 0.5, 0.1, 0.2]], np.float32)
    offsets = np.array([[1e4, -1e4, 700.0, -700.0]], np.float32)
    out = np.asarray(frcnn_box_decode(anchors, offsets, xp=np))
    assert np.all(np.isfinite(out))
    # unclamped inverse still available for exact round-trips
    raw = np.asarray(
        frcnn_box_decode(anchors, offsets, xp=np, clip=None)
    )
    assert np.isinf(raw[0, 2])


def test_pre_nms_topk_honors_reference_capacity_keys():
    """TRAIN_MAX_ROIS / EVAL_MAX_ROIS from a reference YAML set the pre-NMS
    capacity unless PRE_NMS_TOPK explicitly overrides (VERDICT r1 item 5)."""
    cfg = Config(TRAIN_MAX_ROIS=3000, EVAL_MAX_ROIS=300)
    assert cfg.pre_nms_topk_train == 3072  # rounded up to lane multiple
    assert cfg.pre_nms_topk_eval == 384
    tiny = Config(INPUT_SHAPE=(64, 96), ANCHOR_AREAS=(0.02,))
    assert tiny.pre_nms_topk_train == tiny.n_anchors  # capped at |A|
    override = Config(PRE_NMS_TOPK=512)
    assert override.pre_nms_topk_train == 512
    assert override.pre_nms_topk_eval == 512


def test_pre_nms_cap_masks_lane_padding():
    """pre_nms_topk is lane-padded (3000 -> 3072 slots) but only the exact
    reference MaxDetFilter capacity may enter NMS (ADVICE r2 #3)."""
    import jax.numpy as jnp

    from detect_to_track_tpu.ops.nms import proposal_filter

    cfg = Config(TRAIN_MAX_ROIS=3000, EVAL_MAX_ROIS=300)
    assert cfg.pre_nms_topk_train == 3072 and cfg.pre_nms_cap_train == 3000
    assert cfg.pre_nms_topk_eval == 384 and cfg.pre_nms_cap_eval == 300

    # functional: 24 disjoint boxes (no NMS suppression), topk=16, cap=10
    # -> exactly the 10 best survive; slots 10..15 are masked out.
    n = 24
    scores = jnp.linspace(1.0, 0.5, n)
    boxes = jnp.stack(
        [jnp.arange(n) * 10.0, jnp.zeros(n), jnp.full(n, 4.0), jnp.full(n, 4.0)],
        axis=1,
    )
    out = proposal_filter(scores, boxes, 16, 0.0, 0.5, 16, 10)
    assert int(out.valid.sum()) == 10
    uncapped = proposal_filter(scores, boxes, 16, 0.0, 0.5, 16)
    assert int(uncapped.valid.sum()) == 16


def test_vid_source_validates_frame_label_counts(tmp_path):
    """frame/label count mismatch must raise at init (the reference's only
    dataset integrity check, imagenet.py:46-51)."""
    from PIL import Image

    from detect_to_track_tpu.data.imagenet import VIDPairSource

    sid = "batch/snip"
    (tmp_path / "Data/VID/train" / sid).mkdir(parents=True)
    (tmp_path / "Annotations/VID/train" / sid).mkdir(parents=True)
    Image.new("RGB", (10, 10)).save(
        tmp_path / "Data/VID/train" / sid / "000000.JPEG"
    )
    # no xml files -> mismatch
    with pytest.raises(RuntimeError):
        VIDPairSource(tmp_path, [sid], a=0.5)


def test_find_snippets_missing_dir_raises(tmp_path):
    from detect_to_track_tpu.data.imagenet import find_vid_trn_snippet_ids

    (tmp_path / "ImageSets/VID").mkdir(parents=True)
    (tmp_path / "ImageSets/VID/train_10.txt").write_text("missing/snippet 1\n")
    with pytest.raises(FileNotFoundError):
        find_vid_trn_snippet_ids(tmp_path)


def test_ps_roi_pool_channel_validation(rng):
    from detect_to_track_tpu.ops import ps_roi_pool

    fm = rng.rand(8, 8, 10).astype(np.float32)  # wrong channel count
    rois = np.zeros((1, 4), np.float32)
    with pytest.raises(ValueError):
        ps_roi_pool(fm, rois, 2, 3)


def test_trainer_rejects_empty_val_loader():
    """zero val batches would make every epoch's val loss 0/0 = NaN -- no
    checkpoint ever saved; the trainer must fail at construction."""
    import jax.numpy as jnp

    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.trainer import DetectTrackTrainer
    from tests.test_train_step import TINY, tiny_model

    cfg = TINY
    model = tiny_model(cfg)
    h, w = cfg.INPUT_SHAPE
    import jax

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
    )
    trn = SyntheticVIDManager(n_samples=4, image_hw=cfg.INPUT_SHAPE,
                              n_classes=cfg.N_CLASSES)
    val = SyntheticVIDManager(n_samples=1, image_hw=cfg.INPUT_SHAPE,
                              n_classes=cfg.N_CLASSES)  # < BATCH_SIZE=2
    with pytest.raises(ValueError, match="0 batches"):
        DetectTrackTrainer(model, variables, trn, val, None, cfg)


def test_trainer_rejects_empty_trn_loader():
    """a zero-batch TRAIN loader (drop_last) would silently train nothing
    while burning PATIENCE full validation epochs; fail at construction,
    symmetric with the val guard above."""
    import jax
    import jax.numpy as jnp

    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.trainer import DetectTrackTrainer
    from tests.test_train_step import TINY, tiny_model

    cfg = TINY
    model = tiny_model(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0), cfg)
    trn = SyntheticVIDManager(n_samples=1, image_hw=cfg.INPUT_SHAPE,
                              n_classes=cfg.N_CLASSES)  # < BATCH_SIZE=2
    val = SyntheticVIDManager(n_samples=4, image_hw=cfg.INPUT_SHAPE,
                              n_classes=cfg.N_CLASSES)
    with pytest.raises(ValueError, match="training manager yields 0"):
        DetectTrackTrainer(model, variables, trn, val, None, cfg)


def test_prefetch_stops_producer_on_early_close():
    """a consumer that stops early (max_iters mid-epoch) must release the
    producer thread instead of leaving it blocked on a full queue holding
    decoded batches for the rest of the process."""
    import time

    from detect_to_track_tpu.trainer import prefetch

    produced = []

    def src():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch(src(), depth=2)
    assert next(it) == 0
    it.close()  # early stop
    time.sleep(0.6)  # > the producer's 0.25 s put timeout
    n = len(produced)
    time.sleep(0.6)
    assert len(produced) == n  # producer no longer draining the source
    assert n < 1000


def test_trainer_rejects_partial_mesh_under_multiprocess(monkeypatch):
    """under a multi-process runtime the mesh must span every process's
    devices: NUM_DEVICES=1 would silently train nprocs independent models
    (racing non-collective checkpoints into the shared OUTPUT_DIR), and a
    per-host NUM_DEVICES would fail obscurely inside the first sharded
    step. Both must fail at construction instead."""
    import jax
    import jax.numpy as jnp

    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.trainer import DetectTrackTrainer
    from tests.test_train_step import TINY, tiny_model

    cfg = TINY
    model = tiny_model(cfg)
    h, w = cfg.INPUT_SHAPE
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
    )
    mgr = SyntheticVIDManager(n_samples=4, image_hw=cfg.INPUT_SHAPE,
                              n_classes=cfg.N_CLASSES)

    import detect_to_track_tpu.trainer as trainer_mod

    monkeypatch.setattr(trainer_mod.jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="NUM_DEVICES"):
        DetectTrackTrainer(model, variables, mgr, mgr, None, cfg)


def test_bench_headline_survives_faulting_secondary():
    """chip-fault containment (VERDICT r4 weak #1/#4): run the REAL bench
    harness (tiny CPU config) with a fault injected into an early
    secondary, and assert (a) rc == 0, (b) the headline JSON line printed
    BEFORE any secondary could fail, (c) the faulted metric is a named
    null in the enriched line while LATER secondaries still recorded."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env.update(
        D2T_BENCH_TINY="1",
        D2T_BENCH_FAULT="single_pair_inference",
        D2T_BENCH_BUDGET_S="100000",
    )
    out = subprocess.run(
        [sys.executable, str(repo / "bench.py")],
        capture_output=True, text=True, timeout=1200, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = []
    for ln in out.stdout.splitlines():
        try:
            lines.append(json.loads(ln))
        except json.JSONDecodeError:
            continue
    assert len(lines) >= 2, out.stdout
    headline, enriched = lines[0], lines[-1]
    # headline printed before secondaries -> carries no secondary keys
    assert headline["metric"] == "train_frame_pairs_per_sec_per_chip"
    assert headline["value"] > 0
    assert "inference_pairs_per_sec" not in headline
    # the injected fault is a named null; later secondaries still measured
    assert enriched["inference_pairs_per_sec"] is None
    assert enriched["batched_inference_pairs_per_sec"] is not None
    assert enriched["clip_device_fps"] is not None
    assert "injected fault" in out.stderr
