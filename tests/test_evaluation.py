"""mAP evaluation tests."""

import numpy as np

from detect_to_track_tpu.evaluation import average_precision, detection_map


def _onehotish(c, n_classes, conf):
    v = np.full(n_classes + 1, (1 - conf) / n_classes, np.float32)
    v[c] = conf
    return v


def test_perfect_detections_have_map_1():
    n_classes = 3
    gt_c = [np.array([1, 2]), np.array([3])]
    gt_b = [
        np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]], np.float32),
        np.array([[0.5, 0.5, 0.3, 0.3]], np.float32),
    ]
    det_c = [
        np.stack([_onehotish(1, n_classes, 0.9), _onehotish(2, n_classes, 0.8)]),
        np.stack([_onehotish(3, n_classes, 0.95)]),
    ]
    res = detection_map(det_c, gt_b, gt_c, gt_b, n_classes)
    assert res["mAP"] == 1.0


def test_missed_detection_lowers_map():
    n_classes = 2
    gt_c = [np.array([1, 1])]
    gt_b = [np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]], np.float32)]
    # only one of the two objects detected
    det_c = [np.stack([_onehotish(1, n_classes, 0.9)])]
    det_b = [gt_b[0][:1]]
    res = detection_map(det_c, det_b, gt_c, gt_b, n_classes)
    assert 0.0 < res["mAP"] < 1.0
    np.testing.assert_allclose(res["AP_1"], 0.5)


def test_false_positive_lowers_precision():
    n_classes = 1
    gt_c = [np.array([1])]
    gt_b = [np.array([[0.3, 0.3, 0.2, 0.2]], np.float32)]
    det_b = [
        np.array(
            [[0.3, 0.3, 0.2, 0.2], [0.8, 0.8, 0.1, 0.1]], np.float32
        )  # second is a FP
    ]
    det_c = [
        np.stack(
            [_onehotish(1, n_classes, 0.9), _onehotish(1, n_classes, 0.8)]
        )
    ]
    res = detection_map(det_c, det_b, gt_c, gt_b, n_classes)
    assert res["AP_1"] == 1.0  # FP ranked below the TP: AP unaffected at r=1
    # FP ranked above -> AP drops
    det_c2 = [
        np.stack(
            [_onehotish(1, n_classes, 0.5), _onehotish(1, n_classes, 0.8)]
        )
    ]
    res2 = detection_map(det_c2, det_b, gt_c, gt_b, n_classes)
    assert res2["AP_1"] < 1.0


def test_average_precision_shape():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 0.5])
    ap = average_precision(r, p)
    assert 0.5 < ap <= 1.0


def test_evaluate_cli_all_ckpts_shares_one_detector(tmp_path, monkeypatch, capsys):
    """`evaluate.py --all-ckpts` must evaluate every history entry while
    constructing exactly ONE Detector (a fresh Detector per checkpoint means
    a full XLA recompile per entry -- minutes each through a remote-compile
    tunnel) and restore each checkpoint exactly once."""
    import importlib.util
    import json
    import sys
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.models import DetectTrackModule
    import detect_to_track_tpu.inference as inference_mod

    cfg_kw = dict(
        N_CLASSES=6,
        BATCH_SIZE=2,
        INPUT_SHAPE=(64, 96),
        ANCHOR_AREAS=(0.02, 0.08),
        ANCHOR_ASPECT_RATIOS=(0.5, 1.0, 2.0),
        MAX_LABELS=8,
        PRE_NMS_TOPK=64,
        MAX_ROIS=16,
        MAX_DETS=8,
        D_MAX=2,
        K=3,
        COMPUTE_DTYPE="float32",
    )
    cfg = Config(**cfg_kw)
    yaml_path = tmp_path / "tiny.yaml"
    yaml_path.write_text(
        "\n".join(
            f"{k}: {list(v) if isinstance(v, tuple) else v}"
            for k, v in cfg_kw.items()
        )
    )

    model = DetectTrackModule(
        backbone_arch=cfg.BACKBONE_ARCH,
        n_anchors=cfg.n_anchors_per_cell,
        n_classes=cfg.N_CLASSES,
        k=cfg.K,
        d_max=cfg.D_MAX,
        r_hw=cfg.K,
        dtype=jnp.float32,
    )
    h, w = cfg.INPUT_SHAPE
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
    )
    ckptr = ocp.StandardCheckpointer()
    for name, step in [
        ("ckpt_step_00000002", 2),
        ("ckpt_step_00000003", 3),
        ("ckpt", 4),
    ]:
        path = (tmp_path / name).absolute()
        ckptr.save(
            path,
            {"params": variables["params"], "step": jnp.asarray(step)},
            force=True,
        )
    ckptr.wait_until_finished()

    inits = []
    orig_init = inference_mod.Detector.__init__

    def counting_init(self, *a, **kw):
        inits.append(1)
        return orig_init(self, *a, **kw)

    monkeypatch.setattr(inference_mod.Detector, "__init__", counting_init)
    spec = importlib.util.spec_from_file_location(
        "evaluate_cli", Path(__file__).resolve().parents[1] / "evaluate.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "evaluate.py",
            "-c", str(yaml_path),
            "--synthetic",
            "--n-samples", "2",
            "--ckpt", str(tmp_path / "ckpt"),
            "--all-ckpts",
        ],
    )
    mod.main()

    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if "'mAP'" in l]
    assert len(lines) == 3  # one per history entry + the main ckpt
    assert "ckpt_step_00000002" in out and "ckpt(best)" in out
    assert sum(inits) == 1  # ONE Detector, params swapped per restore

    # --min-step extends an existing trace: rotating entries below the
    # bound are skipped entirely (never restored, never evaluated); the
    # main --ckpt path still scores so the run's best is always printed.
    monkeypatch.setattr(
        sys,
        "argv",
        sys.argv[:-1] + ["--all-ckpts", "--min-step", "3"],
    )
    mod.main()
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if "'mAP'" in l]
    assert len(lines) == 2
    assert "ckpt_step_00000002" not in out
    assert "ckpt_step_00000003" in out and "ckpt(best)" in out
