"""config loading, bfloat16 compute path, quirk-flag plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detect_to_track_tpu.config import Config, load_config, save_config


def test_load_reference_schema(tmp_path):
    """the reference's own cfg keys must load unchanged
    (reference cfg/default.yaml:1-50)."""
    cfg = load_config("cfg/default.yaml")
    assert cfg.INPUT_SHAPE == (608, 1200)
    assert cfg.n_anchors_per_cell == 15
    assert cfg.n_anchors == 38 * 75 * 15 == 42750
    assert cfg.SGD_KWARGS["lr"] == 1e-2


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        load_config(str(p))


def test_save_load_roundtrip(tmp_path):
    cfg = Config(BATCH_SIZE=7, ANCHOR_AREAS=(0.1, 0.2))
    p = tmp_path / "cfg.yaml"
    save_config(cfg, str(p))
    cfg2 = load_config(str(p))
    assert cfg2 == cfg


def test_bfloat16_train_step_finite():
    """the COMPUTE_DTYPE=bfloat16 path (params f32, compute bf16, losses
    f32) must produce finite losses end to end."""
    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.models import DetectTrackModule
    from detect_to_track_tpu.trainer import (
        BatchLoader,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    cfg = Config(
        N_CLASSES=4,
        BATCH_SIZE=2,
        INPUT_SHAPE=(32, 48),
        ANCHOR_AREAS=(0.05,),
        ANCHOR_ASPECT_RATIOS=(1.0, 2.0),
        MAX_LABELS=4,
        PRE_NMS_TOPK=16,
        MAX_ROIS=8,
        MAX_DETS=4,
        D_MAX=1,
        K=2,
        COMPUTE_DTYPE="bfloat16",
    )
    model = DetectTrackModule(
        backbone_arch="resnet50",
        n_anchors=cfg.n_anchors_per_cell,
        n_classes=cfg.N_CLASSES,
        k=cfg.K,
        d_max=cfg.D_MAX,
        r_hw=cfg.K,
        corr_impl="xla",
        dtype=jnp.bfloat16,
    )
    manager = SyntheticVIDManager(
        n_samples=2, image_hw=cfg.INPUT_SHAPE, n_classes=cfg.N_CLASSES,
        n_objects=2,
    )
    batch = next(iter(BatchLoader(manager, 2, cfg, seed=0)))
    h, w = cfg.INPUT_SHAPE
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
    )
    # params stay float32 even with bf16 compute
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32

    tx = make_optimizer(cfg, variables["params"])
    step = make_train_step(model, cfg, tx)
    state = TrainState(
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    state, dtl = step(state, batch)
    for v in (dtl.o, dtl.b_rpn, dtl.c, dtl.b_rcnn, dtl.t):
        assert np.isfinite(float(v)), dtl


def test_psroi_channel_map_flag_changes_output(rng):
    """FIX_PSROI_CHANNEL_MAP must select the paper layout end to end."""
    from detect_to_track_tpu.ops import ps_roi_pool

    fm = rng.rand(10, 10, 2 * 9).astype(np.float32)
    rois = np.array([[0.5, 0.5, 0.6, 0.6]], np.float32)
    quirk = np.asarray(ps_roi_pool(fm, rois, 2, 3, False))
    paper = np.asarray(ps_roi_pool(fm, rois, 2, 3, True))
    assert not np.allclose(quirk, paper)


def test_config_value_validation():
    """bad VALUES fail at load, not as shape errors deep in the first
    jitted step (stride mismatch) or a silent float32 fallback (dtype)."""
    import pytest

    from detect_to_track_tpu.config import Config

    with pytest.raises(ValueError, match="FM_STRIDE"):
        Config(INPUT_SHAPE=(600, 1200), FM_STRIDE=16)
    with pytest.raises(ValueError, match="COMPUTE_DTYPE"):
        Config(COMPUTE_DTYPE="bf16")
    with pytest.raises(ValueError, match="NAN_POLICY"):
        Config(NAN_POLICY="ignore")
    with pytest.raises(ValueError, match="HOST_S2D"):
        Config(INPUT_SHAPE=(609, 1201), FM_STRIDE=1, HOST_S2D=True)
    import jax.numpy as jnp

    assert Config().compute_dtype == jnp.bfloat16
    assert Config(COMPUTE_DTYPE="float32").compute_dtype == jnp.float32


def test_max_dets_clamps_to_max_rois():
    """effective detection capacity is min(MAX_DETS, MAX_ROIS): at most
    MAX_ROIS proposals survive NMS, and lax.top_k(k) requires k <= input
    size -- a tiny MAX_ROIS config must not crash the detection compaction
    (found by driving train.py with MAX_ROIS=16 < default MAX_DETS=128)."""
    from detect_to_track_tpu.config import Config

    assert Config(MAX_ROIS=16).max_dets == 16
    assert Config(MAX_ROIS=256, MAX_DETS=128).max_dets == 128
    assert Config(MAX_ROIS=64, MAX_DETS=64).max_dets == 64
