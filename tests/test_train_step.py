"""end-to-end training tests on synthetic data (tiny shapes, CPU) -- the
integration coverage the reference lacks entirely (SURVEY.md §4): one jitted
joint train step must run, produce finite losses, update only trainable
params, and decrease the loss over a few steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detect_to_track_tpu.config import Config
from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
from detect_to_track_tpu.models import DetectTrackModule
from detect_to_track_tpu.trainer import (
    BatchLoader,
    DetectTrackTrainer,
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

TINY = Config(
    N_CLASSES=6,
    BATCH_SIZE=2,
    INPUT_SHAPE=(64, 96),
    FM_STRIDE=16,
    ANCHOR_AREAS=(0.02, 0.08),
    ANCHOR_ASPECT_RATIOS=(0.5, 1.0, 2.0),
    MAX_LABELS=8,
    PRE_NMS_TOPK=64,
    MAX_ROIS=16,
    MAX_DETS=8,
    D_MAX=2,
    K=3,
    COMPUTE_DTYPE="float32",
    TRAIN_ROI_CONF_THRESH=0.1,
    OUTPUT_DIR="/tmp/d2t_test_output",
)


def tiny_model(cfg: Config, **kw) -> DetectTrackModule:
    return DetectTrackModule(
        backbone_arch="resnet50",
        **kw,
        n_anchors=cfg.n_anchors_per_cell,
        n_classes=cfg.N_CLASSES,
        k=cfg.K,
        d_max=cfg.D_MAX,
        r_hw=cfg.K,
        corr_impl="xla",  # interpret-mode pallas is too slow inside grad
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = TINY
    model = tiny_model(cfg)
    manager = SyntheticVIDManager(
        n_samples=4, image_hw=cfg.INPUT_SHAPE, n_classes=cfg.N_CLASSES
    )
    loader = BatchLoader(manager, cfg.BATCH_SIZE, cfg, seed=0)
    batch = next(iter(loader))
    h, w = cfg.INPUT_SHAPE
    rois = jnp.zeros((2, cfg.MAX_ROIS, 4), jnp.float32) + 0.3
    variables0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3), jnp.float32), rois
    )
    # train steps donate (and delete) their input buffers; hand every test
    # its own copy.
    fresh = lambda: jax.tree_util.tree_map(jnp.copy, variables0)
    return cfg, model, fresh, loader, batch


def test_batch_loader_shapes(setup):
    cfg, _, _, loader, batch = setup
    h, w = cfg.INPUT_SHAPE
    assert batch.images.shape == (2, 2, h, w, 3)
    assert batch.labels.boxes.shape == (2, 2, cfg.MAX_LABELS, 4)
    assert batch.labels.mask.any()
    assert len(loader) == 2


def test_uint8_batch_matches_float(setup):
    """uint8-transferred images (device-side /255) must match the float
    path's losses to float32 precision: XLA lowers the /255 as a
    multiply-by-reciprocal, so normalized inputs land within 1 ulp of the
    host-divided floats. Guards the 4x-smaller transfer path (PIL sources
    pack as uint8; see forward_losses)."""
    cfg, model, fresh, _, batch = setup
    from detect_to_track_tpu.trainer import make_eval_step

    q = np.clip(np.rint(np.asarray(batch.images) * 255.0), 0, 255)
    b_u8 = batch._replace(images=q.astype(np.uint8))
    b_f32 = batch._replace(
        images=q.astype(np.float32) / np.float32(255.0)
    )
    params = fresh()["params"]
    estep = make_eval_step(model, cfg)
    d_u8 = jax.device_get(estep(params, b_u8))
    d_f32 = jax.device_get(estep(params, b_f32))
    for k, a in d_u8.asdict().items():
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(d_f32.asdict()[k]),
            rtol=1e-4,
            atol=1e-7,
            err_msg=k,
        )


def test_pil_sources_pack_uint8():
    """BatchLoader packs PIL-backed instances as uint8 (the transfer-lean
    path); mixed batches promote to float with correct scaling."""
    from PIL import Image

    from detect_to_track_tpu.trainer import BatchLoader

    class _Inst:
        def __init__(self, im, labels=()):
            self.im = im
            self.labels = list(labels)

    class _PILManager:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            im = Image.fromarray(
                (rng.rand(32, 48, 3) * 255).astype(np.uint8)
            )
            return _Inst(im), _Inst(im)

    loader = BatchLoader(_PILManager(), 2, TINY, seed=0)
    batch = next(iter(loader))
    assert batch.images.dtype == np.uint8


def test_train_step_runs_and_loss_decreases(setup):
    cfg, model, fresh, loader, batch = setup
    variables = fresh()
    params = variables["params"]
    tx = make_optimizer(cfg, params)
    step = make_train_step(model, cfg, tx)
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )

    losses = []
    for i in range(4):
        state, dtl = step(state, batch)
        for v in (dtl.o, dtl.b_rpn, dtl.c, dtl.b_rcnn, dtl.t):
            assert np.isfinite(float(v)), dtl
        losses.append(float(dtl.to_scalar(jnp.asarray(cfg.COEFS))))
    assert int(state.step) == 4
    # same batch repeated -> total loss must go down
    assert losses[-1] < losses[0], losses


def test_frozen_params_do_not_move(setup):
    cfg, model, fresh, loader, batch = setup
    variables = fresh()
    params = variables["params"]
    tx = make_optimizer(cfg, params)
    step = make_train_step(model, cfg, tx)
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
    # snapshot before stepping: the step donates (deletes) its input buffers
    bb = variables["params"]["backbone"]
    before = {
        "stem": np.asarray(bb["conv1"]["kernel"]),
        "l2": np.asarray(bb["layer2_0"]["conv1"]["kernel"]),
        "l3": np.asarray(bb["layer3_0"]["conv1"]["kernel"]),
        "rpn": np.asarray(variables["params"]["rpn"]["conv"]["kernel"]),
    }
    state2, _ = step(state, batch)

    bb2 = state2.params["backbone"]
    np.testing.assert_array_equal(
        before["stem"], np.asarray(bb2["conv1"]["kernel"])
    )
    np.testing.assert_array_equal(
        before["l2"], np.asarray(bb2["layer2_0"]["conv1"]["kernel"])
    )
    # layer3+ and heads must move
    assert (
        np.abs(np.asarray(bb2["layer3_0"]["conv1"]["kernel"]) - before["l3"]).max()
        > 0
    )
    rpn_after = np.asarray(state2.params["rpn"]["conv"]["kernel"])
    assert np.abs(rpn_after - before["rpn"]).max() > 0


def test_nan_policy_skip_rolls_back_through_donated_step(setup):
    """NAN_POLICY="skip" must survive the donated jitted step (VERDICT r2
    weak #1): a NaN batch between two clean ones leaves params/opt_state/
    step exactly at the pre-NaN state, and the next clean step still runs.
    The rollback is an on-device select INSIDE the step -- a host-side
    `prev = state` would hold buffers invalidated by donate_argnums on TPU."""
    cfg, model, fresh, loader, batch = setup
    cfg = cfg.replace(NAN_POLICY="skip")
    variables = fresh()
    params = variables["params"]
    tx = make_optimizer(cfg, params)
    step = make_train_step(model, cfg, tx)
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )

    # clean step 1
    state, dtl = step(state, batch)
    assert np.isfinite(float(dtl.to_scalar()))
    after_clean = jax.device_get(state)

    # poisoned step: NaN images -> non-finite loss -> state must not move
    bad = jax.tree_util.tree_map(np.copy, batch)
    bad.images[:] = np.nan
    state, dtl = step(state, bad)
    assert not np.isfinite(float(dtl.to_scalar()))
    rolled = jax.device_get(state)
    for a, b in zip(
        jax.tree_util.tree_leaves(after_clean), jax.tree_util.tree_leaves(rolled)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(rolled.step) == 1  # step counter rolled back too

    # clean step 2 proceeds from the restored state
    state, dtl = step(state, batch)
    assert np.isfinite(float(dtl.to_scalar()))
    assert int(jax.device_get(state.step)) == 2


def test_eval_step_matches_train_loss_at_init(setup):
    cfg, model, fresh, loader, batch = setup
    variables = fresh()
    params = variables["params"]
    eval_step = make_eval_step(model, cfg)
    dtl = eval_step(params, batch)
    for v in (dtl.o, dtl.b_rpn, dtl.c, dtl.b_rcnn, dtl.t):
        assert np.isfinite(float(v))


def test_trainer_step_and_checkpoint_roundtrip(setup, tmp_path):
    cfg, model, fresh, loader, batch = setup
    variables = fresh()
    cfg = cfg.replace(OUTPUT_DIR=str(tmp_path), PATIENCE=0)
    manager = SyntheticVIDManager(
        n_samples=4, image_hw=cfg.INPUT_SHAPE, n_classes=cfg.N_CLASSES
    )
    trainer = DetectTrackTrainer(
        model, variables, manager, manager, None, cfg
    )
    trainer.step()
    assert trainer.n_iters == 4
    assert (tmp_path / "ckpt").exists()
    assert (tmp_path / "metrics.jsonl").exists()

    # resume restores exact state
    stepped = jax.device_get(trainer.state)
    trainer.restore()
    restored = jax.device_get(trainer.state)
    for a, b in zip(
        jax.tree_util.tree_leaves(stepped), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...and rewinds progress accounting, so a resumed --max-iters is a
    # TOTAL budget (the RSS-watchdog exec-restart relies on this).
    assert trainer.n_iters == int(restored.step) * cfg.BATCH_SIZE


def test_host_s2d_loss_matches_plain(setup):
    """HOST_S2D: the loader packs (B, 2, H/2, W/2, 12) and the eval loss
    must equal the plain (B, 2, H, W, 3) path (identity stem rewrite +
    tiled normalization; Config.HOST_S2D)."""
    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager

    cfg, model, fresh, _, batch = setup
    cfg_s = cfg.replace(HOST_S2D=True)
    manager = SyntheticVIDManager(
        n_samples=4, image_hw=cfg.INPUT_SHAPE, n_classes=cfg.N_CLASSES
    )
    loader_s = BatchLoader(manager, cfg.BATCH_SIZE, cfg_s, seed=0)
    batch_s = next(iter(loader_s))
    h, w = cfg.INPUT_SHAPE
    assert batch_s.images.shape == (2, 2, h // 2, w // 2, 12)
    assert batch_s.images.dtype == batch.images.dtype
    # identical underlying pixels (same manager/seed, layout-only change)
    from detect_to_track_tpu.utils import depth_to_space2

    np.testing.assert_array_equal(
        depth_to_space2(batch_s.images), np.asarray(batch.images)
    )

    variables = fresh()
    ev_p = make_eval_step(model, cfg)
    ev_s = make_eval_step(model, cfg_s)
    dtl_p = ev_p(variables["params"], jax.device_put(batch))
    dtl_s = ev_s(variables["params"], jax.device_put(batch_s))
    for k in dtl_p.asdict():
        np.testing.assert_allclose(
            float(dtl_p.asdict()[k]), float(dtl_s.asdict()[k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )


def test_grad_accum_matches_unsplit_step(setup):
    """GRAD_ACCUM=2 must produce the same losses AND the same updated
    params as the unsplit step on the same batch (numerator-sum /
    total-count formulation; fp-reassociation tolerance only)."""
    cfg, model, fresh, _, batch = setup
    out = {}
    for accum in (1, 2):
        cfg_a = cfg.replace(GRAD_ACCUM=accum)
        variables = fresh()
        tx = make_optimizer(cfg_a, variables["params"])
        step = make_train_step(model, cfg_a, tx)
        state = TrainState(
            params=variables["params"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        state, dtl = step(state, jax.device_put(batch))
        out[accum] = (jax.device_get(state.params), jax.device_get(dtl))
    p1, d1 = out[1]
    p2, d2 = out[2]
    for k in d1.asdict():
        np.testing.assert_allclose(
            float(d1.asdict()[k]), float(d2.asdict()[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )
    assert float(d2.count) == 1.0  # DTLoss.single convention preserved
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = jax.tree_util.tree_leaves_with_path(p2)
    for (ka, a), (kb, b) in zip(flat1, flat2):
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-6, err_msg=str(ka)
        )


def test_remat_matches_plain_step(setup):
    """REMAT=True (rematerialized backbone blocks) must be a pure
    memory/compute trade: identical losses and identical updated params
    vs the plain step, from identical init."""
    cfg, model, fresh, _, batch = setup
    model_r = tiny_model(cfg, remat=True)
    out = {}
    for name, m in (("plain", model), ("remat", model_r)):
        variables = fresh()
        tx = make_optimizer(cfg, variables["params"])
        step = make_train_step(m, cfg, tx)
        state = TrainState(
            params=variables["params"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        state, dtl = step(state, jax.device_put(batch))
        out[name] = (jax.device_get(state.params), jax.device_get(dtl))
    p1, d1 = out["plain"]
    p2, d2 = out["remat"]
    for k in d1.asdict():
        np.testing.assert_allclose(
            float(d1.asdict()[k]), float(d2.asdict()[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = jax.tree_util.tree_leaves_with_path(p2)
    assert len(flat1) == len(flat2)  # remat must not change the param tree
    for (ka, a), (kb, b) in zip(flat1, flat2):
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-6, err_msg=str(ka)
        )


def test_report_images_preserve_uint8_sources(setup, tmp_path):
    """report overlays must not rescale uint8 report images by 255 again
    (regression: the same double-rescale class that saturated PIL clip
    frames white -- clip.py fix in be3f595, report path fixed later)."""
    cfg, model, fresh, _, _ = setup
    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.trainer import DetectTrackTrainer

    class Uint8Manager(SyntheticVIDManager):
        def __getitem__(self, i):
            i0, i1 = super().__getitem__(i)
            to8 = lambda inst: inst._replace(
                im=(inst.im * 255).astype(np.uint8)
            )
            return to8(i0), to8(i1)

    t = DetectTrackTrainer.__new__(DetectTrackTrainer)
    t.model = model
    t.cfg = cfg
    t.state = TrainState(
        params=fresh()["params"], opt_state=None, step=jnp.zeros((), jnp.int32)
    )
    t.rep_manager = Uint8Manager(
        n_samples=1, image_hw=cfg.INPUT_SHAPE, n_classes=cfg.N_CLASSES
    )
    t.output_dir = tmp_path
    images = t._report_images()
    assert len(images) == 1
    arr = np.array(next(iter(images.values())))
    # a double-rescaled uint8 source saturates ~every pixel to 255; the
    # synthetic background is dim (<=0.1*255), so the mean must stay low
    assert arr.mean() < 100, arr.mean()


def test_grad_accum_rejects_indivisible_batch(setup):
    cfg, model, fresh, _, batch = setup
    cfg_a = cfg.replace(GRAD_ACCUM=3)  # BATCH_SIZE=2 not divisible
    variables = fresh()
    tx = make_optimizer(cfg_a, variables["params"])
    step = make_train_step(model, cfg_a, tx)
    state = TrainState(
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    with pytest.raises(ValueError):
        step(state, jax.device_put(batch))
