"""DetectTrackTrainer with NUM_DEVICES > 1 on the virtual CPU mesh."""

import jax
import jax.numpy as jnp

from detect_to_track_tpu.config import Config
from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
from detect_to_track_tpu.trainer import DetectTrackTrainer
from __graft_entry__ import _model_for


def test_trainer_runs_on_4_device_mesh(tmp_path):
    cfg = Config(
        N_CLASSES=4,
        BATCH_SIZE=4,
        NUM_DEVICES=4,
        INPUT_SHAPE=(32, 48),
        ANCHOR_AREAS=(0.05,),
        ANCHOR_ASPECT_RATIOS=(1.0, 2.0),
        MAX_LABELS=4,
        PRE_NMS_TOPK=16,
        MAX_ROIS=8,
        MAX_DETS=4,
        D_MAX=1,
        K=2,
        COMPUTE_DTYPE="float32",
        OUTPUT_DIR=str(tmp_path),
        PATIENCE=0,
    )
    model = _model_for(cfg, corr_impl="xla")
    manager = SyntheticVIDManager(
        n_samples=4, image_hw=cfg.INPUT_SHAPE, n_classes=cfg.N_CLASSES,
        n_objects=2,
    )
    h, w = cfg.INPUT_SHAPE
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
    )
    trainer = DetectTrackTrainer(model, variables, manager, manager, None, cfg)
    assert trainer.mesh is not None and trainer.mesh.shape == {"data": 4}
    trainer.step()
    assert trainer.n_iters == 4
    assert (tmp_path / "ckpt").exists()
