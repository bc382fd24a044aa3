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
    t._check_finite(_nan_loss())  # no raise
    assert "non-finite" in capsys.readouterr().out


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
