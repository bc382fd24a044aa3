"""the examples/ scripts must keep running end to end (CPU, tiny config)."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

TINY_YAML = """\
N_CLASSES: 6
BATCH_SIZE: 2
INPUT_SHAPE: [64, 96]
ANCHOR_AREAS: [0.02, 0.08]
ANCHOR_ASPECT_RATIOS: [0.5, 1.0, 2.0]
MAX_LABELS: 8
PRE_NMS_TOPK: 64
MAX_ROIS: 16
MAX_DETS: 8
D_MAX: 2
K: 3
COMPUTE_DTYPE: float32
"""


def test_track_clip_example_runs(tmp_path):
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "examples" / "track_clip.py"),
            "-c", str(cfg),
            "--n-frames", "6",
            "--frame-chunk", "3",
            "--min-len", "1",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "6 frames ->" in out.stdout, out.stdout
