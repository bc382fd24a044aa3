"""measure NMS survivor counts at the working point to justify MAX_ROIS.

The reference sends ALL NMS survivors to R-FCN (reference trainer.py:98-102);
XLA needs a static bound (cfg.MAX_ROIS). This tool measures how many
proposals actually survive conf-gate -> top-k -> NMS, at the worst point in
training for survivor counts: random init (scores uninformative, so the gate
passes many anchors and survivor count is driven purely by NMS geometry).

Run:  python tools/measure_nms_survivors.py [--eval] [--n 8]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval", action="store_true", help="use eval thresholds")
    ap.add_argument("--n", type=int, default=8, help="frames to measure")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from detect_to_track_tpu.anchors import build_anchors
    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.encoding import frcnn_box_decode
    from detect_to_track_tpu.models import DetectTrackModule
    from detect_to_track_tpu.ops.nms import nms_mask, top_k_proposals

    cfg = Config()
    conf = cfg.EVAL_ROI_CONF_THRESH if args.eval else cfg.TRAIN_ROI_CONF_THRESH
    iou = cfg.EVAL_NMS_IOU_THRESH if args.eval else cfg.TRAIN_NMS_IOU_THRESH
    topk = cfg.pre_nms_topk_eval if args.eval else cfg.pre_nms_topk_train

    model = DetectTrackModule(
        backbone_arch=cfg.BACKBONE_ARCH,
        first_trainable_stage=cfg.FIRST_TRAINABLE_STAGE,
        n_anchors=cfg.n_anchors_per_cell,
        n_classes=cfg.N_CLASSES,
        k=cfg.K,
        d_max=cfg.D_MAX,
        r_hw=cfg.K,
        dtype=jnp.bfloat16,
    )
    h, w = cfg.INPUT_SHAPE
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng,
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
    )
    anchors = jnp.asarray(
        build_anchors(cfg.fm_shape, cfg.ANCHOR_AREAS, cfg.ANCHOR_ASPECT_RATIOS)
    )

    @jax.jit
    def survivors(images):
        fmaps = model.apply(variables, images, method="backbone")
        o_hat, b_hat, _ = model.apply(variables, fmaps["c4"], method="rpn")
        scores = o_hat[:, :, 1]
        rboxes = frcnn_box_decode(anchors[None], b_hat)

        def one(s, b):
            p = top_k_proposals(s, b, conf, topk)
            keep = nms_mask(p.boxes, p.valid, iou)
            return jnp.sum(p.valid), jnp.sum(keep)

        return jax.vmap(one)(scores, rboxes)

    counts = []
    for i in range(0, args.n, 2):
        images = jax.random.uniform(jax.random.PRNGKey(100 + i), (2, h, w, 3))
        n_gate, n_keep = jax.device_get(survivors(images))
        counts.extend(zip(n_gate.tolist(), n_keep.tolist()))
        print(f"frames {i},{i+1}: gate-survivors={n_gate}, nms-survivors={n_keep}")

    keeps = np.array([k for _, k in counts])
    print(
        f"\nphase={'eval' if args.eval else 'train'} conf>{conf} iou={iou} "
        f"topk={topk} |A|={cfg.n_anchors}\n"
        f"NMS survivors over {len(keeps)} random-init frames: "
        f"min={keeps.min()} mean={keeps.mean():.0f} max={keeps.max()} "
        f"(MAX_ROIS={cfg.MAX_ROIS})"
    )


if __name__ == "__main__":
    main()
