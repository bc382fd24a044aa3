"""evaluation entry point: detection mAP (and optional tubelet extraction)
for a trained checkpoint.

    python evaluate.py -c cfg/default.yaml --ckpt output/ckpt
    python evaluate.py -c cfg/default.yaml --synthetic           # smoke

The reference has no evaluation at all (model selection by val loss only,
SURVEY.md §5); this closes BASELINE config 5's measurement loop.
"""

from argparse import ArgumentParser

import jax
import jax.numpy as jnp


def main() -> None:
    parser = ArgumentParser(__doc__)
    parser.add_argument("-c", "--cfg", default="cfg/default.yaml")
    parser.add_argument("--ckpt", default=None, help="orbax checkpoint path")
    parser.add_argument(
        "--reference-weights",
        default=None,
        help="torch state_dict (.pt) saved by the REFERENCE trainer",
    )
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--n-samples", type=int, default=100)
    args = parser.parse_args()

    from detect_to_track_tpu.config import load_config
    from detect_to_track_tpu.evaluation import evaluate_detector
    from detect_to_track_tpu.inference import Detector
    from detect_to_track_tpu.models import DetectTrackModule

    cfg = load_config(args.cfg)
    dtype = jnp.bfloat16 if cfg.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    model = DetectTrackModule(
        backbone_arch=cfg.BACKBONE_ARCH,
        n_anchors=cfg.n_anchors_per_cell,
        n_classes=cfg.N_CLASSES,
        k=cfg.K,
        d_max=cfg.D_MAX,
        r_hw=cfg.K,
        paper_channel_layout=cfg.FIX_PSROI_CHANNEL_MAP,
        dtype=dtype,
    )

    h, w = cfg.INPUT_SHAPE
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
    )

    if args.reference_weights:
        import torch

        from detect_to_track_tpu.models.convert import (
            convert_reference_state_dict,
        )

        sd = torch.load(args.reference_weights, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items()}
        variables = {
            "params": convert_reference_state_dict(sd, cfg.BACKBONE_ARCH)
        }
    elif args.ckpt:
        import orbax.checkpoint as ocp
        from pathlib import Path

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(Path(args.ckpt).absolute())
        params = (
            restored["params"] if "params" in restored else restored
        )
        variables = {"params": params}

    if args.synthetic:
        from detect_to_track_tpu.data.synthetic import SyntheticVIDManager

        manager = SyntheticVIDManager(
            n_samples=args.n_samples,
            image_hw=cfg.INPUT_SHAPE,
            n_classes=cfg.N_CLASSES,
            seed=1,
        )
    else:
        from detect_to_track_tpu.data.imagenet import setup_vid_datasets

        _, manager, _ = setup_vid_datasets(
            cfg.DATA_ROOT,
            cfg.VID_PARTITION_SIZES,
            cfg.TRN_SIZE,
            args.n_samples,
            cfg.REP_SIZE,
            cfg.P_DET,
            cfg.A,
        )

    detector = Detector(model, variables, cfg)
    metrics = evaluate_detector(detector, manager, cfg.N_CLASSES)
    print({k: round(v, 4) for k, v in sorted(metrics.items())})


if __name__ == "__main__":
    main()
