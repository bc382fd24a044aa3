"""evaluation entry point: detection mAP (and optional tubelet extraction)
for a trained checkpoint.

    python evaluate.py -c cfg/default.yaml --ckpt output/ckpt
    python evaluate.py -c cfg/default.yaml --synthetic           # smoke

The reference has no evaluation at all (model selection by val loss only,
SURVEY.md §5); this closes BASELINE config 5's measurement loop.
"""

from argparse import ArgumentParser

import jax


def main() -> None:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--cfg", default="cfg/default.yaml")
    parser.add_argument("--ckpt", default=None, help="orbax checkpoint path")
    parser.add_argument(
        "--reference-weights",
        default=None,
        help="torch state_dict (.pt) saved by the REFERENCE trainer",
    )
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--n-samples", type=int, default=100)
    parser.add_argument(
        "--all-ckpts",
        action="store_true",
        help="also evaluate every rotating ckpt_step_* next to --ckpt "
        "(mAP-vs-step from the training run's checkpoint history)",
    )
    parser.add_argument(
        "--min-step",
        type=int,
        default=0,
        help="with --all-ckpts: skip rotating checkpoints below this step "
        "(extend an existing mAP-vs-step trace without re-scoring it)",
    )
    args = parser.parse_args()
    if args.reference_weights and args.ckpt:
        # ambiguous: both would populate `variables`, and whichever silently
        # won would misattribute the resulting mAP. Make the user pick.
        parser.error("--reference-weights and --ckpt are mutually exclusive")

    from detect_to_track_tpu.config import load_config
    from detect_to_track_tpu.evaluation import evaluate_detector
    from detect_to_track_tpu.inference import Detector
    from detect_to_track_tpu.models import DetectTrackModule
    from detect_to_track_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # repeat evals must not recompile for minutes

    cfg = load_config(args.cfg)
    model = DetectTrackModule.from_config(cfg)
    if not (args.ckpt or args.reference_weights):
        # random-init eval (harness smoke). With a weight source given the
        # init would be discarded unused -- at full resolution that's a
        # multi-minute traced forward wasted before the first checkpoint
        # even loads.
        variables = model.init_variables(jax.random.PRNGKey(0), cfg)

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
    ckpt_paths = []
    if args.ckpt:
        from pathlib import Path

        # resolve (not absolute): '..'/symlink components would defeat the
        # "main ckpt may BE a rotating entry" dedup below and score it twice
        main_path = Path(args.ckpt).resolve()
        if args.all_ckpts:

            def _step_of(p):
                # non-numeric suffixes (a user's ckpt_step_250.bak next to
                # the real history) must not abort the whole sweep: skip
                # them rather than crash before scoring anything.
                try:
                    return int(p.name.rsplit("_", 1)[1])
                except ValueError:
                    return None

            ckpt_paths = [
                # resolve() each entry so the dedup below compares like with
                # like: --ckpt is resolved, and a symlinked --ckpt pointing
                # at a rotating entry must not be scored twice (ADVICE r3).
                p.resolve()
                for p in sorted(main_path.parent.glob("ckpt_step_*"))
                if (s := _step_of(p)) is not None and s >= args.min_step
            ]
        if main_path not in ckpt_paths:  # --ckpt may BE a rotating entry
            ckpt_paths.append(main_path)

    def load_ckpt(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path)
        params = restored["params"] if "params" in restored else restored
        step = restored.get("step") if hasattr(restored, "get") else None
        return {"params": params}, step

    if ckpt_paths and not (args.all_ckpts and len(ckpt_paths) > 1):
        # single-checkpoint mode only: the --all-ckpts loop below restores
        # each path itself (loading the last one here would restore it twice)
        variables, _ = load_ckpt(ckpt_paths[-1])

    if args.synthetic:
        from detect_to_track_tpu.data.synthetic import SyntheticVIDManager

        manager = SyntheticVIDManager(
            n_samples=args.n_samples,
            image_hw=cfg.INPUT_SHAPE,
            n_classes=cfg.N_CLASSES,
            seed=1,
        )
    else:
        # val manager only -- same deterministic snippet partition as
        # training, WITHOUT constructing DETSampler (which parses every
        # listed DET annotation XML just to be thrown away here).
        from detect_to_track_tpu.data.imagenet import setup_val_manager

        manager = setup_val_manager(
            cfg.DATA_ROOT, cfg.VID_PARTITION_SIZES, args.n_samples
        )

    if args.all_ckpts and len(ckpt_paths) > 1:
        # evaluate the whole rotating history, oldest first; the main ckpt
        # (latest-best) prints last. ONE Detector whose params are swapped
        # per restore: Detector.__init__ makes fresh jax.jit wrappers, so a
        # new Detector per checkpoint would recompile the full graph every
        # iteration (~minutes each through a remote-compile tunnel).
        detector = None
        for path in ckpt_paths:
            variables, step = load_ckpt(path)
            if detector is None:
                detector = Detector(model, variables, cfg)
            else:
                detector.variables = variables
            metrics = evaluate_detector(detector, manager, cfg.N_CLASSES)
            tag = path.name if path.name != "ckpt" else "ckpt(best)"
            print(
                {"ckpt": tag, "step": None if step is None else int(step)}
                | {k: round(v, 4) for k, v in sorted(metrics.items())}
            )
        return

    detector = Detector(model, variables, cfg)
    metrics = evaluate_detector(detector, manager, cfg.N_CLASSES)
    print({k: round(v, 4) for k, v in sorted(metrics.items())})


if __name__ == "__main__":
    main()
