"""training entry point (reference train.py equivalent):

    python train.py -c cfg/default.yaml

Builds the model, datasets and trainer from a flat-key YAML config and runs
the early-stopping training loop. Supports --resume and a --synthetic smoke
mode that needs no ILSVRC data on disk.
"""

from argparse import ArgumentParser

import jax


def main() -> None:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument(
        "-c", "--cfg", default="cfg/default.yaml", help="path to cfg file"
    )
    parser.add_argument(
        "--resume", action="store_true", help="resume from OUTPUT_DIR/ckpt"
    )
    parser.add_argument(
        "--synthetic",
        action="store_true",
        help="train on the synthetic dataset (smoke runs without ILSVRC)",
    )
    parser.add_argument(
        "--torch-weights",
        default=None,
        help="path to a torchvision ResNet state_dict (.pt) for the backbone",
    )
    parser.add_argument("--max-iters", type=float, default=float("inf"))
    args = parser.parse_args()

    from detect_to_track_tpu.config import load_config
    from detect_to_track_tpu.models import DetectTrackModule
    from detect_to_track_tpu.trainer import DetectTrackTrainer

    cfg = load_config(args.cfg)

    if cfg.NUM_HOSTS > 1:
        # multi-host data parallelism: initialize the JAX distributed
        # runtime (coordinator address etc. from the standard
        # JAX_COORDINATOR_ADDRESS/JAX_PROCESS_ID env vars) BEFORE touching
        # devices; the data mesh then spans all hosts' chips and the
        # gradient all-reduce rides ICI within a host, DCN across.
        # parallel/mesh.py's replicate/shard_batch are process-aware;
        # tests/test_multihost.py validates the multi-process runtime
        # (2 processes, gloo) against the single-process mesh. No
        # multi-host TPU hardware was available, so the ICI/DCN transport
        # itself is exercised only via gloo-over-TCP.
        jax.distributed.initialize()

    try:  # config-logged wandb run when wandb is importable + configured.
        # wandb.init() blocks indefinitely without network/credentials, so
        # it only runs when the user opted in via WANDB_MODE (the reference
        # requires wandb unconditionally, reference train.py:25).
        import os

        # multi-host: one wandb run per JOB, not per host (the trainer's
        # logger already routes metrics through process 0 only; N-1 forever-
        # empty runs would just clutter the dashboard).
        if (
            os.environ.get("WANDB_MODE", "disabled") != "disabled"
            and jax.process_index() == 0
        ):
            import wandb

            wandb.init(config=cfg.__dict__)
    except Exception as e:
        # the user EXPLICITLY opted in via WANDB_MODE; failing silently
        # would divert metrics to the JSONL fallback with no warning.
        print(f"WARNING: WANDB_MODE set but wandb.init failed ({e}); "
              "falling back to JSONL/stdout logging")

    model = DetectTrackModule.from_config(cfg)

    if args.synthetic:
        from detect_to_track_tpu.data.synthetic import SyntheticVIDManager

        trn_manager = SyntheticVIDManager(
            n_samples=cfg.TRN_SIZE, image_hw=cfg.INPUT_SHAPE,
            n_classes=cfg.N_CLASSES, seed=0,
        )
        val_manager = SyntheticVIDManager(
            n_samples=cfg.VAL_SIZE, image_hw=cfg.INPUT_SHAPE,
            n_classes=cfg.N_CLASSES, seed=1,
        )
        rep_manager = SyntheticVIDManager(
            n_samples=cfg.REP_SIZE, image_hw=cfg.INPUT_SHAPE,
            n_classes=cfg.N_CLASSES, seed=2,
        )
    else:
        from detect_to_track_tpu.data.imagenet import setup_vid_datasets

        trn_manager, val_manager, rep_manager = setup_vid_datasets(
            cfg.DATA_ROOT,
            cfg.VID_PARTITION_SIZES,
            cfg.TRN_SIZE,
            cfg.VAL_SIZE,
            cfg.REP_SIZE,
            cfg.P_DET,
            cfg.A,
        )

    variables = model.init_variables(jax.random.PRNGKey(0), cfg)
    if args.torch_weights:
        import torch

        from detect_to_track_tpu.models.resnet import convert_torch_state_dict

        sd = torch.load(args.torch_weights, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items()}
        variables["params"]["backbone"] = convert_torch_state_dict(
            sd, cfg.BACKBONE_ARCH
        )

    trainer = DetectTrackTrainer(
        model, variables, trn_manager, val_manager, rep_manager, cfg
    )
    if args.resume:
        trainer.restore()

    def _exec_restart() -> None:
        """host-RSS watchdog action: re-exec this process with --resume.
        The trainer has already checkpointed; the compilation cache (if
        JAX_COMPILATION_CACHE_DIR is set) makes the restart cheap. Works
        around remote-TPU clients retaining every host->device transfer
        (see config.HOST_RSS_LIMIT_GB)."""
        import os
        import sys

        argv = list(sys.argv)
        if "--resume" not in argv:
            argv.append("--resume")
        print(f"re-exec for host-memory hygiene: {argv}", flush=True)
        os.execv(sys.executable, [sys.executable] + argv)

    trainer.on_host_memory_limit = _exec_restart
    trainer.run(max_iters=args.max_iters)


if __name__ == "__main__":
    main()
