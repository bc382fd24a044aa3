"""end-to-end clip tracking example: frames -> detections -> tubelets.

    python examples/track_clip.py -c cfg/default.yaml [--ckpt output/ckpt]
        [--frames DIR] [--n-frames 8] [--host-linking]

With no --frames, a synthetic moving-rectangles clip is generated (so the
example runs anywhere, with or without a trained checkpoint). With no
--ckpt, random-init weights are used -- the mechanics are identical, the
detections are just noise.

This is the workflow the reference leaves to the user (compose
`Detector.__call__` + `viterbi_tracking` by hand, reference
inference.py:21-121 + viterbi.py:162-185); here it is one object:
`ClipTracker` chunks the clip, runs the shared-backbone jitted clip
forward, link-scores + Viterbi-links on device, and returns tubelets.
"""

import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--cfg", default="cfg/default.yaml")
    parser.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    parser.add_argument(
        "--frames", default=None,
        help="directory of image frames (sorted lexically); default: synthetic",
    )
    parser.add_argument("--n-frames", type=int, default=8)
    parser.add_argument(
        "--frame-chunk", type=int, default=4,
        help="frames per device dispatch (fixed shape; one compile per size)",
    )
    parser.add_argument(
        "--host-linking", action="store_true",
        help="use the host/native Viterbi linker instead of the device one",
    )
    parser.add_argument("--min-len", type=int, default=2)
    args = parser.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # with a TPU PJRT plugin installed the env var alone is not honored
        # (tests/conftest.py); mirror it into the config so
        # JAX_PLATFORMS=cpu reliably forces CPU for this example
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import numpy as np

    from detect_to_track_tpu.clip import ClipTracker
    from detect_to_track_tpu.config import load_config
    from detect_to_track_tpu.inference import Detector
    from detect_to_track_tpu.models import DetectTrackModule

    cfg = load_config(args.cfg)
    model = DetectTrackModule.from_config(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0), cfg)
    if args.ckpt:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            Path(args.ckpt).absolute()
        )
        params = restored["params"] if "params" in restored else restored
        variables = {"params": params}

    if args.frames:
        from PIL import Image

        paths = sorted(
            p for p in Path(args.frames).iterdir()
            if p.suffix.lower() in (".jpeg", ".jpg", ".png")
        )[: args.n_frames]
        clip = [Image.open(p).convert("RGB") for p in paths]
    else:
        # one synthetic "video": rectangles moving with constant velocity
        # (uint8 frames, like decoded JPEGs would be)
        h, w = cfg.INPUT_SHAPE
        rng = np.random.RandomState(0)
        centers = rng.rand(3, 2) * 0.5 + 0.25
        sizes = rng.rand(3, 2) * 0.15 + 0.1
        vel = (rng.rand(3, 2) - 0.5) * 0.04
        colors = (rng.rand(3, 3) * 0.7 + 0.3) * 255

        def frame(t: int) -> np.ndarray:
            im = (rng.rand(h, w, 3) * 25).astype(np.uint8)
            for o in range(3):
                ci, cj = centers[o] + t * vel[o]
                oh, ow = sizes[o]
                i0, i1 = int((ci - oh / 2) * h), int((ci + oh / 2) * h)
                j0, j1 = int((cj - ow / 2) * w), int((cj + ow / 2) * w)
                im[max(i0, 0):max(i1, 1), max(j0, 0):max(j1, 1)] = colors[o]
            return im

        clip = [frame(t) for t in range(args.n_frames)]

    detector = Detector(model, variables, cfg)
    tracker = ClipTracker(
        detector,
        min_len=args.min_len,
        frame_chunk=args.frame_chunk,
        device_linking=not args.host_linking,
    )
    tubelets = tracker(clip)

    print(f"{len(clip)} frames -> {len(tubelets)} tubelets")
    for (start, end), boxes in tubelets:
        print(
            f"  frames [{start}, {end}]: {end - start + 1} boxes, "
            f"first ijhw={np.round(boxes[0], 3).tolist()}"
        )


if __name__ == "__main__":
    main()
