"""manual sanity checks (reference checks.py equivalent, with its stale
VIDTrnSampler import fixed -- the class is VIDSampler):

    python checks.py --sampler -c cfg/default.yaml   # dump sampled pairs
    python checks.py --anchors -c cfg/default.yaml   # dump anchor stats
    python checks.py --synthetic --sampler           # no ILSVRC needed
"""

from argparse import ArgumentParser

import numpy as np


def check_sampler(cfg, synthetic: bool) -> None:
    from detect_to_track_tpu.vis import draw_detections

    if synthetic:
        from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
        from PIL import Image

        manager = SyntheticVIDManager(
            n_samples=4, image_hw=(128, 192), n_classes=cfg.N_CLASSES
        )
        pairs = [manager[i] for i in range(4)]
        to_pil = lambda a: Image.fromarray((a * 255).astype(np.uint8))
    else:
        from detect_to_track_tpu.data.imagenet import (
            VIDSampler,
            find_vid_trn_snippet_ids,
        )

        ids = find_vid_trn_snippet_ids(cfg.DATA_ROOT)
        sampler = VIDSampler(cfg.DATA_ROOT, ids, cfg.A)
        pairs = [sampler.sample() for _ in range(4)]
        to_pil = lambda im: im

    for n, (i0, i1) in enumerate(pairs):
        for f, inst in enumerate((i0, i1)):
            im = to_pil(inst.im)
            boxes = np.array([l.box for l in inst.labels]).reshape(-1, 4)
            names = [l.class_name for l in inst.labels]
            draw_detections(im, boxes, names)
            path = f"/tmp/check_sampler_{n}_{f}.png"
            im.save(path)
            print(f"wrote {path} ({len(inst.labels)} objects)")


def check_anchors(cfg) -> None:
    from detect_to_track_tpu.anchors import anchor_boundary_mask, build_anchors

    anchors = build_anchors(
        cfg.fm_shape, cfg.ANCHOR_AREAS, cfg.ANCHOR_ASPECT_RATIOS
    )
    crosses = anchor_boundary_mask(anchors)
    print(f"anchors: {anchors.shape[0]} "
          f"({cfg.fm_shape[0]}x{cfg.fm_shape[1]} cells x "
          f"{cfg.n_anchors_per_cell}/cell)")
    print(f"boundary-crossing (ignored in training): {crosses.sum()} "
          f"({100 * crosses.mean():.1f}%)")
    print(f"height range: [{anchors[:, 2].min():.4f}, {anchors[:, 2].max():.4f}]")
    print(f"width range:  [{anchors[:, 3].min():.4f}, {anchors[:, 3].max():.4f}]")


def main() -> None:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--cfg", default="cfg/default.yaml")
    parser.add_argument("--sampler", action="store_true")
    parser.add_argument("--anchors", action="store_true")
    parser.add_argument("--synthetic", action="store_true")
    args = parser.parse_args()

    from detect_to_track_tpu.config import load_config

    cfg = load_config(args.cfg)
    if not (args.sampler or args.anchors):
        parser.error("nothing to check: pass --sampler and/or --anchors")
    if args.sampler:
        check_sampler(cfg, args.synthetic)
    if args.anchors:
        check_anchors(cfg)


if __name__ == "__main__":
    main()
