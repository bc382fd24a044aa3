"""generate a realistic-scale ILSVRC2015-style fixture tree.

No ILSVRC download is available in this environment, so this builds a real
on-disk tree (full-size JPEGs + pascal XML + ImageSets + devkit class map)
with MOVING rectangular objects and coherent track ids, at source-video
resolution (default 1280x720, resized to cfg.INPUT_SHAPE by the loader).
It exercises the entire host pipeline -- snippet discovery, XML parsing,
wnid translation, dlaplace pair sampling, DET mixture, decode, resize,
packing -- exactly as a real dataset would (reference data layout:
reference detect_to_track/data/imagenet.py).

Run:  python tools/make_fixture_tree.py /tmp/ILSVRC_fixture \
          [--snippets 6] [--frames 12] [--det 8] [--classes 30]
Then: python train.py -c <cfg with DATA_ROOT=/tmp/ILSVRC_fixture> --max-iters 50
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def _xml(objs, w, h):
    parts = [
        "<annotation>",
        f"<size><width>{w}</width><height>{h}</height></size>",
    ]
    for wnid, (x0, y0, x1, y1), tid in objs:
        track = f"<trackid>{tid}</trackid>" if tid is not None else ""
        parts.append(
            f"<object>{track}<name>{wnid}</name>"
            f"<bndbox><xmax>{x1}</xmax><xmin>{x0}</xmin>"
            f"<ymax>{y1}</ymax><ymin>{y0}</ymin></bndbox></object>"
        )
    parts.append("</annotation>")
    return "".join(parts)


def _render(rng, w, h, objs, colors):
    """textured background + filled rectangles per object."""
    im = (rng.rand(h // 8, w // 8, 3) * 80 + 60).astype(np.uint8)
    im = np.kron(im, np.ones((8, 8, 1), np.uint8))[:h, :w]
    for (wnid, (x0, y0, x1, y1), _tid), c in zip(objs, colors):
        im[y0:y1, x0:x1] = c
    return im


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("--snippets", type=int, default=6)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--det", type=int, default=8)
    ap.add_argument("--classes", type=int, default=30)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    args = ap.parse_args()

    from PIL import Image

    rng = np.random.RandomState(0)
    root = args.root
    w, h = args.width, args.height
    wnids = [f"n{i:08d}" for i in range(1, args.classes + 1)]

    devkit = root / "devkit" / "data"
    devkit.mkdir(parents=True, exist_ok=True)
    for task in ("vid", "det"):
        (devkit / f"map_{task}.txt").write_text(
            "".join(f"{x} {i + 1} cls{i + 1}\n" for i, x in enumerate(wnids))
        )

    # --- VID snippets: objects drift linearly, keeping coherent track ids ---
    sids = []
    for s in range(args.snippets):
        sid = f"ILSVRC2015_VID_train_{s // 4:04d}/ILSVRC2015_train_{s:08d}"
        sids.append(sid)
        dpath = root / "Data/VID/train" / sid
        apath = root / "Annotations/VID/train" / sid
        dpath.mkdir(parents=True, exist_ok=True)
        apath.mkdir(parents=True, exist_ok=True)

        n_obj = rng.randint(1, 4)
        cls = rng.choice(len(wnids), n_obj)
        colors = rng.randint(100, 255, (n_obj, 3)).astype(np.uint8)
        # canvas-relative geometry so small trees (e.g. 320x192 for fast
        # learnability runs) generate as well as the 1280x720 default
        smin, smax = int(0.12 * min(w, h)), int(0.4 * min(w, h))
        pos = rng.rand(n_obj, 2) * [
            max(1, w - smax - 40), max(1, h - smax - 40)
        ] + 20
        size = rng.rand(n_obj, 2) * (smax - smin) + smin
        vel = rng.randn(n_obj, 2) * (0.015 * min(w, h))

        for f in range(args.frames):
            objs = []
            for o in range(n_obj):
                x0, y0 = pos[o] + vel[o] * f
                x0 = float(np.clip(x0, 0, w - size[o, 0] - 1))
                y0 = float(np.clip(y0, 0, h - size[o, 1] - 1))
                objs.append(
                    (
                        wnids[cls[o]],
                        (int(x0), int(y0), int(x0 + size[o, 0]), int(y0 + size[o, 1])),
                        o,
                    )
                )
            Image.fromarray(_render(rng, w, h, objs, colors)).save(
                dpath / f"{f:06d}.JPEG", quality=88
            )
            (apath / f"{f:06d}.xml").write_text(_xml(objs, w, h))

    (root / "ImageSets/VID").mkdir(parents=True, exist_ok=True)
    # the discovery glob (reference imagenet.py:329, `train_[0-9]?.txt`)
    # needs two characters after the underscore.
    (root / "ImageSets/VID/train_10.txt").write_text(
        "".join(f"{sid} 1\n" for sid in sids)
    )

    # --- DET still images ---
    (root / "ImageSets/DET").mkdir(parents=True, exist_ok=True)
    det_lines = []
    for d in range(args.det):
        iid = f"ILSVRC2014_train_0000/ILSVRC2014_train_{d:08d}"
        dpath = root / "Data/DET/train" / Path(iid).parent
        apath = root / "Annotations/DET/train" / Path(iid).parent
        dpath.mkdir(parents=True, exist_ok=True)
        apath.mkdir(parents=True, exist_ok=True)
        n_obj = rng.randint(1, 3)
        cls = rng.choice(len(wnids), n_obj)
        colors = rng.randint(100, 255, (n_obj, 3)).astype(np.uint8)
        objs = []
        smin, smax = int(0.12 * min(w, h)), int(0.4 * min(w, h))
        for o in range(n_obj):
            s1 = int(rng.randint(smin, smax))
            s2 = int(rng.randint(smin, smax))
            x0 = int(rng.randint(0, max(1, w - s1 - 1)))
            y0 = int(rng.randint(0, max(1, h - s2 - 1)))
            objs.append(
                (wnids[cls[o]], (x0, y0, x0 + s1, y0 + s2), None)
            )
        Image.fromarray(_render(rng, w, h, objs, colors)).save(
            root / "Data/DET/train" / f"{iid}.JPEG", quality=88
        )
        (root / "Annotations/DET/train" / f"{iid}.xml").write_text(_xml(objs, w, h))
        det_lines.append(f"{iid} {d + 1}\n")
    (root / "ImageSets/DET/train_1.txt").write_text("".join(det_lines))
    (root / "ImageSets/DET/val.txt").write_text("")

    n_jpeg = len(list(root.rglob("*.JPEG")))
    print(f"fixture tree at {root}: {n_jpeg} JPEGs, {len(sids)} snippets")
    return 0


if __name__ == "__main__":
    sys.exit(main())
