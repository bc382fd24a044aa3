"""data-layer tests: pascal XML parsing, samplers over a fake ILSVRC tree,
label packing, sampling utilities."""

import random
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from detect_to_track_tpu.data import pack_labels
from detect_to_track_tpu.data.imagenet import (
    ClassTranslator,
    DETSampler,
    ImagenetSampler,
    VIDManager,
    VIDSampler,
    find_vid_trn_snippet_ids,
    make_mock_dataset,
    setup_vid_datasets,
)
from detect_to_track_tpu.data.pascal import parse_pascal_xmlfile
from detect_to_track_tpu.data.sampling import (
    partition_items,
    sample_dlaplace,
    sliding_window,
)
from detect_to_track_tpu.data.types import ObjectLabel


def _write_xml(path, objs, im_w=200, im_h=100, with_track=True):
    objects = []
    for o in objs:
        wnid, (xmin, ymin, xmax, ymax), tid = o
        track = f"<trackid>{tid}</trackid>" if with_track else ""
        objects.append(
            f"<object>{track}<name>{wnid}</name>"
            f"<bndbox><xmax>{xmax}</xmax><xmin>{xmin}</xmin>"
            f"<ymax>{ymax}</ymax><ymin>{ymin}</ymin></bndbox></object>"
        )
    path.write_text(
        "<annotation>"
        f"<size><width>{im_w}</width><height>{im_h}</height></size>"
        + "".join(objects)
        + "</annotation>"
    )


@pytest.fixture(scope="module")
def ilsvrc(tmp_path_factory):
    """minimal fake ILSVRC2015 tree: 3 VID snippets x 4 frames, 2 DET images."""
    root = tmp_path_factory.mktemp("ILSVRC")
    wnids = ["n0000001", "n0000002"]

    # devkit class map
    devkit = root / "devkit" / "data"
    devkit.mkdir(parents=True)
    (devkit / "map_vid.txt").write_text(
        "".join(f"{w} {i+1} name{i+1}\n" for i, w in enumerate(wnids))
    )

    # VID snippets
    (root / "ImageSets" / "VID").mkdir(parents=True)
    lines = []
    for s in range(3):
        sid = f"ILSVRC2015_VID_train_0000/ILSVRC2015_train_{s:08d}"
        lines.append(f"{sid} 1\n")
        fdir = root / "Data" / "VID" / "train" / sid
        ldir = root / "Annotations" / "VID" / "train" / sid
        fdir.mkdir(parents=True)
        ldir.mkdir(parents=True)
        for t in range(4):
            Image.new("RGB", (200, 100), (s * 40, t * 30, 100)).save(
                fdir / f"{t:06d}.JPEG"
            )
            _write_xml(
                ldir / f"{t:06d}.xml",
                [(wnids[s % 2], (10 + t, 20, 60 + t, 80), 0)],
            )
    (root / "ImageSets" / "VID" / "train_10.txt").write_text("".join(lines))

    # DET images
    (root / "ImageSets" / "DET").mkdir(parents=True)
    det_lines = []
    for d in range(2):
        iid = f"ILSVRC2014_train_000{d}/img{d}"
        det_lines.append(f"{iid} {d+1}\n")
        fdir = root / "Data" / "DET" / "train" / f"ILSVRC2014_train_000{d}"
        ldir = root / "Annotations" / "DET" / "train" / f"ILSVRC2014_train_000{d}"
        fdir.mkdir(parents=True, exist_ok=True)
        ldir.mkdir(parents=True, exist_ok=True)
        Image.new("RGB", (200, 100), (200, d * 100, 0)).save(
            fdir / f"img{d}.JPEG"
        )
        _write_xml(
            ldir / f"img{d}.xml",
            [(wnids[d], (5, 5, 50, 50), None)],
            with_track=False,
        )
    (root / "ImageSets" / "DET" / "train_1.txt").write_text(det_lines[0])
    (root / "ImageSets" / "DET" / "train_2.txt").write_text(det_lines[1])
    return root


def test_parse_pascal_xml(tmp_path):
    p = tmp_path / "a.xml"
    _write_xml(p, [("n123", (20, 10, 60, 30), 7)], im_w=200, im_h=100)
    (lbl,) = parse_pascal_xmlfile(p)
    assert lbl.class_id == "n123"
    assert lbl.track_id == 7
    ci, cj, h, w = lbl.bbox  # fractional ijhw
    np.testing.assert_allclose([ci, cj, h, w], [0.2, 0.2, 0.2, 0.2])


def test_find_snippets_and_vid_sampler(ilsvrc):
    ids = find_vid_trn_snippet_ids(ilsvrc)
    assert len(ids) == 3

    sampler = VIDSampler(ilsvrc, ids, a=0.8, seed=0)
    for _ in range(5):
        i0, i1 = sampler.sample()
        assert i0.im.size == (200, 100)
        assert len(i0.labels) == 1
        assert i0.labels[0].class_id in (1, 2)
        assert i0.labels[0].track_id == 0


def test_vid_manager_deterministic(ilsvrc):
    ids = find_vid_trn_snippet_ids(ilsvrc)
    m = VIDManager(ilsvrc, ids, n_samples=4, seed=1)
    assert len(m) == 4
    a0 = m[0]
    b0 = m[0]
    assert a0[0].labels == b0[0].labels


def test_det_sampler_and_mixture(ilsvrc):
    det = DETSampler(ilsvrc, seed=0)
    inst = det.sample()
    assert len(inst.labels) == 1
    assert inst.labels[0].track_id is None

    ids = find_vid_trn_snippet_ids(ilsvrc)
    vid = VIDSampler(ilsvrc, ids, a=0.8, seed=0)
    mix = ImagenetSampler(vid, det, p_det=1.0, seed=0)
    i0, i1 = mix.sample()
    # DET stills duplicate into a fake pair with enumerated track ids
    assert i0.im is i1.im
    assert i0.labels[0].track_id == 0


def test_setup_vid_datasets(ilsvrc):
    trn, val, rep = setup_vid_datasets(
        ilsvrc, (0.8, 0.2), trn_size=10, val_size=3, rep_size=2, p_det=0.5,
        a=0.8, seed=0,
    )
    assert len(trn) == 10 and len(val) == 3 and len(rep) == 2
    i0, i1 = trn[0]
    assert i0.im.size == (200, 100)
    mock = make_mock_dataset(ilsvrc, 2)
    assert len(mock) == 2


def test_setup_val_manager_matches_full_setup(ilsvrc):
    """evaluate.py's lightweight val-only constructor must draw the SAME
    fixed val instances as setup_vid_datasets (same snippet partition, same
    seed), just without building the expensive DET training stack."""
    from detect_to_track_tpu.data.imagenet import setup_val_manager

    _, val, _ = setup_vid_datasets(
        ilsvrc, (0.8, 0.2), trn_size=10, val_size=3, rep_size=2, p_det=0.5,
        a=0.8,
    )
    val_only = setup_val_manager(ilsvrc, (0.8, 0.2), 3)
    assert len(val_only) == len(val)
    for k in range(len(val)):
        (a0, a1), (b0, b1) = val[k], val_only[k]
        assert [l.box for l in a0.labels] == [l.box for l in b0.labels]
        assert np.asarray(a1.im).shape == np.asarray(b1.im).shape


def test_pack_labels_capacity():
    labels = [
        ObjectLabel(class_id=i + 1, class_name="x", box=(0.5, 0.5, 0.1, 0.1),
                    track_id=i)
        for i in range(5)
    ]
    f = pack_labels(labels, capacity=3)
    assert f.mask.sum() == 3
    f = pack_labels(labels, capacity=8)
    assert f.mask.sum() == 5
    assert f.mask[:5].all() and not f.mask[5:].any()  # packed first
    assert (f.classes[:5] == np.arange(1, 6)).all()
    f = pack_labels([], capacity=4)
    assert not f.mask.any()


def test_partition_items():
    a, b = partition_items(list(range(10)), (0.8, 0.2))
    assert a == list(range(8)) and b == [8, 9]
    (whole,) = partition_items(list(range(3)), (1.0,))
    assert whole == [0, 1, 2]


def test_sliding_window():
    assert list(sliding_window([1, 2, 3, 4], 2)) == [(1, 2), (2, 3), (3, 4)]


def test_dlaplace_distribution():
    """empirical PMF must match tanh(a/2) * exp(-a|x|)."""
    a = 0.8
    rng = random.Random(0)
    draws = np.array([sample_dlaplace(a, rng) for _ in range(40000)])
    p0_expected = np.tanh(a / 2)
    np.testing.assert_allclose((draws == 0).mean(), p0_expected, atol=0.01)
    p1_expected = p0_expected * np.exp(-a)
    np.testing.assert_allclose((draws == 1).mean(), p1_expected, atol=0.01)
    np.testing.assert_allclose((draws == -1).mean(), p1_expected, atol=0.01)
    np.testing.assert_allclose(
        (draws == 2).mean(), p0_expected * np.exp(-2 * a), atol=0.01
    )


def test_space_to_depth2_roundtrip_and_contract():
    """host s2d helpers: exact roundtrip, dtype preservation (uint8 frames
    must stay uint8 through the tunnel), and the channel-layout contract
    shared with ResNetBackbone's pre-s2d stem (vi*6 + vj*3 + c)."""
    import numpy as np

    from detect_to_track_tpu.utils import depth_to_space2, space_to_depth2

    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (2, 2, 8, 12, 3)).astype(np.uint8)
    z = space_to_depth2(x)
    assert z.shape == (2, 2, 4, 6, 12) and z.dtype == np.uint8
    np.testing.assert_array_equal(depth_to_space2(z), x)
    assert z[0, 0, 1, 2, 1 * 6 + 0 * 3 + 2] == x[0, 0, 3, 4, 2]
    # odd sizes / wrong channels refuse loudly
    import pytest

    with pytest.raises(ValueError):
        space_to_depth2(x[:, :, :7])
    with pytest.raises(ValueError):
        depth_to_space2(x)


def test_loader_workers_deterministic(tmp_path):
    """the decode thread pool must not change WHAT is packed: same seed =>
    bit-identical batches with LOADER_WORKERS 1 vs 8 (sampling stays
    serial; only decode/resize fan out)."""
    import numpy as np

    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.trainer import BatchLoader

    mk = lambda: SyntheticVIDManager(
        n_samples=8, image_hw=(32, 48), n_classes=4, seed=11
    )
    cfg1 = Config(BATCH_SIZE=4, MAX_LABELS=8, LOADER_WORKERS=1)
    cfg8 = Config(BATCH_SIZE=4, MAX_LABELS=8, LOADER_WORKERS=8)
    b1 = list(BatchLoader(mk(), 4, cfg1, seed=3))
    b8 = list(BatchLoader(mk(), 4, cfg8, seed=3))
    assert len(b1) == len(b8) > 0
    for a, b in zip(b1, b8):
        np.testing.assert_array_equal(a.images, b.images)
        np.testing.assert_array_equal(a.labels.boxes, b.labels.boxes)
        np.testing.assert_array_equal(a.labels.mask, b.labels.mask)


def test_sampler_reseed_changes_stream_only_when_seeded(ilsvrc):
    """resume support: reseed(salt) must move an explicitly-seeded sampler
    off its original stream (a rebuilt process would otherwise replay the
    instances already trained on) and leave the default entropy-seeded
    sampler API intact."""
    ids = find_vid_trn_snippet_ids(ilsvrc)

    a = VIDSampler(ilsvrc, ids, a=0.8, seed=7)
    b = VIDSampler(ilsvrc, ids, a=0.8, seed=7)
    b.reseed(salt=123)
    draws_a = [a._source.sample() for _ in range(20)]
    draws_b = [b._source.sample() for _ in range(20)]
    assert draws_a != draws_b  # salted stream diverges

    c = VIDSampler(ilsvrc, ids, a=0.8, seed=7)
    c.reseed(salt=123)
    draws_c = [c._source.sample() for _ in range(20)]
    assert draws_b == draws_c  # ...deterministically

    # wrapper delegation (what trainer.restore() calls)
    from detect_to_track_tpu.data.types import DataManagerWrapper

    d = VIDSampler(ilsvrc, ids, a=0.8, seed=7)
    w = DataManagerWrapper(d, nominal_len=10)
    w.reseed(123)
    draws_d = [d._source.sample() for _ in range(20)]
    assert draws_d == draws_b


def test_empty_snippet_dir_fails_at_init(ilsvrc, tmp_path):
    """a snippet directory with zero frames passes the frame==label count
    check (0 == 0) but must be rejected at init, not crash mid-training
    with a negative frame index."""
    import shutil

    root = tmp_path / "tree"
    shutil.copytree(ilsvrc, root)
    ids = find_vid_trn_snippet_ids(root)
    empty = root / "Data" / "VID" / "train" / ids[0]
    for f in empty.glob("*.JPEG"):
        f.unlink()
    for f in (root / "Annotations" / "VID" / "train" / ids[0]).glob("*.xml"):
        f.unlink()
    with pytest.raises(RuntimeError, match="no frames"):
        VIDSampler(root, ids, a=0.8, seed=0)


def test_find_snippets_dedupes_across_lists(ilsvrc):
    """a snippet listed in several train_NN.txt files must appear once:
    duplicates straddling the partition boundary would leak train data
    into the val split (deviation from the reference, documented in
    find_vid_trn_snippet_ids)."""
    base = find_vid_trn_snippet_ids(ilsvrc)
    extra = ilsvrc / "ImageSets" / "VID" / "train_11.txt"
    extra.write_text(f"{base[0]} 1\n{base[2]} 1\n")
    try:
        ids = find_vid_trn_snippet_ids(ilsvrc)
    finally:
        extra.unlink()
    assert ids == base  # same set, first occurrence order, no dupes


def test_det_sampler_raises_on_missing_det_lists(tmp_path):
    """VID-only tree (no DET download): DETSampler must fail at init with
    a clear message, not IndexError at the first draw mid-training."""
    root = tmp_path / "ILSVRC"
    devkit = root / "devkit" / "data"
    devkit.mkdir(parents=True)
    (devkit / "map_vid.txt").write_text("n0000001 1 name1\n")
    with pytest.raises(FileNotFoundError, match="P_DET=0"):
        DETSampler(root, seed=0)


def test_dlaplace_rejects_nonpositive_a():
    rng = random.Random(0)
    with pytest.raises(ValueError, match="a > 0"):
        sample_dlaplace(0.0, rng)
    with pytest.raises(ValueError, match="a > 0"):
        sample_dlaplace(-0.5, rng)


def test_degenerate_gt_box_encodes_finite():
    """real ILSVRC annotations occasionally carry xmax == xmin (w = 0)
    boxes; their is-best anchor is a POSITIVE with loss weight 1, so an
    unguarded log(0) would make the RPN bbox loss infinite. Both hw sides
    are floored (documented deviation in frcnn_box_encode)."""
    from detect_to_track_tpu.encoding import frcnn_box_encode

    anchors = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
    degenerate = np.array([[0.5, 0.5, 0.2, 0.0]], np.float32)  # w == 0
    off = np.asarray(frcnn_box_encode(anchors, degenerate, xp=np))
    assert np.all(np.isfinite(off))
