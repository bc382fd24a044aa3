"""Viterbi tubelet-linking tests: semantics pinned against a direct
transcription of the reference's pure-Python DP (reference viterbi.py), and
native C++ vs numpy parity."""

import numpy as np
import pytest

from detect_to_track_tpu.viterbi import (
    compute_link_scores,
    compute_score_seq,
    viterbi,
    viterbi_multi_link,
    viterbi_tracking,
)


# --- reference oracle: direct transcription of viterbi.py:71-116 ---


def _viterbi_ref(score_seq, init_scores=None):
    n_time_steps = len(score_seq) + 1
    init_scores = init_scores or [0.0] * score_seq[0].shape[0]
    ans = [([src], s) for src, s in enumerate(init_scores)]
    for ts in range(1, n_time_steps):
        transitions = score_seq[ts - 1]
        _, n_dst = transitions.shape
        ans_ts = []
        for dst in range(n_dst):
            best_score, best_path = 0.0, [dst]
            for src, t_score in enumerate(transitions[:, dst]):
                src_path, src_score = ans[src]
                score = src_score + t_score
                if score > best_score:
                    best_score = score
                    best_path = src_path + [dst]
            ans_ts.append((best_path, best_score))
        ans = ans_ts
    path, score = max(ans, key=lambda x: x[1])
    return path, score


def _random_problem(rng, T=5, max_d=4):
    dims = [rng.randint(1, max_d + 1) for _ in range(T)]
    score_seq = [
        rng.rand(dims[t], dims[t + 1]) * 2 for t in range(T - 1)
    ]
    init = list(rng.rand(dims[0]))
    return score_seq, init


@pytest.mark.parametrize("seed", range(8))
def test_viterbi_matches_reference_dp(seed):
    rng = np.random.RandomState(seed)
    score_seq, init = _random_problem(rng)
    path, score = viterbi(score_seq, init)
    path_ref, score_ref = _viterbi_ref(score_seq, init)
    assert path == path_ref
    np.testing.assert_allclose(score, score_ref, rtol=1e-12)


def test_viterbi_fresh_path_mid_sequence():
    """a huge late link must beat a long weak chain: the modified Viterbi
    seeds new paths at every node (reference README.md:9, viterbi.py:101)."""
    score_seq = [
        np.array([[0.1]]),
        np.array([[-np.inf]]),  # chain broken
        np.array([[5.0]]),  # strong late link
    ]
    path, score = viterbi(score_seq, [0.1])
    assert score == 5.0
    assert path == [0, 0]  # starts fresh at ts=2


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("use_native", [False, True])
def test_viterbi_multi_link_extraction(seed, use_native):
    rng = np.random.RandomState(seed + 100)
    score_seq, init = _random_problem(rng, T=4)
    paths = viterbi_multi_link(
        [m.copy() for m in score_seq], list(init), use_native=use_native
    )
    assert len(paths) >= 1
    # every node of every timestep is consumed exactly once
    seen = set()
    for (start, end), score, path in paths:
        assert len(path) == end - start + 1
        for ts, node in zip(range(start, end + 1), path):
            assert (ts, node) not in seen
            seen.add((ts, node))
    # nodes are never reused; t=0 nodes are always covered (paths or the
    # length-1 fallback, reference viterbi.py:154-158). Intermediate nodes
    # whose links were consumed by other paths may legitimately vanish.
    dims = [len(init)] + [m.shape[1] for m in score_seq]
    assert len(seen) <= sum(dims)
    for node in range(dims[0]):
        assert (0, node) in seen


@pytest.mark.parametrize("seed", range(6))
def test_native_matches_numpy(seed):
    from detect_to_track_tpu.native import viterbi_native

    if not viterbi_native.available():
        pytest.skip("no native build available")
    rng = np.random.RandomState(seed)
    score_seq, init = _random_problem(rng, T=6, max_d=5)
    a = viterbi_multi_link(
        [m.copy() for m in score_seq], list(init), use_native=False
    )
    b = viterbi_multi_link(
        [m.copy() for m in score_seq], list(init), use_native=True
    )
    assert len(a) == len(b)
    for (ra, sa, pa), (rb, sb, pb) in zip(a, b):
        assert ra == rb and pa == pb
        np.testing.assert_allclose(sa, sb, rtol=1e-12)


def test_link_scores_psi(rng):
    """psi = 1 iff a track box overlaps both detections
    (reference viterbi.py:11-42)."""
    box = np.array([[0.5, 0.5, 0.2, 0.2]])
    far = np.array([[0.1, 0.1, 0.05, 0.05]])
    confs = np.array([0.7])
    tracks = np.array([[0.5, 0.5, 0.2, 0.2]])

    s_match = compute_link_scores(confs, confs, box, box, tracks, 0.5)
    s_nomatch = compute_link_scores(confs, confs, box, far, tracks, 0.5)
    np.testing.assert_allclose(s_match, [[0.7 + 0.7 + 1.0]])
    np.testing.assert_allclose(s_nomatch, [[0.7 + 0.7]])


def test_score_seq_validation(rng):
    conf_seq = [np.array([0.5])] * 3
    bbox_seq = [np.zeros((1, 4))] * 3
    with pytest.raises(ValueError):
        compute_score_seq(conf_seq, bbox_seq, [np.zeros((1, 4))], 0.5)


def test_viterbi_tracking_end_to_end(rng):
    """two objects moving smoothly for 4 frames must produce 2 full-length
    tubelets."""
    T = 4
    conf_seq, bbox_seq, track_seq = [], [], []
    base = np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]])
    for t in range(T):
        boxes = base + t * 0.01
        conf_seq.append(np.array([0.9, 0.8]))
        bbox_seq.append(boxes)
        if t < T - 1:
            track_seq.append(boxes + 0.005)  # predicted next-frame boxes
    tubelets = viterbi_tracking(conf_seq, bbox_seq, track_seq, 0.5, min_len=T)
    assert len(tubelets) == 2
    for (start, end), boxes in tubelets:
        assert (start, end) == (0, T - 1)
        assert boxes.shape == (T, 4)


def test_viterbi_tracking_with_empty_interior_frame():
    """a frame whose detections were ALL confidence-filtered produces
    zero-size score matrices mid-sequence; the numpy DP must start fresh
    paths after it (np.argmax over the empty source axis used to raise)
    and must agree exactly with the native path."""
    conf_seq = [
        np.array([0.9, 0.8]),
        np.array([], np.float64),  # empty interior frame
        np.array([0.7, 0.6]),
        np.array([0.5]),
    ]
    bbox_seq = [
        np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]]),
        np.zeros((0, 4)),
        np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]]),
        np.array([[0.3, 0.3, 0.2, 0.2]]),
    ]
    track_seq = [
        bbox_seq[0],
        np.zeros((0, 4)),
        bbox_seq[2],
    ]
    from detect_to_track_tpu.viterbi import compute_score_seq

    score_seq = compute_score_seq(conf_seq, bbox_seq, track_seq, 0.5)
    init = [float(c) for c in conf_seq[0]]
    a = viterbi_multi_link(
        [m.copy() for m in score_seq], list(init), use_native=False
    )
    b = viterbi_multi_link(
        [m.copy() for m in score_seq], list(init), use_native=True
    )
    assert sorted(a) == sorted(b)
    # tubelets exist on both sides of the gap, none crossing it
    tubes = viterbi_tracking(conf_seq, bbox_seq, track_seq, 0.5, 1,
                             use_native=False)
    spans = sorted(s for s, _ in tubes)
    assert all(not (s <= 1 <= e) for s, e in spans)
    assert any(e >= 2 for _, e in spans) and any(s == 0 for s, _ in spans)
