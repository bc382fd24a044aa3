"""device (lax.scan) Viterbi vs the host linker: exact behavioral parity on
padded fixed-shape inputs (BASELINE north star: DP as a jax.lax.scan)."""

import numpy as np
import pytest

from detect_to_track_tpu.viterbi import (
    compute_score_seq,
    viterbi,
    viterbi_multi_link,
)
from detect_to_track_tpu.viterbi_device import (
    clip_link_scores,
    viterbi_backtrack,
    viterbi_multi_link_scan,
    viterbi_scan,
)


def _random_problem(rng, T=5, max_d=4):
    dims = [rng.randint(1, max_d + 1) for _ in range(T)]
    score_seq = [
        rng.rand(dims[t], dims[t + 1]).astype(np.float32) * 2
        for t in range(T - 1)
    ]
    init = list(rng.rand(dims[0]).astype(np.float32))
    return score_seq, init, dims


def _pad_problem(score_seq, init, dims, d):
    """exact matrices -> (T-1, D, D) with -inf outside the real slots."""
    t1 = len(score_seq)
    seq = np.full((t1, d, d), -np.inf, np.float32)
    for t, m in enumerate(score_seq):
        seq[t, : m.shape[0], : m.shape[1]] = m
    ini = np.full((d,), -np.inf, np.float32)
    ini[: dims[0]] = init
    return seq, ini


@pytest.mark.parametrize("seed", range(8))
def test_viterbi_scan_matches_host_single_path(seed):
    rng = np.random.RandomState(seed)
    score_seq, init, dims = _random_problem(rng)
    d = 6
    seq, ini = _pad_problem(score_seq, init, dims, d)

    parents, step_scores = jax_get(viterbi_scan(seq, ini))
    t1 = len(score_seq)
    end_scores = step_scores[t1 - 1]
    end = int(np.argmax(end_scores))
    path = np.asarray(
        viterbi_backtrack(parents, np.int32(end), np.int32(t1))
    )

    host_path, host_score = viterbi(
        [m.astype(np.float64) for m in score_seq], [float(v) for v in init]
    )
    start = t1 - len(host_path) + 1
    expect = np.full((t1 + 1,), -1, np.int32)
    expect[start : t1 + 1] = host_path
    np.testing.assert_array_equal(path, expect)
    np.testing.assert_allclose(end_scores[end], host_score, rtol=1e-5)


def jax_get(tree):
    import jax

    return jax.device_get(tree)


@pytest.mark.parametrize("seed", range(8))
def test_viterbi_multi_link_scan_matches_host(seed):
    rng = np.random.RandomState(seed + 50)
    score_seq, init, dims = _random_problem(rng, T=4)
    d = 6
    seq, ini = _pad_problem(score_seq, init, dims, d)

    out = jax_get(viterbi_multi_link_scan(seq, ini))
    n = int(out.n_paths)
    got = []
    for i in range(n):
        s, e = int(out.spans[i, 0]), int(out.spans[i, 1])
        got.append(
            ((s, e), float(out.scores[i]), list(out.nodes[i, s : e + 1]))
        )

    host = viterbi_multi_link(
        [m.astype(np.float64) for m in score_seq],
        [float(v) for v in init],
        use_native=False,
    )
    assert len(got) == len(host)
    for (ra, sa, pa), (rb, sb, pb) in zip(got, host):
        assert ra == rb
        assert pa == pb
        np.testing.assert_allclose(sa, sb, rtol=1e-5)


def test_clip_link_scores_matches_host():
    """padded device link scoring trims to the host compute_score_seq."""
    rng = np.random.RandomState(3)
    T, D = 4, 5
    dims = [3, 2, 4, 1]
    confs = np.zeros((T, D), np.float32)
    boxes = np.zeros((T, D, 4), np.float32)
    tracks = np.zeros((T - 1, D, 4), np.float32)
    valid = np.zeros((T, D), bool)
    conf_seq, bbox_seq, track_seq = [], [], []
    for t in range(T):
        nt = dims[t]
        c = rng.rand(nt).astype(np.float32)
        b = np.stack(
            [
                rng.rand(nt),
                rng.rand(nt),
                0.1 + 0.2 * rng.rand(nt),
                0.1 + 0.2 * rng.rand(nt),
            ],
            axis=1,
        ).astype(np.float32)
        confs[t, :nt], boxes[t, :nt], valid[t, :nt] = c, b, True
        conf_seq.append(c)
        bbox_seq.append(b)
        if t < T - 1:
            tr = b + rng.randn(nt, 4).astype(np.float32) * 0.02
            tracks[t, :nt] = tr
            track_seq.append(tr)

    seq, ini = jax_get(clip_link_scores(confs, boxes, tracks, valid, 0.5))
    host_seq = compute_score_seq(conf_seq, bbox_seq, track_seq, 0.5)
    for t in range(T - 1):
        na, nb = dims[t], dims[t + 1]
        np.testing.assert_allclose(
            seq[t, :na, :nb], host_seq[t], rtol=1e-5, atol=1e-6
        )
        assert not np.isfinite(seq[t, na:, :]).any()
        assert not np.isfinite(seq[t, :, nb:]).any()
    np.testing.assert_allclose(ini[: dims[0]], conf_seq[0], rtol=1e-6)
    assert not np.isfinite(ini[dims[0] :]).any()


def test_multi_link_scan_full_extraction_on_clean_tracks():
    """two smooth tracks over 4 frames -> exactly 2 full-length paths (plus
    nothing else), matching the host end-to-end test."""
    T, D = 4, 4
    confs = np.zeros((T, D), np.float32)
    boxes = np.zeros((T, D, 4), np.float32)
    tracks = np.zeros((T - 1, D, 4), np.float32)
    valid = np.zeros((T, D), bool)
    base = np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]], np.float32)
    for t in range(T):
        confs[t, :2] = [0.9, 0.8]
        boxes[t, :2] = base + t * 0.01
        valid[t, :2] = True
        if t < T - 1:
            tracks[t, :2] = base + t * 0.01 + 0.005

    seq, ini = clip_link_scores(confs, boxes, tracks, valid, 0.5)
    out = jax_get(viterbi_multi_link_scan(seq, ini))
    n = int(out.n_paths)
    full = [
        i
        for i in range(n)
        if (out.spans[i, 1] - out.spans[i, 0] + 1) >= T
    ]
    assert len(full) == 2
    for i in full:
        assert (out.nodes[i, :T] >= 0).all()


def test_exact_zero_transition_terminates_and_agrees():
    """an exactly-0.0 link score reachable from a 0-score source (confidence
    underflow) livelocked every linker but the native one (which broke with
    different output): a fresh 0-score path at an already-drained node
    consumes nothing. The shared fix -- end-node ties break toward a node
    with finite incoming entries -- must terminate and agree across numpy,
    native, and device implementations."""
    import signal

    from detect_to_track_tpu.native import viterbi_native

    score_seq = [np.array([[-np.inf, 0.0], [-np.inf, -np.inf]], np.float64)]
    init = [0.0, 0.0]
    expected = [
        ((1, 1), 0.0, [1]),
        ((0, 0), 0.0, [0]),
        ((0, 0), 0.0, [1]),
    ]

    signal.alarm(120)  # a livelock regression fails loudly, not silently
    try:
        host = viterbi_multi_link(
            [m.copy() for m in score_seq], list(init), use_native=False
        )
        assert host == expected

        if viterbi_native.available():
            nat = viterbi_multi_link(
                [m.copy() for m in score_seq], list(init), use_native=True
            )
            assert nat == expected

        seq, ini = _pad_problem(score_seq, init, [2, 2], 2)
        out = jax_get(viterbi_multi_link_scan(seq, ini))
        got = []
        for i in range(int(out.n_paths)):
            s, e = int(out.spans[i, 0]), int(out.spans[i, 1])
            got.append(
                ((s, e), float(out.scores[i]), list(out.nodes[i, s : e + 1]))
            )
        assert got == expected
    finally:
        signal.alarm(0)


@pytest.mark.parametrize("seed", [0, 3])
def test_multi_link_scan_time_padding_is_noop(seed):
    """trailing all--inf transition matrices (ClipTracker's power-of-two
    time bucketing) must not change the extracted paths: padded final
    timesteps have no finite incoming entry (the inner while guard skips
    them) and the scan's prefix rows are truncation-exact."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed + 130)
    score_seq, init, dims = _random_problem(rng, T=5)
    d = 6
    seq, ini = _pad_problem(score_seq, init, dims, d)

    base = jax_get(viterbi_multi_link_scan(seq, ini))
    padded_seq = jnp.concatenate(
        [jnp.asarray(seq),
         jnp.full((3,) + tuple(seq.shape[1:]), -jnp.inf, seq.dtype)]
    )
    padded = jax_get(viterbi_multi_link_scan(padded_seq, ini))

    n = int(base.n_paths)
    assert int(padded.n_paths) == n
    for i in range(n):
        np.testing.assert_array_equal(base.spans[i], padded.spans[i])
        np.testing.assert_allclose(
            base.scores[i], padded.scores[i], rtol=1e-6
        )
        s, e = int(base.spans[i, 0]), int(base.spans[i, 1])
        np.testing.assert_array_equal(
            base.nodes[i, s : e + 1], padded.nodes[i, s : e + 1]
        )
