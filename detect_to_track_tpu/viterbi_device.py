"""device-side Viterbi tubelet linking: the DP recursion is a jax.lax.scan
over per-frame link-score matrices, and the full multi-path extraction runs
as ONE jitted fixed-shape program (BASELINE.json north star: "Viterbi
tubelet linking runs as a jax.lax.scan over per-frame detections").

Behavioral parity with the host linker (viterbi.py, itself pinned against
reference detect_to_track/viterbi.py:71-159) on PADDED inputs: detections
are fixed (T, D) slots, invalid slots carry -inf link scores -- exactly the
"removed node" representation the multi-path loop already uses, so padding
composes with the algorithm instead of fighting it. Valid slots are
compacted to the front (ops/nms.py) and every live score is >= 0 (sums of
sigmoids + psi), so first-index argmax tie-breaking never selects a padded
slot over a real one; results trim to the exact host output.

Why scan instead of the host loop: link scoring is (T-1, D, D) IoU/mask
algebra the VPU eats whole, and keeping scoring + DP on device means a
chunked ClipTracker never round-trips detections through the host between
chunks -- only the final integer paths come back.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .boxes import compute_ious

NEG_INF = -jnp.inf


def link_scores(
    confs_a: jnp.ndarray,
    confs_b: jnp.ndarray,
    boxes_a: jnp.ndarray,
    boxes_b: jnp.ndarray,
    tracks: jnp.ndarray,
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    iou_thresh: float,
) -> jnp.ndarray:
    """(D, D) padded link-score matrix for one adjacent frame pair
    (device form of viterbi.compute_link_scores / reference viterbi.py:11-42).

    s(a, b) = conf_a + conf_b + psi;  psi = 1 iff some predicted track box
    overlaps both detections with IoU > thresh. Invalid slots (either side)
    get -inf. `tracks` are the frame-(t+1) predicted positions of frame-t
    detections, so they share valid_a.
    """
    confs = confs_a[:, None] + confs_b[None, :]
    m_a = (compute_ious(boxes_a, tracks) > iou_thresh) & valid_a[None, :]
    m_b = (compute_ious(boxes_b, tracks) > iou_thresh) & valid_a[None, :]
    psi = jnp.any(m_a[:, None, :] & m_b[None, :, :], axis=-1)
    s = confs + psi.astype(confs.dtype)
    live = valid_a[:, None] & valid_b[None, :]
    return jnp.where(live, s, NEG_INF)


def clip_link_scores(
    confs: jnp.ndarray,  # (T, D) class-summed confidences
    boxes: jnp.ndarray,  # (T, D, 4) ijhw
    track_boxes: jnp.ndarray,  # (T-1, D, 4) decoded frame-(t+1) predictions
    valid: jnp.ndarray,  # (T, D) bool
    iou_thresh: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(T-1, D, D) score matrices + (D,) init scores for a whole clip, one
    vmap over adjacent pairs (host equivalent: viterbi.compute_score_seq)."""
    seq = jax.vmap(
        lambda ca, cb, ba, bb, tr, va, vb: link_scores(
            ca, cb, ba, bb, tr, va, vb, iou_thresh
        )
    )(
        confs[:-1], confs[1:], boxes[:-1], boxes[1:],
        track_boxes, valid[:-1], valid[1:],
    )
    init = jnp.where(valid[0], confs[0], NEG_INF)
    return seq, init


def viterbi_scan(
    score_seq: jnp.ndarray, init_scores: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """the DP recursion as a lax.scan (host oracle: viterbi.viterbi,
    reference viterbi.py:71-116).

    Each step, for every destination node: best over sources of
    (source_score + transition); if that best is not strictly positive the
    destination starts a fresh path (parent -1, score 0).

    Args:
        score_seq: (T-1, D, D) transition matrices (-inf = no link).
        init_scores: (D,) scores at t=0.

    Returns:
        parents: (T-1, D) int32, parents[t][d] = source of d at ts t+1
            (-1 = fresh path started at ts t+1).
        step_scores: (T-1, D) best-path score ending at each node of ts t+1
            (prefix results: row t is exact for a sequence truncated there).
    """

    def step(scores, trans):
        cand = scores[:, None] + trans  # (src, dst)
        best_src = jnp.argmax(cand, axis=0).astype(jnp.int32)  # first max
        best_val = jnp.max(cand, axis=0)
        fresh = ~(best_val > 0.0)
        parent = jnp.where(fresh, jnp.int32(-1), best_src)
        new_scores = jnp.where(fresh, 0.0, best_val)
        return new_scores, (parent, new_scores)

    _, (parents, step_scores) = jax.lax.scan(step, init_scores, score_seq)
    return parents, step_scores


def viterbi_backtrack(
    parents: jnp.ndarray, end: jnp.ndarray, final_ts: jnp.ndarray
) -> jnp.ndarray:
    """walk parents back from `end` at timestep `final_ts`.

    Returns nodes (T,) int32: the path's node at each timestep, -1 outside
    [start_ts, final_ts]. A reverse lax.scan over the parent rows; the walk
    activates at t = final_ts - 1 and deactivates at the first fresh (-1)
    parent (host oracle: viterbi.viterbi's backtrack loop).
    """
    t1 = parents.shape[0]  # T - 1

    def step(carry, xs):
        t, parent_t = xs
        node, active = carry
        active = active | (t == final_ts - 1)
        node = jnp.where(t == final_ts - 1, end, node)
        p = parent_t[node]
        emit = jnp.where(active & (p >= 0), p, jnp.int32(-1))
        return (jnp.where(active & (p >= 0), p, node), active & (p >= 0)), emit

    (_, _), nodes = jax.lax.scan(
        step,
        (jnp.int32(0), jnp.zeros((), bool)),
        (jnp.arange(t1), parents),
        reverse=True,
    )
    nodes = jnp.concatenate([nodes, jnp.full((1,), -1, jnp.int32)])
    return nodes.at[final_ts].set(end)


class DevicePaths(NamedTuple):
    """fixed-capacity multi-path extraction result (trim with n_paths)."""

    spans: jnp.ndarray  # (P, 2) int32 [start_ts, final_ts]
    scores: jnp.ndarray  # (P,) float
    nodes: jnp.ndarray  # (P, T) int32, -1 outside the span
    n_paths: jnp.ndarray  # () int32


@jax.jit
def viterbi_multi_link_scan(
    score_seq: jnp.ndarray, init_scores: jnp.ndarray
) -> DevicePaths:
    """multi-path extraction entirely on device (host oracle:
    viterbi.viterbi_multi_link / reference viterbi.py:119-159).

    For final_ts = T-1 .. 1: while the incoming matrix of final_ts has any
    finite entry, run the scan DP (prefix rows are exact for every
    truncation, so ONE scan serves every final_ts), take the best path
    ending at final_ts, record it, and -inf its nodes' incoming/outgoing
    transitions (and t=0 init score). Surviving t=0 nodes become length-1
    tubelets. Extraction order (and therefore trimmed output) matches the
    host exactly.
    """
    t1, d, _ = score_seq.shape
    t = t1 + 1
    cap = t * d  # every extracted path consumes >= 1 node

    spans0 = jnp.zeros((cap, 2), jnp.int32)
    scores0 = jnp.zeros((cap,), score_seq.dtype)
    nodes0 = jnp.full((cap, t), -1, jnp.int32)

    def extract_one(seq, init, final_ts):
        parents, step_scores = viterbi_scan(seq, init)
        end_scores = step_scores[final_ts - 1]
        # end-node tie-break: among maximal scores prefer a node whose
        # incoming column still has a finite entry. Identical to plain
        # first-argmax on every input the reference's loop terminates on (a
        # strictly-positive max always has finite incoming), but guarantees
        # each extraction consumes >= 1 finite entry: a fresh 0-score path
        # at a node with an all--inf column removes nothing, and with exact
        # 0.0 transitions (confidence underflow) the reference's while-loop
        # -- and this one -- would otherwise spin forever. Same rule in the
        # host (viterbi.py) and native (viterbi.cpp) linkers.
        incoming_finite = jnp.any(jnp.isfinite(seq[final_ts - 1]), axis=0)
        tied = end_scores == jnp.max(end_scores)
        pref = jnp.where(tied & incoming_finite, end_scores, NEG_INF)
        end = jnp.where(
            jnp.any(jnp.isfinite(pref)),
            jnp.argmax(pref),
            jnp.argmax(end_scores),
        ).astype(jnp.int32)
        path = viterbi_backtrack(parents, end, final_ts)  # (T,)
        score = end_scores[end]
        start_ts = jnp.argmax(path >= 0).astype(jnp.int32)

        member = jnp.zeros((t, d), bool)
        ts_idx = jnp.arange(t)
        member = member.at[ts_idx, jnp.where(path >= 0, path, 0)].set(
            path >= 0
        )
        # incoming of path nodes at ts>0: column node of matrix ts-1
        seq = jnp.where(member[1:][:, None, :], NEG_INF, seq)
        # outgoing of path nodes at ts<final_ts: row node of matrix ts
        out_mask = member[:-1] & (jnp.arange(t1)[:, None] != final_ts)
        seq = jnp.where(out_mask[:, :, None], NEG_INF, seq)
        init = jnp.where(member[0], NEG_INF, init)
        return seq, init, (start_ts, final_ts, score, path)

    def inner_cond(state):
        seq, init, spans, scores, nodes, n, final_ts = state
        return jnp.any(jnp.isfinite(seq[final_ts - 1]))

    def inner_body(state):
        seq, init, spans, scores, nodes, n, final_ts = state
        seq, init, (s_ts, f_ts, sc, path) = extract_one(seq, init, final_ts)
        spans = spans.at[n].set(jnp.stack([s_ts, f_ts]))
        scores = scores.at[n].set(sc)
        nodes = nodes.at[n].set(path)
        return seq, init, spans, scores, nodes, n + 1, final_ts

    def outer_body(i, state):
        seq, init, spans, scores, nodes, n = state
        final_ts = jnp.int32(t1 - i)  # T-1 .. 1
        seq, init, spans, scores, nodes, n, _ = jax.lax.while_loop(
            inner_cond,
            inner_body,
            (seq, init, spans, scores, nodes, n, final_ts),
        )
        return seq, init, spans, scores, nodes, n

    seq, init, spans, scores, nodes, n = jax.lax.fori_loop(
        0,
        t1,
        outer_body,
        (score_seq, init_scores, spans0, scores0, nodes0, jnp.int32(0)),
    )

    # length-1 tubelets at t=0 from surviving init scores, in node order
    def singles_body(node, state):
        spans, scores, nodes, n = state
        alive = jnp.isfinite(init[node])

        def add(args):
            spans, scores, nodes, n = args
            spans = spans.at[n].set(jnp.zeros((2,), jnp.int32))
            scores = scores.at[n].set(init[node])
            nodes = nodes.at[n, 0].set(node)
            return spans, scores, nodes, n + 1

        return jax.lax.cond(alive, add, lambda a: a, (spans, scores, nodes, n))

    spans, scores, nodes, n = jax.lax.fori_loop(
        0, d, singles_body, (spans, scores, nodes, n)
    )
    return DevicePaths(spans=spans, scores=scores, nodes=nodes, n_paths=n)
