"""ctypes loader for the native Viterbi kernel (viterbi.cpp).

Builds a shared library with g++ on first use (cached next to the source,
keyed by source mtime); all entry points degrade gracefully to the numpy
implementation in detect_to_track_tpu.viterbi when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parent / "viterbi.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    so_path = _SRC.parent / "_viterbi_native.so"
    try:
        if (
            not so_path.exists()
            or so_path.stat().st_mtime < _SRC.stat().st_mtime
        ):
            subprocess.run(
                [
                    "g++",
                    "-O3",
                    "-march=native",
                    "-shared",
                    "-fPIC",
                    str(_SRC),
                    "-o",
                    str(so_path),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(so_path))
    except (OSError, subprocess.CalledProcessError):
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.d2t_viterbi_multi_link.restype = ctypes.c_int64
    lib.d2t_viterbi_multi_link.argtypes = [
        f64p, i64p, ctypes.c_int64, f64p, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p, f64p, i64p, i64p,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            if os.environ.get("D2T_DISABLE_NATIVE"):
                _LIB = None
            else:
                _LIB = _build()
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def multi_link(
    score_seq: List[np.ndarray], init_scores: List[float]
) -> List[Tuple[Tuple[int, int], float, List[int]]]:
    """native viterbi_multi_link; same contract as
    detect_to_track_tpu.viterbi.viterbi_multi_link."""
    lib = _get_lib()
    assert lib is not None, "call available() first"

    n_trans = len(score_seq)
    dims = np.asarray(
        [len(init_scores)] + [m.shape[1] for m in score_seq], np.int64
    )
    assert all(
        m.shape == (dims[t], dims[t + 1]) for t, m in enumerate(score_seq)
    ), "inconsistent score matrix shapes"
    trans_flat = (
        np.concatenate([np.ascontiguousarray(m, np.float64).ravel() for m in score_seq])
        if n_trans
        else np.zeros(0, np.float64)
    )
    init = np.asarray(init_scores, np.float64)

    total_nodes = int(dims.sum())
    max_paths = max(total_nodes, 1)
    nodes_cap = max(total_nodes * (n_trans + 1), 1)

    out_start = np.zeros(max_paths, np.int64)
    out_end = np.zeros(max_paths, np.int64)
    out_scores = np.zeros(max_paths, np.float64)
    out_nodes = np.zeros(nodes_cap, np.int64)
    out_offsets = np.zeros(max_paths, np.int64)

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    as_f64 = lambda a: a.ctypes.data_as(f64p)
    as_i64 = lambda a: a.ctypes.data_as(i64p)

    n = lib.d2t_viterbi_multi_link(
        as_f64(trans_flat),
        as_i64(dims),
        ctypes.c_int64(n_trans),
        as_f64(init),
        ctypes.c_int64(max_paths),
        ctypes.c_int64(nodes_cap),
        as_i64(out_start),
        as_i64(out_end),
        as_f64(out_scores),
        as_i64(out_nodes),
        as_i64(out_offsets),
    )
    if n < 0:
        raise RuntimeError("native viterbi capacity overflow")

    results = []
    for i in range(n):
        start, end = int(out_start[i]), int(out_end[i])
        o = int(out_offsets[i])
        length = end - start + 1
        results.append(
            ((start, end), float(out_scores[i]), out_nodes[o : o + length].tolist())
        )
    return results
