"""host input-pipeline bench: batch pack rate vs LOADER_WORKERS.

Measures BatchLoader's decode/resize/pack rate (ms per batch and per
frame) over a real on-disk tree (tools/make_fixture_tree.py output or
ILSVRC) at the working point, for several worker counts. Compare against
the device step time (tools/step_bench.py): if pack >= step, training is
input-bound and needs more LOADER_WORKERS (PERF.md "host-bound real-data
input"). Warm the page cache first (the first epoch reads cold ~2x
slower).

Usage: python tools/input_bench.py DATA_ROOT [batch] [workers ...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.data.imagenet import setup_vid_datasets
    from detect_to_track_tpu.trainer import BatchLoader

    root = sys.argv[1]
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    workers = [int(w) for w in sys.argv[3:]] or [1, 0]

    for w in workers:
        cfg = Config(BATCH_SIZE=bs, LOADER_WORKERS=w)
        trn, _, _ = setup_vid_datasets(
            root, (0.8, 0.2), 16 * bs, bs, 0, 0.5, 0.8, seed=0
        )
        loader = BatchLoader(trn, bs, cfg, seed=0)
        it = iter(loader)
        b = next(it)  # warm (pool spin-up + page cache)
        n = 6
        t0 = time.perf_counter()
        for _ in range(n):
            b = next(it)
        dt = (time.perf_counter() - t0) / n
        print(
            f"LOADER_WORKERS={w}: {dt * 1e3:.0f} ms/batch "
            f"({dt / (2 * bs) * 1e3:.1f} ms/frame) "
            f"shape={b.images.shape} dtype={b.images.dtype}",
            flush=True,
        )


if __name__ == "__main__":
    main()
