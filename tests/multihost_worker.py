"""one process of the two-process multi-host test (tests/test_multihost.py).

Runs the REAL multi-process JAX runtime on CPU: `jax.distributed.initialize`
against a local coordinator, 4 virtual CPU devices per process, gloo TCP
collectives -- the same code path a multi-host TPU pod uses (SURVEY §5
"distributed communication backend"), minus the ICI transport. Each process
feeds its LOCAL half of a deterministic synthetic batch through the sharded
training step (parallel/mesh.py) and writes its view of the results to an
npz for the parent test to compare.

Usage (spawned by the test, not by hand):
    python tests/multihost_worker.py <pid> <nprocs> <port> <outdir> [mode]

mode "step" (default) drives the sharded train step directly; mode
"trainer" runs a full DetectTrackTrainer epoch (train + collective
validation + process-0 checkpoint) under the multi-process runtime.
"""

import os
import sys
from pathlib import Path

pid, nprocs, port, outdir = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    int(sys.argv[3]),
    Path(sys.argv[4]),
)
mode = sys.argv[5] if len(sys.argv) > 5 else "step"

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# persistent compilation cache: the workers compile a joint train step from
# scratch in a fresh process; under a loaded 1-core full-suite run that cold
# compile can approach the parent's wait bound (the r3 order-dependent
# "flake" signature -- passes alone, times out mid-suite). A warm cache
# makes the repeat compiles near-free.
from detect_to_track_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

# the env var alone is not honored when a TPU PJRT plugin is installed
# (same workaround as tests/conftest.py); the rest must be set BEFORE
# distributed.initialize creates the backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=pid,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    from __graft_entry__ import _model_for
    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.parallel import (
        local_value,
        make_mesh,
        make_parallel_train_step,
        replicate,
        shard_batch,
    )
    from detect_to_track_tpu.trainer import (
        BatchLoader,
        TrainState,
        make_optimizer,
    )

    assert jax.process_count() == nprocs
    assert jax.device_count() == 4 * nprocs
    assert jax.local_device_count() == 4

    global_bs = 8
    cfg = Config(
        N_CLASSES=4,
        BATCH_SIZE=global_bs,
        INPUT_SHAPE=(32, 48),
        ANCHOR_AREAS=(0.05,),
        ANCHOR_ASPECT_RATIOS=(1.0, 2.0),
        MAX_LABELS=4,
        PRE_NMS_TOPK=16,
        MAX_ROIS=8,
        MAX_DETS=4,
        D_MAX=1,
        K=2,
        COMPUTE_DTYPE="float32",
    )
    model = _model_for(cfg, corr_impl="xla")

    # every process draws the IDENTICAL global batch (same seed), then keeps
    # only its local slice -- the parent test reproduces the same global
    # batch single-process, so results must agree.
    manager = SyntheticVIDManager(
        n_samples=global_bs, image_hw=cfg.INPUT_SHAPE,
        n_classes=cfg.N_CLASSES, n_objects=2,
    )
    batch = next(iter(BatchLoader(manager, global_bs, cfg, seed=0)))
    rows = global_bs // nprocs
    local = jax.tree_util.tree_map(
        lambda x: x[pid * rows : (pid + 1) * rows], batch
    )

    h, w = cfg.INPUT_SHAPE
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
    )
    params = variables["params"]
    tx = make_optimizer(cfg, params)
    state = TrainState(
        params=params, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )

    mesh = make_mesh(4 * nprocs)
    step = make_parallel_train_step(model, cfg, tx, mesh)
    state = replicate(state, mesh)
    sharded = shard_batch(local, mesh)
    # AOT-compile, THEN coordinator-barrier, THEN dispatch: per-process
    # compile skew on a loaded host exceeds gloo's ~30 s KV rendezvous
    # deadline (the order-dependent full-suite flake -- TESTING.md "gloo
    # rendezvous deadline"). Same discipline as trainer._warm_collectives.
    from detect_to_track_tpu.parallel import barrier_sync

    step_c = step.lower(state, sharded).compile()
    barrier_sync("worker_first_collective")
    for _ in range(2):
        state, dtl = step_c(state, shard_batch(local, mesh))

    params = local_value(state.params)
    leaves = jax.tree_util.tree_leaves_with_path(params)
    np.savez(
        outdir / f"proc{pid}.npz",
        dtl=np.asarray(
            jax.tree_util.tree_leaves(local_value(dtl)), np.float64
        ),
        step=local_value(state.step),
        checksum=np.float64(
            sum(np.float64(np.abs(v).sum()) for _, v in leaves)
        ),
        **{f"leaf{i}": v for i, (_, v) in enumerate(leaves[:4])},
    )
    print(f"proc {pid}: ok", flush=True)


def main_trainer() -> None:
    """full DetectTrackTrainer epoch under the multi-process runtime: each
    process draws its own (seed-salted) local batches, the replicated state
    must end IDENTICAL everywhere, and only process 0 writes the
    checkpoint."""
    from __graft_entry__ import _model_for
    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.parallel import local_value
    from detect_to_track_tpu.trainer import DetectTrackTrainer

    cfg = Config(
        N_CLASSES=4,
        BATCH_SIZE=4,  # per process -> global batch 8 over 8 devices
        NUM_DEVICES=4 * nprocs,
        INPUT_SHAPE=(32, 48),
        ANCHOR_AREAS=(0.05,),
        ANCHOR_ASPECT_RATIOS=(1.0, 2.0),
        MAX_LABELS=4,
        PRE_NMS_TOPK=16,
        MAX_ROIS=8,
        MAX_DETS=4,
        D_MAX=1,
        K=2,
        COMPUTE_DTYPE="float32",
        OUTPUT_DIR=str(outdir / "out"),
        PATIENCE=0,
    )
    model = _model_for(cfg, corr_impl="xla")
    manager = SyntheticVIDManager(
        n_samples=4, image_hw=cfg.INPUT_SHAPE, n_classes=cfg.N_CLASSES,
        n_objects=2,
    )
    h, w = cfg.INPUT_SHAPE
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
    )
    trainer = DetectTrackTrainer(model, variables, manager, manager, None, cfg)
    assert trainer.mesh is not None
    assert trainer.mesh.shape == {"data": 4 * nprocs}
    trainer.step()
    assert trainer.n_iters == cfg.BATCH_SIZE  # local accounting

    params = local_value(trainer.state.params)
    leaves = jax.tree_util.tree_leaves_with_path(params)
    np.savez(
        outdir / f"proc{pid}.npz",
        step=local_value(trainer.state.step),
        ckpt_exists=np.bool_((Path(cfg.OUTPUT_DIR) / "ckpt").exists()),
        checksum=np.float64(
            sum(np.float64(np.abs(v).sum()) for _, v in leaves)
        ),
    )
    print(f"proc {pid}: ok", flush=True)


def main_watchdog() -> None:
    """collective RSS watchdog under the 2-process runtime (VERDICT r3 weak
    #2): only process 1's RSS reads over the bound, yet BOTH processes must
    take the autosave branch together (the per-batch check all-reduces an
    "any process over" flag) and BOTH must invoke the restart handler -- a
    single process checkpointing alone would deadlock orbax's collective
    save, which is why the watchdog used to disarm itself here."""
    from __graft_entry__ import _model_for
    from detect_to_track_tpu.config import Config
    from detect_to_track_tpu.data.synthetic import SyntheticVIDManager
    from detect_to_track_tpu.trainer import DetectTrackTrainer

    cfg = Config(
        N_CLASSES=4,
        BATCH_SIZE=4,
        NUM_DEVICES=4 * nprocs,
        INPUT_SHAPE=(32, 48),
        ANCHOR_AREAS=(0.05,),
        ANCHOR_ASPECT_RATIOS=(1.0, 2.0),
        MAX_LABELS=4,
        PRE_NMS_TOPK=16,
        MAX_ROIS=8,
        MAX_DETS=4,
        D_MAX=1,
        K=2,
        COMPUTE_DTYPE="float32",
        OUTPUT_DIR=str(outdir / "out"),
        HOST_RSS_LIMIT_GB=10000.0,  # armed (finite) but far above real RSS
    )
    model = _model_for(cfg, corr_impl="xla")
    manager = SyntheticVIDManager(
        n_samples=4, image_hw=cfg.INPUT_SHAPE, n_classes=cfg.N_CLASSES,
        n_objects=2,
    )
    h, w = cfg.INPUT_SHAPE
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.full((2, cfg.MAX_ROIS, 4), 0.4, jnp.float32),
    )
    trainer = DetectTrackTrainer(model, variables, manager, manager, None, cfg)
    assert trainer.mesh is not None and jax.process_count() == nprocs

    if pid == 1:  # ONE process reports a leaked heap; the other is healthy
        trainer._host_rss_gb = lambda: 99999.0

    fired = []
    trainer.on_host_memory_limit = lambda: fired.append(True)
    trainer._check_host_memory()  # must checkpoint + fire on BOTH processes

    np.savez(
        outdir / f"proc{pid}.npz",
        fired=np.bool_(bool(fired)),
        autosave_exists=np.bool_(
            (Path(cfg.OUTPUT_DIR) / "ckpt_autosave").exists()
        ),
        disarmed=np.bool_(getattr(trainer, "_rss_watchdog_disarmed", False)),
    )
    print(f"proc {pid}: ok", flush=True)


if __name__ == "__main__":
    {"trainer": main_trainer, "watchdog": main_watchdog}.get(mode, main)()
