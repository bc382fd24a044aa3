"""device mesh + sharding rules.

The reference has NO distributed path at all (single `.cuda()` device,
reference trainer.py:82; SURVEY.md §2 #26). Here scaling is a sharding
annotation: a 1-D `data` mesh shards the frame-pair batch axis, parameters
and optimizer state are replicated, and XLA inserts the gradient psum over
ICI automatically because the loss is a mean over the sharded batch axis.
Every collective is implied by these shardings -- growing to multi-host DP
(or adding a model axis later) is a mesh-shape change, not a rewrite.

One Python process per host is assumed (jax.distributed.initialize for
multi-host). `replicate`/`shard_batch` are process-aware: under a
multi-process runtime they assemble global arrays from per-process local
data (`jax.make_array_from_process_local_data`), so the same trainer code
runs single-chip, multi-chip, and multi-host -- the mesh spans all hosts'
devices and each process feeds only its local shard of the batch. Tests
exercise an 8-device virtual CPU mesh in one process
(tests/test_parallel.py) and a REAL two-process gloo-backed mesh
(tests/test_multihost.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..trainer import TrainState, make_train_step


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(n), axis_names)


def _from_local(tree: Any, sharding: NamedSharding) -> Any:
    """assemble global arrays from per-process local data (multi-process).

    For a replicated spec the local data IS the full value (identical on
    every process, e.g. params initialized from the same PRNG key); for a
    batch-sharded spec it is this process's slice of the global batch.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """replicate a pytree (params / optimizer state) across the mesh.

    Multi-process: every process must hold the same host values (same init
    seed / restored checkpoint); they are placed on each process's local
    devices and stitched into one global replicated array.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return _from_local(tree, sharding)
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """shard every leaf's leading (batch) axis across the data axis.

    Multi-process: `batch` is this process's LOCAL batch (global_batch /
    process_count rows, disjoint across processes); the returned global
    array's leading axis is the concatenation over processes in process
    order.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return _from_local(batch, sharding)
    return jax.device_put(batch, sharding)


# host value of a REPLICATED global array, multi-process safe (the
# implementation lives in utils.host_value so the trainer can use it
# without a circular import).
from ..utils import host_value as local_value  # noqa: E402


def barrier_sync(name: str = "d2t_barrier", timeout_ms: int = 600_000) -> None:
    """re-synchronize all processes through the COORDINATOR's key-value
    service (generous timeout) -- NOT through a device collective.

    Why this exists: XLA's CPU gloo context initialization performs its
    rendezvous through the distributed KV store with a hard ~30 s deadline
    (observed: "Gloo context initialization failed: DEADLINE_EXCEEDED:
    GetKeyValue() timed out ... 29.99s", TESTING.md). Each process compiles
    its programs independently, and per-process compile times skew by far
    more than 30 s on a loaded host (or a cold compilation cache), so the
    fastest process can enter the first collective dispatch -- and start
    the gloo rendezvous clock -- minutes before the slowest. Call this
    AFTER compiling (jit(...).lower(args).compile()) and BEFORE the first
    dispatch, so all processes begin gloo init within milliseconds.

    No-op single-process or when no distributed client is active; a
    coordinator without barrier support degrades to a warning, never a
    crash (the caller's dispatch then simply takes its chances)."""
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
    except Exception as e:  # noqa: BLE001 -- best-effort sync, never fatal
        import warnings

        warnings.warn(f"barrier_sync({name!r}) unavailable: {e!r}")


def make_parallel_train_step(
    model, cfg: Config, tx, mesh: Mesh, axis: str = "data"
) -> Callable:
    """the SPMD version of trainer.make_train_step: state replicated, batch
    sharded over `axis`; the jitted step's gradient mean over the batch
    lowers to an all-reduce over ICI."""
    step = make_train_step(model, cfg, tx, jit=False)  # ONE jit, below
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis))
    return jax.jit(
        step,
        in_shardings=(rep, shd),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_parallel_detect(
    model, cfg: Config, mesh: Mesh, axis: str = "data"
) -> Callable:
    """SPMD batched-pair inference: params/anchors replicated, the pair
    batch sharded over `axis` -- multi-chip serving throughput is a mesh
    width, not a code change. Returns fn(variables, images (P,2,H,W,3),
    anchors) -> PairDetections with every field batch-sharded (device
    results stay sharded; jax.device_get gathers them on the host)."""
    import functools

    from ..inference import detect_pairs_batched

    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis))
    fn = functools.partial(detect_pairs_batched, model, cfg=cfg)
    return jax.jit(
        fn,
        in_shardings=(rep, shd, rep),
        out_shardings=shd,
    )
