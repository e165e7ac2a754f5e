"""Device mesh + sharding for GSPMD data-parallel training.

The reference scales with DDP + NCCL allreduce and hand-written all_gathers
(``src/training/distributed.py``, ``src/open_clip/loss.py:19-63``). The
TPU-native equivalent: one ``jax.sharding.Mesh`` over ICI with axes
``("data", "model")``, params/optimizer-state/memory-bank replicated, batch
sharded on ``data``; XLA inserts the gradient psums, the InfoNCE
negative-gathering, and the prototype-update reductions automatically.
``model`` is a trivial axis today (ViT-B fits on one chip) kept so tensor
parallelism can be introduced without re-plumbing callers.

Multi-host: ``initialize_distributed`` wraps ``jax.distributed.initialize``
(the replacement for torchrun/SLURM env sniffing, reference
``distributed.py:24-114``); ``global_batch_from_local`` builds a global
device array from per-host shards (the ``split_by_node`` equivalent lives in
the data pipeline's shard assignment).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallelism: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallelism == 0, (n, model_parallelism)
    grid = np.asarray(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch so its leading axis is split across the data axis."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def make_sharded_train_step(step_fn, mesh: Mesh):
    """jit the train step with state replicated and batch data-sharded.

    ``(state, batch, rng) -> (state, metrics)``; state is donated so the
    optimizer update is in-place in HBM.
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def initialize_distributed() -> int:
    """Multi-host init (no-op single-host). Returns process index."""
    if int(os.environ.get("LATTECLIP_NUM_PROCESSES", "1")) > 1 or "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
    return jax.process_index()


def global_batch_from_local(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, Any]:
    """Assemble a global sharded batch from this host's local arrays
    (multi-host path; single-host reduces to shard_batch)."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sharding = batch_sharding(mesh)
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
