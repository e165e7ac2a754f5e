"""Device mesh + sharding for GSPMD data×tensor-parallel training.

The reference scales with DDP + NCCL allreduce and hand-written all_gathers
(``src/training/distributed.py``, ``src/open_clip/loss.py:19-63``). The
TPU-native equivalent: one ``jax.sharding.Mesh`` over ICI with axes
``("data", "model")``, batch sharded on ``data``; XLA inserts the gradient
psums, the InfoNCE negative-gathering, and the prototype-update reductions
automatically.

``--model-parallelism K>1`` is real tensor parallelism (the reference has
none — SURVEY §2.4): the transformer MLP kernels of both towers are
Megatron-sharded on ``model`` — ``c_fc_w [L,D,4D]`` column-split on the
hidden dim, ``c_fc_b`` likewise, ``c_proj_w [L,4D,D]`` row-split on the
contraction dim — so the only collective GSPMD inserts per block is the
psum of the ``c_proj`` partial products. Optimizer moments follow the same
specs (their pytree mirrors the params), cutting per-device HBM for the
dominant weight class by K. Everything else (attention, embeddings, bank)
stays replicated: at ViT-B scale the MXU-friendly move is keeping matmuls
big, not slicing 64-wide heads. ``train_state_shardings`` is the single
source of truth; K=1 reduces to full replication.

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


def tpu_compiler_options() -> Optional[Dict[str, str]]:
    """Per-computation TPU compiler options for first-party jit sites.

    Default: none. The flash-attention kernel's larger batch groups get
    their VMEM headroom from a PER-KERNEL Mosaic limit
    (``kernels/attention.py::_compiler_params``, vmem_limit_bytes=64 MiB),
    which measured equal-or-better than a global scoped-VMEM carve-out
    (568.5 img/s vs 567.4 at 32 MiB, vs 559.8 at 64 MiB — the global carve
    taxes every non-attention fusion in the program; BASELINE.md round-3
    rows). LATTECLIP_SCOPED_VMEM_KIB=<kib> re-enables the global carve for
    experiments. XLA_FLAGS cannot carry this flag here: the axon client's
    XLA rejects TPU-only flags at parse time; per-computation options ship
    server-side.
    """
    if jax.default_backend() != "tpu":
        return None
    kib = int(os.environ.get("LATTECLIP_SCOPED_VMEM_KIB", "0"))
    if not kib:
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}


def tpu_jit(fun=None, **kwargs):
    """``jax.jit`` + :func:`tpu_compiler_options` (first-party jit sites).

    With the per-kernel VMEM limit as the default this usually adds
    nothing, but it keeps one place where LATTECLIP_SCOPED_VMEM_KIB
    experiments reach every first-party jit. Only for RUNTIME jit sites —
    at module level it would init the backend (and claim the chip) at
    import time.
    """
    if fun is None:
        return lambda f: tpu_jit(f, **kwargs)
    kwargs.setdefault("compiler_options", tpu_compiler_options())
    return jax.jit(fun, **kwargs)


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


def _tp_leaf_spec(path, leaf, model_size: int) -> P:
    """PartitionSpec for one train-state leaf under K-way tensor parallelism.

    Matches by terminal pytree-key name so it applies uniformly to params
    AND to optimizer moments (optax state mirrors the param tree). Leaves
    whose hidden dim does not divide K stay replicated rather than failing.
    """
    name = None
    if path:
        last = path[-1]
        name = getattr(last, "key", None) or getattr(last, "name", None)
    shape = getattr(leaf, "shape", ())
    if model_size > 1 and name == "c_fc_w" and len(shape) == 3 and shape[-1] % model_size == 0:
        return P(None, None, MODEL_AXIS)
    if model_size > 1 and name == "c_fc_b" and len(shape) == 2 and shape[-1] % model_size == 0:
        return P(None, MODEL_AXIS)
    if model_size > 1 and name == "c_proj_w" and len(shape) == 3 and shape[1] % model_size == 0:
        return P(None, MODEL_AXIS, None)
    return P()


def train_state_shardings(state, mesh: Mesh):
    """Sharding pytree for the full train state (params + opt moments + bank).

    MLP kernels go model-sharded when the mesh has a non-trivial ``model``
    axis; everything else is replicated. With model axis == 1 this is
    exactly ``replicated(mesh)`` everywhere.
    """
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _tp_leaf_spec(path, leaf, model_size)),
        state,
    )


def shard_train_state(state, mesh: Mesh):
    """Place the train state per ``train_state_shardings`` (replicate at K=1)."""
    return jax.tree_util.tree_map(
        jax.device_put, state, train_state_shardings(state, mesh)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch so its leading axis is split across the data axis."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def tree_fully_replicated(tree: Any) -> bool:
    """True when every jax.Array leaf is fully replicated (host-fetchable
    process-locally in a multi-host job). Non-array leaves count as True."""
    return all(
        getattr(getattr(leaf, "sharding", None), "is_fully_replicated", True)
        for leaf in jax.tree_util.tree_leaves(tree)
    )


def gather_replicated(tree: Any, mesh: Mesh) -> Any:
    """All-gather a (possibly model-sharded) tree to fully replicated.

    The TP→replicated resharding is a GSPMD collective: in a multi-host job
    EVERY process must execute this call in the same order — run it on all
    processes (the train loop's eval/checkpoint sections do), never inside
    master-only code. Replicated leaves pass through at no collective cost.
    """
    shardings = jax.tree_util.tree_map(lambda _: replicated(mesh), tree)
    return jax.jit(lambda t: t, out_shardings=shardings)(tree)


def make_sharded_train_step(step_fn, mesh: Mesh, state=None):
    """jit the train step with the state sharded per ``train_state_shardings``
    (replicated at model_parallelism 1, MLP-tensor-sharded otherwise) and the
    batch data-sharded.

    ``(state, batch, rng) -> (state, metrics)``; state is donated so the
    optimizer update is in-place in HBM. Pass ``state`` (or any pytree of
    matching structure/shapes) whenever the mesh has a non-trivial ``model``
    axis; without it K>1 is refused rather than silently replicating params
    and wasting the model-axis devices.
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    if state is not None:
        state_sh = train_state_shardings(state, mesh)
    elif mesh.shape[MODEL_AXIS] == 1:
        state_sh = rep
    else:
        raise ValueError(
            "model_parallelism > 1 requires the state pytree to derive MLP "
            "tensor shardings; call make_sharded_train_step(step, mesh, state)"
        )
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=(0,),
        compiler_options=tpu_compiler_options(),
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
