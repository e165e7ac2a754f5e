#!/usr/bin/env python
"""True multi-process data-parallel smoke test (BASELINE config 5 shape).

Spawns N real processes, each owning its own set of virtual CPU devices,
initialises ``jax.distributed`` (coordinator on localhost), assembles a
global batch from per-host shards via ``global_batch_from_local``, and runs
LatteCLIP train steps over the full mesh. This exercises the actual
multi-host code path (process-local arrays → jax.make_array_from_process_local_data
→ GSPMD collectives) that single-process mesh tests cannot.

Run:  python tools/multihost_smoke.py            # launcher, 2 procs x 4 dev
      (prints per-host losses; asserts they agree across hosts)
"""
from __future__ import annotations

import os
import subprocess
import sys

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 4
PORT = 12765


def worker(process_id: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NUM_PROCESSES,
        process_id=process_id,
    )
    assert jax.process_count() == NUM_PROCESSES
    assert jax.device_count() == NUM_PROCESSES * DEVICES_PER_PROCESS

    import numpy as np

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.core.mesh import (
        global_batch_from_local,
        make_mesh,
        make_sharded_train_step,
        replicate,
    )
    from latteclip_tpu.models.clip import init_clip_params
    from latteclip_tpu.models.tokenizer import get_tokenizer
    from latteclip_tpu.train.optim import make_optimizer, make_schedule
    from latteclip_tpu.train.state import (
        build_template_table,
        create_train_state,
        init_memory_bank,
    )
    from latteclip_tpu.train.step import LatteHParams, make_train_step

    cfg = get_model_config("ViT-tiny-test")
    classes = ["banded", "dotted", "striped", "zigzagged"]
    templates = [lambda c: f"{c} texture."]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tokenizer = get_tokenizer()
    bank = init_memory_bank(params, cfg, tokenizer, classes, templates)
    table = build_template_table(tokenizer, classes, templates)
    optimizer = make_optimizer(make_schedule("const", 1e-4, warmup=1))
    state = create_train_state(params, optimizer, bank)
    step_fn = make_train_step(cfg, optimizer, LatteHParams(augment=False), table)

    mesh = make_mesh()
    sharded_step = make_sharded_train_step(step_fn, mesh)
    state = replicate(state, mesh)

    # per-host local shard of the global batch (split_by_node semantics)
    local_b = 4
    rng = np.random.default_rng(100 + process_id)  # different data per host
    local_batch = {
        "images": rng.integers(0, 255, size=(local_b, 64, 64, 3)).astype(np.uint8),
        "per_image_tokens": rng.integers(1, 49406, size=(local_b, 77)).astype(np.int32),
        "per_group_tokens": rng.integers(1, 49406, size=(local_b, 77)).astype(np.int32),
        "zs_preds": rng.integers(0, 4, size=(local_b,)).astype(np.int32),
        "gt_labels": rng.integers(0, 4, size=(local_b,)).astype(np.int32),
    }
    for i in range(2):
        batch = global_batch_from_local(local_batch, mesh)
        state, metrics = sharded_step(state, batch, jax.random.PRNGKey(i))
        loss = float(metrics["loss"])
        print(f"HOST {process_id} step {i}: loss={loss:.6f}", flush=True)
    # the replicated bank must be identical across hosts
    bank_sum = float(abs(np.asarray(state.memory_bank.addressable_shards[0].data)).sum())
    print(f"HOST {process_id} bank_checksum={bank_sum:.6f}", flush=True)


def main() -> int:
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return 0
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(NUM_PROCESSES)
    ]
    outputs = [p.communicate(timeout=600)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs)
    losses, checksums = {}, {}
    for out in outputs:
        for line in out.splitlines():
            if line.startswith("HOST"):
                print(line)
                parts = line.split()
                host = int(parts[1])
                if "loss=" in line:
                    losses.setdefault(host, []).append(float(line.split("loss=")[1]))
                if "bank_checksum=" in line:
                    checksums[host] = float(line.split("bank_checksum=")[1])
    if not ok:
        for out in outputs:
            print(out[-2000:])
        print("MULTIHOST SMOKE: FAILED (nonzero exit)")
        return 1
    if len(set(tuple(v) for v in losses.values())) != 1 or len(set(checksums.values())) != 1:
        print("MULTIHOST SMOKE: FAILED (hosts disagree)", losses, checksums)
        return 1
    print("MULTIHOST SMOKE: OK — hosts agree on losses and bank state")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
