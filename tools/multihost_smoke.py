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

``SMOKE_TP=2`` runs the same contract under --model-parallelism 2 on the
(4, 2) dp x tp mesh: MLP kernels Megatron-sharded across processes, and the
eval/checkpoint host fetch goes through the all-gather path
(loop._host_local_{eval,save}_state + core.mesh.gather_replicated). The
bare launcher runs BOTH modes.
"""
from __future__ import annotations

import os
import subprocess
import sys

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 4
PORT = 12765


def worker(process_id: int) -> None:
    tp = int(os.environ.get("SMOKE_TP", "1"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{os.environ.get('SMOKE_PORT', PORT)}",
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
        shard_train_state,
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

    mesh = make_mesh(model_parallelism=tp)
    sharded_step = make_sharded_train_step(step_fn, mesh, state)
    state = shard_train_state(state, mesh)

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

    # ---- full mini-epoch tail: eval -> checkpoint -> resume -> step ------------
    # (the loop's multi-host contract: eval runs identically on EVERY process
    # over host-fetched replicated arrays; only master writes files)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from latteclip_tpu.core import checkpoint as ckpt
    from latteclip_tpu.eval.zero_shot import prototype_classifier, run_zero_shot_eval
    from latteclip_tpu.train.loop import (
        LoopConfig,
        _host_local_eval_state,
        _host_local_save_state,
        find_latest_checkpoint,
        save_epoch_checkpoint,
    )

    def eval_batches():
        ergn = np.random.default_rng(7)  # same eval data on every host
        for _ in range(2):
            imgs = ergn.integers(0, 255, size=(8, 64, 64, 3)).astype(np.uint8)
            labels = ergn.integers(0, 4, size=(8,))
            yield ([""] * 8, imgs, labels, 8)

    est = _host_local_eval_state(state, mesh)
    ev = run_zero_shot_eval(est.params, cfg, prototype_classifier(est.memory_bank), eval_batches())
    print(f"HOST {process_id} eval_top1={ev['top1']:.6f} eval_top5={ev['top5']:.6f}", flush=True)

    ckpt_dir = os.environ["SMOKE_CKPT_DIR"]
    loop_cfg = LoopConfig(epochs=1, checkpoint_dir=ckpt_dir, name="smoke")
    save_state = _host_local_save_state(state, mesh)  # collective: every proc
    if process_id == 0:
        save_epoch_checkpoint(save_state, cfg, classes, loop_cfg, epoch=1)
    multihost_utils.sync_global_devices("checkpoint_written")

    # continuation path: one more step from the live state. The step donates
    # its input state, so snapshot what the resume path needs FIRST.
    proto_snapshot = np.asarray(state.prototypes)
    batch = global_batch_from_local(local_batch, mesh)
    _, m_cont = sharded_step(state, batch, jax.random.PRNGKey(99))
    cont_loss = float(m_cont["loss"])

    # resume path: reload params+bank+opt_state from the checkpoint on EVERY
    # host and take the same step — must match the continuation bitwise
    path = find_latest_checkpoint(ckpt_dir)
    assert path, f"no checkpoint found in {ckpt_dir}"
    r_params, r_bank, r_meta = ckpt.load_clip_pt(path, cfg)
    r_state = create_train_state(
        r_params, optimizer, np.stack([r_bank[c] for c in classes])
    )
    r_state = r_state.replace(step=jnp.asarray(int(r_meta["step"]), jnp.int32))
    r_state = r_state.replace(opt_state=ckpt.restore_opt_state(r_state.opt_state, r_meta["optimizer"]))
    r_state = r_state.replace(prototypes=proto_snapshot)  # epoch snapshot, set by start_epoch
    r_state = shard_train_state(r_state, mesh)
    _, m_res = sharded_step(r_state, batch, jax.random.PRNGKey(99))
    res_loss = float(m_res["loss"])
    print(f"HOST {process_id} cont_loss={cont_loss:.8f} resume_loss={res_loss:.8f}", flush=True)


def main() -> int:
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return 0
    # dp-only (tp=1), then --model-parallelism 2 across the two processes
    for tp, port in ((1, PORT), (2, PORT + 1)):
        print(f"=== multihost smoke: tp={tp} ===", flush=True)
        rc = _run_mode(tp, port)
        if rc:
            return rc
    return 0


def _run_mode(tp: int, port: int) -> int:
    import tempfile

    ckpt_dir = tempfile.mkdtemp(prefix="smoke_ckpt_")
    env = dict(os.environ, SMOKE_CKPT_DIR=ckpt_dir, SMOKE_TP=str(tp),
               SMOKE_PORT=str(port))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(NUM_PROCESSES)
    ]
    # generous: 2 procs share one core here and each compiles the full
    # train step + eval + resume-step programs
    outputs = [p.communicate(timeout=2400)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs)
    losses, checksums, evals, tails = {}, {}, {}, {}
    for out in outputs:
        for line in out.splitlines():
            if line.startswith("HOST"):
                print(line)
                parts = line.split()
                host = int(parts[1])
                if "loss=" in line and "cont_loss" not in line:
                    losses.setdefault(host, []).append(float(line.split("loss=")[1]))
                if "bank_checksum=" in line:
                    checksums[host] = float(line.split("bank_checksum=")[1])
                if "eval_top1=" in line:
                    evals[host] = line.split(None, 2)[2]
                if "cont_loss=" in line:
                    cont = float(line.split("cont_loss=")[1].split()[0])
                    res = float(line.split("resume_loss=")[1])
                    tails[host] = (cont, res)
    if not ok:
        for out in outputs:
            print(out[-3000:])
        print("MULTIHOST SMOKE: FAILED (nonzero exit)")
        return 1
    if len(set(tuple(v) for v in losses.values())) != 1 or len(set(checksums.values())) != 1:
        print("MULTIHOST SMOKE: FAILED (hosts disagree on train)", losses, checksums)
        return 1
    if len(set(evals.values())) != 1 or len(evals) != NUM_PROCESSES:
        print("MULTIHOST SMOKE: FAILED (hosts disagree on eval)", evals)
        return 1
    if len(set(tails.values())) != 1 or any(abs(c - r) > 1e-6 for c, r in tails.values()):
        print("MULTIHOST SMOKE: FAILED (resume != continuation)", tails)
        return 1
    print(f"MULTIHOST SMOKE (tp={tp}): OK — train/eval/bank agree across "
          "hosts; checkpoint resume matches continuation bitwise")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
