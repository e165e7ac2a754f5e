"""Training orchestration: epochs, eval, checkpointing, resume.

The TPU counterpart of the reference's ``main.py`` epoch loop
(``src/training/main.py:480-551``): per epoch — snapshot prototypes, run
``steps_per_epoch`` fused steps, zero-shot eval with the prototype
classifier (reference ``zero_shot.py:139-145``), save an OpenCLIP-format
``.pt`` checkpoint (with ``memory_bank.<classname>`` keys) plus an atomic
``epoch_latest.pt``; resume-latest discovery by natural epoch sort
(reference ``main.py:56-69,546-551``).
"""
from __future__ import annotations

import dataclasses
import logging
import os
import re
from typing import Dict, Optional, Sequence

import jax
import numpy as np

from latteclip_tpu.core.checkpoint import save_clip_pt
from latteclip_tpu.core.config import CLIPConfig
from latteclip_tpu.core import mesh as mesh_mod
from latteclip_tpu.core.mesh import (
    global_batch_from_local,
    make_mesh,
    make_sharded_train_step,
    shard_train_state,
)
from latteclip_tpu.data.eval_dataset import FlatFileDataset, iter_batches
from latteclip_tpu.data.pipeline import TrainPipeline, prefetch
from latteclip_tpu.eval.zero_shot import prototype_classifier, run_zero_shot_eval
from latteclip_tpu.obs.meters import (
    DeviceMeterBank,
    Throughput,
    append_results_jsonl,
)
from latteclip_tpu.train.state import TrainState

logger = logging.getLogger(__name__)

_EPOCH_RE = re.compile(r"epoch_(\d+)\.pt$")


def find_latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    if not os.path.isdir(checkpoint_dir):
        return None
    latest = os.path.join(checkpoint_dir, "epoch_latest.pt")
    if os.path.exists(latest):
        return latest
    epochs = []
    for f in os.listdir(checkpoint_dir):
        m = _EPOCH_RE.search(f)
        if m:
            epochs.append((int(m.group(1)), os.path.join(checkpoint_dir, f)))
    return max(epochs)[1] if epochs else None


@dataclasses.dataclass
class LoopConfig:
    epochs: int
    checkpoint_dir: str
    name: str = "run"
    log_every_n_steps: int = 10
    zeroshot_frequency: int = 1
    val_frequency: int = 1      # gates the --val-data branch (reference train.py:1400)
    save_frequency: int = 1
    save_most_recent: bool = True  # atomic epoch_latest.pt (reference main.py:546)
    delete_previous_checkpoint: bool = False
    eval_batch_size: int = 64
    method: str = "ours"  # eval-classifier dispatch, reference zero_shot.py:117-145
    # --profile: jax.profiler trace of a few warm steps (reference tracing
    # surface: model.py:762-775 --trace, main.py:463-465 --torchcompile,
    # profiler.py:82-122)
    profile_dir: Optional[str] = None
    profile_start_step: int = 3
    profile_num_steps: int = 5
    # schedule(step) -> lr, for the per-step "LR:" log field (reference
    # train.py:605 logs optimizer.param_groups[0]['lr'])
    lr_schedule: Optional[object] = None
    # --text-packing: packed template encodes in the eval classifier builds
    # (flyp/imagenet-val branches; 0 = padded)
    text_packing: int = 0


def _host_local_eval_state(state: TrainState, mesh=None) -> TrainState:
    """Fetch the arrays eval needs to host memory.

    In a multi-host job, jitted eval on one process over globally-committed
    arrays deadlocks (collectives expect every process). Fetching replicated
    arrays is process-local and safe on every host; eval then runs
    independently (and identically) per process on local devices. Only used
    when process_count > 1 — single-process runs keep arrays on device.

    Tensor-parallel params (``--model-parallelism K``) are first all-gathered
    to replicated — a collective, so THIS FUNCTION must be called on every
    process (all the loop's call sites are); pass ``mesh`` for that case.
    """
    if jax.process_count() == 1:
        return state
    params = state.params
    if not mesh_mod.tree_fully_replicated(params):
        if mesh is None:
            raise ValueError(
                "model-sharded params need the mesh to all-gather for "
                "host-local eval; pass mesh=... through"
            )
        params = mesh_mod.gather_replicated(params, mesh)
    return state.replace(
        params=jax.device_get(params),
        memory_bank=np.asarray(state.memory_bank),
        prototypes=np.asarray(state.prototypes),
    )


def _host_local_save_state(state: TrainState, mesh=None) -> TrainState:
    """Like :func:`_host_local_eval_state` but also covers the optimizer
    moments the checkpoint carries (TP-sharded under --model-parallelism).
    Collective under TP: call on EVERY process, then let only master write.
    """
    state = _host_local_eval_state(state, mesh)
    if jax.process_count() == 1 or mesh_mod.tree_fully_replicated(state.opt_state):
        return state
    return state.replace(
        opt_state=jax.device_get(
            mesh_mod.gather_replicated(state.opt_state, mesh))
    )


def evaluate_zero_shot(
    state: TrainState,
    cfg: CLIPConfig,
    val_dataset: FlatFileDataset,
    batch_size: int,
    *,
    method: str = "ours",
    tokenizer=None,
    classnames: Optional[Sequence[str]] = None,
    templates=None,
    packing: int = 0,
    mesh=None,
) -> Dict[str, float]:
    """Epoch zero-shot eval with the reference's classifier dispatch:

    * ``ours`` (LatteCLIP): the prototype memory bank IS the classifier
      (reference ``zero_shot.py:139-145``);
    * ``flyp``/``flyp_gt``: rebuild the template classifier from the
      CURRENT text tower every eval (reference ``zero_shot.py:117-137``) —
      FLYP fine-tunes the text tower but never updates the bank, so the
      bank would be a classifier frozen at initialization.
    """
    state = _host_local_eval_state(state, mesh)
    if method in ("flyp", "flyp_gt"):
        from latteclip_tpu.eval.zero_shot import build_zero_shot_classifier

        assert tokenizer is not None and classnames is not None and templates is not None
        classifier = build_zero_shot_classifier(
            state.params, cfg, tokenizer, classnames, templates, packing=packing
        )
    else:
        classifier = prototype_classifier(state.memory_bank)
    return run_zero_shot_eval(
        state.params, cfg, classifier,
        iter_batches(val_dataset, batch_size, pad_final=True),
    )


# Backwards-compatible alias (round-1 name; prototype classifier only).
def evaluate_prototype_zero_shot(
    state: TrainState,
    cfg: CLIPConfig,
    val_dataset: FlatFileDataset,
    batch_size: int,
) -> Dict[str, float]:
    return evaluate_zero_shot(state, cfg, val_dataset, batch_size, method="ours")


def save_epoch_checkpoint(
    state: TrainState,
    cfg: CLIPConfig,
    classnames: Sequence[str],
    loop_cfg: LoopConfig,
    epoch: int,
) -> None:
    os.makedirs(loop_cfg.checkpoint_dir, exist_ok=True)
    bank = np.asarray(state.memory_bank)
    extra = dict(
        epoch=epoch, name=loop_cfg.name,
        memory_bank=bank, classnames=list(classnames),
        opt_state=state.opt_state, step=int(state.step),
    )
    path = os.path.join(loop_cfg.checkpoint_dir, f"epoch_{epoch}.pt")
    save_clip_pt(path, state.params, cfg, **extra)
    if loop_cfg.delete_previous_checkpoint:
        prev = os.path.join(loop_cfg.checkpoint_dir, f"epoch_{epoch - 1}.pt")
        if os.path.exists(prev):
            os.remove(prev)
    if loop_cfg.save_most_recent:
        # atomic latest (save_clip_pt already writes tmp + os.replace)
        save_clip_pt(
            os.path.join(loop_cfg.checkpoint_dir, "epoch_latest.pt"),
            state.params, cfg, **extra,
        )


def train(
    state: TrainState,
    step_fn,
    pipeline: TrainPipeline,
    cfg: CLIPConfig,
    loop_cfg: LoopConfig,
    classnames: Sequence[str],
    val_dataset: Optional[FlatFileDataset] = None,
    start_epoch: int = 0,
    seed: int = 0,
    mesh=None,
    tokenizer=None,
    templates=None,
    val_pairs_dataset=None,
    imagenet_val_dataset=None,
    writers=(),
) -> TrainState:
    """Run the full fine-tune; returns the final state.

    Multi-host note: the eval and checkpoint sections run identical
    process-local work on EVERY process (replicated arrays are fetched to
    host first, see :func:`_host_local_eval_state`); only the master writes
    logs/files. No jitted computation over globally-committed arrays happens
    on a subset of processes, so no collective can deadlock.
    """
    mesh = mesh or make_mesh()
    sharded_step = make_sharded_train_step(step_fn, mesh, state)
    state = shard_train_state(state, mesh)
    is_master = jax.process_index() == 0
    results_path = os.path.join(loop_cfg.checkpoint_dir, "results.jsonl")

    tracer = None
    if loop_cfg.profile_dir and is_master:
        from latteclip_tpu.obs.profiler import StepTraceProfiler

        tracer = StepTraceProfiler(
            loop_cfg.profile_dir,
            start_step=loop_cfg.profile_start_step,
            num_steps=loop_cfg.profile_num_steps,
        )
    global_step = 0

    for epoch in range(start_epoch, loop_cfg.epochs):
        state = state.start_epoch()
        bank = DeviceMeterBank()  # every-step sums stay on device
        thr = Throughput(pipeline.cfg.batch_size, jax.device_count())

        # host->device transfer runs on the PREFETCH thread: the upload of
        # batch i+1 is dispatched as soon as its host assembly finishes,
        # overlapping the device's step-i compute instead of waiting for the
        # consumer to come around between step dispatches (the reference
        # relies on DataLoader pin_memory + non_blocking .cuda() for the
        # same overlap, train.py:380-390)
        def _to_device(batches):
            for hb in batches:
                yield global_batch_from_local(hb, mesh)

        for i, batch in enumerate(prefetch(_to_device(pipeline.epoch(epoch)),
                                           size=pipeline.cfg.prefetch_batches)):
            thr.tick_data()
            if tracer is not None:
                # host readback forces completion of all dispatched steps, so
                # the capture window contains only whole traced steps
                tracer.on_step(global_step, sync=lambda: np.asarray(state.step))
            rng = jax.random.fold_in(jax.random.PRNGKey(seed), epoch * 100003 + i)
            state, metrics = sharded_step(state, batch, rng)
            bank.update(metrics)  # async device add, no sync
            thr.tick_batch()
            global_step += 1

            if is_master and (i % loop_cfg.log_every_n_steps == 0 or i == pipeline.steps_per_epoch - 1):
                meters = bank.fetch()  # ONE host sync for all scalars
                host_metrics = {k: m.val for k, m in meters.items()}
                # reference train.py:602-607 logs the CURRENT param-group lr,
                # i.e. the schedule already stepped for this batch
                lr_str = (
                    " LR: %f" % float(loop_cfg.lr_schedule(int(state.step) - 1))
                    if loop_cfg.lr_schedule is not None else ""
                )
                logger.info(
                    "Train Epoch: %d [%d/%d] Data (t): %.3f Batch (t): %.3f, %#g/s, %#g/s/chip%s "
                    "Logit Scale: %.3f Loss: %.5g (%.5g)",
                    epoch, (i + 1) * pipeline.cfg.batch_size, pipeline.num_samples,
                    thr.data_time.avg, thr.batch_time.avg,
                    thr.samples_per_second, thr.samples_per_second_per_chip, lr_str,
                    meters["logit_scale"].val, meters["loss"].val, meters["loss"].avg,
                )
                # reference train.py:599-607: per-log-point train/* scalars
                gstep = epoch * pipeline.steps_per_epoch + i
                for w in writers:
                    for k, v in host_metrics.items():
                        if np.ndim(v) == 0:
                            w.add_scalar(f"train/{k}", float(v), gstep)
                    w.add_scalar("train/data_time", thr.data_time.avg, gstep)
                    w.add_scalar("train/batch_time", thr.batch_time.avg, gstep)
                    w.add_scalar("train/samples_per_second", thr.samples_per_second, gstep)
                    w.flush()

        completed = epoch + 1
        if (
            val_dataset is not None
            and loop_cfg.zeroshot_frequency
            and (completed % loop_cfg.zeroshot_frequency == 0 or completed == loop_cfg.epochs)
        ):
            # every process evaluates (identically); master logs
            eval_metrics = evaluate_zero_shot(
                state, cfg, val_dataset, loop_cfg.eval_batch_size,
                method=loop_cfg.method, tokenizer=tokenizer,
                classnames=classnames, templates=templates,
                packing=loop_cfg.text_packing, mesh=mesh,
            )
            run_val = (
                val_pairs_dataset is not None
                and loop_cfg.val_frequency
                and (completed % loop_cfg.val_frequency == 0
                     or completed == loop_cfg.epochs)
            )
            if run_val:
                from latteclip_tpu.eval.retrieval import evaluate_val_pairs

                eval_metrics.update(
                    evaluate_val_pairs(
                        _host_local_eval_state(state, mesh).params, cfg,
                        val_pairs_dataset, batch_size=loop_cfg.eval_batch_size,
                        tokenizer=tokenizer,
                    )
                )
            if imagenet_val_dataset is not None and tokenizer is not None:
                # reference zero_shot_eval's imagenet branch (zero_shot.py:
                # 117-137): template classifier from the CURRENT text tower
                from latteclip_tpu.eval.imagenet_metadata import (
                    imagenet_classnames,
                    openai_imagenet_templates,
                )
                from latteclip_tpu.eval.zero_shot import (
                    build_zero_shot_classifier,
                    run_zero_shot_eval,
                )

                est = _host_local_eval_state(state, mesh)
                in_classifier = build_zero_shot_classifier(
                    est.params, cfg, tokenizer,
                    imagenet_classnames(), openai_imagenet_templates(),
                    packing=loop_cfg.text_packing,
                )
                in_metrics = run_zero_shot_eval(
                    est.params, cfg, in_classifier,
                    iter_batches(imagenet_val_dataset, loop_cfg.eval_batch_size, pad_final=True),
                )
                eval_metrics.update(
                    {f"imagenet-zeroshot-val-{k}": v for k, v in in_metrics.items()}
                )
            if is_master:
                logger.info("Eval Epoch: %d %s", completed, {k: round(v, 4) for k, v in eval_metrics.items()})
                append_results_jsonl(results_path, {"epoch": completed, **eval_metrics})
                # reference train.py:1488-1496: eval metrics as val/* scalars
                for w in writers:
                    for k, v in eval_metrics.items():
                        w.add_scalar(f"val/{k}", float(v), completed)
                    w.flush()

        if loop_cfg.save_frequency and (completed % loop_cfg.save_frequency == 0 or completed == loop_cfg.epochs):
            # the host fetch runs on EVERY process: under --model-parallelism
            # it all-gathers the TP shards (a collective); on replicated
            # states it is a process-local copy. Only master then writes.
            save_state = _host_local_save_state(state, mesh)
            if is_master:
                save_epoch_checkpoint(save_state, cfg, classnames, loop_cfg, completed)

    if tracer is not None:
        tracer.close(sync=lambda: np.asarray(state.step))
    return state
