"""Benchmark: LatteCLIP fine-tune throughput, ViT-B/16, one TPU chip.

Measures steady-state images/sec/chip of the FULL fused train step (augment +
image fwd + 4-stream text fwd + fusion + InfoNCE + backward + AdamW + bank
update) — the reference's own throughput formula
``batch_size * world_size / batch_time`` (reference
``src/training/train.py:595-600``).

``vs_baseline`` compares against the estimated reference throughput on its
own hardware (V100-32G, ViT-B/16, global batch 512, AMP fp16, grad
checkpointing — the configuration pinned by the run scripts; see
BASELINE.md). The repo publishes no number, so BASELINE.md pins per-config
estimates (330 img/s at ViT-B/16, 596 at ViT-B/32, one shared utilization
assumption scaled by per-image step FLOPs) and records our measurements as
they land.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

# Per-config V100 baseline estimates (see BASELINE.md "Baseline methodology").
# Both derive from ONE utilization assumption: the round-1 ViT-B/16 estimate
# of 330 img/s, scaled by each config's per-image training FLOPs in the
# reference's own v2 step (image fwd + FOUR text encodes, grad-checkpointing
# on both towers = 4x fwd FLOPs): B/16 ~236 GF/img, B/32 ~130 GF/img.
REFERENCE_V100_IMG_PER_SEC = {
    "ViT-B-16": 330.0,
    "ViT-B-32": 596.0,  # 330 * (236/130); optimistic for the V100 (smaller matmuls)
}

MODEL = "ViT-B-16"
BATCH = 512
WARMUP_STEPS = 3
MEASURE_STEPS = 10


def make_batch(batch_size: int, image_size: int, num_classes: int):
    rng = np.random.default_rng(0)
    return {
        "images": rng.integers(0, 255, size=(batch_size, image_size, image_size, 3)).astype(np.uint8),
        "per_image_tokens": rng.integers(1, 49406, size=(batch_size, 77)).astype(np.int32),
        "per_group_tokens": rng.integers(1, 49406, size=(batch_size, 77)).astype(np.int32),
        "zs_preds": rng.integers(0, num_classes, size=(batch_size,)).astype(np.int32),
        "gt_labels": rng.integers(0, num_classes, size=(batch_size,)).astype(np.int32),
    }


def run(model: str = MODEL, batch: int = BATCH, remat: bool = False) -> dict:
    import jax

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.models.clip import init_clip_params
    from latteclip_tpu.models.tokenizer import get_tokenizer
    from latteclip_tpu.train.optim import make_optimizer, make_schedule
    from latteclip_tpu.train.state import (
        build_template_table,
        create_train_state,
        init_memory_bank,
    )
    from latteclip_tpu.train.step import LatteHParams, make_train_step

    cfg = get_model_config(model)
    classes = [f"class {i}" for i in range(47)]  # DTD-sized class count
    templates = [lambda c: f"{c} texture."]

    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tokenizer = get_tokenizer()
    bank = init_memory_bank(params, cfg, tokenizer, classes, templates)
    table = build_template_table(tokenizer, classes, templates)
    optimizer = make_optimizer(make_schedule("cosine", 1e-5, warmup=10, total_steps=1000))
    state = create_train_state(params, optimizer, bank)
    hp = LatteHParams(remat=remat)
    from latteclip_tpu.core.mesh import tpu_compiler_options

    step = jax.jit(make_train_step(cfg, optimizer, hp, table), donate_argnums=(0,),
                   compiler_options=tpu_compiler_options())

    host_batch = make_batch(batch, cfg.vision.image_size, len(classes))
    device_batch = {k: jax.device_put(v) for k, v in host_batch.items()}

    # NOTE: on the axon relay platform block_until_ready does not actually
    # block; force a real device sync with a host readback of a scalar.
    for i in range(WARMUP_STEPS):
        state, metrics = step(state, device_batch, jax.random.PRNGKey(i))
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, metrics = step(state, device_batch, jax.random.PRNGKey(100 + i))
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * MEASURE_STEPS / dt
    baseline = REFERENCE_V100_IMG_PER_SEC.get(model)
    return {
        "metric": f"finetune_images_per_sec_per_chip_{model.replace('-', '').lower()}",
        "value": round(imgs_per_sec, 2),
        "unit": "images/s/chip",
        # no silently-wrong ratios: models without a derived per-config
        # baseline report null rather than dividing by another config's
        "vs_baseline": round(imgs_per_sec / baseline, 3) if baseline else None,
    }


def main() -> int:
    if len(sys.argv) > 1:  # manual experimentation: bench.py BATCH REMAT [MODEL]
        batch = int(sys.argv[1])
        remat = sys.argv[2] in ("1", "true", "True") if len(sys.argv) > 2 else False
        model = sys.argv[3] if len(sys.argv) > 3 else MODEL
        print(json.dumps(run(model=model, batch=batch, remat=remat)))
        return 0
    # (batch, remat) ladder: largest config that fits wins. v5e has 16G HBM;
    # bs512 needs per-block rematerialisation (the reference also runs bs512
    # with grad checkpointing on its 32G V100).
    attempts = [(BATCH, True), (BATCH // 2, True), (BATCH // 2, False), (BATCH // 4, False)]
    last_err = None
    for batch, remat in attempts:
        try:
            result = run(batch=batch, remat=remat)
            print(json.dumps(result))
            return 0
        except Exception as e:  # OOM surfaces as opaque remote-compile errors
            last_err = e
            print(f"# bench config (batch={batch}, remat={remat}) failed: {e}", file=sys.stderr)
    raise SystemExit(f"all bench configs failed: {last_err}")


if __name__ == "__main__":
    raise SystemExit(main())
