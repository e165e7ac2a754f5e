"""Measure --text-context-cap on the ViT-B/16 bs512 fused v2 step.

Real LLaVA captions ("less than 20 words" prompts) tokenize to ~25-35 BPE
tokens; this measures the step with caption/template contexts capped at 32
and 48 vs the full 77 — the semantics are exact whenever the dataset fits
the cap (tests/test_context_cap.py), so the delta is pure text-tower
savings (GEMMs shrink linearly, attention quadratically).

Usage: python tools/r4_ctxcap.py   (run alone; chip claim exclusive)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)


def run(ctx: int, batch=512, iters=10):
    import jax

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.core.mesh import tpu_compiler_options
    from latteclip_tpu.models.clip import init_clip_params
    from latteclip_tpu.models.tokenizer import get_tokenizer
    from latteclip_tpu.train.optim import make_optimizer, make_schedule
    from latteclip_tpu.train.state import (
        build_template_table,
        create_train_state,
        init_memory_bank,
    )
    from latteclip_tpu.train.step import LatteHParams, make_train_step

    cfg = get_model_config("ViT-B-16")
    classes = [f"class {i}" for i in range(47)]
    templates = [lambda c: f"{c} texture."]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tokenizer = get_tokenizer()
    bank = init_memory_bank(params, cfg, tokenizer, classes, templates)
    table = build_template_table(tokenizer, classes, templates)[:, :ctx]
    optimizer = make_optimizer(make_schedule("cosine", 1e-5, warmup=10, total_steps=1000))
    state = create_train_state(params, optimizer, bank)
    step = jax.jit(make_train_step(cfg, optimizer, LatteHParams(remat=True), table),
                   donate_argnums=(0,), compiler_options=tpu_compiler_options())

    rng = np.random.default_rng(0)
    S = cfg.vision.image_size
    eot = tokenizer.eot_token_id

    def toks():
        t = rng.integers(1, 40000, size=(batch, ctx)).astype(np.int32)
        t[:, -1] = eot
        return t

    db = {
        "images": jax.device_put(rng.integers(0, 255, size=(batch, S, S, 3)).astype(np.uint8)),
        "per_image_tokens": jax.device_put(toks()),
        "per_group_tokens": jax.device_put(toks()),
        "zs_preds": jax.device_put(rng.integers(0, 47, size=(batch,)).astype(np.int32)),
        "gt_labels": jax.device_put(rng.integers(0, 47, size=(batch,)).astype(np.int32)),
    }
    print(f"[{time.strftime('%H:%M:%S')}] ctx={ctx}: building", flush=True)
    for i in range(3):
        state, m = step(state, db, jax.random.PRNGKey(i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, db, jax.random.PRNGKey(100 + i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"RESULT ctx={ctx}: {dt*1e3:8.1f} ms/step  {batch/dt:7.1f} img/s", flush=True)


def main():
    for ctx in [int(x) for x in (sys.argv[1:] or ["77", "48", "32"])]:
        run(ctx)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
