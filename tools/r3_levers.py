"""Round-3 perf levers for the ViT-B/16 bs512 fused v2 step (VERDICT #1).

Measures, in one process (shared kernel cache), streaming results:
  1. base       bs512  remat                     (round-2 reference point)
  2. textfull   bs512  remat, remat_text=False   (text residuals at L=77 are
                                                  cheap to keep)
  3. fuse       bs512  remat, fuse_text_fwd      (ONE [C+2B,77] text forward)
  4. fuse+textfull
  5. bs1024     remat                            (amortize fixed step costs)
  6. bs1024 + the winning flags

Usage: python tools/r3_levers.py [variant ...]   (default: all, in order)
Sync note: axon relay block_until_ready does not block; sync via scalar
readback. Run alone — the chip claim is exclusive.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def make_step(model, remat, remat_text, fuse_text_fwd):
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
    classes = [f"class {i}" for i in range(47)]
    templates = [lambda c: f"{c} texture."]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tokenizer = get_tokenizer()
    bank = init_memory_bank(params, cfg, tokenizer, classes, templates)
    table = build_template_table(tokenizer, classes, templates)
    optimizer = make_optimizer(make_schedule("cosine", 1e-5, warmup=10, total_steps=1000))
    state = create_train_state(params, optimizer, bank)
    hp = LatteHParams(remat=remat, remat_text=remat_text, fuse_text_fwd=fuse_text_fwd)
    from latteclip_tpu.core.mesh import tpu_compiler_options
    step = jax.jit(make_train_step(cfg, optimizer, hp, table), donate_argnums=(0,),
                   compiler_options=tpu_compiler_options())
    return cfg, state, step


def run_variant(name, batch, remat, remat_text=None, fuse=False, iters=10):
    import jax

    print(f"[{time.strftime('%H:%M:%S')}] {name}: building (bs{batch} remat={remat} "
          f"remat_text={remat_text} fuse={fuse})", flush=True)
    try:
        cfg, state, step = make_step("ViT-B-16", remat, remat_text, fuse)
        rng = np.random.default_rng(0)
        S = cfg.vision.image_size
        db = {
            "images": jax.device_put(rng.integers(0, 255, size=(batch, S, S, 3)).astype(np.uint8)),
            "per_image_tokens": jax.device_put(rng.integers(1, 49406, size=(batch, 77)).astype(np.int32)),
            "per_group_tokens": jax.device_put(rng.integers(1, 49406, size=(batch, 77)).astype(np.int32)),
            "zs_preds": jax.device_put(rng.integers(0, 47, size=(batch,)).astype(np.int32)),
            "gt_labels": jax.device_put(rng.integers(0, 47, size=(batch,)).astype(np.int32)),
        }
        t_compile = time.perf_counter()
        for i in range(3):
            state, m = step(state, db, jax.random.PRNGKey(i))
        loss = float(m["loss"])
        print(f"[{time.strftime('%H:%M:%S')}] {name}: warm (compile+3 steps "
              f"{time.perf_counter()-t_compile:.0f}s, loss {loss:.4f})", flush=True)
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, db, jax.random.PRNGKey(100 + i))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"RESULT {name}: {dt*1e3:8.1f} ms/step  {batch/dt:7.1f} img/s", flush=True)
        return batch / dt
    except Exception as e:
        print(f"RESULT {name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


VARIANTS = {
    "base":          dict(batch=512, remat=True),
    "textfull":      dict(batch=512, remat=True, remat_text=False),
    "fuse":          dict(batch=512, remat=True, fuse=True),
    "fuse_textfull": dict(batch=512, remat=True, remat_text=False, fuse=True),
    "bs1024":        dict(batch=1024, remat=True),
    "bs1024_fuse":   dict(batch=1024, remat=True, fuse=True),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        run_variant(n, **VARIANTS[n])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
