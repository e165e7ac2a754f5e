"""Scoped-VMEM experiment via per-computation compiler options.

The axon client's XLA rejects TPU-only flags in XLA_FLAGS (parse error), so
``--xla_tpu_scoped_vmem_limit_kib`` is passed through AOT
``lower(...).compile(compiler_options=...)`` instead, which ships the option
to the server-side TPU compiler. Raising the scoped-VMEM ceiling lets the
flash-attention kernel run bigger batch groups (round 2: fwd G=8 needs
18.79 MB vs the ~16 MB default — the single measured blocker on the
attention TF/s). Pair with LATTECLIP_ATTN_BUDGET_MB to actually request the
bigger groups.

Usage: LATTECLIP_ATTN_BUDGET_MB=24 python tools/r3_vmem2.py 32768 [batch]
Run ALONE: exclusive chip.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    vmem_kib = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax

    from tools.r3_levers import make_step

    print(f"[{time.strftime('%H:%M:%S')}] building (bs{batch}, "
          f"scoped_vmem={vmem_kib}KiB)", flush=True)
    cfg, state, step = make_step("ViT-B-16", True, None, False)
    rng = np.random.default_rng(0)
    S = cfg.vision.image_size
    db = {
        "images": jax.device_put(rng.integers(0, 255, size=(batch, S, S, 3)).astype(np.uint8)),
        "per_image_tokens": jax.device_put(rng.integers(1, 49406, size=(batch, 77)).astype(np.int32)),
        "per_group_tokens": jax.device_put(rng.integers(1, 49406, size=(batch, 77)).astype(np.int32)),
        "zs_preds": jax.device_put(rng.integers(0, 47, size=(batch,)).astype(np.int32)),
        "gt_labels": jax.device_put(rng.integers(0, 47, size=(batch,)).astype(np.int32)),
    }
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    lowered = step.lower(state, db, key)
    print(f"[{time.strftime('%H:%M:%S')}] lowered ({time.perf_counter()-t0:.0f}s); "
          "compiling with options...", flush=True)
    t0 = time.perf_counter()
    opts = {"xla_tpu_scoped_vmem_limit_kib": str(vmem_kib)} if vmem_kib else None
    compiled = lowered.compile(compiler_options=opts)
    print(f"[{time.strftime('%H:%M:%S')}] compiled ({time.perf_counter()-t0:.0f}s)",
          flush=True)
    for i in range(3):
        state, m = compiled(state, db, jax.random.PRNGKey(i))
    print(f"warm, loss {float(m['loss']):.4f}", flush=True)
    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        state, m = compiled(state, db, jax.random.PRNGKey(100 + i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"RESULT vmem{vmem_kib}: {dt*1e3:8.1f} ms/step  {batch/dt:7.1f} img/s",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
