"""Round-3 step decomposition probe (one process, shared kernel cache).

Times, same-session: the bs512 reference step, a bs768 rung (bs1024 OOMs;
768 may fit and amortize fixed costs), the step without in-step
augmentation, tower-isolated value+grad at step shapes, and the flash
kernel at text shapes via in-jit scan timing. Output drives the round-3
perf narrative in BASELINE.md.

Usage: python tools/r4_probe.py [probe ...]   (default: all)
Run ALONE — the chip claim is exclusive.
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


def probe_steps():
    sys.path.insert(0, "tools")
    from r3_levers import run_variant

    run_variant("base512", batch=512, remat=True)
    run_variant("bs768", batch=768, remat=True)


def probe_noaug():
    sys.path.insert(0, "tools")
    from perf_lab import bench_step

    bench_step(batch=512, remat=True, augment=False)


def probe_towers():
    sys.path.insert(0, "tools")
    from perf_lab import bench_towers

    bench_towers(batch=512)


def probe_text_kernel():
    """Flash kernel at the caption text shapes: [1024, 77, 3*512]."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "tools")
    from perf_lab import timeit_looped

    from latteclip_tpu.kernels.attention import flash_attention_qkv

    B, L, H, D = 1024, 77, 8, 64
    HD = H * D
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, L, 3 * HD)), dtype=jnp.bfloat16)
    fwd_flops = 4 * B * H * L * L * D
    tot_flops = 15 * B * H * L * L * D

    t = timeit_looped(lambda qkv: flash_attention_qkv(qkv, H), (qkv,))
    print(f"text flash fwd      : {t*1e3:8.2f} ms  {fwd_flops/t/1e12:6.1f} TF/s", flush=True)

    def loss_fa(qkv):
        return jnp.sum(flash_attention_qkv(qkv, H).astype(jnp.float32))

    t = timeit_looped(jax.grad(loss_fa), (qkv,))
    print(f"text flash fwd+bwd  : {t*1e3:8.2f} ms  {tot_flops/t/1e12:6.1f} TF/s", flush=True)


PROBES = {
    "steps": probe_steps,
    "noaug": probe_noaug,
    "towers": probe_towers,
    "textk": probe_text_kernel,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        print(f"=== {n} ===", flush=True)
        t0 = time.time()
        try:
            PROBES[n]()
        except Exception as e:
            print(f"{n} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        print(f"=== {n} done in {time.time()-t0:.0f}s ===", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
