"""Measure the block-diagonal head-fold forward (LATTECLIP_ATTN_BLOCKDIAG).

Kernel-level at text shapes first (the latency-bound regime it targets),
then the full ViT-B/16 bs512 step. Subprocess per variant (env read at
dispatch; server-side compile cache shared).

Usage: python tools/r4_blockdiag.py [kernel|step] ...
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KERNEL_INNER = """
import sys
sys.path.insert(0, {root!r}); sys.path.insert(0, {tools!r})
import numpy as np, jax, jax.numpy as jnp
from perf_lab import timeit_looped
from latteclip_tpu.kernels.attention import flash_attention_qkv
B, L, H, D = 1024, 77, 8, 64
rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.standard_normal((B, L, 3*H*D)), jnp.bfloat16)
fwd = 4*B*H*L*L*D
t = timeit_looped(lambda q: flash_attention_qkv(q, H, True), (qkv,))
print(f"RESULT {name} text fwd: {{t*1e3:8.2f}} ms  {{fwd/t/1e12:5.1f}} TF/s", flush=True)
"""

STEP_INNER = "import sys; sys.path.insert(0, {tools!r}); " \
             "from r3_levers import run_variant; run_variant({name!r}, batch=512, remat=True)"


def main() -> int:
    which = sys.argv[1:] or ["kernel", "step"]
    for mode in which:
        for name, env in (("base", {}), ("blockdiag", {"LATTECLIP_ATTN_BLOCKDIAG": "1"})):
            inner = (KERNEL_INNER if mode == "kernel" else STEP_INNER).format(
                root=_ROOT, tools=os.path.join(_ROOT, "tools"), name=name)
            print(f"=== {mode}/{name} {env} ===", flush=True)
            t0 = time.time()
            subprocess.run([sys.executable, "-c", inner],
                           env=dict(os.environ, **env), timeout=3600,
                           check=False, cwd=_ROOT)
            print(f"=== done in {time.time()-t0:.0f}s ===", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
