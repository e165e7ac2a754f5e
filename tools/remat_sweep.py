"""Measure the ViT-B/16 bs512 fused step under different remat save sets.

Each named intermediate pinned by the policy trades HBM for skipped
backward recompute (see models/layers.py REMAT_SAVE_NAMES):

  qkv_proj_v  ~465 MB/layer  skips the LN+QKV GEMM recompute (vision)
  attn_res_v  ~155 MB/layer  skips the out-proj recompute (vision)
  mlp_act_v   ~620 MB/layer  skips both MLP GEMM recomputes (vision)
  *_t         text-tower equivalents at ~52% the size

Usage: python tools/remat_sweep.py [batch] — prints one line per config.
OOM surfaces as a remote-compile error; the sweep records it and moves on.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402
from latteclip_tpu.models import layers  # noqa: E402

CONFIGS = [
    "flash_out,flash_lse",
    "flash_out,flash_lse,qkv_proj_v",
    "flash_out,flash_lse,attn_res_v",
    "flash_out,flash_lse,qkv_proj_v,attn_res_v",
    "flash_out,flash_lse,qkv_proj_t,attn_res_t,mlp_act_t",
    "flash_out,flash_lse,qkv_proj_v,qkv_proj_t,attn_res_t",
]


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    for names in CONFIGS:
        layers.REMAT_SAVE_NAMES = tuple(names.split(","))
        t0 = time.time()
        try:
            result = bench.run(batch=batch, remat=True)
            print(
                f"SWEEP save={names}: {result['value']:8.1f} img/s "
                f"(compile+run {time.time()-t0:.0f}s)",
                flush=True,
            )
        except Exception as e:
            msg = str(e).replace("\n", " ")[:200]
            print(f"SWEEP save={names}: FAILED {msg}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
