"""Upper-bound probe: the full v2 step with attention kernels stubbed out.

Replaces ``flash_attention_qkv`` with a v-passthrough (wrong numerics, same
shapes/dtypes and a gradient path) and times the ViT-B/16 bs512 step. The
gap to the real step bounds what ANY attention-kernel optimization can buy;
everything else (GEMMs, LN/GELU, fusion, loss, optimizer, augment) is
untouched.

Usage: python tools/r4_attnfree.py   (run alone; chip claim exclusive)
"""
from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main():
    from latteclip_tpu.kernels import attention as A

    HD_OF = {}

    def stub(qkv, num_heads, causal=False):
        B, L, C = qkv.shape
        hd = C // 3
        # v-passthrough: keeps shapes, keeps a grad path through qkv
        return qkv[..., 2 * hd:]

    A.flash_attention_qkv = stub
    import latteclip_tpu.kernels as K

    # attention_core_qkv imports the symbol lazily from the module — the
    # monkeypatch above is seen by every caller
    from r3_levers import run_variant

    run_variant("attn_free", batch=512, remat=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
