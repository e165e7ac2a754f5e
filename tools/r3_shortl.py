"""Round-3 short-sequence text-attention levers (VERDICT #1, continued).

tools/r3_text_audit.py showed the L=77 text towers run the flash kernel at
2.6 TF/s (vs 21-26 at L=197): each fwd program at G=16 is ~194 MFLOP of
77x64x77 dots yet measures ~75 us — per-program overhead, not VPU. Two
competing fixes, measured on the full ViT-B/16 bs512 fused v2 step:

  gmax16    LATTECLIP_ATTN_GMAX=16 — the pre-round-3 short-L picks
            (fwd G=16 / bwd G=8); the session-local reference point.
  shortl    default — the short-L 48 MB budget extends the ladder to
            fwd G=64 / bwd G=32 at text HD=512, amortizing program overhead.
  xla_text  LATTECLIP_TEXT_XLA_ATTN=1 + attn_probs remat pin — text
            attention as plain XLA batched matmuls; the pinned bf16 probs
            (~100 MB/layer) remove the QK^T+softmax recompute that made
            this lose in round 2 (484 vs 529).

Each variant runs in a SUBPROCESS (env vars are read at import in several
modules; the kernel compile cache is shared server-side across processes).
Run ALONE — the chip claim is exclusive.

Usage: python tools/r3_shortl.py [variant ...]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

VARIANTS = {
    "gmax16": {"LATTECLIP_ATTN_GMAX": "16"},
    "shortl": {"LATTECLIP_ATTN_SHORTL": "1"},
    "xla_text": {
        "LATTECLIP_TEXT_XLA_ATTN": "1",
        "LATTECLIP_REMAT_SAVE": "flash_out,flash_lse,attn_probs",
    },
}

INNER = "import sys; sys.path.insert(0, 'tools'); " \
        "from r3_levers import run_variant; run_variant('{name}', batch=512, remat=True)"


def main() -> int:
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        env = dict(os.environ, **VARIANTS[n])
        print(f"=== {n} ({VARIANTS[n]}) ===", flush=True)
        t0 = time.time()
        subprocess.run([sys.executable, "-c", INNER.format(name=n)], env=env,
                       timeout=3600, check=False)
        print(f"=== {n} done in {time.time()-t0:.0f}s ===", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
