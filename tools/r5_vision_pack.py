"""A/B the vision pair-packing lever (models/vit.py `LATTECLIP_VISION_PACK`).

The round-5 trace decomposition measured the L=50 vision attention kernel at
12.2 TF/s — the 50-token score tile wastes 61% of its 128 lanes — while the
segment-masked packed-text kernel ran 36.8 TF/s on full rows. Packing two
images per row halves the score tiles at identical attention math.

Runs the FULL packed train step (bench.run) pack-off vs pack-on in ONE
process at the round-5 tuned config (bs384, no remat, auto unroll) and the
reference's exact bs512. Run ALONE — the chip claim is exclusive.

Usage: python tools/r5_vision_pack.py [--quick]
"""
from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import bench  # noqa: E402


def ab(tag: str, **kw):
    from latteclip_tpu.models import vit as V

    out = {}
    for env in ("0", "auto"):
        V._VISION_PACK_ENV = env
        t0 = time.time()
        r = bench.run(**kw)
        out[env] = r["value"]
        print(f"{tag} pack={env:4s}: {r['value']:8.1f} img/s  "
              f"(total {time.time()-t0:.0f}s)", flush=True)
    gain = out["auto"] / out["0"] - 1.0
    print(f"{tag} pair-pack gain: {gain*100:+.1f}%", flush=True)
    return out


def main():
    quick = "--quick" in sys.argv
    ab("B/32 packed bs384 no-remat", model="ViT-B-32", batch=384,
       remat=False, packing=128)
    if not quick:
        ab("B/32 packed bs512 no-remat", model="ViT-B-32", batch=512,
           remat=False, packing=128)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
