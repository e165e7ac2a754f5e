"""Decompose the FULL-loop host path (VERDICT r4 item 3).

After the decode cache warms (epoch >= 2 decodes nothing), the full loop
still measured ~780 img/s at B/32 bs256 packed vs a ~1636 img/s device step
(BASELINE.md round-4 full-loop rows). This tool attributes the gap on THIS
1-core host, stage by stage, against the reference's multi-worker DataLoader
assumption (``/root/reference/src/training/data.py:751-757``).

Stages (each timed in isolation, same fixture, warm decode cache):
  tar      — raw tar iteration + shuffle buffer (no decode, no assemble)
  produce  — pipeline.epoch() end-to-end batch production (warm cache)
  fill     — batch-buffer writes only (replay cached samples into buffers)
  pack     — host packer on a produced batch
  h2d      — shard_batch() host->device transfer + block
  step     — device-only train step at the same shape
  loop     — produce+h2d+step with the real prefetch overlap (the number
             full_loop_bench.py reports)

Usage: python tools/r5_loop_profile.py [--stages tar,produce,...] [--batch 256]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def build(root: str, images: int, size: int):
    from latteclip_tpu.data.synthetic import make_full_fixture

    t0 = time.time()
    make_full_fixture(root, num_train=images, num_val=8, image_size=size)
    print(f"fixture: {images} imgs @ {size}px in {time.time()-t0:.1f}s", flush=True)


def make_pipeline(root: str, batch: int, packing: int, images: int):
    from latteclip_tpu.data.pipeline import (
        PipelineConfig,
        TrainPipeline,
        build_train_data,
    )
    from latteclip_tpu.models.tokenizer import ClipTokenizer

    import json

    tok = ClipTokenizer()
    with open(os.path.join(root, "class_to_id.json")) as f:
        c2i = json.load(f)
    classnames = [c for c, _ in sorted(c2i.items(), key=lambda kv: kv[1])]
    data = build_train_data(
        os.path.join(root, "webdataset", "train_tars"),
        os.path.join(root, "clip_features_train.pkl"),
        [os.path.join(root, "captions_per_image")],
        [os.path.join(root, "captions_per_group")],
        classnames,
        tok,
    )
    cfg = PipelineConfig(
        batch_size=batch,
        image_size=224,
        ondevice_resize=True,
        text_packing_len=packing or 0,
        num_threads=4,
    )
    return TrainPipeline(data, cfg, num_samples=images * 2)


def warm(pipe):
    t0 = time.time()
    n = 0
    for b in pipe.epoch(0):
        n += b["images"].shape[0]
    print(f"warm epoch: {n} samples in {time.time()-t0:.1f}s "
          f"(cache {len(pipe._decode_cache)} entries, "
          f"{pipe._decode_cache_used/1e6:.0f} MB)", flush=True)


def stage_tar(pipe, epochs=3):
    from latteclip_tpu.data.tar_reader import (
        ShuffleBuffer, iter_shards_samples, shuffled_shards, split_shards)

    best = 0.0
    for e in range(1, epochs + 1):
        shards = split_shards(shuffled_shards(pipe.data.shards, 0, e * 1000), 0, 1)
        sb = ShuffleBuffer(pipe.cfg.shuffle_buffer, seed=e)
        t0 = time.time()
        n = sum(1 for _ in sb(iter_shards_samples(shards)))
        r = n / (time.time() - t0)
        best = max(best, r)
        print(f"  tar e{e}: {n} raw samples, {r:.0f}/s", flush=True)
    return best


def stage_produce(pipe, epochs=(1, 2)):
    best = 0.0
    for e in epochs:
        t0 = time.time()
        n = 0
        for b in pipe.epoch(e):
            n += b["images"].shape[0]
        r = n / (time.time() - t0)
        best = max(best, r)
        print(f"  produce e{e}: {n} samples, {r:.0f}/s", flush=True)
    return best


def stage_fill(pipe):
    """Batch-buffer writes only: replay already-assembled samples."""
    stream = pipe._sample_stream(1)
    samples = [next(stream) for _ in range(pipe.cfg.batch_size)]
    B = pipe.cfg.batch_size
    img_shape = samples[0]["image"].shape
    tok_dim = pipe._tok_dim
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        batch = {
            "images": np.empty((B,) + img_shape, np.uint8),
            "per_image_tokens": np.empty((B, tok_dim), np.int32),
            "per_group_tokens": np.empty((B, tok_dim), np.int32),
            "zs_preds": np.empty((B,), np.int32),
            "gt_labels": np.empty((B,), np.int32),
            "crop_boxes": np.empty((B, 4), np.float32),
        }
        for i, s in enumerate(samples):
            batch["images"][i] = s["image"]
            batch["per_image_tokens"][i] = s["per_image_tokens"]
            batch["per_group_tokens"][i] = s["per_group_tokens"]
            batch["zs_preds"][i] = s["zs_pred"]
            batch["gt_labels"][i] = s["gt"]
            batch["crop_boxes"][i] = s["crop_box"]
    r = reps * B / (time.time() - t0)
    print(f"  fill: {r:.0f} samples/s ({1e3*B/r:.1f} ms/batch)", flush=True)
    return r


def stage_pack(pipe):
    from latteclip_tpu.data.packing import (
        pack_caption_batch, pack_rows_needed, token_lengths)

    b = next(pipe.epoch(1))
    P = pipe.cfg.text_packing_len or 128
    t0 = time.time()
    reps = 50
    for _ in range(reps):
        lengths = np.concatenate([
            token_lengths(b["per_image_tokens"]),
            token_lengths(b["per_group_tokens"]),
        ])
        rows = pack_rows_needed(lengths, P)
        pack_caption_batch(b["per_image_tokens"], b["per_group_tokens"], P,
                           -(-rows // 8) * 8)
    dt = (time.time() - t0) / reps
    print(f"  pack: {dt*1e3:.2f} ms/batch", flush=True)
    return dt


def stage_h2d(pipe, reps=20):
    import jax
    from latteclip_tpu.core.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    b = next(pipe.epoch(1))
    nbytes = sum(np.asarray(v).nbytes for v in b.values())
    # warm
    db = shard_batch(b, mesh)
    jax.block_until_ready(db)
    t0 = time.time()
    for _ in range(reps):
        db = shard_batch(b, mesh)
        jax.block_until_ready(db)
    dt = (time.time() - t0) / reps
    B = pipe.cfg.batch_size
    print(f"  h2d: {dt*1e3:.1f} ms/batch ({nbytes/1e6:.1f} MB, "
          f"{nbytes/dt/1e9:.2f} GB/s, {B/dt:.0f} samples/s equiv)", flush=True)
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--source-size", type=int, default=448)
    ap.add_argument("--packing", type=int, default=128)
    ap.add_argument("--stages", default="tar,produce,fill,pack,h2d")
    args = ap.parse_args()

    # keep JAX off the real chip unless a device stage is requested
    stages = args.stages.split(",")
    if "h2d" not in stages and "step" not in stages:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    root = tempfile.mkdtemp(prefix="r5_loop_")
    build(root, args.images, args.source_size)
    pipe = make_pipeline(root, args.batch, args.packing, args.images)
    warm(pipe)

    results = {}
    for st in stages:
        print(f"[{st}]", flush=True)
        fn = {"tar": stage_tar, "produce": stage_produce, "fill": stage_fill,
              "pack": stage_pack, "h2d": stage_h2d}[st]
        results[st] = fn(pipe)
    print("RESULTS", {k: round(float(v), 4) for k, v in results.items()}, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
