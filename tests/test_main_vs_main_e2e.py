"""MAIN-vs-MAIN end-to-end oracle: the reference's REAL ``training.main``
(reference src/training/main.py:72-551) and our ``latteclip_tpu.train.main``
driven through their CLIs on the SAME tar/pkl/caption fixture.

This closes the wiring layer above the (already A/B'd) inner functions —
flag plumbing, data accounting, epoch math, checkpoint layout, eval plumbing.
Two claims:

1. TRAIN (tolerance): 2 epochs of ``--method ours`` on identical data.
   Per-step LR schedules must match EXACTLY; batch accounting must match;
   final losses track within augmentation noise (the reference force-enables
   torch-RNG color jitter, main.py:232-234, so sample-exact equality is
   impossible even between two reference runs); checkpoint key/shape
   surfaces must agree.
2. EVAL-ONLY (exact): both mains resume the checkpoint the REFERENCE just
   trained and evaluate zero-shot; metrics must be EXACTLY equal (eval
   transforms are deterministic, fp32 both sides).

Reference batch size must equal embed_dim here (32): train.py:476 multiplies
``label_text_weight [B] * label_text_features [B, D]`` without unsqueeze — a
latent bug invisible in the reference's own runs (B == D == 512) that crashes
otherwise; our side replays it bit-for-bit via ``--fusion-bug-compat``.
"""
import json
import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from ref_oracle import REF_ROOT  # noqa: E402

CLASSES = ["banded", "dotted", "striped", "zigzagged", "bubbly", "cracked",
           "fibrous", "grooved", "knitted", "meshed", "pleated", "woven"]
MODEL = "ViT-e2e-test"
BATCH, N_TRAIN, N_VAL, EPOCHS = 32, 96, 24, 2

_STEP_RE = re.compile(
    r"Train Epoch: (\d+) \[\s*(\d+)/(\d+)[^\]]*\].*?LR: ([0-9.e-]+).*?"
    r"Logit Scale: ([0-9.]+).*?Loss: ([0-9.]+) \(([0-9.]+)\)"
)


def _parse_train_log(path):
    """-> {(epoch, samples_seen): (lr, logit_scale, loss, loss_avg)}"""
    out = {}
    with open(path) as f:
        for line in f:
            m = _STEP_RE.search(line)
            if m:
                e, ns, total, lr, scale, loss, avg = m.groups()
                out[(int(e), int(ns))] = (
                    float(lr), float(scale), float(loss), float(avg), int(total)
                )
    return out


def _read_results(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    """Build the fixture and run BOTH mains' 2-epoch train; reused by tests."""
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference checkout unavailable")
    pytest.importorskip("torch")
    import ref_e2e_stubs

    ref_e2e_stubs.install_all()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    root = str(tmp_path_factory.mktemp("e2e"))
    from latteclip_tpu.data.synthetic import make_full_fixture

    make_full_fixture(root, num_train=N_TRAIN, num_val=N_VAL, image_size=96,
                      classes=CLASSES)

    # reference-side model config + eval.yaml
    cfg_dir = os.path.join(root, "ref_model_configs")
    os.makedirs(cfg_dir)
    src_cfg = os.path.join(os.path.dirname(__file__), "..", "latteclip_tpu",
                           "core", "model_configs", f"{MODEL}.json")
    with open(src_cfg) as f, open(os.path.join(cfg_dir, f"{MODEL}.json"), "w") as g:
        g.write(f.read())
    eval_yaml = os.path.join(root, "eval.yaml")
    with open(eval_yaml, "w") as f:
        for split, train in (("val", "False"), ("train", "True")):
            f.write(
                f"tasks:\n" if split == "val" else ""
            )
            f.write(
                f"  dtd_{split}_zeroshot_classification:\n"
                f"    dataset_loading_kwargs:\n"
                f"      dataset_name: \"dtd_zero_shot\"\n"
                f"    num_workers: 0\n"
                f"    return_f1_score: 0\n"
                f"    dataset_specific_kwargs:\n"
                f"      preprocess_path: \"{root}\"\n"
                f"      train: {train}\n"
                f"      transform: \"default_clip\"\n"
                f"      topk: [1]\n"
            )

    import open_clip  # the reference package (stubs make it importable)

    open_clip.factory.add_model_config(cfg_dir)
    from training.main import main as ref_main

    shards = sorted(os.listdir(os.path.join(root, "webdataset", "train_tars")))
    pattern = os.path.join(root, "webdataset", "train_tars",
                           "{00000..%05d}.tar" % (len(shards) - 1))
    common = [
        "--train-num-samples", str(N_TRAIN),
        "--clip-prediction-path", os.path.join(root, "clip_features_train.pkl"),
        "--generated-captions-path", os.path.join(root, "captions_per_image"),
        "--generated-common-captions-path", os.path.join(root, "captions_per_group"),
        "--zeroshot-eval-data", "dtd",
        "--batch-size", str(BATCH), "--epochs", str(EPOCHS),
        "--lr", "1e-4", "--warmup", "2", "--seed", "0",
        "--precision", "fp32", "--method", "ours",
        "--save-frequency", "1", "--log-every-n-steps", "1",
    ]
    rc = ref_main([
        "--model", MODEL, "--train-data", pattern,
        "--dataset-type", "webdataset",
        "--eval-config-path", eval_yaml, "--workers", "0",
        "--name", "ref_run", "--logs", os.path.join(root, "ref_logs"),
        *common,
    ])
    assert rc is None or rc == 0, rc

    from latteclip_tpu.train.main import main as our_main

    rc = our_main([
        "--model", MODEL,
        "--train-data", os.path.join(root, "webdataset", "train_tars"),
        "--eval-preprocess-path", root,
        "--fusion-bug-compat", "--workers", "1",
        "--name", "our_run", "--logs", os.path.join(root, "our_logs"),
        *common,
    ])
    assert rc == 0, rc

    return {
        "root": root,
        "eval_yaml": eval_yaml,
        "ref_main": ref_main,
        "our_main": our_main,
        "ref_dir": os.path.join(root, "ref_logs", "ref_run"),
        "our_dir": os.path.join(root, "our_logs", "our_run"),
    }


def test_train_wiring_parity(e2e):
    ref = _parse_train_log(os.path.join(e2e["ref_dir"], "out.log"))
    ours = _parse_train_log(os.path.join(e2e["our_dir"], "out.log"))
    assert ref and ours

    # batch accounting: same samples-per-epoch total, same step markers; our
    # log covers every step, the reference's must be a subset of the same grid
    steps = N_TRAIN // BATCH
    expected = {(e, (i + 1) * BATCH) for e in range(EPOCHS) for i in range(steps)}
    assert set(ours) == expected, sorted(ours)
    assert set(ref) <= expected, sorted(ref)
    assert all(v[4] == N_TRAIN for v in ref.values())
    assert all(v[4] == N_TRAIN for v in ours.values())

    # LR schedule EXACT per step (cosine + warmup wiring, reference
    # scheduler.py vs train/optim.py)
    for key in ref:
        assert abs(ref[key][0] - ours[key][0]) < 1e-9, (key, ref[key], ours[key])

    # logit scale: same init, near-identical drift at lr 1e-4
    for key in ref:
        assert abs(ref[key][1] - ours[key][1]) < 0.02, (key, ref[key], ours[key])

    # losses track within augmentation noise (different RNG streams)
    for key in ref:
        rel = abs(ref[key][3] - ours[key][3]) / ref[key][3]
        assert rel < 0.15, (key, ref[key], ours[key])

    # eval metrics per epoch: same keys modulo naming, tolerant values
    ref_rows = _read_results(os.path.join(e2e["ref_dir"], "checkpoints",
                                          "results.jsonl"))
    our_rows = _read_results(os.path.join(e2e["our_dir"], "checkpoints",
                                          "results.jsonl"))
    assert len(ref_rows) == EPOCHS and len(our_rows) == EPOCHS
    for rr, ro in zip(ref_rows, our_rows):
        r1 = rr["dtd-val-zero-shot-classification-val-top10"]
        o1 = ro["top10"]
        assert abs(r1 - o1) <= 0.35, (rr, ro)


def test_checkpoint_surface_parity(e2e):
    """Both mains' epoch_2.pt expose the same model-weight surface."""
    import torch

    ref_ck = torch.load(os.path.join(e2e["ref_dir"], "checkpoints", "epoch_2.pt"),
                        map_location="cpu", weights_only=False)
    our_ck = torch.load(os.path.join(e2e["our_dir"], "checkpoints", "epoch_2.pt"),
                        map_location="cpu", weights_only=False)
    assert {"epoch", "state_dict"} <= set(ref_ck) and {"epoch", "state_dict"} <= set(our_ck)
    assert ref_ck["epoch"] == our_ck["epoch"] == EPOCHS

    def norm(sd):
        out = {}
        for k, v in sd.items():
            if k.startswith("clip_model."):
                k = k[len("clip_model."):]
            if k.startswith(("image_adapter.", "text_adapter.")):
                continue  # ratio-0 adapters: params exist but are unused
            out[k] = tuple(v.shape)
        return out

    ref_sd, our_sd = norm(ref_ck["state_dict"]), norm(our_ck["state_dict"])
    assert set(ref_sd) == set(our_sd), set(ref_sd) ^ set(our_sd)
    for k in ref_sd:
        assert ref_sd[k] == our_sd[k], (k, ref_sd[k], our_sd[k])


def test_eval_only_exact(e2e):
    """Both mains evaluate the reference-trained checkpoint: metrics EXACT."""
    root = e2e["root"]
    ckpt = os.path.join(e2e["ref_dir"], "checkpoints", "epoch_2.pt")

    rc = e2e["ref_main"]([
        "--model", MODEL, "--zeroshot-eval-data", "dtd",
        "--eval-config-path", e2e["eval_yaml"], "--resume", ckpt,
        "--batch-size", str(BATCH), "--workers", "0", "--precision", "fp32",
        "--method", "ours", "--name", "ref_evalonly",
        "--logs", os.path.join(root, "ref_logs"),
    ])
    assert rc is None or rc == 0, rc
    rc = e2e["our_main"]([
        "--model", MODEL, "--zeroshot-eval-data", "dtd",
        "--eval-preprocess-path", root, "--resume", ckpt,
        "--batch-size", str(BATCH), "--workers", "0", "--precision", "fp32",
        "--method", "ours", "--name", "our_evalonly",
        "--logs", os.path.join(root, "our_logs"),
    ])
    assert rc == 0, rc

    ref_row = _read_results(os.path.join(root, "ref_logs", "ref_evalonly",
                                         "checkpoints", "results.jsonl"))[-1]
    our_row = _read_results(os.path.join(root, "our_logs", "our_evalonly",
                                         "checkpoints", "results.jsonl"))[-1]
    for k in ("top1", "top5", "top10"):
        ref_v = ref_row[f"dtd-val-zero-shot-classification-val-{k}"]
        assert ref_v == pytest.approx(our_row[k], abs=1e-9), (k, ref_row, our_row)