"""Trajectory conformance against the reference's REAL ``train_one_epoch_v2``.

Unlike the hand-transcribed fusion oracle in ``test_train_step.py``, this
test imports the reference training module itself
(``/root/reference/src/training/train.py:306-636``) and DRIVES it: a tiny
CLIP with our initial weights (through the checkpoint mapper), a stubbed
dataloader yielding the reference's 10-tuple (``data.py:662-664``), plain
SGD, three steps — then compares the per-step losses, the memory-bank
trajectory, and the final parameters against our fused step with
``bug_compat=True``. A misreading of the reference cannot hide here: the
oracle IS the reference.

Constraints inherited from the reference: batch == embed_dim (its fusion
broadcast only runs there — scripts pin 512==512; we pin 16==16), fp32,
single process.
"""
import sys
import types

import numpy as np
import pytest

import jax
import optax

torch = pytest.importorskip("torch")

from ref_oracle import REF_ROOT, load_reference_open_clip  # noqa: E402

from latteclip_tpu.core.checkpoint import params_to_pt_state_dict  # noqa: E402
from latteclip_tpu.core.config import config_from_dict  # noqa: E402
from latteclip_tpu.data import transforms as T  # noqa: E402
from latteclip_tpu.models.clip import init_clip_params  # noqa: E402
from latteclip_tpu.models.tokenizer import get_tokenizer  # noqa: E402
from latteclip_tpu.train.state import (  # noqa: E402
    build_template_table,
    create_train_state,
    init_memory_bank,
)
from latteclip_tpu.train.step import LatteHParams, make_train_step  # noqa: E402

B = 16  # == embed_dim: the reference's fusion requires it
STEPS = 3
LR = 1e-3
CLASSES = ["banded", "dotted", "striped", "zigzagged"]
TEMPLATES = [lambda c: f"a photo of a {c}."]
CFG = config_from_dict(
    "tiny-oracle",
    {
        "embed_dim": B,
        "compute_dtype": "float32",
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64,
                     "heads": 4, "layers": 2},
    },
)


def _load_reference_trainer():
    oc = load_reference_open_clip()
    if oc is None:
        pytest.skip("reference checkout or torch unavailable")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    try:
        from training import train as ref_train
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference training module not importable: {e}")
    return oc, ref_train


def _make_batches(tok, rng):
    """STEPS batches: uint8 images + tokenized captions + pseudo-labels."""
    batches = []
    for s in range(STEPS):
        per_img = tok([
            f"close-up photo number {s * B + i} of a {CLASSES[i % 4]} surface."
            for i in range(B)
        ])
        per_grp = tok([
            f"several {CLASSES[(i + s) % 4]} patterns arranged in a grid {i}."
            for i in range(B)
        ])
        batches.append({
            "images": rng.integers(0, 255, size=(B, 32, 32, 3)).astype(np.uint8),
            "per_image_tokens": per_img.astype(np.int32),
            "per_group_tokens": per_grp.astype(np.int32),
            "zs_preds": rng.integers(0, len(CLASSES), size=(B,)).astype(np.int32),
            "gt_labels": rng.integers(0, len(CLASSES), size=(B,)).astype(np.int32),
        })
    return batches


class _StubLoader:
    """Duck-types the WebLoader surface v2 reads (num_batches/num_samples)."""

    def __init__(self, batches):
        self._batches = batches
        self.num_batches = len(batches)
        self.num_samples = sum(b[0].shape[0] for b in batches)

    def __iter__(self):
        return iter(self._batches)


class _StubTrainData:
    def __init__(self, loader):
        self.dataloader = loader

    def set_epoch(self, epoch):
        pass


class _CaptureWriter:
    """Stands in for the TensorBoard writer to capture per-step losses."""

    def __init__(self):
        self.scalars = {}

    def add_scalar(self, name, val, step):
        self.scalars.setdefault(name, []).append(float(val))


def _reference_args():
    return types.SimpleNamespace(
        device="cpu", precision="fp32", accum_freq=1, distill=False,
        skip_scheduler=True, lr_scheduler="cosine", horovod=False,
        grad_clip_norm=None, world_size=1, rank=0, local_rank=0,
        batch_size=B, log_every_n_steps=1, wandb=False,
        alpha=0.01, use_template_caption=1.0, use_image_caption=1.0,
        use_batch_caption=1.0, use_zeroshot_pseudolabel=1.0,
        use_finetune_pseudolabel=1.0,
        zeroshot_eval_data="dtd", extract_features_split="train",
    )


def test_real_train_one_epoch_v2_trajectory():
    oc, ref_train = _load_reference_trainer()

    # --- shared starting point -------------------------------------------
    tok = get_tokenizer()
    params = init_clip_params(jax.random.PRNGKey(42), CFG)
    bank0 = np.asarray(init_memory_bank(params, CFG, tok, CLASSES, TEMPLATES))
    table = build_template_table(tok, CLASSES, TEMPLATES)
    batches = _make_batches(tok, np.random.default_rng(7))
    # both sides consume the SAME normalized image tensors: ours normalizes
    # in-step (augment=False), the reference receives transformed tensors
    norm_images = [np.asarray(T.normalize_images(b["images"])) for b in batches]

    # --- ours: fused step, bug-compat, SGD -------------------------------
    opt = optax.sgd(LR)
    state = create_train_state(params, opt, bank0).start_epoch()
    step = jax.jit(make_train_step(
        CFG, opt, LatteHParams(augment=False, bug_compat=True), table))
    our_losses = []
    for i, b in enumerate(batches):
        state, metrics = step(state, b, jax.random.PRNGKey(i))
        our_losses.append(float(metrics["loss"]))

    # --- reference: the real train_one_epoch_v2 --------------------------
    ref_clip = oc.model.CLIP(
        embed_dim=CFG.embed_dim,
        vision_cfg={"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        text_cfg={"context_length": 77, "vocab_size": 49408, "width": 64,
                  "heads": 4, "layers": 2},
    )
    sd = {k: torch.from_numpy(v) for k, v in
          params_to_pt_state_dict(params, CFG).items()}
    missing, unexpected = ref_clip.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("attn_mask" in k for k in missing), missing  # buffers only

    model = oc.model.CustomCLIP(ref_clip, CLASSES, oc.tokenize)
    model.init_memory_bank(CLASSES, TEMPLATES)
    with torch.no_grad():
        for i, c in enumerate(CLASSES):
            model.memory_bank[c].copy_(torch.from_numpy(bank0[i]))

    ref_batches = []
    for b, img in zip(batches, norm_images):
        images_t = torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous()
        per_img = torch.from_numpy(b["per_image_tokens"].astype(np.int64)).unsqueeze(1)
        per_grp = torch.from_numpy(b["per_group_tokens"].astype(np.int64)).unsqueeze(1)
        texts = per_img.clone()  # only read for its [bs, k, dim] shape
        zs_names = [[CLASSES[int(z)]] for z in b["zs_preds"]]
        ref_batches.append((
            images_t, images_t.clone(), texts, per_grp.clone(), [""] * B,
            None, per_img, per_grp, [{} for _ in range(B)], zs_names,
        ))

    data = {
        "train": _StubTrainData(_StubLoader(ref_batches)),
        "dtd-train-zero-shot-classification": types.SimpleNamespace(
            class_names=CLASSES, templates=TEMPLATES),
    }
    writer = _CaptureWriter()
    ref_train.train_one_epoch_v2(
        model, data, oc.ClipLoss(), 0,
        torch.optim.SGD(model.parameters(), lr=LR, momentum=0.0),
        None, None, None, _reference_args(), tb_writer=writer,
    )

    # --- compare trajectories ---------------------------------------------
    ref_losses = writer.scalars["train/loss"]
    assert len(ref_losses) == STEPS
    np.testing.assert_allclose(our_losses, ref_losses, rtol=0, atol=2e-4)

    ref_bank = np.stack([model.memory_bank[c].detach().numpy() for c in CLASSES])
    np.testing.assert_allclose(
        np.asarray(state.memory_bank), ref_bank, rtol=0, atol=5e-4)

    ours_sd = params_to_pt_state_dict(state.params, CFG)
    ref_sd = {k: v.detach().numpy() for k, v in ref_clip.state_dict().items()}
    for key in ("text_projection", "visual.proj", "token_embedding.weight",
                "visual.conv1.weight", "logit_scale",
                "transformer.resblocks.0.mlp.c_fc.weight",
                "visual.transformer.resblocks.1.attn.in_proj_weight"):
        np.testing.assert_allclose(
            ours_sd[key], ref_sd[key], rtol=0, atol=5e-4, err_msg=key)
    # and the full tree stays within a loose bound
    for key, v in ours_sd.items():
        np.testing.assert_allclose(v, ref_sd[key], rtol=0, atol=2e-3, err_msg=key)


def test_real_v2_trajectory_with_context_cap():
    """--text-context-cap exactness, proven against the REAL reference:
    OUR side trains with caption/template tokens capped to the batch max
    EOT (rounded to 8), the reference trains on the same captions at the
    full 77 columns — losses, bank, and params must still match. This is
    the end-to-end form of the tower-level exactness test in
    tests/test_context_cap.py."""
    oc, ref_train = _load_reference_trainer()

    from latteclip_tpu.data.pipeline import _max_context, _truncate_tokens

    tok = get_tokenizer()
    params = init_clip_params(jax.random.PRNGKey(42), CFG)
    bank0 = np.asarray(init_memory_bank(params, CFG, tok, CLASSES, TEMPLATES))
    table = build_template_table(tok, CLASSES, TEMPLATES)
    batches = _make_batches(tok, np.random.default_rng(7))
    norm_images = [np.asarray(T.normalize_images(b["images"])) for b in batches]

    arrs = [b["per_image_tokens"] for b in batches]
    arrs += [b["per_group_tokens"] for b in batches]
    cap = -(-_max_context(arrs + [table], tok.eot_token_id) // 8) * 8
    assert cap < 77  # the fixture captions are short; the cap must bite

    capped_table, lost = _truncate_tokens(table, cap, tok.eot_token_id)
    assert lost == 0
    capped_batches = []
    for b in batches:
        nb = dict(b)
        for key in ("per_image_tokens", "per_group_tokens"):
            nb[key], lost = _truncate_tokens(b[key], cap, tok.eot_token_id)
            assert lost == 0
        capped_batches.append(nb)

    opt = optax.sgd(LR)
    state = create_train_state(params, opt, bank0).start_epoch()
    step = jax.jit(make_train_step(
        CFG, opt, LatteHParams(augment=False, bug_compat=True), capped_table))
    our_losses = []
    for i, b in enumerate(capped_batches):
        state, metrics = step(state, b, jax.random.PRNGKey(i))
        our_losses.append(float(metrics["loss"]))

    # --- reference at the FULL 77 columns -----------------------------------
    ref_clip = oc.model.CLIP(
        embed_dim=CFG.embed_dim,
        vision_cfg={"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        text_cfg={"context_length": 77, "vocab_size": 49408, "width": 64,
                  "heads": 4, "layers": 2},
    )
    sd = {k: torch.from_numpy(v) for k, v in
          params_to_pt_state_dict(params, CFG).items()}
    _missing, unexpected = ref_clip.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model = oc.model.CustomCLIP(ref_clip, CLASSES, oc.tokenize)
    model.init_memory_bank(CLASSES, TEMPLATES)
    with torch.no_grad():
        for i, c in enumerate(CLASSES):
            model.memory_bank[c].copy_(torch.from_numpy(bank0[i]))

    ref_batches = []
    for b, img in zip(batches, norm_images):
        images_t = torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous()
        per_img = torch.from_numpy(b["per_image_tokens"].astype(np.int64)).unsqueeze(1)
        per_grp = torch.from_numpy(b["per_group_tokens"].astype(np.int64)).unsqueeze(1)
        zs_names = [[CLASSES[int(z)]] for z in b["zs_preds"]]
        ref_batches.append((
            images_t, images_t.clone(), per_img.clone(), per_grp.clone(),
            [""] * B, None, per_img, per_grp, [{} for _ in range(B)], zs_names,
        ))
    data = {
        "train": _StubTrainData(_StubLoader(ref_batches)),
        "dtd-train-zero-shot-classification": types.SimpleNamespace(
            class_names=CLASSES, templates=TEMPLATES),
    }
    writer = _CaptureWriter()
    ref_train.train_one_epoch_v2(
        model, data, oc.ClipLoss(), 0,
        torch.optim.SGD(model.parameters(), lr=LR, momentum=0.0),
        None, None, None, _reference_args(), tb_writer=writer,
    )

    ref_losses = writer.scalars["train/loss"]
    np.testing.assert_allclose(our_losses, ref_losses, rtol=0, atol=2e-4)
    ref_bank = np.stack([model.memory_bank[c].detach().numpy() for c in CLASSES])
    np.testing.assert_allclose(
        np.asarray(state.memory_bank), ref_bank, rtol=0, atol=5e-4)
    ours_sd = params_to_pt_state_dict(state.params, CFG)
    ref_sd = {k: v.detach().numpy() for k, v in ref_clip.state_dict().items()}
    for key, v in ours_sd.items():
        np.testing.assert_allclose(v, ref_sd[key], rtol=0, atol=2e-3, err_msg=key)


def test_real_v2_trajectory_with_text_packing():
    """--text-packing exactness, proven against the REAL reference: OUR
    side trains with both caption streams packed variable-length ([R, 128]
    segment-masked rows) and the template table statically packed, the
    reference trains on the same captions padded to the full 77 columns
    (src/open_clip/tokenizer.py:250-258) — losses, bank, and params must
    still match. End-to-end form of tests/test_packed_step.py's
    packed-vs-padded trajectory equality."""
    oc, ref_train = _load_reference_trainer()

    from latteclip_tpu.data.packing import (
        pack_caption_batch,
        pack_rows_needed,
        pack_template_table,
        token_lengths,
    )

    tok = get_tokenizer()
    params = init_clip_params(jax.random.PRNGKey(42), CFG)
    bank0 = np.asarray(init_memory_bank(params, CFG, tok, CLASSES, TEMPLATES))
    table = build_template_table(tok, CLASSES, TEMPLATES)
    batches = _make_batches(tok, np.random.default_rng(7))
    norm_images = [np.asarray(T.normalize_images(b["images"])) for b in batches]

    PACK = 128
    packed_batches = []
    rows = 0
    for b in batches:  # one static row count across steps, like the bucketer
        lens = np.concatenate([token_lengths(b["per_image_tokens"]),
                               token_lengths(b["per_group_tokens"])])
        rows = max(rows, -(-pack_rows_needed(lens, PACK) // 8) * 8)
    for b in batches:
        nb = dict(b)
        nb.update(pack_caption_batch(
            b["per_image_tokens"], b["per_group_tokens"], PACK, rows))
        packed_batches.append(nb)

    opt = optax.sgd(LR)
    state = create_train_state(params, opt, bank0).start_epoch()
    step = jax.jit(make_train_step(
        CFG, opt,
        LatteHParams(augment=False, bug_compat=True, text_packing=True),
        table, template_packed=pack_template_table(table, PACK)))
    our_losses = []
    for i, b in enumerate(packed_batches):
        state, metrics = step(state, b, jax.random.PRNGKey(i))
        our_losses.append(float(metrics["loss"]))

    # --- reference at the FULL padded 77 columns -----------------------------
    ref_clip = oc.model.CLIP(
        embed_dim=CFG.embed_dim,
        vision_cfg={"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        text_cfg={"context_length": 77, "vocab_size": 49408, "width": 64,
                  "heads": 4, "layers": 2},
    )
    sd = {k: torch.from_numpy(v) for k, v in
          params_to_pt_state_dict(params, CFG).items()}
    _missing, unexpected = ref_clip.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model = oc.model.CustomCLIP(ref_clip, CLASSES, oc.tokenize)
    model.init_memory_bank(CLASSES, TEMPLATES)
    with torch.no_grad():
        for i, c in enumerate(CLASSES):
            model.memory_bank[c].copy_(torch.from_numpy(bank0[i]))

    ref_batches = []
    for b, img in zip(batches, norm_images):
        images_t = torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous()
        per_img = torch.from_numpy(b["per_image_tokens"].astype(np.int64)).unsqueeze(1)
        per_grp = torch.from_numpy(b["per_group_tokens"].astype(np.int64)).unsqueeze(1)
        zs_names = [[CLASSES[int(z)]] for z in b["zs_preds"]]
        ref_batches.append((
            images_t, images_t.clone(), per_img.clone(), per_grp.clone(),
            [""] * B, None, per_img, per_grp, [{} for _ in range(B)], zs_names,
        ))
    data = {
        "train": _StubTrainData(_StubLoader(ref_batches)),
        "dtd-train-zero-shot-classification": types.SimpleNamespace(
            class_names=CLASSES, templates=TEMPLATES),
    }
    writer = _CaptureWriter()
    ref_train.train_one_epoch_v2(
        model, data, oc.ClipLoss(), 0,
        torch.optim.SGD(model.parameters(), lr=LR, momentum=0.0),
        None, None, None, _reference_args(), tb_writer=writer,
    )

    ref_losses = writer.scalars["train/loss"]
    np.testing.assert_allclose(our_losses, ref_losses, rtol=0, atol=2e-4)
    ref_bank = np.stack([model.memory_bank[c].detach().numpy() for c in CLASSES])
    np.testing.assert_allclose(
        np.asarray(state.memory_bank), ref_bank, rtol=0, atol=5e-4)
    ours_sd = params_to_pt_state_dict(state.params, CFG)
    ref_sd = {k: v.detach().numpy() for k, v in ref_clip.state_dict().items()}
    for key, v in ours_sd.items():
        np.testing.assert_allclose(v, ref_sd[key], rtol=0, atol=2e-3, err_msg=key)


# ---------------------------------------------------------------------------
# FLYP baseline: the reference's REAL train_one_epoch_original_clip
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_gt", [False, True], ids=["flyp", "flyp_gt"])
def test_real_flyp_trainer_trajectory(use_gt):
    """Drives the reference's real ``train_one_epoch_original_clip``
    (``/root/reference/src/training/train.py:76-284`` — the FLYP/FLYP_GT
    baseline: per-sample template texts from the pseudo-label (or GT
    classname), one ClipLoss) and compares losses + final params against
    ``make_flyp_step``. Our step encodes the C unique class templates once
    and gathers rows — gradient-identical to the reference's per-sample
    re-encoding (gather's transpose is scatter-add) — so the trajectories
    must match to fp32 tolerance."""
    oc, ref_train = _load_reference_trainer()

    tok = get_tokenizer()
    params = init_clip_params(jax.random.PRNGKey(5), CFG)
    table = build_template_table(tok, CLASSES, TEMPLATES)
    batches = _make_batches(tok, np.random.default_rng(13))
    norm_images = [np.asarray(T.normalize_images(b["images"])) for b in batches]

    # --- ours: flyp step, SGD ---------------------------------------------
    from latteclip_tpu.train.step import make_flyp_step

    opt = optax.sgd(LR)
    bank0 = np.asarray(init_memory_bank(params, CFG, tok, CLASSES, TEMPLATES))
    state = create_train_state(params, opt, bank0)
    step = jax.jit(make_flyp_step(
        CFG, opt, LatteHParams(augment=False), table, use_gt=use_gt))
    our_losses = []
    for i, b in enumerate(batches):
        state, metrics = step(state, b, jax.random.PRNGKey(i))
        our_losses.append(float(metrics["loss"]))

    # --- reference: the real train_one_epoch_original_clip ------------------
    ref_clip = oc.model.CLIP(
        embed_dim=CFG.embed_dim,
        vision_cfg={"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        text_cfg={"context_length": 77, "vocab_size": 49408, "width": 64,
                  "heads": 4, "layers": 2},
    )
    sd = {k: torch.from_numpy(v) for k, v in
          params_to_pt_state_dict(params, CFG).items()}
    missing, unexpected = ref_clip.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model = oc.model.CustomCLIP(ref_clip, CLASSES, oc.tokenize)

    ref_batches = []
    for b, img in zip(batches, norm_images):
        images_t = torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous()
        per_img = torch.from_numpy(b["per_image_tokens"].astype(np.int64)).unsqueeze(1)
        per_grp = torch.from_numpy(b["per_group_tokens"].astype(np.int64)).unsqueeze(1)
        metadata = [{"class_name": CLASSES[int(g)]} for g in b["gt_labels"]]
        zs_names = [[CLASSES[int(z)]] for z in b["zs_preds"]]
        ref_batches.append((
            images_t, images_t.clone(), per_img.clone(), per_grp.clone(),
            [""] * B, None, per_img, per_grp, metadata, zs_names,
        ))

    data = {
        "train": _StubTrainData(_StubLoader(ref_batches)),
        "dtd-train-zero-shot-classification": types.SimpleNamespace(
            class_names=CLASSES, templates=TEMPLATES),
    }
    writer = _CaptureWriter()
    ref_train.train_one_epoch_original_clip(
        model, data, oc.ClipLoss(), 0,
        torch.optim.SGD(model.parameters(), lr=LR, momentum=0.0),
        None, None, None, _reference_args(), use_gt=use_gt, tb_writer=writer,
    )

    ref_losses = writer.scalars["train/loss"]
    assert len(ref_losses) == STEPS
    np.testing.assert_allclose(our_losses, ref_losses, rtol=0, atol=2e-4)

    ours_sd = params_to_pt_state_dict(state.params, CFG)
    ref_sd = {k: v.detach().numpy() for k, v in ref_clip.state_dict().items()}
    for key, v in ours_sd.items():
        np.testing.assert_allclose(v, ref_sd[key], rtol=0, atol=2e-3, err_msg=key)


# ---------------------------------------------------------------------------
# Pseudo-label extraction: the reference's REAL extract_features
# ---------------------------------------------------------------------------


def test_real_extract_features_pkl_parity(tmp_path):
    """Drives the reference's real ``extract_features``
    (``/root/reference/src/training/train.py:1310-1382`` — the producer of
    ``clip_features_<split>.pkl``, the join key of the whole pipeline)
    against ``eval/features.py`` on the same flat dataset and weights, and
    compares the pickles record by record."""
    import pickle

    oc, ref_train = _load_reference_trainer()

    from latteclip_tpu.data.eval_dataset import FlatFileDataset
    from latteclip_tpu.data.synthetic import make_flat_dataset
    from latteclip_tpu.data import transforms as T
    from latteclip_tpu.eval.features import extract_features

    root = str(tmp_path / "ds")
    make_flat_dataset(root, num_train=14, num_val=4,
                      classes=EVAL_CLASSES, image_size=32)
    ds = FlatFileDataset(root, train=True, image_size=32, dataset_name="dtd")

    tok = get_tokenizer()
    params = init_clip_params(jax.random.PRNGKey(9), CFG)

    ours_dir = str(tmp_path / "ours")
    extract_features(params, CFG, tok, ds, ours_dir, "train", batch_size=5)
    with open(f"{ours_dir}/clip_features_train.pkl", "rb") as f:
        ours = pickle.load(f)

    # --- reference side ----------------------------------------------------
    ref_clip = oc.model.CLIP(
        embed_dim=CFG.embed_dim,
        vision_cfg={"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        text_cfg={"context_length": 77, "vocab_size": 49408, "width": 64,
                  "heads": 4, "layers": 2},
    )
    sd = {k: torch.from_numpy(v) for k, v in
          params_to_pt_state_dict(params, CFG).items()}
    missing, unexpected = ref_clip.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model = oc.model.CustomCLIP(ref_clip, ds.display_class_names, oc.tokenize)

    ids, imgs, labels = [], [], []
    for i in range(len(ds)):
        image_id, arr, label = ds.load_sample(i)
        ids.append(image_id)
        imgs.append(arr)
        labels.append(label)
    norm = np.asarray(T.normalize_images(
        np.stack(imgs), *T.model_mean_std(CFG)))
    loader = [(
        ids,
        torch.from_numpy(norm.transpose(0, 3, 1, 2)).contiguous(),
        torch.tensor(labels),
    )]
    data = {
        "dtd-train-zero-shot-classification": types.SimpleNamespace(
            dataloader=loader, class_names=ds.display_class_names,
            templates=ds.templates),
    }
    args = _reference_args()
    args.extract_features_path = str(tmp_path / "ref")
    args.val_num_samples = len(ds)
    # the reference times the loop with unconditional torch.cuda.synchronize
    # (train.py:1350,1354) — a no-op stand-in on this CPU-only torch build
    orig_sync = torch.cuda.synchronize
    torch.cuda.synchronize = lambda *a, **k: None
    try:
        ref_train.extract_features(model, data, 0, args, tokenizer=oc.tokenize)
    finally:
        torch.cuda.synchronize = orig_sync
    with open(f"{tmp_path}/ref/clip_features_train.pkl", "rb") as f:
        theirs = pickle.load(f)

    assert set(ours) == set(theirs) == set(ids)
    for image_id in ids:
        a, b = ours[image_id], theirs[image_id]
        np.testing.assert_allclose(a["image"], b["image"], atol=2e-5,
                                   err_msg=image_id)
        np.testing.assert_allclose(a["top_logit"], b["top_logit"], atol=2e-3)
        np.testing.assert_array_equal(a["top_class_ids"], b["top_class_ids"])
        assert a["class_names"] == b["class_names"]
        assert a["gt_classname"] == b["gt_classname"]
        assert a["gt_class_id"] == b["gt_class_id"]


# ---------------------------------------------------------------------------
# Val loss + retrieval: the reference's REAL evaluate
# ---------------------------------------------------------------------------


def test_real_evaluate_val_branch_parity():
    """Drives the reference's real ``evaluate``
    (``/root/reference/src/training/train.py:1385-1503``, val branch:
    symmetric CLIP loss + ``get_clip_metrics`` retrieval R@k over the
    accumulated features) against ``eval/retrieval.py::validation_loss``
    on the same (image, caption) pairs and weights."""
    oc, ref_train = _load_reference_trainer()

    from latteclip_tpu.eval.retrieval import validation_loss

    tok = get_tokenizer()
    params = init_clip_params(jax.random.PRNGKey(33), CFG)
    rng = np.random.default_rng(17)
    batches = []
    for s in range(2):
        images = rng.integers(0, 255, size=(8, 32, 32, 3)).astype(np.uint8)
        texts = tok([f"sample {s}-{i} of a {CLASSES[i % 4]} surface."
                     for i in range(8)]).astype(np.int32)
        batches.append((images, texts))

    ours = validation_loss(params, CFG, batches)

    ref_clip = oc.model.CLIP(
        embed_dim=CFG.embed_dim,
        vision_cfg={"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        text_cfg={"context_length": 77, "vocab_size": 49408, "width": 64,
                  "heads": 4, "layers": 2},
        output_dict=True,
    )
    sd = {k: torch.from_numpy(v) for k, v in
          params_to_pt_state_dict(params, CFG).items()}
    _missing, unexpected = ref_clip.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected

    loader = []
    for images, texts in batches:
        norm = np.asarray(T.normalize_images(images))
        loader.append((
            torch.from_numpy(norm.transpose(0, 3, 1, 2)).contiguous(),
            torch.from_numpy(texts.astype(np.int64)),
            [{}] * len(images),
        ))
    val = types.SimpleNamespace(dataloader=_StubLoader(loader))
    data = {"val": val}
    args = _reference_args()
    args.val_frequency = 1
    args.epochs = 1
    args.method = "ours"
    args.distributed = False
    args.zeroshot_frequency = 0
    args.save_logs = False
    metrics = ref_train.evaluate(ref_clip, data, 1, args, tokenizer=oc.tokenize)

    assert abs(ours["clip_val_loss"] - metrics["clip_val_loss"]) < 2e-4
    for key in ("image_to_text_R@1", "image_to_text_R@5", "image_to_text_R@10",
                "text_to_image_R@1", "text_to_image_mean_rank",
                "image_to_text_median_rank"):
        assert abs(ours[key] - metrics[key]) < 1e-9, (key, ours[key], metrics[key])
    assert ours["num_samples"] == metrics["num_samples"] == 16


# ---------------------------------------------------------------------------
# Fusion-weight analysis: the reference's REAL extract_group_weights
# ---------------------------------------------------------------------------


def test_real_extract_group_weights_parity(tmp_path):
    """Drives the reference's real ``extract_group_weights``
    (``/root/reference/src/training/train.py:639-808`` — the fusion-weight
    analysis dump) on the SAME sample stream as ``eval/group_weights.py``
    and compares ``group_weights.npy`` plus the label fields of
    ``all_labels.json``. Also pins that the reference's
    ``compute_text_weights`` ignores its ``preds`` argument (the mask is
    computed but never applied, train.py:301-303), which is why our
    preds-free ``text_confidence_weights`` is exact."""
    import json as json_mod

    oc, ref_train = _load_reference_trainer()

    from latteclip_tpu.data.pipeline import (
        PipelineConfig,
        TrainPipeline,
        build_train_data,
    )
    from latteclip_tpu.data.synthetic import DEFAULT_CLASSES, make_full_fixture
    from latteclip_tpu.eval.group_weights import extract_group_weights

    root = str(tmp_path / "fx")
    make_full_fixture(root, num_train=16, num_val=4, image_size=32)
    class_names = [c.lower().replace("_", " ") for c in DEFAULT_CLASSES]
    tok = get_tokenizer()
    data = build_train_data(
        f"{root}/webdataset/train_tars", f"{root}/clip_features_train.pkl",
        [f"{root}/captions_per_image"], [f"{root}/captions_per_group"],
        class_names, tok,
    )
    params = init_clip_params(jax.random.PRNGKey(21), CFG)
    bank0 = np.asarray(init_memory_bank(params, CFG, tok, class_names, TEMPLATES))

    ours_dir = str(tmp_path / "ours")
    extract_group_weights(params, CFG, data, bank0, TEMPLATES, tok, ours_dir,
                          batch_size=8, image_size=32)
    gw_ours = np.load(f"{ours_dir}/group_weights.npy")
    with open(f"{ours_dir}/all_labels.json") as f:
        items_ours = json_mod.load(f)

    # --- identical sample stream for the reference --------------------------
    pipe = TrainPipeline(
        data, PipelineConfig(batch_size=8, image_size=32, shuffle_buffer=1),
        num_samples=16)
    stream = pipe._sample_stream(0)
    ref_batches = []
    for _ in range(2):  # 16 samples, bs 8
        samples = [next(stream) for _ in range(8)]
        imgs = np.stack([s["image"] for s in samples])
        norm = np.asarray(T.normalize_images(imgs))
        images_t = torch.from_numpy(norm.transpose(0, 3, 1, 2)).contiguous()
        per_img = torch.from_numpy(
            np.stack([s["per_image_tokens"] for s in samples]).astype(np.int64)
        ).unsqueeze(1)
        per_grp = torch.from_numpy(
            np.stack([s["per_group_tokens"] for s in samples]).astype(np.int64)
        ).unsqueeze(1)
        metadata = [{"class_name": class_names[s["gt"]],
                     "image_id": f"id{i}"} for i, s in enumerate(samples)]
        zs_names = [[class_names[s["zs_pred"]]] for s in samples]
        # position 3 (common_texts) must be list-of-str-lists: the reference
        # dumps common_texts[i][0] straight into all_labels.json
        # (train.py:749), which crashes on the tokenized tensors its own
        # loader produces — a latent reference bug; strings are the only
        # form the function can complete with
        ref_batches.append((
            images_t, images_t.clone(), per_img.clone(), [["common"]] * 8,
            [["raw"]] * 8, None, per_img, per_grp, metadata, zs_names,
        ))

    ref_clip = oc.model.CLIP(
        embed_dim=CFG.embed_dim,
        vision_cfg={"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        text_cfg={"context_length": 77, "vocab_size": 49408, "width": 64,
                  "heads": 4, "layers": 2},
    )
    sd = {k: torch.from_numpy(v) for k, v in
          params_to_pt_state_dict(params, CFG).items()}
    _missing, unexpected = ref_clip.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model = oc.model.CustomCLIP(ref_clip, class_names, oc.tokenize)
    model.init_memory_bank(class_names, TEMPLATES)
    with torch.no_grad():
        for i, c in enumerate(class_names):
            model.memory_bank[c].copy_(torch.from_numpy(bank0[i]))

    dataset = {
        "train": _StubTrainData(_StubLoader(ref_batches)),
        "dtd-train-zero-shot-classification": types.SimpleNamespace(
            class_names=class_names, templates=TEMPLATES),
    }
    args = _reference_args()
    args.extract_group_weight_path = str(tmp_path / "ref")
    import os
    os.makedirs(args.extract_group_weight_path, exist_ok=True)
    ref_train.extract_group_weights(model, dataset, 0, args, tokenizer=oc.tokenize)
    gw_ref = np.load(f"{tmp_path}/ref/group_weights.npy")
    with open(f"{tmp_path}/ref/all_labels.json") as f:
        items_ref = json_mod.load(f)

    assert gw_ours.shape == gw_ref.shape == (16,)
    np.testing.assert_allclose(gw_ours, gw_ref, atol=5e-4)
    assert len(items_ours) == len(items_ref) == 16
    for a, b in zip(items_ours, items_ref):
        assert a["zs_lb"] == b["zs_lb"]
        assert a["ft_lb"] == b["ft_lb"]
        assert a["gt_lb"] == b["gt_lb"]


# ---------------------------------------------------------------------------
# Two epochs + live cosine schedule + end-state zero-shot eval A/B
# ---------------------------------------------------------------------------

EVAL_CLASSES = [
    "banded", "dotted", "striped", "zigzagged", "woven", "cracked",
    "bubbly", "fibrous", "knitted", "pleated", "porous", "swirly",
]  # >= 10 so the reference's top-10 accuracy path runs (zero_shot.py:14-20)


class _EpochLoader:
    """Epoch-switchable stub: epoch e yields batches[e*n : (e+1)*n]."""

    def __init__(self, batches, per_epoch):
        self._batches = batches
        self._per_epoch = per_epoch
        self._epoch = 0
        self.num_batches = per_epoch
        self.num_samples = per_epoch * batches[0][0].shape[0]

    def set_epoch(self, epoch):
        self._epoch = epoch

    def __iter__(self):
        lo = self._epoch * self._per_epoch
        return iter(self._batches[lo:lo + self._per_epoch])


class _EpochTrainData:
    def __init__(self, loader):
        self.dataloader = loader

    def set_epoch(self, epoch):
        self.dataloader.set_epoch(epoch)


def test_real_v2_two_epochs_schedule_and_eval():
    """Longer-horizon A/B vs the REAL reference: two epochs with the cosine
    schedule ACTIVE on both sides (warmup 2, total 6 — reference
    scheduler.py:43-53 vs train/optim.py), per-epoch prototype snapshots,
    then the reference's real ``zero_shot_eval`` (method "ours", prototype
    classifier — zero_shot.py:139-145) against our ``run_zero_shot_eval`` on
    an identical held-out batch. Catches trainer-loop drift the single-epoch
    trajectory test cannot: schedule stepping, epoch boundaries, bank
    carry-over, and the eval classifier path."""
    oc, ref_train = _load_reference_trainer()
    from training import scheduler as ref_scheduler
    from training import zero_shot as ref_zero_shot

    EPOCHS, WARMUP = 2, 2
    total_steps = EPOCHS * STEPS

    # --- shared starting point -------------------------------------------
    tok = get_tokenizer()
    params = init_clip_params(jax.random.PRNGKey(3), CFG)
    bank0 = np.asarray(init_memory_bank(params, CFG, tok, EVAL_CLASSES, TEMPLATES))
    table = build_template_table(tok, EVAL_CLASSES, TEMPLATES)
    rng = np.random.default_rng(11)
    batches = []
    for s in range(total_steps):
        per_img = tok([
            f"photo {s}-{i} of a {EVAL_CLASSES[(s + i) % len(EVAL_CLASSES)]} surface."
            for i in range(B)
        ])
        per_grp = tok([
            f"grid {s}-{i} of {EVAL_CLASSES[(s * 3 + i) % len(EVAL_CLASSES)]} patterns."
            for i in range(B)
        ])
        batches.append({
            "images": rng.integers(0, 255, size=(B, 32, 32, 3)).astype(np.uint8),
            "per_image_tokens": per_img.astype(np.int32),
            "per_group_tokens": per_grp.astype(np.int32),
            "zs_preds": rng.integers(0, len(EVAL_CLASSES), size=(B,)).astype(np.int32),
            "gt_labels": rng.integers(0, len(EVAL_CLASSES), size=(B,)).astype(np.int32),
        })
    norm_images = [np.asarray(T.normalize_images(b["images"])) for b in batches]
    val_images = rng.integers(0, 255, size=(32, 32, 32, 3)).astype(np.uint8)
    val_labels = rng.integers(0, len(EVAL_CLASSES), size=(32,)).astype(np.int64)

    # --- ours: fused step + optax cosine schedule --------------------------
    from latteclip_tpu.eval.zero_shot import (
        make_eval_step,
        prototype_classifier,
        run_zero_shot_eval,
    )
    from latteclip_tpu.train.optim import make_schedule

    sched = make_schedule("cosine", LR, warmup=WARMUP, total_steps=total_steps)
    opt = optax.sgd(sched)
    state = create_train_state(params, opt, bank0)
    step = jax.jit(make_train_step(
        CFG, opt, LatteHParams(augment=False, bug_compat=True), table))
    our_losses = []
    for e in range(EPOCHS):
        state = state.start_epoch()
        for i in range(STEPS):
            state, metrics = step(state, batches[e * STEPS + i],
                                  jax.random.PRNGKey(e * STEPS + i))
            our_losses.append(float(metrics["loss"]))
    our_classifier = prototype_classifier(state.memory_bank)
    our_logits = np.asarray(make_eval_step(
        state.params, CFG, our_classifier)(val_images))
    ours_eval = run_zero_shot_eval(
        state.params, CFG, our_classifier,
        [(list(range(32)), val_images, val_labels, 32)])

    # --- reference: two real train_one_epoch_v2 epochs --------------------
    ref_clip = oc.model.CLIP(
        embed_dim=CFG.embed_dim,
        vision_cfg={"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        text_cfg={"context_length": 77, "vocab_size": 49408, "width": 64,
                  "heads": 4, "layers": 2},
    )
    sd = {k: torch.from_numpy(v) for k, v in
          params_to_pt_state_dict(params, CFG).items()}
    missing, unexpected = ref_clip.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model = oc.model.CustomCLIP(ref_clip, EVAL_CLASSES, oc.tokenize)
    model.init_memory_bank(EVAL_CLASSES, TEMPLATES)
    with torch.no_grad():
        for i, c in enumerate(EVAL_CLASSES):
            model.memory_bank[c].copy_(torch.from_numpy(bank0[i]))

    ref_batches = []
    for b, img in zip(batches, norm_images):
        images_t = torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous()
        per_img = torch.from_numpy(b["per_image_tokens"].astype(np.int64)).unsqueeze(1)
        per_grp = torch.from_numpy(b["per_group_tokens"].astype(np.int64)).unsqueeze(1)
        zs_names = [[EVAL_CLASSES[int(z)]] for z in b["zs_preds"]]
        ref_batches.append((
            images_t, images_t.clone(), per_img.clone(), per_grp.clone(),
            [""] * B, None, per_img, per_grp, [{} for _ in range(B)], zs_names,
        ))

    data = {
        "train": _EpochTrainData(_EpochLoader(ref_batches, STEPS)),
        "dtd-train-zero-shot-classification": types.SimpleNamespace(
            class_names=EVAL_CLASSES, templates=TEMPLATES),
    }
    args = _reference_args()
    args.skip_scheduler = False
    optimizer = torch.optim.SGD(model.parameters(), lr=LR, momentum=0.0)
    scheduler = ref_scheduler.cosine_lr(optimizer, LR, WARMUP, total_steps)
    writer = _CaptureWriter()
    for epoch in range(EPOCHS):
        data["train"].set_epoch(epoch)
        ref_train.train_one_epoch_v2(
            model, data, oc.ClipLoss(), epoch, optimizer,
            None, scheduler, None, args, tb_writer=writer)

    ref_losses = writer.scalars["train/loss"]
    assert len(ref_losses) == total_steps
    np.testing.assert_allclose(our_losses, ref_losses, rtol=0, atol=3e-4)

    ref_bank = np.stack([model.memory_bank[c].detach().numpy()
                         for c in EVAL_CLASSES])
    np.testing.assert_allclose(
        np.asarray(state.memory_bank), ref_bank, rtol=0, atol=5e-4)
    ours_sd = params_to_pt_state_dict(state.params, CFG)
    ref_sd = {k: v.detach().numpy() for k, v in ref_clip.state_dict().items()}
    for key, v in ours_sd.items():
        np.testing.assert_allclose(v, ref_sd[key], rtol=0, atol=2e-3, err_msg=key)

    # --- eval A/B through the reference's REAL zero_shot_eval --------------
    norm_val = np.asarray(T.normalize_images(val_images, *T.model_mean_std(CFG)))
    val_loader = [(
        list(range(32)),
        torch.from_numpy(norm_val.transpose(0, 3, 1, 2)).contiguous(),
        torch.from_numpy(val_labels),
    )]
    eval_data = {
        "dtd-val-zero-shot-classification": types.SimpleNamespace(
            dataloader=val_loader, class_names=EVAL_CLASSES,
            templates=TEMPLATES),
    }
    args.method = "ours"
    args.zeroshot_frequency = 1
    args.epochs = EPOCHS
    args.distributed = False
    results = ref_zero_shot.zero_shot_eval(
        model, eval_data, EPOCHS, args, tokenizer=oc.tokenize)

    with torch.no_grad():
        mem = torch.nn.functional.normalize(
            torch.stack([model.memory_bank[c] for c in EVAL_CLASSES]), dim=1)
        out = model(image=val_loader[0][1])
        feats = out["image_features"] if isinstance(out, dict) else out[0]
        ref_logits = (100.0 * feats @ mem.T.detach()).numpy()
    np.testing.assert_allclose(our_logits, ref_logits, rtol=0, atol=5e-3)
    key = "dtd-val-zero-shot-classification-val-top{}"
    for k, our_key in ((1, "top1"), (5, "top5"), (10, "top10")):
        assert abs(results[key.format(k)] - ours_eval[our_key]) < 1e-9, (
            k, results[key.format(k)], ours_eval[our_key])


def test_real_train_one_epoch_v1_gamma_trajectory():
    """--gamma conformance against the reference's REAL legacy
    ``train_one_epoch`` (train.py:811-1126) — the only reference path where
    γ has semantics (the momentum-prototype EMA mix at train.py:953).

    Drives the real function at its effective configuration (k=1
    pseudo-label per image — its ``squeeze(1)`` only type-checks there;
    w=1.0 text mixing) for 3 steps with γ=0.3 and compares per-step losses,
    the UN-renormalized bank trajectory, and the final parameters against
    ``make_v1_step``. Also pins the v1 signature facts our step must
    reproduce: the text tower receives NO update (detached anchor → torch
    grad=None skip), the vision tower does.
    """
    GAMMA = 0.3
    oc, ref_train = _load_reference_trainer()

    from latteclip_tpu.train.step import make_v1_step

    tok = get_tokenizer()
    params = init_clip_params(jax.random.PRNGKey(42), CFG)
    bank0 = np.asarray(init_memory_bank(params, CFG, tok, CLASSES, TEMPLATES))
    table = build_template_table(tok, CLASSES, TEMPLATES)
    batches = _make_batches(tok, np.random.default_rng(7))
    norm_images = [np.asarray(T.normalize_images(b["images"])) for b in batches]

    # --- ours: v1 momentum step, SGD --------------------------------------
    opt = optax.sgd(LR)
    state = create_train_state(params, opt, bank0).start_epoch()
    step = jax.jit(make_v1_step(
        CFG, opt, LatteHParams(augment=False), table, gamma=GAMMA))
    our_losses = []
    for i, b in enumerate(batches):
        state, metrics = step(state, b, jax.random.PRNGKey(i))
        our_losses.append(float(metrics["loss"]))

    # --- reference: the real legacy train_one_epoch -----------------------
    ref_clip = oc.model.CLIP(
        embed_dim=CFG.embed_dim,
        vision_cfg={"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        text_cfg={"context_length": 77, "vocab_size": 49408, "width": 64,
                  "heads": 4, "layers": 2},
    )
    sd = {k: torch.from_numpy(v) for k, v in
          params_to_pt_state_dict(params, CFG).items()}
    missing, unexpected = ref_clip.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model = oc.model.CustomCLIP(ref_clip, CLASSES, oc.tokenize)
    model.init_memory_bank(CLASSES, TEMPLATES)
    with torch.no_grad():
        for i, c in enumerate(CLASSES):
            model.memory_bank[c].copy_(torch.from_numpy(bank0[i]))

    # v1 unpacks: images, distill_images, texts, common_texts, text_raws,
    #             label_texts, per_image_texts, per_image_group_texts,
    #             metadata, zeroshot_classnames    (train.py:857-860)
    # label_texts = template tokens of the zero-shot pseudo-label, [bs,k=1,77]
    ref_batches = []
    for b, img in zip(batches, norm_images):
        images_t = torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous()
        label_texts = torch.from_numpy(np.asarray(table)[b["zs_preds"]].astype(np.int64)).unsqueeze(1)
        per_img = torch.from_numpy(b["per_image_tokens"].astype(np.int64)).unsqueeze(1)
        per_grp = torch.from_numpy(b["per_group_tokens"].astype(np.int64)).unsqueeze(1)
        zs_names = [[CLASSES[int(z)]] for z in b["zs_preds"]]
        ref_batches.append((
            images_t, images_t.clone(), label_texts.clone(), label_texts.clone(),
            [""] * B, label_texts, per_img, per_grp,
            [{} for _ in range(B)], zs_names,
        ))

    data = {"train": _StubTrainData(_StubLoader(ref_batches))}
    args = _reference_args()
    args.gamma = GAMMA
    writer = _CaptureWriter()
    text_sd_before = {k: v.detach().clone() for k, v in ref_clip.state_dict().items()
                      if k.startswith(("transformer.", "token_embedding",
                                       "positional_embedding", "text_projection",
                                       "ln_final"))}
    ref_train.train_one_epoch(
        model, data, oc.ClipLoss(), 0,
        torch.optim.SGD(model.parameters(), lr=LR, momentum=0.0),
        None, None, None, args, tb_writer=writer,
    )

    # signature fact: v1 trains the IMAGE tower only (detached text anchor)
    ref_sd = {k: v.detach().numpy() for k, v in ref_clip.state_dict().items()}
    for k, v_before in text_sd_before.items():
        np.testing.assert_array_equal(ref_sd[k], v_before.numpy(),
                                      err_msg=f"reference text param {k} moved")
    ours_sd = params_to_pt_state_dict(state.params, CFG)
    init_sd = params_to_pt_state_dict(params, CFG)
    for k in text_sd_before:
        np.testing.assert_array_equal(ours_sd[k], init_sd[k],
                                      err_msg=f"our text param {k} moved")
    assert not np.allclose(ours_sd["visual.conv1.weight"],
                           init_sd["visual.conv1.weight"])

    # trajectories
    ref_losses = writer.scalars["train/loss"]
    assert len(ref_losses) == STEPS
    np.testing.assert_allclose(our_losses, ref_losses, rtol=0, atol=2e-4)

    ref_bank = np.stack([model.memory_bank[c].detach().numpy() for c in CLASSES])
    np.testing.assert_allclose(
        np.asarray(state.memory_bank), ref_bank, rtol=0, atol=5e-4)
    # v1's bank update does NOT renormalize — pin that the trajectory is
    # actually off the unit sphere, so the comparison is meaningful
    norms = np.linalg.norm(ref_bank, axis=1)
    assert (np.abs(norms - 1.0) > 1e-3).any(), norms

    for key, v in ours_sd.items():
        np.testing.assert_allclose(v, ref_sd[key], rtol=0, atol=2e-3, err_msg=key)


def test_v1_step_uninitialized_bank_branch():
    """v1's init branch (train.py:926-927): an all-zero bank makes the anchor
    the raw label feature, and the first update fills seen classes with the
    γ-mixed mean while unseen classes stay zero."""
    from latteclip_tpu.train.step import make_v1_step

    tok = get_tokenizer()
    params = init_clip_params(jax.random.PRNGKey(1), CFG)
    table = build_template_table(tok, CLASSES, TEMPLATES)
    bank0 = np.zeros((len(CLASSES), CFG.embed_dim), np.float32)
    opt = optax.sgd(LR)
    state = create_train_state(params, opt, bank0).start_epoch()
    step = jax.jit(make_v1_step(
        CFG, opt, LatteHParams(augment=False), table, gamma=0.5))
    b = _make_batches(tok, np.random.default_rng(3))[0]
    b = dict(b, zs_preds=np.array([0, 1] * (B // 2), np.int32))  # classes 2,3 unseen
    state, metrics = step(state, b, jax.random.PRNGKey(0))
    bank = np.asarray(state.memory_bank)
    assert np.abs(bank[:2]).sum() > 0
    np.testing.assert_array_equal(bank[2:], 0.0)
    assert np.isfinite(float(metrics["loss"]))
