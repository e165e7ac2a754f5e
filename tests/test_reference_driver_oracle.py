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
