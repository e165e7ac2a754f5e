"""CoCa fine-tuning through the trainer: checkpoint round-trip, CoCaLoss
parity vs the reference class, and the FLYP-CoCa step.

The reference's own CLI cannot actually fine-tune CoCa with CoCaLoss: its
``train_one_epoch_original_clip`` calls ``loss(image_features=...,
text_features=..., logit_scale=...)`` (train.py:166-171) while
``CoCaLoss.forward`` requires ``logits``/``labels`` positionally
(loss.py:304) — a TypeError on the first step. This repo wires the intended
semantics (create_loss dispatch, factory.py:325-331) so ``--model coca_*
--method flyp`` trains with the weighted contrastive+caption objective.
"""
import dataclasses

import numpy as np
import pytest

import jax
import optax

from latteclip_tpu.core.checkpoint import (
    coca_params_to_state_dict,
    coca_state_dict_to_params,
)
from latteclip_tpu.core.config import CoCaConfig, config_from_dict
from latteclip_tpu.models.coca import coca_forward, coca_loss, init_coca_params
from latteclip_tpu.train.state import create_train_state
from latteclip_tpu.train.step import LatteHParams, make_flyp_step

from ref_oracle import load_reference_open_clip

COCA_SMALL = {
    "embed_dim": 32,
    "vision_cfg": {
        "image_size": 32, "layers": 2, "width": 64, "patch_size": 16,
        "attentional_pool": True, "attn_pooler_queries": 8, "attn_pooler_heads": 4,
        "output_tokens": True,
    },
    "text_cfg": {
        "context_length": 12, "vocab_size": 96, "width": 32, "heads": 4,
        "layers": 2, "embed_cls": True, "output_tokens": True,
    },
    "multimodal_cfg": {
        "context_length": 12, "vocab_size": 96, "width": 32, "heads": 4, "layers": 2,
    },
}


def _cfg() -> CoCaConfig:
    cfg = config_from_dict("coca_small_train", COCA_SMALL)
    assert isinstance(cfg, CoCaConfig)
    return dataclasses.replace(cfg, compute_dtype="float32")


def _batch(cfg, B=6, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "images": rng.randint(0, 255, size=(B, 32, 32, 3)).astype(np.uint8),
        "per_image_tokens": np.zeros((B, cfg.text.context_length), np.int32),
        "per_group_tokens": np.zeros((B, cfg.text.context_length), np.int32),
        "zs_preds": rng.randint(0, 4, size=(B,)).astype(np.int32),
        "gt_labels": rng.randint(0, 4, size=(B,)).astype(np.int32),
    }


def _template_table(cfg, C=4, seed=3):
    """Synthetic per-class token rows in the tiny vocab (real lengths)."""
    rng = np.random.RandomState(seed)
    ctx = cfg.text.context_length
    table = np.zeros((C, ctx), np.int32)
    for c in range(C):
        n = rng.randint(4, ctx)
        table[c, :n] = rng.randint(1, cfg.text.vocab_size - 1, size=n)
    return table


def test_coca_sd_round_trip():
    """params -> OpenCLIP-layout sd -> params is exact, incl. the attn pool,
    cls-mask text tower, decoder cross blocks, and memory_bank rows."""
    cfg = _cfg()
    params = init_coca_params(jax.random.PRNGKey(0), cfg)
    bank = np.random.RandomState(1).rand(4, cfg.embed_dim).astype(np.float32)
    names = ["a", "b", "c", "d"]

    sd = coca_params_to_state_dict(params, cfg, memory_bank=bank, classnames=names)
    assert all(f"memory_bank.{n}" in sd for n in names)
    # go through the REAL load path (pt_state_dict_to_params dispatch +
    # _normalize_state_dict — which must NOT CustomTextCLIP-fold the coca
    # text.* keys)
    from latteclip_tpu.core.checkpoint import pt_state_dict_to_params

    back, bank_back = pt_state_dict_to_params(sd, cfg)
    np.testing.assert_array_equal(np.stack([bank_back[n] for n in names]), bank)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict((jax.tree_util.keystr(k), v)
                  for k, v in jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        key = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), np.asarray(flat_b[key]), err_msg=key)


@pytest.mark.skipif(load_reference_open_clip() is None, reason="oracle unavailable")
def test_coca_loss_matches_reference_class():
    """Our coca_loss vs the reference's REAL CoCaLoss on identical arrays
    (loss.py:278-321: weighted ClipLoss + CrossEntropyLoss(ignore_index=pad))."""
    import torch

    oc = load_reference_open_clip()
    rng = np.random.RandomState(0)
    B, E, L, V = 8, 16, 12, 96
    img = rng.randn(B, E).astype(np.float32)
    txt = rng.randn(B, E).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    logits = rng.randn(B, L, V).astype(np.float32)
    labels = rng.randint(1, V, size=(B, L))
    labels[:, 8:] = 0  # pad tail (ignore_index)
    scale = np.float32(50.0)

    ours = coca_loss(
        {"image_features": img, "text_features": txt, "logits": logits,
         "labels": labels, "logit_scale": scale},
        caption_loss_weight=2.0, clip_loss_weight=1.0, pad_id=0,
    )
    ref_loss = oc.loss.CoCaLoss(caption_loss_weight=2.0, clip_loss_weight=1.0, pad_id=0)
    ref = ref_loss(
        torch.from_numpy(img), torch.from_numpy(txt),
        torch.from_numpy(logits), torch.from_numpy(labels),
        torch.tensor(scale), output_dict=True,
    )
    np.testing.assert_allclose(
        float(ours["contrastive_loss"]), float(ref["contrastive_loss"]), atol=1e-5)
    np.testing.assert_allclose(
        float(ours["caption_loss"]), float(ref["caption_loss"]), atol=1e-5)


def test_flyp_coca_step_trains_all_towers():
    """make_flyp_step(coca_weights=...): losses finite, BOTH the contrastive
    towers and the caption decoder receive updates (unlike the v2 path where
    the decoder is frozen-by-zeroed-updates)."""
    cfg = _cfg()
    params = init_coca_params(jax.random.PRNGKey(0), cfg)
    table = _template_table(cfg)
    opt = optax.adamw(1e-3)
    bank = np.zeros((4, cfg.embed_dim), np.float32)
    state = create_train_state(params, opt, bank)
    step = jax.jit(make_flyp_step(
        cfg, opt, LatteHParams(augment=False), table,
        coca_weights=(2.0, 1.0),
    ))
    batch = _batch(cfg)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["caption_loss"]))
    assert np.isfinite(float(metrics["contrastive_loss"]))
    # decoder trained
    d0 = np.asarray(params["text_decoder"]["text_projection"])
    d1 = np.asarray(state2.params["text_decoder"]["text_projection"])
    assert np.abs(d1 - d0).max() > 0
    # text tower trained
    t0 = np.asarray(params["text"]["cls_emb"])
    t1 = np.asarray(state2.params["text"]["cls_emb"])
    assert np.abs(t1 - t0).max() > 0
    # logit scale clamped
    assert float(state2.params["logit_scale"]) <= np.log(100.0) + 1e-6


def test_coca_encode_dispatch_matches_coca_forward():
    """clip_mod.encode_image/encode_text on a CoCaConfig must equal the
    latents coca_forward produces (eval/bank/classifier builds rely on it)."""
    from latteclip_tpu.models import clip as clip_mod

    cfg = _cfg()
    params = init_coca_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(5)
    images = rng.rand(3, 32, 32, 3).astype(np.float32)
    tokens = _template_table(cfg, C=3, seed=9)

    out = coca_forward(params, cfg, images, tokens)
    img = clip_mod.encode_image(params, cfg, images, normalize=True)
    txt = clip_mod.encode_text(params, cfg, tokens, normalize=True)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(out["image_features"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(txt), np.asarray(out["text_features"]), atol=1e-5)
