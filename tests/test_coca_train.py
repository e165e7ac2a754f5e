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


def test_v2_coca_beyond_reference():
    """The v2 objective on a CoCa model — a path the reference CANNOT run:
    its CustomCLIP.__init__ dereferences clip_model.transformer
    (model.py:479), which CoCa does not have (its text tower is .text), and
    its original_clip trainer calls CoCaLoss without logits/labels
    (train.py:166-171). Both crashes are asserted here, then our step's
    invariants are pinned: trains the contrastive towers, keeps the caption
    decoder BITWISE at init (torch's grad=None skip semantics via zeroed
    updates), clamps logit_scale."""
    from latteclip_tpu.train.state import build_template_table, init_memory_bank
    from latteclip_tpu.train.step import make_train_step
    from latteclip_tpu.models.tokenizer import get_tokenizer

    oc = load_reference_open_clip()
    if oc is not None:
        import torch

        torch.manual_seed(0)
        ref_coca = oc.coca_model.CoCa(
            embed_dim=COCA_SMALL["embed_dim"],
            multimodal_cfg=COCA_SMALL["multimodal_cfg"],
            text_cfg=COCA_SMALL["text_cfg"],
            vision_cfg=COCA_SMALL["vision_cfg"],
        )
        with pytest.raises(AttributeError, match="transformer"):
            oc.model.CustomCLIP(ref_coca, ["a", "b"], lambda t: t)

    cfg = _cfg()
    B = COCA_SMALL["embed_dim"]  # fusion bug-compat path needs B == E
    CLASSES = ["a", "b", "c", "d"]
    params = init_coca_params(jax.random.PRNGKey(21), cfg)
    table = _template_table(cfg)
    bank0 = np.asarray(table[:, :1], np.float32)  # placeholder; real init below
    rng = np.random.default_rng(17)

    class _Tok:
        def __call__(self, texts):
            r = np.random.RandomState(abs(hash(tuple(texts))) % 2**31)
            ctx = cfg.text.context_length
            out = np.zeros((len(texts), ctx), np.int32)
            for i in range(len(texts)):
                n = r.randint(4, ctx)
                out[i, :n] = r.randint(1, cfg.text.vocab_size - 1, size=n)
            return out

    tok = _Tok()
    bank0 = np.asarray(init_memory_bank(params, cfg, tok, CLASSES,
                                        [lambda c: f"a photo of a {c}."]))
    opt = optax.adamw(1e-3)
    state = create_train_state(params, opt, bank0).start_epoch()
    step = jax.jit(make_train_step(
        cfg, opt, LatteHParams(augment=False), table,
        zero_update_subtrees=("text_decoder",)))
    batch = {
        "images": rng.integers(0, 255, size=(B, 32, 32, 3)).astype(np.uint8),
        "per_image_tokens": _template_table(cfg, C=B, seed=5),
        "per_group_tokens": _template_table(cfg, C=B, seed=6),
        "zs_preds": rng.integers(0, 4, size=(B,)).astype(np.int32),
        "gt_labels": rng.integers(0, 4, size=(B,)).astype(np.int32),
    }
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))

    # contrastive towers trained
    assert np.abs(np.asarray(state.params["text"]["cls_emb"])
                  - np.asarray(params["text"]["cls_emb"])).max() > 0
    assert np.abs(np.asarray(state.params["visual"]["proj"])
                  - np.asarray(params["visual"]["proj"])).max() > 0
    # caption decoder BITWISE at init (no AdamW decay drift)
    d_init = dict((jax.tree_util.keystr(p), np.asarray(a)) for p, a in
                  jax.tree_util.tree_leaves_with_path(params["text_decoder"]))
    for p, a in jax.tree_util.tree_leaves_with_path(state.params["text_decoder"]):
        np.testing.assert_array_equal(
            np.asarray(a), d_init[jax.tree_util.keystr(p)],
            err_msg=jax.tree_util.keystr(p))
    assert float(state.params["logit_scale"]) <= np.log(100.0) + 1e-6


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
