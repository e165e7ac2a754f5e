"""Vision/tokenizer extras: patch dropout, sin-cos pos embed, reductions."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.models.clip import encode_image, init_clip_params
from latteclip_tpu.models.pos_embed import sincos_2d
from latteclip_tpu.models.tokenizer import (
    get_tokenizer,
    random_mask_tokenize,
    simple_mask_tokenize,
)
from latteclip_tpu.models.vit import patch_dropout

TINY = config_from_dict(
    "tiny",
    {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 8},
        "text_cfg": {"context_length": 16, "vocab_size": 128, "width": 32, "heads": 4, "layers": 2},
    },
)


def test_patch_dropout_keeps_cls_and_count():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 17, 8).astype(np.float32))
    out = patch_dropout(x, prob=0.5, rng=jax.random.PRNGKey(0))
    assert out.shape == (4, 1 + 8, 8)  # 16 patches * 0.5 = 8 kept + cls
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))


def test_patch_dropout_in_forward():
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    cfg = dataclasses.replace(
        TINY, vision=dataclasses.replace(TINY.vision, patch_dropout=0.5)
    )
    imgs = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    out_train = encode_image(params, cfg, imgs, normalize=True, train=True, rng=jax.random.PRNGKey(1))
    out_eval = encode_image(params, cfg, imgs, normalize=True)
    assert out_train.shape == out_eval.shape == (2, 32)
    assert not np.allclose(np.asarray(out_train), np.asarray(out_eval))


def test_sincos_pos_embed_properties():
    pos = sincos_2d(64, 4, cls_token=True)
    assert pos.shape == (17, 64)
    np.testing.assert_array_equal(pos[0], 0.0)  # cls slot zeroed
    assert np.abs(pos[1:]).max() <= 1.0

    cfg = dataclasses.replace(
        TINY, vision=dataclasses.replace(TINY.vision, pos_embed_type="sin_cos_2d")
    )
    from latteclip_tpu.models.vit import init_vit_params

    p = init_vit_params(jax.random.PRNGKey(0), cfg.vision, 32)
    np.testing.assert_allclose(np.asarray(p["pos_embed"]), sincos_2d(64, 4), atol=1e-6)


def test_reduction_strategies():
    tok = get_tokenizer()
    long_text = "word " * 200
    rng = np.random.default_rng(0)

    out = random_mask_tokenize(tok, long_text, context_length=32, rng=rng)
    assert out.shape == (1, 32)
    assert out[0, 0] == tok.sot_token_id and out[0, 31] == tok.eot_token_id

    out2 = simple_mask_tokenize(tok, long_text, context_length=32, rng=rng)
    assert out2[0, 0] == tok.sot_token_id and out2[0, 31] == tok.eot_token_id

    # short texts are unchanged by reductions
    short = random_mask_tokenize(tok, "hello world", context_length=32, rng=rng)
    np.testing.assert_array_equal(short[0][:5], tok("hello world", 32)[0][:5])


def test_attentional_pool_forward():
    cfg = dataclasses.replace(
        TINY,
        vision=dataclasses.replace(
            TINY.vision, attentional_pool=True, attn_pooler_queries=8, attn_pooler_heads=4
        ),
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    assert "attn_pool" in params["visual"]
    imgs = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    feats = encode_image(params, cfg, imgs, normalize=True)
    assert feats.shape == (2, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5)


def test_all_shipped_configs_parse():
    from latteclip_tpu.core.config import CoCaConfig, get_model_config, list_models

    models = list_models()
    assert len(models) >= 50
    for name in models:
        cfg = get_model_config(name)
        if isinstance(cfg, CoCaConfig):
            assert cfg.multimodal.layers > 0
            continue
        assert cfg.embed_dim > 0 and cfg.text.width > 0
        v = cfg.vision
        if hasattr(v, "patch_size"):
            assert v.width % v.head_width == 0, name
    # families that must be present for the pretrained registry
    for name in ("RN50x4", "RN50x64", "ViT-bigG-14", "ViT-e-14",
                 "ViT-SO400M-14-SigLIP", "coca_ViT-L-14", "ViT-S-32"):
        assert name in models, name


def test_siglip_ln_eps_plumbed():
    """SigLIP towers use flax's LayerNorm eps 1e-6 (reference text_cfg
    norm_kwargs + the timm SigLIP trunk), not torch's 1e-5."""
    from latteclip_tpu.core.config import config_from_dict, get_model_config
    from latteclip_tpu.models import layers

    cfg = get_model_config("ViT-B-16-SigLIP")
    assert cfg.vision.ln_eps == 1e-6 and cfg.text.ln_eps == 1e-6
    assert get_model_config("ViT-B-16").vision.ln_eps == 1e-5

    # reference JSON spelling resolves too
    raw = {
        "embed_dim": 8,
        "vision_cfg": {"image_size": 32, "layers": 1, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 8, "vocab_size": 64, "width": 64,
                     "heads": 4, "layers": 1, "norm_kwargs": {"eps": 1e-6}},
    }
    assert config_from_dict("x", raw).text.ln_eps == 1e-6

    # eps actually changes the math
    x = jnp.full((1, 4), 1e-3) + jnp.arange(4) * 1e-4
    s, b = jnp.ones((4,)), jnp.zeros((4,))
    a = np.asarray(layers.layer_norm(x, s, b, 1e-5))
    c = np.asarray(layers.layer_norm(x, s, b, 1e-6))
    assert np.abs(a - c).max() > 1e-3


def test_no_cls_tok_pooling_rejected():
    """no_cls_token + pool_type='tok' would silently pool a patch token."""
    cfg = config_from_dict("bad", {
        "embed_dim": 16,
        "vision_cfg": {"image_size": 32, "layers": 1, "width": 64,
                       "patch_size": 16, "no_cls_token": True},
        "text_cfg": {"context_length": 8, "vocab_size": 64, "width": 64,
                     "heads": 4, "layers": 1},
    })
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    imgs = np.zeros((1, 32, 32, 3), np.float32)
    with pytest.raises(ValueError, match="class token"):
        encode_image(params, cfg, imgs)
