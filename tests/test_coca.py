"""CoCa: parity vs the reference torch model + loss/generation behavior."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latteclip_tpu.core.checkpoint import coca_state_dict_to_params
from latteclip_tpu.core.config import CoCaConfig, config_from_dict
from latteclip_tpu.models.coca import (
    coca_forward,
    coca_loss,
    generate,
    init_coca_params,
)

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


def _cfg():
    import dataclasses

    cfg = config_from_dict("coca_small", COCA_SMALL)
    assert isinstance(cfg, CoCaConfig)
    return dataclasses.replace(cfg, compute_dtype="float32")


def _tokens(cfg, batch=3, seed=1):
    rng = np.random.RandomState(seed)
    ctx = cfg.text.context_length
    tokens = np.zeros((batch, ctx), dtype=np.int32)
    for i in range(batch):
        n = rng.randint(3, ctx)
        tokens[i, :n] = rng.randint(1, cfg.text.vocab_size - 1, size=n)
    return tokens


def test_coca_config_dispatch():
    cfg = _cfg()
    assert cfg.multimodal.layers == 2 and cfg.text.embed_cls


def test_coca_forward_shapes_and_loss():
    cfg = _cfg()
    params = init_coca_params(jax.random.PRNGKey(0), cfg)
    images = np.random.RandomState(0).rand(3, 32, 32, 3).astype(np.float32)
    tokens = _tokens(cfg)
    out = coca_forward(params, cfg, images, tokens)
    assert out["image_features"].shape == (3, cfg.embed_dim)
    assert out["text_features"].shape == (3, cfg.embed_dim)
    assert out["logits"].shape == (3, cfg.text.context_length, cfg.text.vocab_size)
    losses = coca_loss(out)
    assert np.isfinite(float(losses["contrastive_loss"]))
    assert np.isfinite(float(losses["caption_loss"]))


@pytest.mark.skipif(load_reference_open_clip() is None, reason="oracle unavailable")
def test_coca_parity_vs_reference():
    import torch

    oc = load_reference_open_clip()
    torch.manual_seed(0)
    ref = oc.coca_model.CoCa(
        embed_dim=COCA_SMALL["embed_dim"],
        multimodal_cfg=COCA_SMALL["multimodal_cfg"],
        text_cfg=COCA_SMALL["text_cfg"],
        vision_cfg=COCA_SMALL["vision_cfg"],
    ).eval()
    gen = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)

    cfg = _cfg()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = coca_state_dict_to_params(sd, cfg)

    rng = np.random.RandomState(7)
    images = rng.rand(2, 32, 32, 3).astype(np.float32)
    tokens = _tokens(cfg, batch=2, seed=11)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(images.transpose(0, 3, 1, 2)), torch.from_numpy(tokens).long())
    out = coca_forward(params, cfg, images, tokens)

    np.testing.assert_allclose(
        np.asarray(out["image_features"]), ref_out["image_features"].numpy(), atol=5e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["text_features"]), ref_out["text_features"].numpy(), atol=5e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(out["labels"]), ref_out["labels"].numpy())


def test_coca_generate():
    cfg = _cfg()
    params = init_coca_params(jax.random.PRNGKey(0), cfg)
    images = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    toks = generate(params, cfg, images, seq_len=6, sot_token_id=1, eot_token_id=2)
    assert toks.shape == (2, cfg.text.context_length)
    assert (toks[:, 0] == 1).all()
    toks_tk = generate(params, cfg, images, seq_len=6, top_k=3, sot_token_id=1, eot_token_id=2)
    assert toks_tk.shape == toks.shape


def test_coca_generate_beamsearch():
    from latteclip_tpu.models.coca import generate_beamsearch

    cfg = _cfg()
    params = init_coca_params(jax.random.PRNGKey(0), cfg)
    images = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    toks = generate_beamsearch(
        params, cfg, images, num_beams=4, num_beam_groups=2,
        min_seq_len=2, seq_len=8, sot_token_id=1, eot_token_id=2,
    )
    assert toks.shape == (2, cfg.text.context_length)
    assert (toks[:, 0] == 1).all()
    # deterministic
    again = generate_beamsearch(
        params, cfg, images, num_beams=4, num_beam_groups=2,
        min_seq_len=2, seq_len=8, sot_token_id=1, eot_token_id=2,
    )
    np.testing.assert_array_equal(toks, again)
    # min-length: no EOT before position min_seq_len
    assert not (toks[:, 1:2] == 2).any()


# ---------------------------------------------------------------------------
# coca_roberta: CoCa with an HF text trunk (reference coca_roberta-ViT-B-32)
# ---------------------------------------------------------------------------

def _coca_roberta_cfg():
    """Tiny CoCa-with-roberta config mirroring coca_roberta-ViT-B-32's
    structure (HF trunk + mean pooler + linear proj, no vision attn pool)."""
    from latteclip_tpu.core.config import TextConfig, VisionConfig
    from latteclip_tpu.models.hf_text import HFTextConfig

    return CoCaConfig(
        name="coca_roberta_small",
        embed_dim=24,
        vision=VisionConfig(image_size=32, layers=2, width=64, patch_size=16),
        text=HFTextConfig(
            model_type="roberta", vocab_size=96, width=64, layers=2, heads=4,
            intermediate=128, max_positions=40, pad_id=1, ln_eps=1e-5,
            pooler_type="mean_pooler", proj_type="linear", context_length=12,
        ),
        multimodal=TextConfig(
            context_length=12, vocab_size=96, width=64, heads=4, layers=2,
        ),
        compute_dtype="float32",
    )


def _roberta_tokens(cfg, batch, seed):
    rng = np.random.RandomState(seed)
    ctx = cfg.text.context_length
    tokens = np.full((batch, ctx), cfg.text.pad_id, dtype=np.int32)
    for i in range(batch):
        n = rng.randint(3, ctx)
        tokens[i, 0] = 0  # <s>
        tokens[i, 1:n] = rng.randint(3, cfg.text.vocab_size - 1, size=n - 1)
    return tokens


def test_coca_roberta_config_resolves():
    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.models.hf_text import HFTextConfig

    cfg = get_model_config("coca_roberta-ViT-B-32")
    assert isinstance(cfg, CoCaConfig)
    assert isinstance(cfg.text, HFTextConfig)
    assert cfg.text.model_type == "roberta" and cfg.text.proj_type == "linear"
    assert cfg.multimodal.width == 768


def test_coca_roberta_forward_and_generate():
    cfg = _coca_roberta_cfg()
    params = init_coca_params(jax.random.PRNGKey(0), cfg)
    images = np.random.RandomState(0).rand(3, 32, 32, 3).astype(np.float32)
    tokens = _roberta_tokens(cfg, 3, seed=5)
    out = coca_forward(params, cfg, images, tokens)
    assert out["image_features"].shape == (3, cfg.embed_dim)
    assert out["text_features"].shape == (3, cfg.embed_dim)
    # mean pooler: the full hidden sequence feeds the decoder
    assert out["logits"].shape == (3, cfg.text.context_length, cfg.text.vocab_size)
    losses = coca_loss(out, pad_id=cfg.text.pad_id)
    assert np.isfinite(float(losses["contrastive_loss"]))
    assert np.isfinite(float(losses["caption_loss"]))

    toks = generate(params, cfg, images, seq_len=6, sot_token_id=0, eot_token_id=2)
    assert toks.shape == (3, cfg.text.context_length)
    assert (toks[:, 0] == 0).all()


@pytest.mark.skipif(load_reference_open_clip() is None, reason="oracle unavailable")
def test_coca_roberta_parity_vs_reference(tmp_path):
    """Drive the reference CoCa with a real (tiny, random) HF roberta trunk —
    built offline by pointing hf_model_name at a local config dir — and
    check feature/logit/label parity after state-dict import."""
    import torch

    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.RobertaConfig(
        vocab_size=96, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=40, type_vocab_size=1,
        pad_token_id=1, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,
    )
    hf_cfg.save_pretrained(tmp_path)

    oc = load_reference_open_clip()
    torch.manual_seed(0)
    ref = oc.coca_model.CoCa(
        embed_dim=24,
        multimodal_cfg={"context_length": 12, "vocab_size": 96, "width": 64,
                        "heads": 4, "layers": 2},
        text_cfg={"hf_model_name": str(tmp_path), "hf_proj_type": "linear",
                  "hf_model_pretrained": False, "width": 64, "output_tokens": True},
        vision_cfg={"image_size": 32, "layers": 2, "width": 64, "patch_size": 16,
                    "output_tokens": True},
    ).eval()
    gen = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)

    cfg = _coca_roberta_cfg()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = coca_state_dict_to_params(sd, cfg)

    rng = np.random.RandomState(7)
    images = rng.rand(2, 32, 32, 3).astype(np.float32)
    tokens = _roberta_tokens(cfg, 2, seed=11)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(images.transpose(0, 3, 1, 2)),
                      torch.from_numpy(tokens).long())
    out = coca_forward(params, cfg, images, tokens)

    np.testing.assert_allclose(
        np.asarray(out["image_features"]), ref_out["image_features"].numpy(),
        atol=5e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["text_features"]), ref_out["text_features"].numpy(),
        atol=5e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), atol=1e-4, rtol=1e-3,
    )
    np.testing.assert_array_equal(np.asarray(out["labels"]), ref_out["labels"].numpy())
