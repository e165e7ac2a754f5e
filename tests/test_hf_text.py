"""HF text tower parity (models/hf_text.py) against live ``transformers``.

Tiny randomly-initialised BertModel / RobertaModel instances are the torch
oracle: their ``state_dict`` is imported into the native JAX tower and the
outputs compared on identical padded inputs — embeddings, post-LN masked
encoder, poolers, and projections (reference ``src/open_clip/hf_model.py``).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from latteclip_tpu.models.hf_text import (  # noqa: E402
    HFTextConfig,
    hf_text_config,
    hf_text_forward,
    import_hf_state_dict,
    init_hf_text_params,
)

D, L, H, M, V, P = 32, 2, 4, 64, 100, 40


def tiny_bert():
    cfg = transformers.BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=M, max_position_embeddings=P, type_vocab_size=1,
        pad_token_id=0, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    return transformers.BertModel(cfg, add_pooling_layer=True).eval(), cfg


def tiny_roberta():
    cfg = transformers.RobertaConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=M, max_position_embeddings=P, type_vocab_size=1,
        pad_token_id=1, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    return transformers.RobertaModel(cfg, add_pooling_layer=False).eval(), cfg


def make_ids(pad_id, rng):
    # variable-length rows padded to T=10
    ids = rng.integers(3, V, size=(4, 10)).astype(np.int64)
    lengths = [10, 7, 5, 9]
    for r, n in enumerate(lengths):
        ids[r, n:] = pad_id
    return ids


def jax_cfg(model_type, pad_id, pooler, ln_eps):
    return HFTextConfig(
        model_type=model_type, vocab_size=V, width=D, layers=L, heads=H,
        intermediate=M, max_positions=P, pad_id=pad_id, ln_eps=ln_eps,
        pooler_type=pooler,
    )


def hf_hidden_and_pooler(model, ids, pad_id):
    mask = torch.tensor((ids != pad_id).astype(np.int64))
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids), attention_mask=mask)
    return out


def test_bert_cls_pooler_parity():
    model, _ = tiny_bert()
    ids = make_ids(0, np.random.default_rng(2))
    cfg = jax_cfg("bert", 0, "cls_pooler", 1e-12)
    params = import_hf_state_dict(model.state_dict(), cfg)
    assert "pooler_w" in params

    ours = np.asarray(hf_text_forward(params, cfg, jnp.asarray(ids.astype(np.int32)),
                                      embed_dim=D, dtype=jnp.float32))
    want = hf_hidden_and_pooler(model, ids, 0).pooler_output.numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5, rtol=1e-4)


def test_roberta_mean_pooler_parity():
    model, _ = tiny_roberta()
    ids = make_ids(1, np.random.default_rng(3))
    cfg = jax_cfg("roberta", 1, "mean_pooler", 1e-5)
    params = import_hf_state_dict(model.state_dict(), cfg)

    ours = np.asarray(hf_text_forward(params, cfg, jnp.asarray(ids.astype(np.int32)),
                                      embed_dim=D, dtype=jnp.float32))
    out = hf_hidden_and_pooler(model, ids, 1).last_hidden_state.numpy()
    mask = (ids != 1).astype(np.float32)[:, :, None]
    want = (out * mask).sum(1) / mask.sum(1)
    np.testing.assert_allclose(ours, want, atol=2e-5, rtol=1e-4)


def test_max_pooler_and_projections():
    model, _ = tiny_roberta()
    ids = make_ids(1, np.random.default_rng(4))
    cfg = jax_cfg("roberta", 1, "max_pooler", 1e-5)
    params = import_hf_state_dict(model.state_dict(), cfg)

    ours = np.asarray(hf_text_forward(params, cfg, jnp.asarray(ids.astype(np.int32)),
                                      embed_dim=D, dtype=jnp.float32))
    out = hf_hidden_and_pooler(model, ids, 1).last_hidden_state.numpy()
    masked = np.where((ids == 1)[:, :, None], -np.inf, out)
    np.testing.assert_allclose(ours, masked.max(1), atol=2e-5, rtol=1e-4)

    # mlp projection to a different embed dim (reference hf_model.py:146-152)
    E = 16
    pcfg = HFTextConfig(model_type="roberta", vocab_size=V, width=D, layers=L,
                        heads=H, intermediate=M, max_positions=P, pad_id=1,
                        pooler_type="mean_pooler", proj_type="mlp")
    pp = init_hf_text_params(jax.random.PRNGKey(0), pcfg, E)
    assert pp["proj1_w"].shape == (D, (D + E) // 2)
    feats = hf_text_forward(pp, pcfg, jnp.asarray(ids.astype(np.int32)),
                            embed_dim=E, dtype=jnp.float32)
    assert feats.shape == (4, E)


def test_hf_text_config_resolution():
    cfg = hf_text_config({"hf_model_name": "roberta-base", "proj": "mlp"})
    assert cfg.model_type == "roberta" and cfg.width == 768
    assert cfg.pooler_type == "mean_pooler" and cfg.proj_type == "mlp"
    assert cfg.position_offset == 2

    # encoder-decoder families resolve natively now (encoder-side towers)
    cfg = hf_text_config({"hf_model_name": "google/mt5-base", "model_type": "mt5"})
    assert cfg.width == 768 and cfg.d_kv == 64 and cfg.pad_id == 0
    cfg = hf_text_config({"hf_model_name": "facebook/nllb-200-distilled-600M",
                          "model_type": "m2m_100"})
    assert cfg.width == 1024 and cfg.scale_embedding and cfg.pad_id == 1


def test_proj_defaults_to_mlp_like_reference():
    """Configs that omit the proj key get the MLP projection: reference
    CLIPTextCfg.hf_proj_type='mlp' (model.py:202) is always passed through
    (model.py:306). roberta-ViT-B-32 from-scratch: 768 -> 640 -> 512."""
    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.models.clip import init_clip_params

    cfg = get_model_config("roberta-ViT-B-32")
    assert cfg.text.proj_type == "mlp"
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    text = params["text"]
    assert "proj_w" not in text
    assert text["proj1_w"].shape == (768, (768 + 512) // 2)
    assert text["proj2_w"].shape == ((768 + 512) // 2, 512)


def test_hf_clip_checkpoint_roundtrip(tmp_path):
    """HF-text CLIP params survive the .pt cycle via CustomTextCLIP naming
    (text.transformer.* HF keys + text.proj)."""
    from latteclip_tpu.core.checkpoint import load_clip_pt, save_clip_pt
    from latteclip_tpu.core.config import config_from_dict
    from latteclip_tpu.models import clip as clip_mod

    cfg = config_from_dict("tiny-hf", {
        "embed_dim": 16,
        "compute_dtype": "float32",
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {
            "hf_model_name": "", "model_type": "roberta", "vocab_size": V,
            "width": D, "layers": L, "heads": H, "intermediate": M,
            "max_positions": P, "pad_id": 1, "proj": "mlp",
        },
    })
    params = clip_mod.init_clip_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "hf.pt")
    save_clip_pt(path, params, cfg)
    loaded, _bank, _meta = load_clip_pt(path, cfg)

    ids = jnp.asarray(np.random.default_rng(0).integers(2, V, size=(2, 10)).astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(clip_mod.encode_text(params, cfg, ids)),
        np.asarray(clip_mod.encode_text(loaded, cfg, ids)), atol=1e-6,
    )


# ---------------------------------------------------------------------------
# Encoder-decoder families: the reference consumes AutoModel(...).encoder
# (hf_model.py:124-126) — parity vs the live T5/M2M100 ENCODERS
# ---------------------------------------------------------------------------

def tiny_mt5():
    cfg = transformers.MT5Config(
        vocab_size=V, d_model=D, d_kv=8, d_ff=M, num_layers=L, num_heads=H,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        dropout_rate=0.0, feed_forward_proj="gated-gelu", pad_token_id=0,
    )
    torch.manual_seed(3)
    return transformers.MT5EncoderModel(cfg).eval()


def tiny_m2m():
    cfg = transformers.M2M100Config(
        vocab_size=V, d_model=D, encoder_layers=L, decoder_layers=L,
        encoder_attention_heads=H, decoder_attention_heads=H,
        encoder_ffn_dim=M, decoder_ffn_dim=M, max_position_embeddings=P,
        pad_token_id=1, scale_embedding=True, dropout=0.0,
        activation_dropout=0.0, attention_dropout=0.0,
        activation_function="relu",
    )
    torch.manual_seed(4)
    return transformers.M2M100Model(cfg).eval()


def test_mt5_encoder_parity():
    model = tiny_mt5()
    ids = make_ids(0, np.random.default_rng(5))
    cfg = HFTextConfig(
        model_type="mt5", vocab_size=V, width=D, layers=L, heads=H,
        intermediate=M, d_kv=8, rel_buckets=8, rel_max_distance=20,
        max_positions=P, pad_id=0, ln_eps=1e-6, pooler_type="mean_pooler",
    )
    params = import_hf_state_dict(model.state_dict(), cfg)
    ours = np.asarray(hf_text_forward(params, cfg, jnp.asarray(ids.astype(np.int32)),
                                      embed_dim=D, dtype=jnp.float32))
    out = hf_hidden_and_pooler(model, ids, 0).last_hidden_state.numpy()
    mask = (ids != 0).astype(np.float32)[..., None]
    want = (out * mask).sum(1) / mask.sum(1)
    np.testing.assert_allclose(ours, want, atol=2e-5, rtol=1e-4)


def test_m2m_encoder_parity():
    model = tiny_m2m()
    ids = make_ids(1, np.random.default_rng(6))
    ids[:, 0] = 2  # language-code position (ClsPooler reads token 0)
    cfg = HFTextConfig(
        model_type="m2m_100", vocab_size=V, width=D, layers=L, heads=H,
        intermediate=M, max_positions=P, pad_id=1, ln_eps=1e-5,
        scale_embedding=True, pooler_type="cls_pooler",
    )
    params = import_hf_state_dict(model.state_dict(), cfg)
    assert "pooler_w" not in params  # M2M100 has no tanh pooler head
    ours = np.asarray(hf_text_forward(params, cfg, jnp.asarray(ids.astype(np.int32)),
                                      embed_dim=D, dtype=jnp.float32))
    mask = torch.tensor((ids != 1).astype(np.int64))
    with torch.no_grad():
        out = model.encoder(input_ids=torch.tensor(ids), attention_mask=mask)
    want = out.last_hidden_state.numpy()[:, 0]  # cls_pooler
    np.testing.assert_allclose(ours, want, atol=2e-5, rtol=1e-4)


def test_encdec_export_roundtrip():
    # export emits the reference checkpoint layout (bare encoder namespace);
    # re-import must be the identity
    from latteclip_tpu.models.hf_text import export_hf_state_dict

    for make, cfg in (
        (tiny_mt5, HFTextConfig(model_type="mt5", vocab_size=V, width=D,
                                layers=L, heads=H, intermediate=M, d_kv=8,
                                rel_buckets=8, rel_max_distance=20,
                                max_positions=P, pad_id=0)),
        (tiny_m2m, HFTextConfig(model_type="m2m_100", vocab_size=V, width=D,
                                layers=L, heads=H, intermediate=M,
                                max_positions=P, pad_id=1, scale_embedding=True)),
    ):
        params = import_hf_state_dict(make().state_dict(), cfg)
        sd = export_hf_state_dict(params, cfg)
        assert not any(k.startswith("encoder.") for k in sd)
        again = import_hf_state_dict(sd, cfg)
        jax.tree.map(np.testing.assert_array_equal, params, again)


def test_encdec_configs_resolve_and_init():
    from latteclip_tpu.core.config import get_model_config

    for name in ("mt5-base-ViT-B-32", "nllb-clip-base", "nllb-clip-base-siglip"):
        cfg = get_model_config(name)
        assert cfg.text.model_type in ("mt5", "m2m_100")
    # init path builds the right param tree for a tiny t5-style config
    tiny = HFTextConfig(model_type="mt5", vocab_size=V, width=D, layers=L,
                        heads=H, intermediate=M, d_kv=8, rel_buckets=8,
                        pad_id=0, proj_type="linear")
    p = init_hf_text_params(jax.random.PRNGKey(0), tiny, 16)
    assert p["rel_bias"].shape == (8, H) and p["proj_w"].shape == (D, 16)
    out = hf_text_forward(p, tiny, jnp.ones((2, 9), jnp.int32),
                          embed_dim=16, dtype=jnp.float32)
    assert out.shape == (2, 16) and np.isfinite(np.asarray(out)).all()
