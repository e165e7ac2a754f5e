"""big_vision .npz importer parity (core/big_vision.py).

A synthetic SigLIP-schema checkpoint is generated with big_vision's exact
key layout and flax shapes, imported, and the package's forward is compared
against an independent numpy/jax oracle implementing the big_vision math
directly from the raw npz arrays (flax MHA with (D, H, hd) kernels, tanh
gelu, MAPHead probe attention, last-token text pooling). Reference mapping:
``src/open_clip/big_vision.py:9-134``.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from latteclip_tpu.core.big_vision import load_big_vision_npz
from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.models import clip as clip_mod

D, H, LAYERS = 16, 4, 2
PATCH, IMG = 4, 8
VOCAB, CTX = 50, 8
MLP = 32


def tiny_cfg():
    return config_from_dict("tiny-siglip", {
        "embed_dim": D,
        "init_logit_bias": -10.0,
        "gelu_tanh": True,
        "compute_dtype": "float32",
        "vision_cfg": {
            "image_size": IMG, "patch_size": PATCH, "width": D,
            "layers": LAYERS, "head_width": D // H, "mlp_ratio": MLP / D,
            "pool_type": "map", "no_cls_token": True, "no_ln_pre": True,
        },
        "text_cfg": {
            "context_length": CTX, "vocab_size": VOCAB, "width": D,
            "heads": H, "layers": LAYERS, "mlp_ratio": MLP / D,
            "no_causal_mask": True, "pool_type": "last",
        },
    })


def _mha_keys(rng, prefix, store):
    hd = D // H
    for n in ("query", "key", "value"):
        store[f"{prefix}{n}/kernel"] = rng.standard_normal((D, H, hd)).astype(np.float32) * 0.2
        store[f"{prefix}{n}/bias"] = rng.standard_normal((H, hd)).astype(np.float32) * 0.05
    store[f"{prefix}out/kernel"] = rng.standard_normal((H, hd, D)).astype(np.float32) * 0.2
    store[f"{prefix}out/bias"] = rng.standard_normal((D,)).astype(np.float32) * 0.05


def _block_keys(rng, prefix, store):
    store[f"{prefix}LayerNorm_0/scale"] = 1 + rng.standard_normal(D).astype(np.float32) * 0.05
    store[f"{prefix}LayerNorm_0/bias"] = rng.standard_normal(D).astype(np.float32) * 0.05
    store[f"{prefix}LayerNorm_1/scale"] = 1 + rng.standard_normal(D).astype(np.float32) * 0.05
    store[f"{prefix}LayerNorm_1/bias"] = rng.standard_normal(D).astype(np.float32) * 0.05
    _mha_keys(rng, f"{prefix}MultiHeadDotProductAttention_0/", store)
    store[f"{prefix}MlpBlock_0/Dense_0/kernel"] = rng.standard_normal((D, MLP)).astype(np.float32) * 0.2
    store[f"{prefix}MlpBlock_0/Dense_0/bias"] = rng.standard_normal(MLP).astype(np.float32) * 0.05
    store[f"{prefix}MlpBlock_0/Dense_1/kernel"] = rng.standard_normal((MLP, D)).astype(np.float32) * 0.2
    store[f"{prefix}MlpBlock_0/Dense_1/bias"] = rng.standard_normal(D).astype(np.float32) * 0.05


@pytest.fixture(scope="module")
def npz_path(tmp_path_factory):
    rng = np.random.default_rng(0)
    grid = IMG // PATCH
    store = {
        "params/img/embedding/kernel": rng.standard_normal((PATCH, PATCH, 3, D)).astype(np.float32) * 0.2,
        "params/img/embedding/bias": rng.standard_normal(D).astype(np.float32) * 0.05,
        "params/img/pos_embedding": rng.standard_normal((1, grid * grid, D)).astype(np.float32) * 0.1,
        "params/img/Transformer/encoder_norm/scale": 1 + rng.standard_normal(D).astype(np.float32) * 0.05,
        "params/img/Transformer/encoder_norm/bias": rng.standard_normal(D).astype(np.float32) * 0.05,
        "params/img/MAPHead_0/probe": rng.standard_normal((1, 1, D)).astype(np.float32) * 0.2,
        "params/img/MAPHead_0/LayerNorm_0/scale": 1 + rng.standard_normal(D).astype(np.float32) * 0.05,
        "params/img/MAPHead_0/LayerNorm_0/bias": rng.standard_normal(D).astype(np.float32) * 0.05,
        "params/txt/Embed_0/embedding": rng.standard_normal((VOCAB, D)).astype(np.float32) * 0.2,
        "params/txt/pos_embedding": rng.standard_normal((1, CTX, D)).astype(np.float32) * 0.1,
        "params/txt/Encoder_0/encoder_norm/scale": 1 + rng.standard_normal(D).astype(np.float32) * 0.05,
        "params/txt/Encoder_0/encoder_norm/bias": rng.standard_normal(D).astype(np.float32) * 0.05,
        "params/txt/head/kernel": rng.standard_normal((D, D)).astype(np.float32) * 0.2,
        "params/txt/head/bias": rng.standard_normal(D).astype(np.float32) * 0.05,
        "params/t": np.asarray([2.3], np.float32),
        "params/b": np.asarray([-10.0], np.float32),
    }
    _mha_keys(rng, "params/img/MAPHead_0/MultiHeadDotProductAttention_0/", store)
    for blk in ("params/img/MAPHead_0/MlpBlock_0/",):
        store[f"{blk}Dense_0/kernel"] = rng.standard_normal((D, MLP)).astype(np.float32) * 0.2
        store[f"{blk}Dense_0/bias"] = rng.standard_normal(MLP).astype(np.float32) * 0.05
        store[f"{blk}Dense_1/kernel"] = rng.standard_normal((MLP, D)).astype(np.float32) * 0.2
        store[f"{blk}Dense_1/bias"] = rng.standard_normal(D).astype(np.float32) * 0.05
    for i in range(LAYERS):
        _block_keys(rng, f"params/img/Transformer/encoderblock_{i}/", store)
        _block_keys(rng, f"params/txt/Encoder_0/encoderblock_{i}/", store)
    path = tmp_path_factory.mktemp("bv") / "siglip.npz"
    np.savez(str(path), **store)
    return str(path)


# ---------------------------------------------------------------------------
# oracle: big_vision forward math straight from the npz arrays (f64 numpy)
# ---------------------------------------------------------------------------

def _ln(x, scale, bias, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)))


def _softmax(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(-1, keepdims=True)


def _oracle_attn(w, prefix, q_in, kv_in):
    hd = D // H
    q = np.einsum("bld,dhk->blhk", q_in, w[f"{prefix}query/kernel"]) + w[f"{prefix}query/bias"]
    k = np.einsum("bld,dhk->blhk", kv_in, w[f"{prefix}key/kernel"]) + w[f"{prefix}key/bias"]
    v = np.einsum("bld,dhk->blhk", kv_in, w[f"{prefix}value/kernel"]) + w[f"{prefix}value/bias"]
    s = np.einsum("blhk,bmhk->bhlm", q / np.sqrt(hd), k)
    p = _softmax(s)
    o = np.einsum("bhlm,bmhk->blhk", p, v)
    return np.einsum("blhk,hkd->bld", o, w[f"{prefix}out/kernel"]) + w[f"{prefix}out/bias"]


def _oracle_block(w, prefix, x):
    y = _ln(x, w[f"{prefix}LayerNorm_0/scale"], w[f"{prefix}LayerNorm_0/bias"])
    x = x + _oracle_attn(w, f"{prefix}MultiHeadDotProductAttention_0/", y, y)
    y = _ln(x, w[f"{prefix}LayerNorm_1/scale"], w[f"{prefix}LayerNorm_1/bias"])
    h = _gelu_tanh(y @ w[f"{prefix}MlpBlock_0/Dense_0/kernel"] + w[f"{prefix}MlpBlock_0/Dense_0/bias"])
    return x + h @ w[f"{prefix}MlpBlock_0/Dense_1/kernel"] + w[f"{prefix}MlpBlock_0/Dense_1/bias"]


def _oracle_image(w, images):
    B = images.shape[0]
    gh = IMG // PATCH
    x = images.reshape(B, gh, PATCH, gh, PATCH, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, gh * gh, -1) @ w["params/img/embedding/kernel"].reshape(-1, D)
    x = x + w["params/img/embedding/bias"] + w["params/img/pos_embedding"][0]
    for i in range(LAYERS):
        x = _oracle_block(w, f"params/img/Transformer/encoderblock_{i}/", x)
    x = _ln(x, w["params/img/Transformer/encoder_norm/scale"],
            w["params/img/Transformer/encoder_norm/bias"])
    mp = "params/img/MAPHead_0/"
    probe = np.broadcast_to(w[f"{mp}probe"], (B, 1, D))
    o = _oracle_attn(w, f"{mp}MultiHeadDotProductAttention_0/", probe, x)
    y = _ln(o, w[f"{mp}LayerNorm_0/scale"], w[f"{mp}LayerNorm_0/bias"])
    h = _gelu_tanh(y @ w[f"{mp}MlpBlock_0/Dense_0/kernel"] + w[f"{mp}MlpBlock_0/Dense_0/bias"])
    o = o + h @ w[f"{mp}MlpBlock_0/Dense_1/kernel"] + w[f"{mp}MlpBlock_0/Dense_1/bias"]
    return o[:, 0]


def _oracle_text(w, ids):
    x = w["params/txt/Embed_0/embedding"][ids] + w["params/txt/pos_embedding"][0]
    for i in range(LAYERS):
        x = _oracle_block(w, f"params/txt/Encoder_0/encoderblock_{i}/", x)
    x = _ln(x, w["params/txt/Encoder_0/encoder_norm/scale"],
            w["params/txt/Encoder_0/encoder_norm/bias"])
    return x[:, -1] @ w["params/txt/head/kernel"] + w["params/txt/head/bias"]


def test_import_shapes_and_scalars(npz_path):
    cfg = tiny_cfg()
    params = load_big_vision_npz(npz_path, cfg)
    assert params["visual"]["patch_kernel"].shape == (PATCH * PATCH * 3, D)
    assert params["visual"]["blocks"]["in_proj_w"].shape == (LAYERS, D, 3 * D)
    assert params["visual"]["map_head"]["probe"].shape == (1, D)
    assert "proj" not in params["visual"]
    assert params["text"]["text_projection_b"].shape == (D,)
    assert params["logit_scale"] == pytest.approx(2.3)
    assert params["logit_bias"] == pytest.approx(-10.0)


def test_image_forward_matches_big_vision_math(npz_path):
    cfg = tiny_cfg()
    params = load_big_vision_npz(npz_path, cfg)
    w = {k: np.asarray(v, np.float64) for k, v in np.load(npz_path).items()}
    rng = np.random.default_rng(1)
    images = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)

    ours = np.asarray(clip_mod.encode_image(params, cfg, jnp.asarray(images)))
    want = _oracle_image(w, images.astype(np.float64))
    np.testing.assert_allclose(ours, want, atol=2e-4, rtol=2e-4)


def test_text_forward_matches_big_vision_math(npz_path):
    cfg = tiny_cfg()
    params = load_big_vision_npz(npz_path, cfg)
    w = {k: np.asarray(v, np.float64) for k, v in np.load(npz_path).items()}
    rng = np.random.default_rng(2)
    ids = rng.integers(0, VOCAB, size=(3, CTX)).astype(np.int32)

    ours = np.asarray(clip_mod.encode_text(params, cfg, jnp.asarray(ids)))
    want = _oracle_text(w, ids)
    # f32 vs f64 accumulation order over 2 layers; the LN-eps delta
    # (ours 1e-5 vs flax 1e-6) also contributes ~5e-6 relative
    np.testing.assert_allclose(ours, want, atol=5e-4, rtol=2e-3)


def test_siglip_config_registered():
    from latteclip_tpu.core.config import get_model_config

    cfg = get_model_config("ViT-B-16-SigLIP")
    assert cfg.vision.no_cls_token and cfg.vision.pool_type == "map"
    assert cfg.text.no_causal_mask and cfg.text.pool_type == "last"
    assert cfg.init_logit_bias == -10.0 and cfg.gelu_tanh

    params = clip_mod.init_clip_params(jax.random.PRNGKey(0), tiny_cfg())
    assert "logit_bias" in params and "class_embedding" not in params["visual"]


def test_siglip_checkpoint_roundtrip(npz_path, tmp_path):
    """SigLIP params survive the OpenCLIP-format .pt save/load cycle
    (map_head/patch_bias/proj-less vision, text proj bias, logit bias)."""
    from latteclip_tpu.core.checkpoint import load_clip_pt, save_clip_pt

    cfg = tiny_cfg()
    params = load_big_vision_npz(npz_path, cfg)
    path = str(tmp_path / "siglip.pt")
    save_clip_pt(path, params, cfg)
    loaded, _bank, _meta = load_big_vision_roundtrip = load_clip_pt(path, cfg)

    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32))
    a = np.asarray(clip_mod.encode_image(params, cfg, imgs))
    b = np.asarray(clip_mod.encode_image(loaded, cfg, imgs))
    np.testing.assert_allclose(a, b, atol=1e-6)
    ids = jnp.asarray(rng.integers(0, VOCAB, size=(2, CTX)).astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(clip_mod.encode_text(params, cfg, ids)),
        np.asarray(clip_mod.encode_text(loaded, cfg, ids)), atol=1e-6,
    )
    assert float(loaded["logit_bias"]) == pytest.approx(-10.0)


def test_siglip_preprocessing_metadata():
    """SigLIP configs carry inception normalization + squash resize, and the
    normalize sites consume them (review finding: the metadata existed only
    in the registry and every call hardcoded OpenAI stats)."""
    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.data import transforms as T

    cfg = get_model_config("ViT-B-16-SigLIP")
    assert cfg.image_mean == (0.5, 0.5, 0.5) and cfg.image_std == (0.5, 0.5, 0.5)
    assert cfg.resize_mode == "squash"
    mean, std = T.model_mean_std(cfg)
    assert mean == (0.5, 0.5, 0.5)

    clip_cfg = get_model_config("ViT-B-32")
    assert T.model_mean_std(clip_cfg) == (T.OPENAI_MEAN, T.OPENAI_STD)

    # the stats actually change the computed features
    x = np.full((1, 8, 8, 3), 128, np.uint8)
    a = np.asarray(T.normalize_images(jnp.asarray(x), mean, std))
    b = np.asarray(T.normalize_images(jnp.asarray(x)))
    assert not np.allclose(a, b)
    np.testing.assert_allclose(a, (128 / 255 - 0.5) / 0.5, atol=1e-4)


def test_npz_loads_through_load_clip_pt(npz_path, tmp_path):
    """load_clip_pt dispatches .npz to the big_vision importer (review
    finding: the importer previously had no caller on the checkpoint path)."""
    from latteclip_tpu.core.checkpoint import load_clip_pt

    cfg = tiny_cfg()
    params, bank, meta = load_clip_pt(npz_path, cfg)
    assert bank == {} and meta == {}
    assert "map_head" in params["visual"]
    rng = np.random.default_rng(9)
    imgs = jnp.asarray(rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32))
    direct = load_big_vision_npz(npz_path, cfg)
    np.testing.assert_allclose(
        np.asarray(clip_mod.encode_image(params, cfg, imgs)),
        np.asarray(clip_mod.encode_image(direct, cfg, imgs)), atol=1e-6,
    )
