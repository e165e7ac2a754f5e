"""HuggingFace-architecture text towers, implemented natively in JAX.

Counterpart of the reference's ``HFTextEncoder``
(``src/open_clip/hf_model.py:96-169``), which wraps torch ``AutoModel``.
Here the BERT family (bert / roberta / xlm-roberta) is implemented directly
as a post-LN masked encoder over stacked params (lax.scan, like the CLIP
towers). The encoder-decoder families the reference reaches through
``AutoModel(...).encoder`` (hf_model.py:124-126) are also native:

* ``mt5`` — the T5 encoder stack: RMSNorm (no bias / no mean subtraction),
  bucketed relative position bias shared across layers, UNSCALED attention
  logits (the 1/sqrt(d) is folded into T5's init), gated-GELU feed-forward,
  no absolute position table;
* ``m2m_100`` (NLLB) — pre-LN encoder with fairseq sinusoidal position
  embeddings (pad-offset ids, table offset 2), sqrt(d_model) embedding
  scale, ReLU feed-forward, final LayerNorm.

Shared machinery for every family:

* the pooler registry — ``mean_pooler`` / ``max_pooler`` / ``cls_pooler``
  (+ tanh pooler head) / ``cls_last_hidden_state_pooler``
  (reference hf_model.py:36-93);
* projection types — identity / ``linear`` / ``mlp``
  (reference hf_model.py:141-152);
* RoBERTa's pad-offset position ids (positions start at ``pad_id + 1``
  and pad tokens keep ``pad_id``);
* weight import from an HF torch ``state_dict`` (works with the package's
  torch-free ``.pt``/safetensors readers or a live ``transformers`` model).

Masked attention runs in plain XLA (einsum + additive mask): HF context
lengths here are short (≤512) and batch-dominated; padding masks make the
flash kernel's causal-only interface inapplicable.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.models import layers
from latteclip_tpu.models.layers import Params

NEG_INF = -1e9

# Known HF config dims so registry JSON configs resolve without network
# access (values from the models' published config.json).
KNOWN_HF_CONFIGS = {
    "roberta-base": dict(model_type="roberta", vocab_size=50265, width=768,
                         layers=12, heads=12, intermediate=3072,
                         max_positions=514, pad_id=1, ln_eps=1e-5),
    "xlm-roberta-base": dict(model_type="xlm-roberta", vocab_size=250002,
                             width=768, layers=12, heads=12, intermediate=3072,
                             max_positions=514, pad_id=1, ln_eps=1e-5),
    "xlm-roberta-large": dict(model_type="xlm-roberta", vocab_size=250002,
                              width=1024, layers=24, heads=16, intermediate=4096,
                              max_positions=514, pad_id=1, ln_eps=1e-5),
    "bert-base-uncased": dict(model_type="bert", vocab_size=30522, width=768,
                              layers=12, heads=12, intermediate=3072,
                              max_positions=512, pad_id=0, ln_eps=1e-12),
    # T5 encoders have no absolute position table; max_positions is unused.
    "google/mt5-base": dict(model_type="mt5", vocab_size=250112, width=768,
                            layers=12, heads=12, intermediate=2048, d_kv=64,
                            max_positions=512, pad_id=0, ln_eps=1e-6),
    "google/mt5-xl": dict(model_type="mt5", vocab_size=250112, width=2048,
                          layers=24, heads=32, intermediate=5120, d_kv=64,
                          max_positions=512, pad_id=0, ln_eps=1e-6),
    "facebook/nllb-200-distilled-600M": dict(
        model_type="m2m_100", vocab_size=256206, width=1024, layers=12,
        heads=16, intermediate=4096, max_positions=1024, pad_id=1,
        ln_eps=1e-5, scale_embedding=True),
    "facebook/nllb-200-distilled-1.3B": dict(
        model_type="m2m_100", vocab_size=256206, width=1024, layers=24,
        heads=16, intermediate=8192, max_positions=1024, pad_id=1,
        ln_eps=1e-5, scale_embedding=True),
}


@dataclasses.dataclass(frozen=True)
class HFTextConfig:
    """Text-tower config for an HF-architecture encoder (selected by
    ``"hf_model_name"`` in a model JSON's ``text_cfg``, like the reference
    factory, model.py:141-150)."""

    model_name: str = ""
    tokenizer_name: str = ""        # hf_tokenizer_name from the model JSON
    model_type: str = "roberta"     # 'bert' | 'roberta' | 'xlm-roberta'
    vocab_size: int = 50265
    width: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 514
    type_vocab_size: int = 1
    pad_id: int = 1
    ln_eps: float = 1e-5
    context_length: int = 77        # tokenizer padding length
    pooler_type: str = "mean_pooler"
    proj_type: Optional[str] = None  # None | 'linear' | 'mlp'
    # T5-family (mt5) geometry: per-head dim is d_kv (total inner dim
    # heads*d_kv may differ from width) + relative-position-bias bucketing
    d_kv: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128
    # m2m_100: multiply token embeddings by sqrt(width) (fairseq convention)
    scale_embedding: bool = False

    @property
    def position_offset(self) -> int:
        # RoBERTa/M2M100 position ids start at pad_id + 1 (HF
        # create_position_ids_from_input_ids); BERT starts at 0
        return self.pad_id + 1 if self.model_type in ("roberta", "xlm-roberta", "m2m_100") else 0


def hf_text_config(text_raw: Dict) -> HFTextConfig:
    """Build an :class:`HFTextConfig` from a model JSON ``text_cfg`` dict
    carrying ``hf_model_name`` (reference model.py:141-150 + hf_model.py)."""
    from latteclip_tpu.models.hf_configs import SUPPORTED_MODEL_TYPES, arch_dict

    name = text_raw.get("hf_model_name", "")
    base = dict(KNOWN_HF_CONFIGS.get(name, {}))
    explicit = {k: v for k, v in text_raw.items()
                if k in {f.name for f in dataclasses.fields(HFTextConfig)}}
    base.update(explicit)
    mt = base.get("model_type", "roberta")
    if mt not in SUPPORTED_MODEL_TYPES:
        raise ValueError(
            f"hf model_type '{mt}' has no native tower (supported: "
            f"{SUPPORTED_MODEL_TYPES}); registry entry: {arch_dict.get(mt)}"
        )
    if name and name not in KNOWN_HF_CONFIGS and not {"width", "layers"} <= set(explicit):
        # NEVER fall back to roberta-base dims for an unknown hub name: the
        # silently wrong architecture fails much later with misleading errors
        raise ValueError(
            f"hf_model_name {name!r} is not in KNOWN_HF_CONFIGS and the "
            "text_cfg does not specify its dimensions; add width/layers/"
            "heads/intermediate/vocab_size/max_positions explicitly"
        )
    base["model_name"] = name
    base["tokenizer_name"] = text_raw.get("hf_tokenizer_name", name)
    # reference JSON key spellings: hf_pooler_type / hf_proj_type / proj
    if text_raw.get("hf_pooler_type") is not None:
        base["pooler_type"] = text_raw["hf_pooler_type"]
    if "pooler_type" not in base or base.get("pooler_type") is None:
        base["pooler_type"] = arch_dict[mt]["pooler"]
    for key in ("proj", "hf_proj_type"):
        if text_raw.get(key) is not None:
            base["proj_type"] = text_raw[key]
    if base.get("proj_type") is None:
        # reference CLIPTextCfg.hf_proj_type defaults to 'mlp' (model.py:202)
        # and is always passed through (model.py:306), so configs that omit
        # the key get the width->(width+embed)/2->embed GELU MLP, even when
        # width == embed_dim (hf_model.py:142-150 only builds Identity when
        # proj_type is None, which the factory never passes).
        base["proj_type"] = "mlp"
    return HFTextConfig(**base)


def _add_proj_params(params, cfg, embed_dim, normal, D):
    proj = cfg.proj_type
    if proj is None and D != embed_dim:
        proj = "linear"  # a projection is mandatory when dims differ
    if proj == "linear":
        params["proj_w"] = normal((D, embed_dim))
    elif proj == "mlp":
        hidden = (D + embed_dim) // 2
        params["proj1_w"] = normal((D, hidden))
        params["proj2_w"] = normal((hidden, embed_dim))
    return params


def _init_t5_params(rng: jax.Array, cfg: HFTextConfig, embed_dim: int) -> Params:
    D, L, M, inner = cfg.width, cfg.layers, cfg.intermediate, cfg.heads * cfg.d_kv
    k = iter(jax.random.split(rng, 16))
    normal = lambda shape, s=1.0: jax.random.normal(next(k), shape) * s  # noqa: E731
    # T5 init folds the attention scale into the weights (factor=1.0 scheme)
    blocks = {
        "q_w": normal((L, D, inner), (D * cfg.d_kv) ** -0.5),
        "k_w": normal((L, D, inner), D ** -0.5),
        "v_w": normal((L, D, inner), D ** -0.5),
        "o_w": normal((L, inner, D), inner ** -0.5),
        "ln1_scale": jnp.ones((L, D)),
        "wi0_w": normal((L, D, M), D ** -0.5),
        "wi1_w": normal((L, D, M), D ** -0.5),
        "wo_w": normal((L, M, D), M ** -0.5),
        "ln2_scale": jnp.ones((L, D)),
    }
    params = {
        "word_emb": normal((cfg.vocab_size, D)),
        "rel_bias": normal((cfg.rel_buckets, cfg.heads), (D // cfg.heads) ** -0.5),
        "final_ln_scale": jnp.ones((D,)),
        "blocks": blocks,
    }
    return _add_proj_params(params, cfg, embed_dim, lambda s: normal(s, 0.02), D)


def _init_m2m_params(rng: jax.Array, cfg: HFTextConfig, embed_dim: int) -> Params:
    D, L, M = cfg.width, cfg.layers, cfg.intermediate
    k = iter(jax.random.split(rng, 16))
    s = 0.02
    normal = lambda shape: jax.random.normal(next(k), shape) * s  # noqa: E731
    blocks = {
        "q_w": normal((L, D, D)), "q_b": jnp.zeros((L, D)),
        "k_w": normal((L, D, D)), "k_b": jnp.zeros((L, D)),
        "v_w": normal((L, D, D)), "v_b": jnp.zeros((L, D)),
        "o_w": normal((L, D, D)), "o_b": jnp.zeros((L, D)),
        "ln1_scale": jnp.ones((L, D)), "ln1_bias": jnp.zeros((L, D)),
        "fc1_w": normal((L, D, M)), "fc1_b": jnp.zeros((L, M)),
        "fc2_w": normal((L, M, D)), "fc2_b": jnp.zeros((L, D)),
        "ln2_scale": jnp.ones((L, D)), "ln2_bias": jnp.zeros((L, D)),
    }
    params = {
        "word_emb": normal((cfg.vocab_size, D)),
        "final_ln_scale": jnp.ones((D,)), "final_ln_bias": jnp.zeros((D,)),
        "blocks": blocks,
    }
    return _add_proj_params(params, cfg, embed_dim, normal, D)


def init_hf_text_params(rng: jax.Array, cfg: HFTextConfig, embed_dim: int) -> Params:
    if cfg.model_type == "mt5":
        return _init_t5_params(rng, cfg, embed_dim)
    if cfg.model_type == "m2m_100":
        return _init_m2m_params(rng, cfg, embed_dim)
    D, L, M = cfg.width, cfg.layers, cfg.intermediate
    k = iter(jax.random.split(rng, 24))
    s = 0.02  # HF BertConfig initializer_range default

    def normal(shape):
        return jax.random.normal(next(k), shape) * s

    blocks = {
        "q_w": normal((L, D, D)), "q_b": jnp.zeros((L, D)),
        "k_w": normal((L, D, D)), "k_b": jnp.zeros((L, D)),
        "v_w": normal((L, D, D)), "v_b": jnp.zeros((L, D)),
        "attn_out_w": normal((L, D, D)), "attn_out_b": jnp.zeros((L, D)),
        "attn_ln_scale": jnp.ones((L, D)), "attn_ln_bias": jnp.zeros((L, D)),
        "inter_w": normal((L, D, M)), "inter_b": jnp.zeros((L, M)),
        "out_w": normal((L, M, D)), "out_b": jnp.zeros((L, D)),
        "out_ln_scale": jnp.ones((L, D)), "out_ln_bias": jnp.zeros((L, D)),
    }
    params = {
        "word_emb": normal((cfg.vocab_size, D)),
        "pos_emb": normal((cfg.max_positions, D)),
        "type_emb": normal((cfg.type_vocab_size, D)),
        "emb_ln_scale": jnp.ones((D,)), "emb_ln_bias": jnp.zeros((D,)),
        "blocks": blocks,
    }
    if cfg.pooler_type == "cls_pooler":
        params["pooler_w"] = normal((D, D))
        params["pooler_b"] = jnp.zeros((D,))
    return _add_proj_params(params, cfg, embed_dim, normal, D)


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _rms(x, scale, eps):
    # T5LayerNorm: no mean subtraction, no bias; variance in f32
    xf = x.astype(jnp.float32)
    var = (xf * xf).mean(-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(x.dtype)


def _t5_rel_buckets(T: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """Bidirectional T5 relative-position buckets [T, T] (HF
    ``T5Attention._relative_position_bucket``): half the buckets for each
    sign, half of those exact, the rest log-spaced out to max_distance."""
    ctx = np.arange(T)
    rel = ctx[None, :] - ctx[:, None]          # memory_pos - query_pos
    nb = num_buckets // 2
    ret = (rel > 0).astype(np.int32) * nb
    n = np.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int32)
    return ret + np.where(n < max_exact, n, np.minimum(large, nb - 1))


def _sinusoid_table(n_pos: int, dim: int, padding_idx: int) -> np.ndarray:
    """fairseq/M2M100 sinusoidal table [n_pos, dim]: first half sin, second
    half cos (NOT interleaved), zeroed at padding_idx (HF
    ``M2M100SinusoidalPositionalEmbedding.get_embedding``)."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(np.log(10000.0) / (half - 1)))
    ang = np.arange(n_pos, dtype=np.float64)[:, None] * freq[None, :]
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        emb = np.concatenate([emb, np.zeros((n_pos, 1))], axis=1)
    emb[padding_idx] = 0.0
    return emb.astype(np.float32)


def _pool_project(x, mask, params, cfg, dtype):
    """Shared pooler registry + projection head (reference
    hf_model.py:36-93,141-152). ``x``: [B, T, D] f32, ``mask``: [B, T]."""
    maskf = mask.astype(jnp.float32)
    if cfg.pooler_type == "mean_pooler":
        pooled = (x * maskf[:, :, None]).sum(1) / maskf.sum(1, keepdims=True)
    elif cfg.pooler_type == "max_pooler":
        pooled = jnp.where(maskf[:, :, None] == 0, -jnp.inf, x).max(axis=1)
    elif cfg.pooler_type == "cls_pooler":
        pooled = x[:, 0]
        if "pooler_w" in params:  # HF tanh pooler head (BertPooler)
            pooled = jnp.tanh(
                layers.dense(pooled.astype(jnp.float32), params["pooler_w"],
                             params["pooler_b"], jnp.float32)
            )
    elif cfg.pooler_type == "cls_last_hidden_state_pooler":
        pooled = x[:, 0]
    else:
        raise ValueError(f"unknown pooler_type: {cfg.pooler_type}")

    pooled = pooled.astype(dtype)
    if "proj_w" in params:
        pooled = layers.dense(pooled, params["proj_w"], None, dtype)
    elif "proj1_w" in params:
        h = layers.gelu(layers.dense(pooled, params["proj1_w"], None, dtype))
        pooled = layers.dense(h, params["proj2_w"], None, dtype)
    return pooled.astype(jnp.float32)


def _t5_forward(params, cfg, tokens, *, dtype, remat):
    from latteclip_tpu.kernels import xla_attention

    mask = (tokens != cfg.pad_id).astype(jnp.int32)
    B, T = tokens.shape
    H, dk = cfg.heads, cfg.d_kv
    inner = H * dk
    x = params["word_emb"][tokens].astype(dtype)  # no pos table, no scale
    # position bias: layer 0's relative_attention_bias, shared by all layers,
    # with the pad mask folded in (HF T5Stack adds the extended mask into it)
    buckets = _t5_rel_buckets(T, cfg.rel_buckets, cfg.rel_max_distance)
    rel = jnp.transpose(params["rel_bias"][buckets], (2, 0, 1))  # [H, T, T]
    bias = rel[None].astype(jnp.float32) + jnp.where(
        mask == 0, NEG_INF, 0.0
    ).astype(jnp.float32)[:, None, None, :]

    def body(carry, p):
        h = _rms(carry, p["ln1_scale"], cfg.ln_eps).astype(dtype)
        q = layers.dense(h, p["q_w"], None, dtype).reshape(B, T, H, dk)
        k = layers.dense(h, p["k_w"], None, dtype).reshape(B, T, H, dk)
        v = layers.dense(h, p["v_w"], None, dtype).reshape(B, T, H, dk)
        # T5 attention is UNSCALED (the 1/sqrt(d) lives in the init)
        attn = xla_attention(q, k, v, dtype=dtype, bias=bias, scale=1.0)
        carry = carry + layers.dense(attn.reshape(B, T, inner), p["o_w"], None, dtype)
        h = _rms(carry, p["ln2_scale"], cfg.ln_eps).astype(dtype)
        # mt5 / T5-v1.1 gated-GELU FF ("gelu_new" = tanh approximation)
        ff = layers.gelu_tanh(layers.dense(h, p["wi0_w"], None, dtype)) \
            * layers.dense(h, p["wi1_w"], None, dtype)
        carry = carry + layers.dense(ff, p["wo_w"], None, dtype)
        return carry, None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _rms(x, params["final_ln_scale"], cfg.ln_eps).astype(jnp.float32)
    return _pool_project(x, mask, params, cfg, dtype)


def _m2m_forward(params, cfg, tokens, *, dtype, remat):
    from latteclip_tpu.kernels import xla_attention

    mask = (tokens != cfg.pad_id).astype(jnp.int32)
    B, T = tokens.shape
    # sinusoidal table rows go up to pad_id + T (position-id scheme shared
    # with RoBERTa); the table itself carries the fairseq offset of 2
    if cfg.pad_id + T >= cfg.max_positions + 2:
        raise ValueError(
            f"sequence length {T} exceeds the sinusoidal table "
            f"(max_positions={cfg.max_positions} + offset 2)"
        )
    pos_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_id
    table = jnp.asarray(_sinusoid_table(cfg.max_positions + 2, cfg.width, cfg.pad_id))
    scale = cfg.width ** 0.5 if cfg.scale_embedding else 1.0
    x = (params["word_emb"][tokens] * scale + table[pos_ids]).astype(dtype)
    mask_bias = jnp.where(mask == 0, NEG_INF, 0.0).astype(jnp.float32)[:, None, None, :]
    H = cfg.heads
    hd = cfg.width // H

    def body(carry, p):
        h = _ln(carry, p["ln1_scale"], p["ln1_bias"], cfg.ln_eps).astype(dtype)
        q = layers.dense(h, p["q_w"], p["q_b"], dtype).reshape(B, T, H, hd)
        k = layers.dense(h, p["k_w"], p["k_b"], dtype).reshape(B, T, H, hd)
        v = layers.dense(h, p["v_w"], p["v_b"], dtype).reshape(B, T, H, hd)
        attn = xla_attention(q, k, v, dtype=dtype, bias=mask_bias).reshape(B, T, cfg.width)
        carry = carry + layers.dense(attn, p["o_w"], p["o_b"], dtype)
        h = _ln(carry, p["ln2_scale"], p["ln2_bias"], cfg.ln_eps).astype(dtype)
        ff = jax.nn.relu(layers.dense(h, p["fc1_w"], p["fc1_b"], dtype))
        carry = carry + layers.dense(ff, p["fc2_w"], p["fc2_b"], dtype)
        return carry, None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _ln(x, params["final_ln_scale"], params["final_ln_bias"], cfg.ln_eps)
    return _pool_project(x.astype(jnp.float32), mask, params, cfg, dtype)


def _masked_attention(x, p, mask_bias, num_heads, dtype):
    from latteclip_tpu.kernels import xla_attention

    B, T, D = x.shape
    hd = D // num_heads
    q = layers.dense(x, p["q_w"], p["q_b"], dtype).reshape(B, T, num_heads, hd)
    k = layers.dense(x, p["k_w"], p["k_b"], dtype).reshape(B, T, num_heads, hd)
    v = layers.dense(x, p["v_w"], p["v_b"], dtype).reshape(B, T, num_heads, hd)
    out = xla_attention(q, k, v, dtype=dtype, bias=mask_bias[:, None, None, :])
    return out.reshape(B, T, D)


def hf_text_forward(
    params: Params,
    cfg: HFTextConfig,
    tokens: jnp.ndarray,
    *,
    embed_dim: int,
    dtype: jnp.dtype = jnp.bfloat16,
    remat: bool = False,
) -> jnp.ndarray:
    """Token ids [B, T] -> pooled+projected features [B, embed_dim] (f32)."""
    del embed_dim  # geometry is fixed by the param shapes
    if cfg.model_type == "mt5":
        return _t5_forward(params, cfg, tokens, dtype=dtype, remat=remat)
    if cfg.model_type == "m2m_100":
        return _m2m_forward(params, cfg, tokens, dtype=dtype, remat=remat)
    x, mask = _bert_hidden(params, cfg, tokens, dtype=dtype, remat=remat)
    return _pool_project(x, mask, params, cfg, dtype)


def hf_text_forward_tokens(
    params: Params,
    cfg: HFTextConfig,
    tokens: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``output_tokens`` forward (reference hf_model.py:154-169): token ids
    [B, T] -> (pooled+projected latent [B, E] f32, per-token hidden states).

    The hidden states are the encoder's raw (un-projected) last layer; for
    the cls poolers the cls position is dropped from the token stream (the
    reference slices ``arange(T) != cls_token_position``), for mean/max
    pooling the full sequence is returned. Feeds CoCa's multimodal decoder
    (``coca_roberta-*`` configs, reference coca_model.py:97-103,171-175).
    """
    if cfg.model_type in ("mt5", "m2m_100"):
        raise NotImplementedError(
            "output_tokens is only wired for the BERT-family towers (no "
            "reference config pairs an encoder-decoder text tower with CoCa)"
        )
    x, mask = _bert_hidden(params, cfg, tokens, dtype=dtype, remat=remat)
    pooled = _pool_project(x, mask, params, cfg, dtype)
    if cfg.pooler_type in ("cls_pooler", "cls_last_hidden_state_pooler"):
        token_embs = x[:, 1:]  # drop cls_token_position == 0
    else:
        token_embs = x
    return pooled, token_embs.astype(dtype)


def _bert_hidden(
    params: Params,
    cfg: HFTextConfig,
    tokens: jnp.ndarray,
    *,
    dtype: jnp.dtype,
    remat: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BERT-family encoder body: token ids [B, T] -> (last hidden state
    [B, T, D] f32, attention mask [B, T] int32)."""
    mask = (tokens != cfg.pad_id).astype(jnp.int32)          # [B, T]
    B, T = tokens.shape
    # static bound: RoBERTa positions reach pad_id + T; a silent JAX gather
    # clamp would reuse the last pos-embed row (HF raises an index error)
    max_pos = cfg.pad_id + T if cfg.position_offset else T - 1
    if max_pos >= cfg.max_positions:
        raise ValueError(
            f"sequence length {T} exceeds the position table "
            f"(max_positions={cfg.max_positions}, offset {cfg.position_offset})"
        )

    if cfg.position_offset:
        # RoBERTa: incremental positions over non-pad tokens, offset past pad_id
        pos_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_id
    else:
        pos_ids = jnp.broadcast_to(jnp.arange(T), (B, T))
    x = (
        params["word_emb"][tokens]
        + params["pos_emb"][pos_ids]
        + params["type_emb"][jnp.zeros_like(tokens)]
    )
    x = _ln(x, params["emb_ln_scale"], params["emb_ln_bias"], cfg.ln_eps).astype(dtype)

    mask_bias = jnp.where(mask == 0, NEG_INF, 0.0).astype(jnp.float32)

    def body(carry, p):
        attn = _masked_attention(carry, p, mask_bias, cfg.heads, dtype)
        attn = layers.dense(attn, p["attn_out_w"], p["attn_out_b"], dtype)
        h = _ln(carry + attn, p["attn_ln_scale"], p["attn_ln_bias"], cfg.ln_eps)
        inter = layers.gelu(layers.dense(h, p["inter_w"], p["inter_b"], dtype))
        out = layers.dense(inter, p["out_w"], p["out_b"], dtype)
        return _ln(h + out, p["out_ln_scale"], p["out_ln_bias"], cfg.ln_eps), None

    if remat:  # per-block gradient checkpointing, like the CLIP towers
        body = jax.checkpoint(body, prevent_cse=False)
    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x.astype(jnp.float32), mask


# ---------------------------------------------------------------------------
# HF state-dict import
# ---------------------------------------------------------------------------

def _import_t5_state_dict(sd: Dict[str, np.ndarray], cfg: HFTextConfig) -> Params:
    """T5/mt5 ENCODER naming (``block.{i}.layer.{0,1}...``) -> pytree. The
    reference stores ``AutoModel(...).encoder`` as its transformer
    (hf_model.py:124-126), so checkpoint keys carry no ``encoder.`` prefix;
    a live ``T5EncoderModel``/``MT5EncoderModel`` state_dict does — both
    are accepted (normalized by the caller)."""
    L = cfg.layers

    def lin(fmt):
        return np.stack([sd[fmt.format(i)].T for i in range(L)]).copy()

    def raw(fmt):
        return np.stack([sd[fmt.format(i)] for i in range(L)])

    blocks = {
        "q_w": lin("block.{}.layer.0.SelfAttention.q.weight"),
        "k_w": lin("block.{}.layer.0.SelfAttention.k.weight"),
        "v_w": lin("block.{}.layer.0.SelfAttention.v.weight"),
        "o_w": lin("block.{}.layer.0.SelfAttention.o.weight"),
        "ln1_scale": raw("block.{}.layer.0.layer_norm.weight"),
        "wi0_w": lin("block.{}.layer.1.DenseReluDense.wi_0.weight"),
        "wi1_w": lin("block.{}.layer.1.DenseReluDense.wi_1.weight"),
        "wo_w": lin("block.{}.layer.1.DenseReluDense.wo.weight"),
        "ln2_scale": raw("block.{}.layer.1.layer_norm.weight"),
    }
    return {
        "word_emb": sd["embed_tokens.weight"],
        "rel_bias": sd["block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
        "final_ln_scale": sd["final_layer_norm.weight"],
        "blocks": blocks,
    }


def _import_m2m_state_dict(sd: Dict[str, np.ndarray], cfg: HFTextConfig) -> Params:
    """M2M100/NLLB ENCODER naming (``layers.{i}.self_attn...``) -> pytree.
    The sinusoidal position table is recomputed, not imported (HF registers
    it as a non-persistent buffer)."""
    L = cfg.layers

    def lin(fmt):
        return np.stack([sd[fmt.format(i)].T for i in range(L)]).copy()

    def raw(fmt):
        return np.stack([sd[fmt.format(i)] for i in range(L)])

    blocks = {
        "q_w": lin("layers.{}.self_attn.q_proj.weight"),
        "q_b": raw("layers.{}.self_attn.q_proj.bias"),
        "k_w": lin("layers.{}.self_attn.k_proj.weight"),
        "k_b": raw("layers.{}.self_attn.k_proj.bias"),
        "v_w": lin("layers.{}.self_attn.v_proj.weight"),
        "v_b": raw("layers.{}.self_attn.v_proj.bias"),
        "o_w": lin("layers.{}.self_attn.out_proj.weight"),
        "o_b": raw("layers.{}.self_attn.out_proj.bias"),
        "ln1_scale": raw("layers.{}.self_attn_layer_norm.weight"),
        "ln1_bias": raw("layers.{}.self_attn_layer_norm.bias"),
        "fc1_w": lin("layers.{}.fc1.weight"),
        "fc1_b": raw("layers.{}.fc1.bias"),
        "fc2_w": lin("layers.{}.fc2.weight"),
        "fc2_b": raw("layers.{}.fc2.bias"),
        "ln2_scale": raw("layers.{}.final_layer_norm.weight"),
        "ln2_bias": raw("layers.{}.final_layer_norm.bias"),
    }
    return {
        "word_emb": sd["embed_tokens.weight"],
        "final_ln_scale": sd["layer_norm.weight"],
        "final_ln_bias": sd["layer_norm.bias"],
        "blocks": blocks,
    }


def import_hf_state_dict(state_dict: Dict, cfg: HFTextConfig) -> Params:
    """HF torch ``state_dict`` -> param pytree (dispatches on
    ``cfg.model_type``).

    Torch ``nn.Linear`` stores ``(out, in)``; kernels are transposed into
    this package's ``(in, out)`` dense convention. A leading ``bert.`` /
    ``roberta.`` prefix — or, for the encoder-decoder families, the
    ``encoder.`` prefix a live ``AutoModel`` state_dict carries — is
    stripped if present.
    """
    if cfg.model_type in ("mt5", "m2m_100"):
        sd = {}
        for k, v in state_dict.items():
            if k in ("shared.weight", "encoder.embed_positions.weights"):
                continue  # alias of embed_tokens / recomputed sinusoid table
            if k.startswith("encoder."):
                k = k[len("encoder."):]
            if k.startswith("decoder.") or k == "lm_head.weight":
                continue
            sd[k] = np.asarray(v, dtype=np.float32)
        if cfg.model_type == "mt5":
            return _import_t5_state_dict(sd, cfg)
        return _import_m2m_state_dict(sd, cfg)
    sd = {}
    for k, v in state_dict.items():
        k = k.split(".", 1)[1] if k.split(".", 1)[0] in ("bert", "roberta") else k
        sd[k] = np.asarray(v, dtype=np.float32)

    def lin_w(name):
        return sd[name].T.copy()

    L = cfg.layers
    stack = lambda fmt, tr: np.stack(  # noqa: E731
        [lin_w(fmt.format(i)) if tr else sd[fmt.format(i)] for i in range(L)]
    )
    blocks = {
        "q_w": stack("encoder.layer.{}.attention.self.query.weight", True),
        "q_b": stack("encoder.layer.{}.attention.self.query.bias", False),
        "k_w": stack("encoder.layer.{}.attention.self.key.weight", True),
        "k_b": stack("encoder.layer.{}.attention.self.key.bias", False),
        "v_w": stack("encoder.layer.{}.attention.self.value.weight", True),
        "v_b": stack("encoder.layer.{}.attention.self.value.bias", False),
        "attn_out_w": stack("encoder.layer.{}.attention.output.dense.weight", True),
        "attn_out_b": stack("encoder.layer.{}.attention.output.dense.bias", False),
        "attn_ln_scale": stack("encoder.layer.{}.attention.output.LayerNorm.weight", False),
        "attn_ln_bias": stack("encoder.layer.{}.attention.output.LayerNorm.bias", False),
        "inter_w": stack("encoder.layer.{}.intermediate.dense.weight", True),
        "inter_b": stack("encoder.layer.{}.intermediate.dense.bias", False),
        "out_w": stack("encoder.layer.{}.output.dense.weight", True),
        "out_b": stack("encoder.layer.{}.output.dense.bias", False),
        "out_ln_scale": stack("encoder.layer.{}.output.LayerNorm.weight", False),
        "out_ln_bias": stack("encoder.layer.{}.output.LayerNorm.bias", False),
    }
    params = {
        "word_emb": sd["embeddings.word_embeddings.weight"],
        "pos_emb": sd["embeddings.position_embeddings.weight"],
        "type_emb": sd["embeddings.token_type_embeddings.weight"],
        "emb_ln_scale": sd["embeddings.LayerNorm.weight"],
        "emb_ln_bias": sd["embeddings.LayerNorm.bias"],
        "blocks": blocks,
    }
    if "pooler.dense.weight" in sd and cfg.pooler_type == "cls_pooler":
        params["pooler_w"] = lin_w("pooler.dense.weight")
        params["pooler_b"] = sd["pooler.dense.bias"]
    return params


_T5_EXPORT = [
    ("q_w", "layer.0.SelfAttention.q.weight", True),
    ("k_w", "layer.0.SelfAttention.k.weight", True),
    ("v_w", "layer.0.SelfAttention.v.weight", True),
    ("o_w", "layer.0.SelfAttention.o.weight", True),
    ("ln1_scale", "layer.0.layer_norm.weight", False),
    ("wi0_w", "layer.1.DenseReluDense.wi_0.weight", True),
    ("wi1_w", "layer.1.DenseReluDense.wi_1.weight", True),
    ("wo_w", "layer.1.DenseReluDense.wo.weight", True),
    ("ln2_scale", "layer.1.layer_norm.weight", False),
]

_M2M_EXPORT = [
    ("q_w", "self_attn.q_proj.weight", True), ("q_b", "self_attn.q_proj.bias", False),
    ("k_w", "self_attn.k_proj.weight", True), ("k_b", "self_attn.k_proj.bias", False),
    ("v_w", "self_attn.v_proj.weight", True), ("v_b", "self_attn.v_proj.bias", False),
    ("o_w", "self_attn.out_proj.weight", True), ("o_b", "self_attn.out_proj.bias", False),
    ("ln1_scale", "self_attn_layer_norm.weight", False),
    ("ln1_bias", "self_attn_layer_norm.bias", False),
    ("fc1_w", "fc1.weight", True), ("fc1_b", "fc1.bias", False),
    ("fc2_w", "fc2.weight", True), ("fc2_b", "fc2.bias", False),
    ("ln2_scale", "final_layer_norm.weight", False),
    ("ln2_bias", "final_layer_norm.bias", False),
]


def export_hf_state_dict(params: Params, cfg: HFTextConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_hf_state_dict`: param pytree -> HF-naming
    torch ``state_dict`` arrays (kernels transposed back to ``(out, in)``).
    Encoder-decoder families emit the reference's checkpoint layout — the
    bare ENCODER namespace (``block.*`` / ``layers.*``), since the
    reference's transformer attribute IS the encoder (hf_model.py:124-126).
    """
    b = params["blocks"]
    if cfg.model_type in ("mt5", "m2m_100"):
        per_layer, stem = (_T5_EXPORT, "block") if cfg.model_type == "mt5" \
            else (_M2M_EXPORT, "layers")
        sd = {"embed_tokens.weight": np.asarray(params["word_emb"], np.float32)}
        if cfg.model_type == "mt5":
            sd["block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = \
                np.asarray(params["rel_bias"], np.float32)
            sd["final_layer_norm.weight"] = np.asarray(params["final_ln_scale"], np.float32)
        else:
            sd["layer_norm.weight"] = np.asarray(params["final_ln_scale"], np.float32)
            sd["layer_norm.bias"] = np.asarray(params["final_ln_bias"], np.float32)
        for i in range(cfg.layers):
            for ours, theirs, transpose in per_layer:
                arr = np.asarray(b[ours][i], np.float32)
                sd[f"{stem}.{i}.{theirs}"] = arr.T.copy() if transpose else arr
        return sd
    sd: Dict[str, np.ndarray] = {
        "embeddings.word_embeddings.weight": np.asarray(params["word_emb"], np.float32),
        "embeddings.position_embeddings.weight": np.asarray(params["pos_emb"], np.float32),
        "embeddings.token_type_embeddings.weight": np.asarray(params["type_emb"], np.float32),
        "embeddings.LayerNorm.weight": np.asarray(params["emb_ln_scale"], np.float32),
        "embeddings.LayerNorm.bias": np.asarray(params["emb_ln_bias"], np.float32),
    }
    names = [
        ("q_w", "attention.self.query.weight", True),
        ("q_b", "attention.self.query.bias", False),
        ("k_w", "attention.self.key.weight", True),
        ("k_b", "attention.self.key.bias", False),
        ("v_w", "attention.self.value.weight", True),
        ("v_b", "attention.self.value.bias", False),
        ("attn_out_w", "attention.output.dense.weight", True),
        ("attn_out_b", "attention.output.dense.bias", False),
        ("attn_ln_scale", "attention.output.LayerNorm.weight", False),
        ("attn_ln_bias", "attention.output.LayerNorm.bias", False),
        ("inter_w", "intermediate.dense.weight", True),
        ("inter_b", "intermediate.dense.bias", False),
        ("out_w", "output.dense.weight", True),
        ("out_b", "output.dense.bias", False),
        ("out_ln_scale", "output.LayerNorm.weight", False),
        ("out_ln_bias", "output.LayerNorm.bias", False),
    ]
    for i in range(cfg.layers):
        for ours, theirs, transpose in names:
            arr = np.asarray(b[ours][i], np.float32)
            sd[f"encoder.layer.{i}.{theirs}"] = arr.T.copy() if transpose else arr
    if "pooler_w" in params:
        sd["pooler.dense.weight"] = np.asarray(params["pooler_w"], np.float32).T.copy()
        sd["pooler.dense.bias"] = np.asarray(params["pooler_b"], np.float32)
    return sd


# (the HF tokenizer adapter lives in models/tokenizer.py::HFTokenizerWrapper
# — it additionally applies the reference's clean_text; do not duplicate it)
