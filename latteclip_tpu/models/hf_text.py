"""HuggingFace-architecture text towers, implemented natively in JAX.

Counterpart of the reference's ``HFTextEncoder``
(``src/open_clip/hf_model.py:96-169``), which wraps torch ``AutoModel``.
Here the BERT family (bert / roberta / xlm-roberta) is implemented directly
as a post-LN masked encoder over stacked params (lax.scan, like the CLIP
towers), with:

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
from typing import Dict, Optional

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

    @property
    def position_offset(self) -> int:
        # RoBERTa position ids start at pad_id + 1 (HF
        # create_position_ids_from_input_ids); BERT starts at 0
        return self.pad_id + 1 if self.model_type in ("roberta", "xlm-roberta") else 0


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


def init_hf_text_params(rng: jax.Array, cfg: HFTextConfig, embed_dim: int) -> Params:
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


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


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
    x = x.astype(jnp.float32)

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


# ---------------------------------------------------------------------------
# HF state-dict import
# ---------------------------------------------------------------------------

def import_hf_state_dict(state_dict: Dict, cfg: HFTextConfig) -> Params:
    """HF torch ``state_dict`` (BERT-family AutoModel naming) -> param pytree.

    Torch ``nn.Linear`` stores ``(out, in)``; kernels are transposed into
    this package's ``(in, out)`` dense convention. A leading ``bert.`` /
    ``roberta.`` prefix is stripped if present.
    """
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


def export_hf_state_dict(params: Params, cfg: HFTextConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_hf_state_dict`: param pytree -> HF-naming
    torch ``state_dict`` arrays (kernels transposed back to ``(out, in)``)."""
    b = params["blocks"]
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
