"""Text transformer tower (pure functions, argmax-EOT pooling).

Numerics match the reference's fused text tower
(``src/open_clip/model.py:420-437`` / ``transformer.py:565-708``): token
embedding + learned positional embedding, causal pre-LN stack, ``ln_final``,
EOT pooling at the per-row argmax token id, projection matmul. TPU choices:
stacked+scanned blocks, static ``[ctx, ctx]`` causal mask built at trace
time, int32 token ids.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import TextConfig
from latteclip_tpu.models import layers
from latteclip_tpu.models.layers import Params

NEG_INF = -1e9  # finite -inf stand-in; softmax-in-f32 makes this exact enough


def init_text_params(rng: jax.Array, cfg: TextConfig, embed_dim: int) -> Params:
    """Reference init scheme (transformer.py:628-649)."""
    D, L = cfg.width, cfg.layers
    k = iter(jax.random.split(rng, 16))
    attn_std = D ** -0.5
    proj_std = attn_std * (2 * L) ** -0.5
    fc_std = (2 * D) ** -0.5
    mlp_width = int(D * cfg.mlp_ratio)

    blocks = {
        "ln_1_scale": jnp.ones((L, D)),
        "ln_1_bias": jnp.zeros((L, D)),
        "in_proj_w": jax.random.normal(next(k), (L, D, 3 * D)) * attn_std,
        "in_proj_b": jnp.zeros((L, 3 * D)),
        "out_proj_w": jax.random.normal(next(k), (L, D, D)) * proj_std,
        "out_proj_b": jnp.zeros((L, D)),
        "ln_2_scale": jnp.ones((L, D)),
        "ln_2_bias": jnp.zeros((L, D)),
        "c_fc_w": jax.random.normal(next(k), (L, D, mlp_width)) * fc_std,
        "c_fc_b": jnp.zeros((L, mlp_width)),
        "c_proj_w": jax.random.normal(next(k), (L, mlp_width, D)) * proj_std,
        "c_proj_b": jnp.zeros((L, D)),
    }
    if cfg.ls_init_value is not None:
        blocks["ls_1_gamma"] = jnp.full((L, D), cfg.ls_init_value)
        blocks["ls_2_gamma"] = jnp.full((L, D), cfg.ls_init_value)
    return {
        "token_embedding": jax.random.normal(next(k), (cfg.vocab_size, D)) * 0.02,
        "pos_embed": jax.random.normal(next(k), (cfg.context_length, D)) * 0.01,
        "blocks": blocks,
        "ln_final_scale": jnp.ones((D,)),
        "ln_final_bias": jnp.zeros((D,)),
        "text_projection": jax.random.normal(next(k), (D, embed_dim)) * attn_std,
    }


def causal_mask(ctx: int) -> jnp.ndarray:
    """Additive [ctx, ctx] mask: 0 on/below diagonal, NEG_INF above."""
    i = jnp.arange(ctx)[:, None]
    j = jnp.arange(ctx)[None, :]
    return jnp.where(j > i, NEG_INF, 0.0).astype(jnp.float32)


def text_forward_embeds(
    params: Params,
    cfg: TextConfig,
    embeds: jnp.ndarray,
    eot_pos: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    quick_gelu: bool = False,
) -> jnp.ndarray:
    """Token *embeddings* [B, ctx, D] + EOT positions [B] -> features [B, E].

    The prompt-tuning entry point (reference ``TextEncoder``,
    model.py:971-991): identical to :func:`text_forward` but the embedding
    lookup is replaced by caller-assembled embeddings (learnable context
    vectors spliced between SOT and the class tokens).
    """
    act = layers.quick_gelu if quick_gelu else layers.gelu
    ctx = embeds.shape[1]
    x = embeds.astype(dtype) + params["pos_embed"][:ctx].astype(dtype)
    x = layers.transformer_stack(
        x, params["blocks"], cfg.heads, not cfg.no_causal_mask, act, dtype,
        ln_eps=cfg.ln_eps,
    )
    x = layers.layer_norm(x, params["ln_final_scale"], params["ln_final_bias"], cfg.ln_eps)
    pooled = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0]
    out = layers.dense(pooled, params["text_projection"], None, dtype)
    return out.astype(jnp.float32)


def text_forward_packed(
    params: Params,
    cfg: TextConfig,
    tokens: jnp.ndarray,
    positions: jnp.ndarray,
    seg_ids: jnp.ndarray,
    eot_row: jnp.ndarray,
    eot_col: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    quick_gelu: bool = False,
    remat: bool = False,
    gelu_tanh: bool = False,
) -> jnp.ndarray:
    """Variable-length PACKED rows -> pooled features [N, embed_dim] (f32).

    ``tokens``/``positions``/``seg_ids``: [R, P] from data.packing — real
    caption token runs packed end to end; ``eot_row``/``eot_col``: [N] the
    packed coordinates of each sequence's EOT token. Numerically equivalent
    to :func:`text_forward` on the padded [N, ctx] layout (causal masking +
    EOT pooling make later/foreign columns invisible — same argument as
    ``--text-context-cap``, tests/test_packing.py pins it) while running the
    whole tower on ~sum(len) tokens instead of N*ctx.
    """
    act = layers.quick_gelu if quick_gelu else (layers.gelu_tanh if gelu_tanh else layers.gelu)
    x = params["token_embedding"][tokens].astype(dtype)             # [R, P, D]
    x = x + params["pos_embed"][positions].astype(dtype)
    x = layers.transformer_stack(
        x, params["blocks"], cfg.heads, not cfg.no_causal_mask, act, dtype,
        remat=remat, tower="_t", ln_eps=cfg.ln_eps, seg_ids=seg_ids,
    )
    x = layers.layer_norm(x, params["ln_final_scale"], params["ln_final_bias"], cfg.ln_eps)
    pooled = x[eot_row, eot_col]                                    # [N, D]
    out = layers.dense(pooled, params["text_projection"], params.get("text_projection_b"), dtype)
    return out.astype(jnp.float32)


def text_forward(
    params: Params,
    cfg: TextConfig,
    tokens: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    quick_gelu: bool = False,
    remat: bool = False,
    gelu_tanh: bool = False,
) -> jnp.ndarray:
    """Token ids [B, ctx] (int32) -> pooled features [B, embed_dim] (f32)."""
    act = layers.quick_gelu if quick_gelu else (layers.gelu_tanh if gelu_tanh else layers.gelu)
    ctx = tokens.shape[1]

    x = params["token_embedding"][tokens].astype(dtype)            # [B, ctx, D]
    x = x + params["pos_embed"][:ctx].astype(dtype)

    x = layers.transformer_stack(
        x, params["blocks"], cfg.heads, not cfg.no_causal_mask, act, dtype,
        remat=remat, tower="_t", ln_eps=cfg.ln_eps,
    )
    x = layers.layer_norm(x, params["ln_final_scale"], params["ln_final_bias"], cfg.ln_eps)

    if cfg.pool_type == "argmax":
        # EOT token has the highest id in each row (reference
        # transformer.py:555-558); gather features at its position.
        eot_pos = tokens.argmax(axis=-1)
        pooled = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0]
    elif cfg.pool_type == "first":
        pooled = x[:, 0]
    elif cfg.pool_type == "last":
        pooled = x[:, -1]
    else:
        raise ValueError(f"unsupported text pool_type: {cfg.pool_type}")

    # optional projection bias (SigLIP text head, reference big_vision.py:128-129)
    out = layers.dense(pooled, params["text_projection"], params.get("text_projection_b"), dtype)
    return out.astype(jnp.float32)
