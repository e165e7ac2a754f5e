"""Vision transformer tower (pure functions, NHWC, MXU-friendly patchify).

Numerics match the reference ``VisionTransformer``
(``src/open_clip/transformer.py:328-547``): conv patchify, class token +
learned positional embedding, pre-LN stack, ``ln_post`` then token pooling
and a final projection matmul. Differences are deliberate TPU choices:

* images are NHWC (TPU-native layout), not NCHW;
* the stride-P convolution is expressed as reshape + one big matmul
  ``[B, N, P*P*3] @ [P*P*3, D]`` so the whole patch embed runs on the MXU;
* blocks are stacked and scanned (see ``layers.transformer_stack``).
"""
from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import VisionConfig
from latteclip_tpu.models import layers
from latteclip_tpu.models.layers import Params

# Vision pair-packing: at short sequence lengths (ViT-B/32's L=50) the
# attention score tile wastes most of its 128 lanes (trace-measured
# 12.2 TF/s vs 36.8 on the packed-text kernel — BASELINE.md round-5
# decomposition row). Packing TWO images per row ([B, L] -> [B/2, 2L])
# and masking cross-image entries with the segment kernel's block-diagonal
# bias doubles lane utilisation with EXACTLY the same attention math
# (masked score entries exp2 to 0.0 before every reduction). "auto"
# (default) packs whenever both images fit one 128-lane tile; "0"/"1"
# force. The reference has no analogue (its nn.MultiheadAttention pads
# every sequence — transformer.py:202).
_VISION_PACK_ENV = _os.environ.get("LATTECLIP_VISION_PACK", "auto")


def _pack_pairs(B: int, L: int) -> bool:
    if _VISION_PACK_ENV == "0":
        return False
    return B % 2 == 0 and 2 * L <= 128


def init_vit_params(rng: jax.Array, cfg: VisionConfig, embed_dim: int) -> Params:
    """Initialise vision tower params (f32).

    The reference leaves vision blocks at torch defaults
    (``transformer.py:468-486`` is a no-op); we use the same normal scheme
    the reference applies to its text tower, which is well-behaved for
    from-scratch training. Pretrained checkpoints overwrite all of this.
    """
    D, L = cfg.width, cfg.layers
    k = iter(jax.random.split(rng, 16))
    scale = D ** -0.5
    proj_std = scale * (2 * L) ** -0.5
    fc_std = (2 * D) ** -0.5
    mlp_width = int(D * cfg.mlp_ratio)

    blocks = {
        "ln_1_scale": jnp.ones((L, D)),
        "ln_1_bias": jnp.zeros((L, D)),
        "in_proj_w": jax.random.normal(next(k), (L, D, 3 * D)) * scale,
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
    if cfg.pos_embed_type == "sin_cos_2d":
        from latteclip_tpu.models.pos_embed import sincos_2d

        pos_embed = jnp.asarray(sincos_2d(D, cfg.grid, cls_token=not cfg.no_cls_token))
    else:
        pos_embed = jax.random.normal(next(k), (cfg.seq_len, D)) * scale
    pool_dim = embed_dim if cfg.attentional_pool else D
    params = {
        "patch_kernel": jax.random.normal(next(k), (cfg.patch_size * cfg.patch_size * 3, D)) * scale,
        "pos_embed": pos_embed,
        "ln_pre_scale": jnp.ones((D,)),
        "ln_pre_bias": jnp.zeros((D,)),
        "blocks": blocks,
        "ln_post_scale": jnp.ones((pool_dim,)),
        "ln_post_bias": jnp.zeros((pool_dim,)),
    }
    if not cfg.no_cls_token:
        params["class_embedding"] = jax.random.normal(next(k), (D,)) * scale
    if not (cfg.pool_type == "map" and pool_dim == embed_dim):
        # SigLIP-style models (MAP pooling, width == embed_dim) have no
        # final projection (reference big_vision.py:131: head is the pool)
        params["proj"] = jax.random.normal(next(k), (pool_dim, embed_dim)) * scale
    if cfg.timm_trunk:  # timm trunks: biased patch conv; Eva also has a
        # biased head proj (trunk classifier); plain-ViT trunks reach
        # embed_dim through TimmModel's separate UNBIASED head Linear
        # (reference timm_model.py:104-106, proj_bias=False default)
        params["patch_bias"] = jnp.zeros((D,))
        if cfg.timm_trunk.startswith("eva"):
            params["proj_b"] = jnp.zeros((embed_dim,))
    if cfg.attentional_pool:
        params["attn_pool"] = init_attn_pool_params(
            next(k), embed_dim, D, cfg.attn_pooler_queries
        )
    if cfg.pool_type == "map":
        params["map_head"] = init_map_head_params(next(k), D, int(D * cfg.mlp_ratio))
    return params


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, N, patch*patch*3] patch vectors (i, j, c order)."""
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, P, P, C]
    return x.reshape(B, gh * gw, patch * patch * C)


def init_attn_pool_params(rng: jax.Array, d_model: int, context_dim: int, n_queries: int) -> Params:
    """AttentionalPooler params (reference transformer.py:165-185):
    learned queries + MHA with kdim=vdim=context_dim + q/k LayerNorms."""
    k = iter(jax.random.split(rng, 8))
    scale = d_model ** -0.5
    return {
        "query": jax.random.normal(next(k), (n_queries, d_model)),
        # torch Linear convention [out, in]; forward applies x @ W.T
        "q_proj_w": jax.random.normal(next(k), (d_model, d_model)) * scale,
        "k_proj_w": jax.random.normal(next(k), (d_model, context_dim)) * scale,
        "v_proj_w": jax.random.normal(next(k), (d_model, context_dim)) * scale,
        "in_proj_b": jnp.zeros((3 * d_model,)),
        "out_proj_w": jax.random.normal(next(k), (d_model, d_model)) * scale,
        "out_proj_b": jnp.zeros((d_model,)),
        "ln_q_scale": jnp.ones((d_model,)),
        "ln_q_bias": jnp.zeros((d_model,)),
        "ln_k_scale": jnp.ones((context_dim,)),
        "ln_k_bias": jnp.zeros((context_dim,)),
    }


def attentional_pool(
    x: jnp.ndarray, p: Params, num_heads: int, dtype: jnp.dtype
) -> jnp.ndarray:
    """Learned-query cross attention over patch tokens: [B, L, C] -> [B, Q, D]
    (reference AttentionalPooler.forward, transformer.py:180-185)."""
    B = x.shape[0]
    keys = layers.layer_norm(x, p["ln_k_scale"], p["ln_k_bias"]).astype(dtype)
    queries = layers.layer_norm(p["query"][None], p["ln_q_scale"], p["ln_q_bias"])[0]
    d_model = queries.shape[-1]
    head_dim = d_model // num_heads

    bq, bk, bv = jnp.split(p["in_proj_b"].astype(dtype), 3)
    q = (queries.astype(dtype) @ p["q_proj_w"].astype(dtype).T + bq)      # [Q, D]
    k = keys @ p["k_proj_w"].astype(dtype).T + bk                         # [B, L, D]
    v = keys @ p["v_proj_w"].astype(dtype).T + bv

    Q = q.shape[0]
    qh = jnp.broadcast_to(q.reshape(1, Q, num_heads, head_dim), (B, Q, num_heads, head_dim))
    kh = k.reshape(B, -1, num_heads, head_dim)
    vh = v.reshape(B, -1, num_heads, head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh * head_dim ** -0.5, kh,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh, preferred_element_type=jnp.float32)
    out = out.reshape(B, Q, d_model).astype(dtype)
    return out @ p["out_proj_w"].astype(dtype).T + p["out_proj_b"].astype(dtype)


def init_map_head_params(rng: jax.Array, d_model: int, mlp_width: int) -> Params:
    """big_vision MAPHead params — flax ``(in, out)`` kernel convention,
    matching the .npz layout the importer reads (reference
    big_vision.py:84-100 maps the same arrays onto timm's attn_pool)."""
    k = iter(jax.random.split(rng, 8))
    scale = d_model ** -0.5
    return {
        "probe": jax.random.normal(next(k), (1, d_model)) * scale,
        "q_w": jax.random.normal(next(k), (d_model, d_model)) * scale,
        "q_b": jnp.zeros((d_model,)),
        "k_w": jax.random.normal(next(k), (d_model, d_model)) * scale,
        "k_b": jnp.zeros((d_model,)),
        "v_w": jax.random.normal(next(k), (d_model, d_model)) * scale,
        "v_b": jnp.zeros((d_model,)),
        "out_w": jax.random.normal(next(k), (d_model, d_model)) * scale,
        "out_b": jnp.zeros((d_model,)),
        "ln_scale": jnp.ones((d_model,)),
        "ln_bias": jnp.zeros((d_model,)),
        "fc1_w": jax.random.normal(next(k), (d_model, mlp_width)) * scale,
        "fc1_b": jnp.zeros((mlp_width,)),
        "fc2_w": jax.random.normal(next(k), (mlp_width, d_model)) * scale,
        "fc2_b": jnp.zeros((d_model,)),
    }


def siglip_map_head(
    x: jnp.ndarray, p: Params, num_heads: int, dtype: jnp.dtype,
    ln_eps: float = layers.LN_EPS,
) -> jnp.ndarray:
    """big_vision MAPHead: probe cross-attention, then LN + residual MLP,
    returning the probe token — ``x[:, 0]`` of the pooled sequence. The MLP
    uses tanh-approximate gelu (flax ``nn.gelu`` default), unlike the towers'
    exact gelu."""
    from latteclip_tpu.kernels import xla_attention

    B, L, D = x.shape
    hd = D // num_heads
    x = x.astype(dtype)
    q = p["probe"].astype(dtype) @ p["q_w"].astype(dtype) + p["q_b"].astype(dtype)  # [1, D]
    k = x @ p["k_w"].astype(dtype) + p["k_b"].astype(dtype)                          # [B, L, D]
    v = x @ p["v_w"].astype(dtype) + p["v_b"].astype(dtype)
    qh = jnp.broadcast_to(q.reshape(1, 1, num_heads, hd), (B, 1, num_heads, hd))
    out = xla_attention(
        qh, k.reshape(B, L, num_heads, hd), v.reshape(B, L, num_heads, hd), dtype=dtype
    )
    out = out.reshape(B, 1, D)
    out = out @ p["out_w"].astype(dtype) + p["out_b"].astype(dtype)
    y = layers.layer_norm(out, p["ln_scale"], p["ln_bias"], ln_eps)
    h = jax.nn.gelu(y @ p["fc1_w"].astype(dtype) + p["fc1_b"].astype(dtype), approximate=True)
    out = out + (h @ p["fc2_w"].astype(dtype) + p["fc2_b"].astype(dtype))
    return out[:, 0]


def patch_dropout(x: jnp.ndarray, prob: float, rng: jax.Array,
                  has_cls: bool = True) -> jnp.ndarray:
    """Randomly keep a fraction of patch tokens, always keeping the class
    token when present (reference PatchDropout, transformer.py:49-86).
    Static output shape: num_keep is computed from the static token count.
    ``has_cls=False`` (SigLIP/no-cls towers) samples over ALL tokens."""
    n_cls = 1 if has_cls else 0
    cls_tok, patches = x[:, :n_cls], x[:, n_cls:]
    B, N, D = patches.shape
    num_keep = max(1, int(N * (1.0 - prob)))
    scores = jax.random.normal(rng, (B, N))
    keep = jax.lax.top_k(scores, num_keep)[1]                     # [B, num_keep]
    kept = jnp.take_along_axis(patches, keep[..., None], axis=1)
    return jnp.concatenate([cls_tok, kept], axis=1)


def vit_forward(
    params: Params,
    cfg: VisionConfig,
    images: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    quick_gelu: bool = False,
    remat: bool = False,
    train: bool = False,
    rng: jax.Array = None,
    output_tokens: bool = False,
    gelu_tanh: bool = False,
):
    """Images [B, H, W, 3] -> pooled features [B, embed_dim] (f32); with
    ``output_tokens`` also returns the token embeddings (CoCa decoder input,
    reference transformer.py:529-546)."""
    B = images.shape[0]
    act = layers.quick_gelu if quick_gelu else (layers.gelu_tanh if gelu_tanh else layers.gelu)
    eps = cfg.ln_eps
    if cfg.no_cls_token and cfg.pool_type == "tok" and not cfg.attentional_pool:
        # x[:, 0] would silently pool the first PATCH token
        raise ValueError(
            "pool_type='tok' needs a class token; this config sets "
            "no_cls_token — use pool_type 'map' or 'avg'"
        )

    x = patchify(images, cfg.patch_size)
    x = layers.dense(x, params["patch_kernel"], params.get("patch_bias"), dtype)  # [B, N, D]

    if not cfg.no_cls_token:
        cls = jnp.broadcast_to(params["class_embedding"].astype(dtype), (B, 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1)                      # [B, N+1, D]
    pos = params["pos_embed"]
    if cfg.pos_embed_type == "sin_cos_2d":  # fixed embedding (requires_grad=False)
        pos = jax.lax.stop_gradient(pos)
    x = x + pos.astype(dtype)

    if train and cfg.patch_dropout > 0.0:
        assert rng is not None, "patch dropout needs an rng"
        x = patch_dropout(x, cfg.patch_dropout, rng, has_cls=not cfg.no_cls_token)

    if not cfg.no_ln_pre:
        x = layers.layer_norm(x, params["ln_pre_scale"], params["ln_pre_bias"], eps)

    Lx = x.shape[1]
    if _pack_pairs(B, Lx):
        # two images per 128-lane row; block-diagonal segment mask keeps the
        # attention math identical (see module docstring above)
        x = x.reshape(B // 2, 2 * Lx, x.shape[2])
        seg = jnp.broadcast_to(
            jnp.repeat(jnp.arange(1, 3, dtype=jnp.int32), Lx), (B // 2, 2 * Lx)
        )
        x = layers.transformer_stack(
            x, params["blocks"], cfg.heads, False, act, dtype, remat=remat,
            tower="_v", ln_eps=eps, seg_ids=seg,
        )
        x = x.reshape(B, Lx, x.shape[2])
    else:
        x = layers.transformer_stack(
            x, params["blocks"], cfg.heads, False, act, dtype, remat=remat,
            tower="_v", ln_eps=eps,
        )

    off = 0 if cfg.no_cls_token else 1
    if cfg.pool_type == "map":
        # big_vision/SigLIP: encoder_norm BEFORE the MAP head, probe token
        # is the pooled feature (reference big_vision.py:81-100)
        x = layers.layer_norm(x, params["ln_post_scale"], params["ln_post_bias"], eps)
        tokens = x
        pooled = siglip_map_head(x, params["map_head"], cfg.heads, dtype, ln_eps=eps)
    elif cfg.attentional_pool:
        # CoCa-style: pool with learned queries, then ln_post + tok pooling
        # (reference transformer.py:529-533)
        x = attentional_pool(x, params["attn_pool"], cfg.attn_pooler_heads, dtype)
        x = layers.layer_norm(x, params["ln_post_scale"], params["ln_post_bias"], eps)
        tokens = x[:, 1:]
        pooled = tokens.mean(axis=1) if cfg.pool_type == "avg" else x[:, 0]
    elif cfg.final_ln_after_pool:
        tokens = x[:, off:]
        pooled = tokens.mean(axis=1) if cfg.pool_type == "avg" else x[:, 0]
        pooled = layers.layer_norm(pooled, params["ln_post_scale"], params["ln_post_bias"], eps)
    else:
        x = layers.layer_norm(x, params["ln_post_scale"], params["ln_post_bias"], eps)
        tokens = x[:, off:]
        pooled = tokens.mean(axis=1) if cfg.pool_type == "avg" else x[:, 0]

    if "proj" in params:
        # proj_b: timm-Eva trunks project with the trunk's own biased
        # classifier head (timm_model.py:61-72, proj=None + num_classes)
        pooled = layers.dense(pooled, params["proj"], params.get("proj_b"), dtype)
    out = pooled.astype(jnp.float32)
    if output_tokens:
        return out, tokens
    return out
