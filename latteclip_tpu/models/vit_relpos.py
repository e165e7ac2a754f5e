"""VisionTransformerRelPos trunk — native JAX (rel-pos-MLP attention bias).

The reference reaches this trunk through timm
(``src/open_clip/timm_model.py:28-151``, config
``vit_relpos_medium_patch16_cls_224.json``: ``timm_pool=''`` keeps the
trunk's own token pool, ``timm_proj='linear'`` adds an unbiased head
Linear to embed_dim). timm is absent in this environment and the trunk has
no paper; this implements the architecture as documented by timm's
``vision_transformer_relpos.py`` (transcribed from knowledge of its public
source — same discipline as models/swin.py / models/eva02.py, oracle in
``tests/test_vit_relpos.py``):

* patch embed: stride-``P`` conv (reshape+matmul like models/vit.py) with
  bias, NO LayerNorm and — unlike every other ViT here — **no absolute
  position embedding**: all positional information enters as a per-block
  relative-position bias;
* ``RelPosMlp`` (mode ``'cr'``, the default for ``rel_pos_type='mlp'``):
  a [2g-1, 2g-1, 2] table of signed-log relative coordinates
  ``sign(c) * ln(1+|c|)`` fed through a 2→hidden→heads ReLU MLP (both
  layers biased), gathered into an [N, N, heads] bias by the standard
  Swin-style relative-position index, then zero-padded one row+column at
  the front for the class token (``prefix_tokens=1``);
* pre-LN blocks with LayerScale (timm class default ``init_values=1e-6``
  — relpos ViTs train with LayerScale on), fused qkv **without bias**
  (``qkv_bias=False`` in the medium-cls entrypoint), GELU MLP;
* class token, ``global_pool='token'`` + ``fc_norm=False``: final LN over
  all tokens, take token 0, then the TimmModel head Linear.

DOCUMENTED ASSUMPTIONS (PRODUCTION.md "layout assumptions" table): with
timm unverifiable in-env, two registry values are transcribed from memory
of the timm source rather than verified against it: the rel-pos MLP hidden
dim for the medium-cls entrypoint (``rel_pos_dim=256``) and LayerScale
``init_values=1e-6``. Both are *self-correcting for checkpoint loads*:
``core/checkpoint.py::_relpos_visual_from_sd`` infers the hidden dim from
``attn.rel_pos.mlp.fc1.weight``'s shape and LayerScale presence from the
``ls1.gamma`` key, so a real timm checkpoint with different values loads
correctly — only fresh ``init_clip_params`` inits depend on the registry.
RelPosMlp's train-time dropout (0.125 after the ReLU) is omitted: nothing
in the reference trains this trunk, and get_bias is deterministic at eval.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.models import layers
from latteclip_tpu.models.layers import Params

RELPOS_TRUNKS: Dict[str, Dict[str, Any]] = {
    # timm vision_transformer_relpos.py entrypoint
    # vit_relpos_medium_patch16_cls_224: ViT-M/16, rel-pos-MLP bias,
    # class token + token pool, qkv_bias=False, fc_norm=False
    "vit_relpos_medium_patch16_cls_224": dict(
        width=512, layers=12, heads=8, patch_size=16, mlp_ratio=4.0,
        rel_pos_hidden=256,   # timm rel_pos_dim (ASSUMPTION — see docstring)
        init_values=1e-6,     # timm LayerScale default (ASSUMPTION)
    ),
}


def rel_log_coords(g: int) -> np.ndarray:
    """timm ``gen_relative_log_coords`` mode='cr': [2g-1, 2g-1, 2] table of
    ``sign(c) * ln(1 + |c|)`` over relative (dy, dx)."""
    r = np.arange(-(g - 1), g, dtype=np.float32)
    table = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1)  # [2g-1, 2g-1, 2]
    return np.sign(table) * np.log1p(np.abs(table))


def rel_pos_bias(p: Params, g: int, heads: int, rel_index: jnp.ndarray) -> jnp.ndarray:
    """RelPosMlp.get_bias(): MLP over the log-coord table, gather, cls pad.

    Returns [1, heads, N+1, N+1] (f32) with zero bias on the class-token
    row/column (timm pads with ``F.pad(bias, [prefix, 0, prefix, 0])``).
    """
    table = jnp.asarray(rel_log_coords(g))                        # [2g-1, 2g-1, 2]
    h = jax.nn.relu(table @ p["mlp_fc1_w"] + p["mlp_fc1_b"])
    h = h @ p["mlp_fc2_w"] + p["mlp_fc2_b"]                       # [2g-1, 2g-1, heads]
    flat = h.reshape(-1, heads)[rel_index.reshape(-1)]            # [N*N, heads]
    bias = flat.reshape(g * g, g * g, heads).transpose(2, 0, 1)   # [heads, N, N]
    bias = jnp.pad(bias, ((0, 0), (1, 0), (1, 0)))
    return bias[None].astype(jnp.float32)


def init_relpos_params(rng: jax.Array, cfg, embed_dim: int) -> Params:
    t = RELPOS_TRUNKS[cfg.trunk]
    D, heads, P, mr = t["width"], t["heads"], t["patch_size"], t["mlp_ratio"]
    hidden = int(D * mr)
    rh = t["rel_pos_hidden"]
    k = iter(jax.random.split(rng, 4 + 8 * t["layers"]))
    scale = D ** -0.5
    blocks = []
    for _ in range(t["layers"]):
        blocks.append({
            "ln_1_scale": jnp.ones((D,)), "ln_1_bias": jnp.zeros((D,)),
            "in_proj_w": jax.random.normal(next(k), (D, 3 * D)) * scale,
            "mlp_fc1_w": jax.random.normal(next(k), (2, rh)) * (2 ** -0.5),
            "mlp_fc1_b": jnp.zeros((rh,)),
            "mlp_fc2_w": jax.random.normal(next(k), (rh, heads)) * (rh ** -0.5),
            "mlp_fc2_b": jnp.zeros((heads,)),
            "out_proj_w": jax.random.normal(next(k), (D, D)) * scale,
            "out_proj_b": jnp.zeros((D,)),
            "ls_1": jnp.full((D,), t["init_values"], jnp.float32),
            "ln_2_scale": jnp.ones((D,)), "ln_2_bias": jnp.zeros((D,)),
            "c_fc_w": jax.random.normal(next(k), (D, hidden)) * scale,
            "c_fc_b": jnp.zeros((hidden,)),
            "c_proj_w": jax.random.normal(next(k), (hidden, D)) * (hidden ** -0.5),
            "c_proj_b": jnp.zeros((D,)),
            "ls_2": jnp.full((D,), t["init_values"], jnp.float32),
        })
    return {
        "patch_kernel": jax.random.normal(next(k), (P * P * 3, D)) * scale,
        "patch_bias": jnp.zeros((D,)),
        "class_embedding": jax.random.normal(next(k), (D,)) * 1e-6,
        "blocks": blocks,
        "norm_scale": jnp.ones((D,)), "norm_bias": jnp.zeros((D,)),
        "proj": jax.random.normal(next(k), (D, embed_dim)) * scale,
    }


def _relpos_block(x, p, heads: int, g: int, rel_index, dtype, ln_eps: float):
    from latteclip_tpu.kernels import xla_attention

    B, N, C = x.shape
    hd = C // heads
    h = layers.layer_norm(x, p["ln_1_scale"], p["ln_1_bias"], ln_eps).astype(dtype)
    qkv = layers.dense(h, p["in_proj_w"], None, dtype)            # qkv_bias=False
    q, k, v = jnp.split(qkv, 3, axis=-1)
    bias = rel_pos_bias(p, g, heads, rel_index)                   # [1, h, N, N]
    out = xla_attention(
        q.reshape(B, N, heads, hd), k.reshape(B, N, heads, hd),
        v.reshape(B, N, heads, hd), dtype=dtype, bias=bias,
    ).reshape(B, N, C)
    out = layers.dense(out, p["out_proj_w"], p["out_proj_b"], dtype)
    x = x + out * p["ls_1"]

    h = layers.layer_norm(x, p["ln_2_scale"], p["ln_2_bias"], ln_eps).astype(dtype)
    h = layers.gelu(layers.dense(h, p["c_fc_w"], p["c_fc_b"], dtype))
    h = layers.dense(h, p["c_proj_w"], p["c_proj_b"], dtype)
    return x + h * p["ls_2"]


def relpos_forward(
    params: Params,
    cfg,
    images: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    remat: bool = False,
    train: bool = False,
    rng: jax.Array = None,
    **_unused,
):
    """Images [B, H, W, 3] -> pooled features [B, embed_dim] (f32)."""
    from latteclip_tpu.models.swin import relative_position_index
    from latteclip_tpu.models.vit import patchify

    t = RELPOS_TRUNKS[cfg.trunk]
    heads, eps = t["heads"], cfg.ln_eps
    g = cfg.image_size // t["patch_size"]
    B = images.shape[0]

    x = patchify(images, t["patch_size"])
    x = layers.dense(x, params["patch_kernel"], params["patch_bias"], dtype)
    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype), (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)                         # no abs pos embed

    rel_index = jnp.asarray(relative_position_index(g))
    for bp in params["blocks"]:
        blk = _relpos_block
        if remat:
            blk = jax.checkpoint(_relpos_block, static_argnums=(2, 3, 5, 6),
                                 prevent_cse=False)
        x = blk(x, bp, heads, g, rel_index, dtype, eps)

    x = layers.layer_norm(x, params["norm_scale"], params["norm_bias"], eps)
    pooled = x[:, 0]                                              # global_pool='token'
    pooled = layers.dense(pooled, params["proj"], None, dtype)
    return pooled.astype(jnp.float32)
