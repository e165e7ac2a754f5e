"""EVA-02 vision trunk (TrV): 2-D rope, SwiGLU+sub-LN MLP, optional
post-norm — native JAX, pure functions over stacked params.

The reference reaches EVA02 through timm
(``src/open_clip/timm_model.py:28-151`` with
``timm_model_name=eva02_*_clip_*``, pool='token', proj=None — the trunk's
biased ``head`` Linear projects to embed_dim; configs
``src/open_clip/model_configs/EVA02-*.json``). timm is not installed in
either environment, so this is a from-scratch implementation of the
published TrV architecture (EVA-02, arXiv 2303.11331 §2.1; EVA-CLIP,
arXiv 2303.15389 Table 1):

* **pre-norm blocks** (B/L variants): ``x += proj(rope_attn(LN1(x)))``,
  ``x += SwiGLU(LN2(x))`` where ``SwiGLU(h) = LN_sub(silu(h@w1g) * (h@w1x))
  @ w2`` — the "sub-LN" normalizes the gated hidden before the output
  projection;
* **2-D axial rope** on q/k, identity on the class token: each head-dim
  half encodes one image axis (y then x) with ``dim/4`` frequency bands
  ``temperature^(-4i/dim)``; rotation uses the non-interleaved
  (rotate-half) convention INTERNALLY. timm's ``RotaryEmbeddingCat`` +
  ``apply_rot_embed_cat`` use the same axial frequencies but INTERLEAVED
  channel pairing; the checkpoint importer converts between the two by an
  exact q/k channel permutation (``rope_perm_interleaved_to_half`` below,
  applied in ``core/checkpoint.py::_eva02_rope_qk_perm``; conjugation
  pinned in ``tests/test_eva02.py``). Residual caveat: timm's source is
  not in this environment to diff, so the interleaved semantics are
  transcribed from its published ``pos_embed_sincos.py`` behaviour — the
  layout stays isolated here so one permutation change fixes any
  real-weight disagreement;
* **post-norm blocks + plain MLP, no rope** (the E variant — EVA-CLIP's
  enormous tower predates the TrV changes): ``x += LN1(attn(x))``,
  ``x += LN2(mlp(x))``;
* attention: fused qkv projection with learnable q/v bias and
  implicit-zero k bias (B, E) or separate q/k/v projections with biasless
  k (L) — both stored as one packed ``in_proj``; an optional inner
  LayerNorm on the merged heads before the out-projection
  (``scale_attn_inner``, B/L).

Checkpoint interop uses timm's ``visual.trunk.*`` key layout
(``core/checkpoint.py::_eva02_visual_*``); a from-published-architecture
torch oracle validates forward parity and the key mapping both ways
(``tests/test_eva02.py``).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from latteclip_tpu.models import layers
from latteclip_tpu.models.layers import Params


def rope_sin_cos(grid_h: int, grid_w: int, head_dim: int,
                 temperature: float = 10000.0,
                 ref_shape: Optional[int] = None,
                 with_cls: bool = True):
    """2-D axial rope tables: [1 + grid_h*grid_w, head_dim] sin and cos.

    Row 0 (the class token) gets angle 0 — cos 1 / sin 0 — so applying rope
    to the full sequence leaves the cls token untouched. Layout: the angle
    vector is ``concat(y_angles[dim/4], x_angles[dim/4])`` duplicated for
    the rotate-half pairing (channel c pairs with c + dim/2).
    ``ref_shape`` rescales positions to a reference grid (timm
    ``ref_feat_shape``) so different image sizes share frequencies.
    """
    assert head_dim % 4 == 0, "2-D rope needs head_dim divisible by 4"
    bands = head_dim // 4
    freqs = temperature ** (-jnp.arange(bands, dtype=jnp.float32) / bands)
    ys = jnp.arange(grid_h, dtype=jnp.float32)
    xs = jnp.arange(grid_w, dtype=jnp.float32)
    if ref_shape:
        ys = ys * (ref_shape / grid_h)
        xs = xs * (ref_shape / grid_w)
    ay = ys[:, None] * freqs[None, :]                      # [gh, bands]
    ax = xs[:, None] * freqs[None, :]                      # [gw, bands]
    # per position (y, x): concat(y_angles, x_angles) -> [gh*gw, dim/2]
    a = jnp.concatenate([
        jnp.broadcast_to(ay[:, None, :], (grid_h, grid_w, bands)),
        jnp.broadcast_to(ax[None, :, :], (grid_h, grid_w, bands)),
    ], axis=-1).reshape(grid_h * grid_w, head_dim // 2)
    a = jnp.concatenate([a, a], axis=-1)                   # rotate-half pairing
    if with_cls:
        a = jnp.concatenate([jnp.zeros((1, head_dim), jnp.float32), a], axis=0)
    return jnp.sin(a), jnp.cos(a)


def rope_perm_interleaved_to_half(head_dim: int):
    """Channel permutation mapping timm's INTERLEAVED rope pairing onto this
    module's rotate-half convention.

    timm applies EVA02 rope via ``apply_rot_embed_cat`` (timm
    ``layers/pos_embed_sincos.py``): channels pair as ``(2i, 2i+1)`` with
    ``rot(x) = stack([-x[..., 1::2], x[..., ::2]])`` and the axial angle
    vector ``repeat_interleave(2)``-expanded, so channels ``2i``/``2i+1``
    share angle ``a_i``. This module pairs ``(i, i + D/2)`` (rotate-half)
    with the angle vector duplicated, so channels ``i``/``i + D/2`` share
    ``a_i``. The two are EXACTLY conjugate under the channel permutation
    ``new[i] = old[2i], new[i + D/2] = old[2i + 1]`` applied to q and k:
    per-channel angles and rotation partners map 1:1 (sign included), and
    q·k dot products are invariant under any simultaneous q/k channel
    permutation — so permuting the checkpoint's q/k projection output
    channels at import makes our rotate-half forward reproduce timm's
    computation exactly (``tests/test_eva02.py`` pins this against an
    independent interleaved-convention implementation). The inverse
    (``np.argsort``) restores timm layout at export.
    """
    import numpy as np

    half = head_dim // 2
    perm = np.empty(head_dim, np.int64)
    perm[:half] = np.arange(half) * 2
    perm[half:] = np.arange(half) * 2 + 1
    return perm


def apply_rope_packed(qkv: jnp.ndarray, num_heads: int,
                      sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """Rotate q and k inside the packed [B, L, 3*H*D] tensor; v unchanged.

    Works on the packed layout so the flash kernel's no-slice interface is
    preserved: rotate-half runs on a [B, L, 3, H, D] view and the v stream
    is restored from the original tensor.
    """
    B, L, HD3 = qkv.shape
    HD = HD3 // 3
    D = HD // num_heads
    x = qkv.reshape(B, L, 3, num_heads, D)
    half = D // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    sin = sin.astype(qkv.dtype)[None, :, None, None, :]
    cos = cos.astype(qkv.dtype)[None, :, None, None, :]
    rotated = (x * cos + rot * sin).reshape(B, L, HD3)
    # v stream: identity
    return jnp.concatenate([rotated[..., :2 * HD], qkv[..., 2 * HD:]], axis=-1)


def init_eva02_params(rng: jax.Array, cfg, embed_dim: int) -> Params:
    """Stacked EVA02 trunk params (f32). Pretrained checkpoints overwrite."""
    D, L = cfg.width, cfg.layers
    k = iter(jax.random.split(rng, 24))
    scale = D ** -0.5
    proj_std = scale * (2 * L) ** -0.5
    blocks = {
        "ln_1_scale": jnp.ones((L, D)),
        "ln_1_bias": jnp.zeros((L, D)),
        "in_proj_w": jax.random.normal(next(k), (L, D, 3 * D)) * scale,
        "in_proj_b": jnp.zeros((L, 3 * D)),
        "out_proj_w": jax.random.normal(next(k), (L, D, D)) * proj_std,
        "out_proj_b": jnp.zeros((L, D)),
        "ln_2_scale": jnp.ones((L, D)),
        "ln_2_bias": jnp.zeros((L, D)),
    }
    H = cfg.swiglu_hidden
    if cfg.swiglu:
        fc_std = (2 * D) ** -0.5
        blocks.update({
            "w1g": jax.random.normal(next(k), (L, D, H)) * fc_std,
            "b1g": jnp.zeros((L, H)),
            "w1x": jax.random.normal(next(k), (L, D, H)) * fc_std,
            "b1x": jnp.zeros((L, H)),
            "ln_sub_scale": jnp.ones((L, H)),
            "ln_sub_bias": jnp.zeros((L, H)),
            "w2": jax.random.normal(next(k), (L, H, D)) * proj_std,
            "b2": jnp.zeros((L, D)),
        })
    else:
        blocks.update({
            "c_fc_w": jax.random.normal(next(k), (L, D, H)) * (2 * D) ** -0.5,
            "c_fc_b": jnp.zeros((L, H)),
            "c_proj_w": jax.random.normal(next(k), (L, H, D)) * proj_std,
            "c_proj_b": jnp.zeros((L, D)),
        })
    if cfg.inner_attn_norm:
        blocks["attn_norm_scale"] = jnp.ones((L, D))
        blocks["attn_norm_bias"] = jnp.zeros((L, D))
    return {
        "patch_kernel": jax.random.normal(next(k), (cfg.patch_size ** 2 * 3, D)) * scale,
        "patch_bias": jnp.zeros((D,)),
        "class_embedding": jax.random.normal(next(k), (D,)) * scale,
        "pos_embed": jax.random.normal(next(k), (cfg.seq_len, D)) * scale,
        "blocks": blocks,
        "ln_post_scale": jnp.ones((D,)),
        "ln_post_bias": jnp.zeros((D,)),
        "proj": jax.random.normal(next(k), (D, embed_dim)) * scale,
        "proj_b": jnp.zeros((embed_dim,)),
    }


def _eva02_block(x, p, cfg, sin, cos, dtype, tower="_v"):
    from jax.ad_checkpoint import checkpoint_name

    from latteclip_tpu.kernels import attention_core_qkv

    eps = cfg.ln_eps
    if cfg.post_norm:
        h = x.astype(dtype)
    else:
        h = layers.layer_norm(x, p["ln_1_scale"], p["ln_1_bias"], eps).astype(dtype)
    qkv = layers.dense(h, p["in_proj_w"], p["in_proj_b"], dtype)
    if cfg.use_rope:
        qkv = apply_rope_packed(qkv, cfg.heads, sin, cos)
    qkv = checkpoint_name(qkv, f"qkv_proj{tower}")
    attn = attention_core_qkv(qkv, cfg.heads, False, dtype=dtype)
    if cfg.inner_attn_norm:
        attn = layers.layer_norm(attn, p["attn_norm_scale"], p["attn_norm_bias"], eps).astype(dtype)
    attn = layers.dense(attn, p["out_proj_w"], p["out_proj_b"], dtype)
    if cfg.post_norm:
        attn = layers.layer_norm(attn, p["ln_1_scale"], p["ln_1_bias"], eps).astype(dtype)
    x = checkpoint_name(x + attn, f"attn_res{tower}")

    if cfg.post_norm:
        h = x.astype(dtype)
    else:
        h = layers.layer_norm(x, p["ln_2_scale"], p["ln_2_bias"], eps).astype(dtype)
    if cfg.swiglu:
        g = jax.nn.silu(layers.dense(h, p["w1g"], p["b1g"], dtype))
        u = layers.dense(h, p["w1x"], p["b1x"], dtype)
        hid = layers.layer_norm(g * u, p["ln_sub_scale"], p["ln_sub_bias"], eps).astype(dtype)
        hid = checkpoint_name(hid, f"mlp_act{tower}")
        out = layers.dense(hid, p["w2"], p["b2"], dtype)
    else:
        hid = layers.dense(h, p["c_fc_w"], p["c_fc_b"], dtype)
        hid = checkpoint_name(layers.gelu(hid), f"mlp_act{tower}")
        out = layers.dense(hid, p["c_proj_w"], p["c_proj_b"], dtype)
    if cfg.post_norm:
        out = layers.layer_norm(out, p["ln_2_scale"], p["ln_2_bias"], eps).astype(dtype)
    return x + out


def eva02_forward(
    params: Params,
    cfg,
    images: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    remat: bool = False,
    train: bool = False,
    rng: jax.Array = None,
    output_tokens: bool = False,
    **_unused,
):
    """Images [B, H, W, 3] -> pooled features [B, embed_dim] (f32)."""
    from latteclip_tpu.models.vit import patchify

    B = images.shape[0]
    x = patchify(images, cfg.patch_size)
    x = layers.dense(x, params["patch_kernel"], params["patch_bias"], dtype)
    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype), (B, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)

    if cfg.use_rope:
        sin, cos = rope_sin_cos(cfg.grid, cfg.grid, cfg.head_width,
                                cfg.rope_temperature, cfg.ref_feat_shape)
        sin, cos = jax.lax.stop_gradient(sin), jax.lax.stop_gradient(cos)
    else:
        sin = cos = None

    def body(carry, layer_params):
        return _eva02_block(carry, layer_params, cfg, sin, cos, dtype), None

    if remat:
        policy = jax.checkpoint_policies.save_only_these_names(*layers.REMAT_SAVE_NAMES)
        body = jax.checkpoint(body, prevent_cse=False, policy=policy)
    x, _ = jax.lax.scan(body, x, params["blocks"])

    x = layers.layer_norm(x, params["ln_post_scale"], params["ln_post_bias"], cfg.ln_eps)
    tokens = x[:, 1:]
    pooled = x[:, 0]
    pooled = layers.dense(pooled, params["proj"], params["proj_b"], dtype)
    out = pooled.astype(jnp.float32)
    if output_tokens:
        return out, tokens
    return out
