"""TPU kernels: pallas implementations of the hot ops with XLA fallbacks.

``attention_core`` is the single dispatch point used by the model towers; it
consumes the packed-head layout ``[B, L, H*D]`` the fused QKV projection
naturally produces. On TPU it routes to the pallas flash-attention kernel
(``attention.py``); elsewhere (CPU tests, debugging) a plain-XLA reference
implementation is used. Set ``LATTECLIP_DISABLE_PALLAS=1`` to force XLA.
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp


@lru_cache()
def _pallas_enabled() -> bool:
    if os.environ.get("LATTECLIP_DISABLE_PALLAS", "0") == "1":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def causal_bias(L: int) -> jnp.ndarray:
    """Additive [L, L] causal mask: 0 on/below the diagonal, -1e9 above."""
    i = jnp.arange(L)[:, None]
    j = jnp.arange(L)[None, :]
    return jnp.where(j > i, -1e9, 0.0).astype(jnp.float32)


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    dtype: jnp.dtype = jnp.bfloat16,
    bias: jnp.ndarray = None,
    scale: float = None,
) -> jnp.ndarray:
    """Reference attention in plain XLA. q: [B, Lq, H, Hd], k/v:
    [B, Lk, H, Hd] -> [B, Lq, H, Hd]; ``bias`` is an optional additive f32
    logit bias broadcastable to [B, H, Lq, Lk] (padding masks, ALiBi, ...).
    ``scale`` overrides the default 1/sqrt(head_dim) logit scaling (T5-family
    attention is unscaled — pass 1.0).

    Logit accumulation and softmax in f32 (matches torch-AMP semantics of
    the reference's nn.MultiheadAttention path, reference
    src/open_clip/transformer.py:202,227-229). This is the single XLA
    attention core — the HF text towers and the SigLIP MAP head reuse it so
    precision semantics stay in one place.
    """
    head_dim = q.shape[-1]
    if scale is None:
        scale = head_dim ** -0.5
    q = (q * scale).astype(dtype)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k.astype(dtype), preferred_element_type=jnp.float32
    )
    if causal:
        logits = logits + causal_bias(q.shape[1])
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    # Named so a remat policy can PIN the probs (LATTECLIP_REMAT_SAVE=
    # ...,attn_probs): with probs saved, the backward needs no QK^T/softmax
    # recompute — at text shapes (L=77) the bf16 probs are only ~100 MB/layer,
    # which is what makes the XLA short-seq route viable under remat (the
    # round-2 measurement that lost 45 ms recomputed this forward).
    from jax.ad_checkpoint import checkpoint_name

    probs = checkpoint_name(probs.astype(dtype), "attn_probs")
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)


def attention_core_qkv(
    qkv: jnp.ndarray,
    num_heads: int,
    causal: bool = False,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Fused attention directly on the packed QKV projection output.

    ``qkv``: [B, L, 3*H*D] laid out ``[q | k | v]`` — consumed whole so no
    slice/concat copies materialize around the kernel (they cost ~930 MB of
    HBM traffic per ViT-B layer with the 3-tensor interface).
    """
    head_dim = qkv.shape[-1] // 3 // num_heads
    # head slicing along lanes requires 64/128-aligned head widths; other
    # widths (e.g. SigLIP-SO400M's 72) take the XLA path.
    # LATTECLIP_TEXT_XLA_ATTN=1 additionally routes short sequences (text,
    # L<128) to XLA — at L=77 the flash kernel's per-head dots are tiny and
    # the O(B*H*L^2) probs it avoids are only ~100 MB (perf experiment knob).
    short_seq_xla = (
        os.environ.get("LATTECLIP_TEXT_XLA_ATTN", "0") == "1" and qkv.shape[1] < 128
    )
    if _pallas_enabled() and head_dim in (64, 128) and not short_seq_xla:
        from latteclip_tpu.kernels.attention import flash_attention_qkv

        return flash_attention_qkv(qkv.astype(dtype), num_heads, causal)
    B, L, HD3 = qkv.shape
    HD = HD3 // 3
    D = HD // num_heads
    q, k, v = qkv[:, :, :HD], qkv[:, :, HD:2 * HD], qkv[:, :, 2 * HD:]
    out = xla_attention(
        q.reshape(B, L, num_heads, D),
        k.reshape(B, L, num_heads, D),
        v.reshape(B, L, num_heads, D),
        causal,
        dtype=dtype,
    )
    return out.reshape(B, L, HD)


def attention_core_qkv_segmented(
    qkv: jnp.ndarray,
    num_heads: int,
    seg_ids: jnp.ndarray,
    causal: bool = True,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Segment-masked attention on packed variable-length rows.

    ``qkv``: [R, P, 3*H*D]; ``seg_ids``: [R, P] int32 (0 = padding). Tokens
    attend within their own segment only (causally when ``causal``) — the
    compute core of true sequence packing (data/packing.py). Routes to the
    pallas kernel on TPU, plain XLA elsewhere.
    """
    head_dim = qkv.shape[-1] // 3 // num_heads
    if _pallas_enabled() and head_dim in (64, 128):
        from latteclip_tpu.kernels.attention import flash_attention_qkv_segmented

        return flash_attention_qkv_segmented(
            qkv.astype(dtype), num_heads, seg_ids, causal
        )
    B, L, HD3 = qkv.shape
    HD = HD3 // 3
    D = HD // num_heads
    same = seg_ids[:, :, None] == seg_ids[:, None, :]       # [B, L, L]
    bias = jnp.where(same, 0.0, -1e9).astype(jnp.float32)[:, None]  # [B,1,L,L]
    q, k, v = qkv[:, :, :HD], qkv[:, :, HD:2 * HD], qkv[:, :, 2 * HD:]
    out = xla_attention(
        q.reshape(B, L, num_heads, D),
        k.reshape(B, L, num_heads, D),
        v.reshape(B, L, num_heads, D),
        causal,
        dtype=dtype,
        bias=bias,
    )
    return out.reshape(B, L, HD)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    causal: bool = False,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Fused attention on packed-head [B, L, H*D] tensors."""
    if _pallas_enabled():
        from latteclip_tpu.kernels.attention import flash_attention_packed

        return flash_attention_packed(
            q.astype(dtype), k.astype(dtype), v.astype(dtype), num_heads, causal
        )
    B, L, HD = q.shape
    D = HD // num_heads
    out = xla_attention(
        q.reshape(B, L, num_heads, D),
        k.reshape(B, L, num_heads, D),
        v.reshape(B, L, num_heads, D),
        causal,
        dtype=dtype,
    )
    return out.reshape(B, L, HD)
