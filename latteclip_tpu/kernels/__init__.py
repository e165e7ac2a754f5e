"""TPU kernels: pallas implementations of the hot ops with XLA fallbacks.

``attention_core`` is the single dispatch point used by the model towers.
On TPU it routes to the pallas flash-attention kernel (``attention.py``);
elsewhere (CPU tests, debugging) it uses a plain-XLA reference
implementation. Set ``LATTECLIP_DISABLE_PALLAS=1`` to force the XLA path.
"""
from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional

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


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Reference attention in plain XLA. q/k/v: [B, L, H, Hd] -> [B, L, H, Hd].

    Logit accumulation and softmax in f32 (matches torch-AMP semantics of
    the reference's nn.MultiheadAttention path, reference
    src/open_clip/transformer.py:202,227-229).
    """
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    q = (q * scale).astype(dtype)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k.astype(dtype), preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(dtype), v.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Dispatch to the pallas fused attention on TPU, XLA elsewhere."""
    if _pallas_enabled():
        from latteclip_tpu.kernels.attention import flash_attention

        try:
            return flash_attention(q, k, v, mask, dtype=dtype)
        except NotImplementedError:
            pass
    return xla_attention(q, k, v, mask, dtype=dtype)
