"""Pallas flash-attention for the CLIP towers (placeholder — see round plan).

Implemented in a later milestone this round; until then the dispatcher in
``kernels/__init__.py`` falls back to the XLA path.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    raise NotImplementedError
