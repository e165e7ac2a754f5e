"""Fused LayerNorm → Linear pallas kernel (experimental, flag-gated).

The pre-LN transformer applies LayerNorm immediately before the QKV and MLP
up-projections; unfused, the normalized activations make a full HBM
round-trip between the VPU and the MXU (~310 MB per pass at ViT-B/16
bs512). This kernel computes LN (f32 statistics) and the matmul in one VMEM
residency. Backward is expressed with plain XLA ops via ``jax.vjp`` of the
unfused composition — identical math, so only the forward needs a kernel.

Enabled on TPU when ``LATTECLIP_FUSED_LN=1``. **Default off**: measured on
v5e at ViT-B/16 bs512 this kernel LOSES to XLA's own LN+matmul fusion
(433 vs 489 img/s) — XLA already avoids the HBM round-trip and pipelines the
weight streaming better than the per-program constant-block DMA here. Kept
as a correct, tested baseline for a future full-block fusion (which must
beat this bar).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from latteclip_tpu.models import layers as L

_VMEM_BUDGET = 10 * 1024 * 1024


def _kernel(x_ref, s_ref, b_ref, w_ref, wb_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)               # [G, L, D]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    xn = xn.astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)              # [D, O]
    # Mosaic requires a 32-bit matmul accumulator; cast on store
    y = jax.lax.dot_general(
        xn, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = (y + wb_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _group_size(b: int, l: int, d: int, o: int) -> int:
    w_bytes = d * o * 2
    for g in (8, 4, 2, 1):
        tile_bytes = g * l * (d * 2 + d * 4 + o * 2)  # x bf16 + xn f32 + out
        if b % g == 0 and w_bytes + tile_bytes <= _VMEM_BUDGET:
            return g
    return 0


def _unfused(x, scale, bias, w, wb, dtype, eps=L.LN_EPS):
    return L.dense(L.layer_norm(x, scale, bias, eps), w, wb, dtype)


@functools.lru_cache()
def _enabled() -> bool:
    if os.environ.get("LATTECLIP_FUSED_LN", "0") != "1":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _fwd_pallas(x, scale, bias, w, wb, dtype):
    B, Lx, D = x.shape
    O = w.shape[1]
    G = _group_size(B, Lx, D, O)
    if G == 0:
        return _unfused(x, scale, bias, w, wb, dtype)
    tile_in = pl.BlockSpec((G, Lx, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    tile_out = pl.BlockSpec((G, Lx, O), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM)
    vec_o = pl.BlockSpec((O,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((D, O), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=L.LN_EPS),
        grid=(B // G,),
        in_specs=[tile_in, vec_d, vec_d, mat, vec_o],
        out_specs=tile_out,
        out_shape=jax.ShapeDtypeStruct((B, Lx, O), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lx * D * O,
            bytes_accessed=B * Lx * (D + O) * 2 + D * O * 2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, scale, bias, w, wb)


@jax.custom_vjp
def fused_ln_linear(x, scale, bias, w, wb):
    """LN(x; scale, bias) @ w + wb, fused on TPU. Output dtype = x dtype."""
    return _fwd_pallas(x, scale, bias, w, wb, x.dtype)


def _fwd(x, scale, bias, w, wb):
    return _fwd_pallas(x, scale, bias, w, wb, x.dtype), (x, scale, bias, w, wb)


def _bwd(res, g):
    x, scale, bias, w, wb = res
    # identical math, plain XLA: jax builds the exact VJP of the composition
    _out, vjp = jax.vjp(lambda *a: _unfused(*a, x.dtype), x, scale, bias, w, wb)
    return vjp(g)


fused_ln_linear.defvjp(_fwd, _bwd)


def ln_linear(x, scale, bias, w, wb, dtype, eps=L.LN_EPS):
    """Dispatch: fused pallas kernel on TPU (flag-gated) or unfused XLA.

    Non-default ``eps`` (SigLIP's 1e-6) always takes the XLA path — the
    experimental kernel is compiled with the torch default and is off by
    default anyway (it loses to XLA fusion, see module docstring)."""
    if _enabled() and eps == L.LN_EPS and not isinstance(w, dict):
        return fused_ln_linear(x.astype(dtype), scale, bias, w, wb)
    return _unfused(x, scale, bias, w, wb, dtype, eps)
