"""Pallas flash attention for CLIP towers (short sequences, packed heads).

The CLIP workloads are many-heads × short-sequence (vision 50/197/577
tokens, text 77), batch-dominated — the opposite regime of LM flash kernels
that tile long sequences. Design:

* the kernel consumes the **natural projection layout** ``[B, L, H*D]``
  (exactly what the fused QKV matmul produces) and slices heads along the
  lane dimension inside the kernel — there are NO host-side transposes or
  pad copies at all (those dominated an earlier [B,H,L,D] variant: 6×300 MB
  of pure data movement per ViT-B layer);
* one head's full scores fit in VMEM, so there is no online-softmax tiling;
  the grid packs ``G`` batch rows per program and loops heads statically,
  with batched dot_general over G keeping the MXU fed;
* masks (causal + implicit length) are synthesised from iota — nothing
  streamed from HBM;
* forward stores the output plus per-(row, head) logsumexp; the O(B·H·L²)
  softmax probabilities the XLA path keeps for backward (~28 GB at ViT-B/16
  bs512) never exist in HBM;
* backward recomputes probabilities from (q, k, lse) and emits dq/dk/dv in
  one fused kernel.

Numerics match the XLA reference path (``kernels.xla_attention``): bf16
matmul inputs, f32 score accumulation + softmax. ``tests/test_kernels.py``
checks values and grads; the same kernel code runs in interpret mode on CPU
and compiled on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

_QKT = (((2,), (2,)), ((0,), (0,)))    # [G,Lq,D] x [G,Lk,D] -> [G,Lq,Lk]
_PV = (((2,), (1,)), ((0,), (0,)))     # [G,Lq,Lk] x [G,Lk,D] -> [G,Lq,D]
_PT_DO = (((1,), (1,)), ((0,), (0,)))  # [G,Lq,Lk] x [G,Lq,D] -> [G,Lk,D]

_VMEM_BUDGET = 10 * 1024 * 1024  # headroom under the 16M scoped limit


def _fwd_bytes(g: int, l: int, hd: int, d: int) -> int:
    # tiles q/k/v/o [G,L,HD] + per-head s,p f32 + pb bf16
    return g * (4 * l * hd * 2 + 2 * l * l * 4 + l * l * 2)


def _bwd_bytes(g: int, l: int, hd: int, d: int) -> int:
    # tiles q/k/v/do [G,L,HD] bf16 + dq/dk/dv f32 + s,p,dp f32 + pb,ds bf16
    return g * (4 * l * hd * 2 + 3 * l * hd * 4 + 3 * l * l * 4 + 2 * l * l * 2)


def _group_size(b: int, l: int, hd: int, d: int, cost_fn) -> int:
    for g in (8, 4, 2):
        if b % g == 0 and cost_fn(g, l, hd, d) <= _VMEM_BUDGET:
            return g
    return 1


def _causal_bias(L: int) -> jnp.ndarray:
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    return jnp.where(cols > rows, NEG_INF, 0.0).astype(jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, H, D, causal):
    L = q_ref.shape[1]
    bias = _causal_bias(L)[None] if causal else None
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, :, sl].astype(jnp.bfloat16)   # [G, L, D]
        k = k_ref[:, :, sl].astype(jnp.bfloat16)
        v = v_ref[:, :, sl].astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k, _QKT, preferred_element_type=jnp.float32)
        s = s * scale
        if bias is not None:
            s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, _PV, preferred_element_type=jnp.float32
        ) / l
        o_ref[:, :, sl] = o.astype(o_ref.dtype)
        lse_ref[:, h, :] = m[..., 0] + jnp.log(l[..., 0])


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, scale, H, D, causal):
    L = q_ref.shape[1]
    bias = _causal_bias(L)[None] if causal else None
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, :, sl].astype(jnp.bfloat16)
        k = k_ref[:, :, sl].astype(jnp.bfloat16)
        v = v_ref[:, :, sl].astype(jnp.bfloat16)
        do = do_ref[:, :, sl].astype(jnp.bfloat16)
        lse = lse_ref[:, h, :]                      # [G, L]

        s = jax.lax.dot_general(q, k, _QKT, preferred_element_type=jnp.float32)
        s = s * scale
        if bias is not None:
            s = s + bias
        p = jnp.exp(s - lse[..., None])             # softmax, recomputed (f32)
        pb = p.astype(jnp.bfloat16)

        dv = jax.lax.dot_general(pb, do, _PT_DO, preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _QKT, preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(jnp.bfloat16)
        dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32)
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _flash_fwd_impl(q, k, v, causal: bool, num_heads: int):
    """q/k/v: [B, L, H*D] packed heads -> (out [B, L, H*D], lse [B, H, L])."""
    dtype = q.dtype
    B, L, HD = q.shape
    D = HD // num_heads
    G = _group_size(B, L, HD, D, _fwd_bytes)
    scale = D ** -0.5

    tile = pl.BlockSpec((G, L, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((G, num_heads, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, H=num_heads, D=D, causal=causal),
        grid=(B // G,),
        in_specs=[tile, tile, tile],
        out_specs=[tile, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, HD), dtype),
            jax.ShapeDtypeStruct((B, num_heads, L), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * L * L * D,
            bytes_accessed=4 * B * L * HD * 2,
            transcendentals=B * num_heads * L * L,
        ),
        interpret=_interpret(),
    )(q, k, v)
    return o, lse


def _make_fa(num_heads: int):
    # lse is a PRIMAL output (not just a residual): under jax.checkpoint with
    # a policy saving {flash_out, flash_lse}, the residuals (q, k, v, lse)
    # are then all either recomputed upstream or saved, so partial
    # evaluation eliminates the forward kernel from the backward recompute.
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def fa(q, k, v, causal=False):
        return _flash_fwd_impl(q, k, v, causal, num_heads)

    def fwd(q, k, v, causal):
        from jax.ad_checkpoint import checkpoint_name

        o, lse = _flash_fwd_impl(q, k, v, causal, num_heads)
        o = checkpoint_name(o, "flash_out")
        lse = checkpoint_name(lse, "flash_lse")
        return (o, lse), (q, k, v, lse)

    def bwd(causal, res, cots):
        g, _g_lse = cots  # lse cotangent is unused (lse feeds no real output)
        q, k, v, lse = res
        B, L, HD = q.shape
        D = HD // num_heads
        G = _group_size(B, L, HD, D, _bwd_bytes)
        scale = D ** -0.5
        tile = pl.BlockSpec((G, L, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        lse_spec = pl.BlockSpec((G, num_heads, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_kernel, scale=scale, H=num_heads, D=D, causal=causal),
            grid=(B // G,),
            in_specs=[tile, tile, tile, tile, lse_spec],
            out_specs=[tile, tile, tile],
            out_shape=[
                jax.ShapeDtypeStruct((B, L, HD), q.dtype),
                jax.ShapeDtypeStruct((B, L, HD), k.dtype),
                jax.ShapeDtypeStruct((B, L, HD), v.dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=11 * B * num_heads * L * L * D,
                bytes_accessed=8 * B * L * HD * 2,
                transcendentals=B * num_heads * L * L,
            ),
            interpret=_interpret(),
        )(q, k, v, g.astype(q.dtype), lse)
        return dq, dk, dv

    fa.defvjp(fwd, bwd)
    return fa


_FA_CACHE = {}


def flash_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    causal: bool = False,
) -> jnp.ndarray:
    """Fused attention on packed-head [B, L, H*D] tensors.

    The fwd rule tags out/lse with checkpoint names so the remat policy in
    ``layers.transformer_stack`` can pin them across the boundary (see
    _make_fa for why that removes the kernel from the backward recompute).
    """
    if num_heads not in _FA_CACHE:
        _FA_CACHE[num_heads] = _make_fa(num_heads)
    out, _lse = _FA_CACHE[num_heads](q, k, v, causal)
    return out


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
) -> jnp.ndarray:
    """Compatibility wrapper for [B, L, H, D] inputs."""
    B, L, H, D = q.shape
    out = flash_attention_packed(
        q.reshape(B, L, H * D), k.reshape(B, L, H * D), v.reshape(B, L, H * D),
        H, causal,
    )
    return out.reshape(B, L, H, D)
