"""Transformer building blocks as pure functions over param pytrees.

Numerics mirror the reference blocks (pre-LN residual attention,
GELU/QuickGELU MLP — reference ``src/open_clip/transformer.py:188-243``) but
the implementation is TPU-first:

* parameters of all layers are **stacked** along a leading layer axis and the
  block is driven by ``jax.lax.scan`` — one compiled block regardless of
  depth, optional per-block rematerialisation via ``jax.checkpoint``;
* weights are stored ``[in, out]`` so every projection is a plain ``x @ W``
  feeding the MXU;
* precision policy: parameters live in float32, matmul inputs are cast to the
  configured compute dtype (bfloat16), LayerNorm and softmax statistics are
  computed in float32 — the TPU-native equivalent of the reference's AMP fp16
  + ``LayerNormFp32`` arrangement (reference
  ``src/open_clip/transformer.py:15-21``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

LN_EPS = 1e-5

# Which named intermediates per-block remat pins instead of recomputing.
# Override via LATTECLIP_REMAT_SAVE (comma-separated). Names are per-tower
# suffixed: "qkv_proj_v"/"qkv_proj_t", "attn_res_v"/"attn_res_t",
# "mlp_act_v"/"mlp_act_t" — e.g. adding "qkv_proj_v" trades ~465 MB/layer of
# HBM (ViT-B/16 bs512) for skipping the vision LN+QKV GEMM recompute
# (tools/remat_sweep.py measures the options).
import os as _os

# NOTE: the env value REPLACES the default set — include flash_out,flash_lse
# yourself or the attention forward gets recomputed in backward.
REMAT_SAVE_NAMES = tuple(
    name.strip()
    for name in _os.environ.get("LATTECLIP_REMAT_SAVE", "flash_out,flash_lse").split(",")
    if name.strip()
)

# lax.scan unroll factor for the layer stack. 1 = rolled while-loop (fast
# compile, one program per block). Larger values let XLA schedule across
# layer boundaries and turn the per-layer dynamic-update-slice gradient
# stacking into statically-indexed writes (measured round 5: +4.1% whole
# step on packed ViT-B/32, 1633.5 -> 1699.7 img/s; the rolled trace shows
# ~44 ms/step in those DUS fusions); the cost is compile time roughly
# linear in the factor (~210 s for ViT-B on the remote TPU).
# Default "auto": fully unroll stacks of <= _AUTO_UNROLL_MAX_LAYERS on TPU
# when the per-layer activation tile is small enough, stay rolled elsewhere
# (CPU test compiles would pay 12x for nothing). Calibration (round 5,
# packed steps, same sessions): ViT-B/32 vision bs512 [512,50,768] = 19.7M
# elements unrolled WINS (+4.1% rolled->unrolled; enables bs512 no-remat
# that OOMs rolled); ViT-B/16 vision bs512 [512,197,768] = 77.5M LOSES
# (unroll=12 fails to compile, unroll=4 runs 2% slower than rolled). The
# threshold sits between: 24M elements.
_SCAN_UNROLL_ENV = _os.environ.get("LATTECLIP_SCAN_UNROLL", "auto")
_AUTO_UNROLL_MAX_LAYERS = 16
_AUTO_UNROLL_MAX_ELEMS = 24_000_000


def _scan_unroll(n_layers: int, x_shape=None) -> int:
    if _SCAN_UNROLL_ENV != "auto":
        return max(1, int(_SCAN_UNROLL_ENV))
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - uninitialized backend
        on_tpu = False
    if not on_tpu or n_layers > _AUTO_UNROLL_MAX_LAYERS:
        return 1
    elems = 1
    for d in (x_shape or ()):
        elems *= int(d)
    return n_layers if elems <= _AUTO_UNROLL_MAX_ELEMS else 1


def layer_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = LN_EPS
) -> jnp.ndarray:
    """LayerNorm with f32 statistics, output cast back to input dtype.

    ``eps`` defaults to torch's 1e-5; SigLIP/big_vision towers use flax's
    1e-6 (plumbed from the config's ``ln_eps``)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU default is the exact (erf) formulation
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    # flax nn.gelu default (big_vision/SigLIP towers use this approximation)
    return jax.nn.gelu(x, approximate=True)


def dense(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray], dtype: jnp.dtype) -> jnp.ndarray:
    # emit the compute dtype directly: the MXU accumulates in f32 internally
    # regardless, and a f32 intermediate would be kept live for backward
    # (it dominated HBM in no-remat configs) — bias add in dtype matches
    # torch-AMP semantics
    if isinstance(w, dict) and "int8" in w:  # quantized kernel (models/quantize.py)
        from latteclip_tpu.models.quantize import int8_dense

        return int8_dense(x, w, b, dtype)
    y = jnp.dot(x.astype(dtype), w.astype(dtype), preferred_element_type=dtype)
    if b is not None:
        y = y + b.astype(dtype)
    return y


def scaled_cosine_attention(
    x: jnp.ndarray,
    p: Params,
    num_heads: int,
    *,
    causal: bool = False,
    logit_scale_max: float = 4.6051702,  # log(1/0.01), reference transformer.py:96
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Scaled-cosine attention (reference custom ``Attention``,
    transformer.py:88-162): q/k are l2-normalized per head, scores scaled by
    a learned per-head ``exp(clamp(logit_scale, max))``; optional learned
    per-head output scaling (``head_scale``, the ``scale_heads`` variant).

    Params: ``in_proj_w (D, 3D)``, ``in_proj_b``, ``out_proj_w``,
    ``out_proj_b``, optional ``logit_scale (H, 1, 1)``, ``head_scale
    (H, 1, 1)``. Plain-XLA path: the variant is config-reachable but cold
    (the reference never instantiates it from any shipped config), so it
    does not warrant a pallas kernel.
    """
    B, L, D = x.shape
    hd = D // num_heads
    qkv = dense(x, p["in_proj_w"], p.get("in_proj_b"), dtype)
    q, k, v = (qkv[..., i * D:(i + 1) * D].reshape(B, L, num_heads, hd) for i in range(3))

    if "logit_scale" in p:
        qn = l2_normalize(q.astype(jnp.float32))
        kn = l2_normalize(k.astype(jnp.float32))
        s = jnp.einsum("bqhd,bkhd->bhqk", qn.astype(dtype), kn.astype(dtype),
                       preferred_element_type=jnp.float32)
        scale = jnp.exp(jnp.minimum(p["logit_scale"], logit_scale_max))
        s = s * scale[None, :, 0, 0][:, :, None, None]
    else:
        s = jnp.einsum("bqhd,bkhd->bhqk", (q * hd ** -0.5).astype(dtype), k.astype(dtype),
                       preferred_element_type=jnp.float32)
    if causal:
        i = jnp.arange(L)[:, None]
        j = jnp.arange(L)[None, :]
        s = s + jnp.where(j > i, -1e9, 0.0).astype(jnp.float32)
    probs = jax.nn.softmax(s, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(dtype),
                     preferred_element_type=jnp.float32)
    if "head_scale" in p:  # scale_heads variant (transformer.py:121-124,155-157)
        out = out * p["head_scale"][None, None, :, 0, 0][..., None]
    out = out.reshape(B, L, D).astype(dtype)
    return dense(out, p["out_proj_w"], p["out_proj_b"], dtype)


def mlp(x: jnp.ndarray, p: Params, act, dtype: jnp.dtype) -> jnp.ndarray:
    h = dense(x, p["c_fc_w"], p["c_fc_b"], dtype)
    h = act(h)
    return dense(h, p["c_proj_w"], p["c_proj_b"], dtype)


def residual_block(
    x: jnp.ndarray,
    p: Params,
    num_heads: int,
    causal: bool,
    act,
    dtype: jnp.dtype,
    tower: str = "",
    ln_eps: float = LN_EPS,
    seg_ids: jnp.ndarray = None,
) -> jnp.ndarray:
    """Pre-LN residual attention block (reference transformer.py:231-243).

    The LN→projection pairs go through the (flag-gated) fused pallas kernel;
    with the flag off this is exactly LN + dense. Intermediates are
    checkpoint-named with a per-tower suffix (``_v``/``_t``) so remat
    policies can pin them selectively (e.g. save vision ``qkv_proj_v`` but
    let the smaller text tower recompute).
    """
    from jax.ad_checkpoint import checkpoint_name

    from latteclip_tpu.kernels import attention_core_qkv, attention_core_qkv_segmented
    from latteclip_tpu.kernels.fused_ln_linear import ln_linear

    qkv = ln_linear(x, p["ln_1_scale"], p["ln_1_bias"], p["in_proj_w"], p["in_proj_b"], dtype, eps=ln_eps)
    # pinning this skips the LN+QKV GEMM recompute in backward
    qkv = checkpoint_name(qkv, f"qkv_proj{tower}")
    if seg_ids is not None:  # packed variable-length rows (data/packing.py)
        attn = attention_core_qkv_segmented(qkv, num_heads, seg_ids, causal, dtype=dtype)
    else:
        attn = attention_core_qkv(qkv, num_heads, causal, dtype=dtype)
    attn = dense(attn, p["out_proj_w"], p["out_proj_b"], dtype)
    if "ls_1_gamma" in p:  # LayerScale (reference transformer.py:39-46,241-242)
        attn = attn * p["ls_1_gamma"].astype(dtype)
    # pinning the attention residual sum skips the out-proj recompute
    x = checkpoint_name(x + attn, f"attn_res{tower}")

    h = ln_linear(x, p["ln_2_scale"], p["ln_2_bias"], p["c_fc_w"], p["c_fc_b"], dtype, eps=ln_eps)
    # pinning the activation output skips BOTH MLP GEMM recomputes
    h = checkpoint_name(act(h), f"mlp_act{tower}")
    h = dense(h, p["c_proj_w"], p["c_proj_b"], dtype)
    if "ls_2_gamma" in p:
        h = h * p["ls_2_gamma"].astype(dtype)
    return x + h


def transformer_stack(
    x: jnp.ndarray,
    stacked: Params,
    num_heads: int,
    causal: bool,
    act,
    dtype: jnp.dtype,
    remat: bool = False,
    tower: str = "",
    ln_eps: float = LN_EPS,
    seg_ids: jnp.ndarray = None,
) -> jnp.ndarray:
    """Run a stack of residual blocks via lax.scan over the layer axis."""

    def body(carry, layer_params):
        out = residual_block(carry, layer_params, num_heads, causal, act, dtype,
                             tower, ln_eps, seg_ids=seg_ids)
        return out, None

    if remat:
        # Save the (small) flash-attention outputs + logsumexps across the
        # checkpoint boundary: the kernel's residuals are exactly its inputs
        # plus lse, so with out/lse pinned the backward recompute eliminates
        # the attention forward entirely (lse is a primal output of the
        # custom_vjp precisely to enable this). REMAT_SAVE_NAMES may
        # additionally pin the tower-suffixed intermediates ("qkv_proj_v",
        # "attn_res_t", ...) to skip GEMM recomputes when HBM allows.
        policy = jax.checkpoint_policies.save_only_these_names(*REMAT_SAVE_NAMES)
        body = jax.checkpoint(body, prevent_cse=False, policy=policy)

    n_layers = jax.tree.leaves(stacked)[0].shape[0]
    unroll = min(_scan_unroll(n_layers, x.shape), n_layers)
    if n_layers % unroll:
        unroll = 1  # keep the rolled form when the factor doesn't divide
    x, _ = jax.lax.scan(body, x, stacked, unroll=unroll)
    return x


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Match torch F.normalize: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)
