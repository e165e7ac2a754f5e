"""ConvNeXt vision tower (native replacement for the reference's timm trunk).

The reference reaches ConvNeXt through timm (``src/open_clip/timm_model.py:28-108``
with ``vision_cfg.timm_model_name`` = ``convnext_*``; the 11 convnext model
configs all set ``timm_pool=''`` → trunk global-avg-pool + head LayerNorm, and
``timm_proj`` linear or mlp). timm is not installed in this environment, so the
trunk is implemented natively from the published architecture
(Liu et al., *A ConvNet for the 2020s*, arXiv 2201.03545; timm semantics:
channels-last block norm/MLP, LayerScale ``gamma``, stochastic depth with a
linear rate ramp over all blocks):

- stem: 4x4/4 conv + LayerNorm (eps 1e-6)
- stage s: [LayerNorm + 2x2/2 conv downsample (s>0)] + depths[s] blocks
- block: 7x7 depthwise conv -> LN -> Linear C->4C -> GELU -> Linear 4C->C
  -> gamma * -> drop-path + residual
- head: global average pool -> LayerNorm -> proj (linear, or timm-Mlp with
  hidden 2*embed_dim for the ``_d`` configs; final proj bias=False, matching
  ``timm_model.py:102-106`` with the default ``proj_bias=False``)

TPU choices: NHWC layout end-to-end (``lax.conv_general_dilated`` with HWIO
kernels, ``feature_group_count=C`` for the depthwise conv — XLA maps these
onto the MXU directly), blocks within a stage stacked into one pytree and
driven by ``lax.scan`` (one trace/compile per stage, not per block), per-block
drop-path rates carried as a scanned array, optional per-block
``jax.checkpoint`` rematerialisation. All norm statistics in f32; conv/GEMM
inputs in the compute dtype (bf16 policy).

Checkpoint I/O uses the timm/OpenCLIP key layout (``visual.trunk.stem.0.*``,
``visual.trunk.stages.{s}.blocks.{b}.conv_dw/norm/mlp.fc1/mlp.fc2/gamma``,
``visual.trunk.stages.{s}.downsample.0/1.*``, ``visual.trunk.head.norm.*``,
``visual.head.proj.*`` or ``visual.head.mlp.*``) so reference-built convnext
checkpoints load directly (see core/checkpoint.py).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.models.layers import Params, gelu, layer_norm

# timm trunk table: model name -> (per-stage block depths, per-stage dims).
# Published constants (timm convnext_*; paper Table 1 + laion scale-ups).
CONVNEXT_TRUNKS: Dict[str, Any] = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnext_xxlarge": ((3, 4, 30, 3), (384, 768, 1536, 3072)),
}


def _conv(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray], stride: int,
          padding: int, dtype: jnp.dtype, groups: int = 1) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(dtype)


def _drop_path(x: jnp.ndarray, rate: jnp.ndarray, rng: Optional[jax.Array]) -> jnp.ndarray:
    """Per-sample stochastic depth (timm drop_path): keep-mask [B,1,1,1],
    survivors scaled by 1/keep. ``rate`` is a traced scalar (scanned over
    blocks), so the mask math stays inside one compiled scan body."""
    if rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
    return jnp.where(mask, x.astype(jnp.float32) / keep, 0.0).astype(x.dtype)


def _block(x: jnp.ndarray, p: Params, eps: float, dtype: jnp.dtype,
           dp_rate: jnp.ndarray, rng: Optional[jax.Array]) -> jnp.ndarray:
    """One ConvNeXt block, channels-last (timm conv_mlp=False semantics)."""
    C = x.shape[-1]
    shortcut = x
    y = _conv(x, p["dw_w"], p["dw_b"], 1, 3, dtype, groups=C)
    y = layer_norm(y, p["norm_scale"], p["norm_bias"], eps=eps)
    y = y.astype(dtype) @ p["fc1_w"].astype(dtype) + p["fc1_b"].astype(dtype)
    y = gelu(y)
    y = y @ p["fc2_w"].astype(dtype) + p["fc2_b"].astype(dtype)
    y = (y.astype(jnp.float32) * p["gamma"].astype(jnp.float32)).astype(dtype)
    return shortcut + _drop_path(y, dp_rate, rng)


def init_convnext_params(rng: jax.Array, cfg, embed_dim: int) -> Params:
    """Random init: trunc-normal(0.02) convs/linears, zero biases, gamma at
    ``ls_init_value`` (timm ``_init_weights``; init parity is not
    checkpoint-relevant — reference convnext runs always load pretrained)."""
    depths, dims = cfg.depths, cfg.dims
    keys = iter(jax.random.split(rng, 4 + 2 * sum(depths) + 16))

    def tn(shape, std=0.02):
        return jax.random.truncated_normal(next(keys), -2.0, 2.0, shape) * std

    stem: Params = {
        "conv_w": tn((4, 4, 3, dims[0])), "conv_b": jnp.zeros((dims[0],)),
        "norm_scale": jnp.ones((dims[0],)), "norm_bias": jnp.zeros((dims[0],)),
    }
    stages: List[Params] = []
    for s, (depth, dim) in enumerate(zip(depths, dims)):
        stage: Params = {}
        if s > 0:
            stage["down"] = {
                "norm_scale": jnp.ones((dims[s - 1],)),
                "norm_bias": jnp.zeros((dims[s - 1],)),
                "conv_w": tn((2, 2, dims[s - 1], dim)),
                "conv_b": jnp.zeros((dim,)),
            }
        hidden = 4 * dim
        stage["blocks"] = {
            "dw_w": jnp.stack([tn((7, 7, 1, dim)) for _ in range(depth)]),
            "dw_b": jnp.zeros((depth, dim)),
            "norm_scale": jnp.ones((depth, dim)),
            "norm_bias": jnp.zeros((depth, dim)),
            "fc1_w": jnp.stack([tn((dim, hidden)) for _ in range(depth)]),
            "fc1_b": jnp.zeros((depth, hidden)),
            "fc2_w": jnp.stack([tn((hidden, dim)) for _ in range(depth)]),
            "fc2_b": jnp.zeros((depth, dim)),
            "gamma": jnp.full((depth, dim), cfg.ls_init_value),
        }
        stages.append(stage)
    D = dims[-1]
    head: Params = {
        "norm_scale": jnp.ones((D,)), "norm_bias": jnp.zeros((D,)),
    }
    if cfg.proj == "linear":
        head["proj_w"] = tn((D, embed_dim), std=D ** -0.5)
    elif cfg.proj == "mlp":
        head["mlp_fc1_w"] = tn((D, 2 * embed_dim), std=D ** -0.5)
        head["mlp_fc1_b"] = jnp.zeros((2 * embed_dim,))
        head["mlp_fc2_w"] = tn((2 * embed_dim, embed_dim), std=(2 * embed_dim) ** -0.5)
    elif cfg.proj != "none":
        raise ValueError(f"unknown convnext proj '{cfg.proj}'")
    return {"stem": stem, "stages": stages, "head": head}


def convnext_forward(
    params: Params,
    cfg,  # ConvNeXtVisionConfig
    images: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    remat: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    **_unused,
) -> jnp.ndarray:
    """Images [B, S, S, 3] -> projected features [B, embed_dim] (f32)."""
    depths = cfg.depths
    eps = cfg.ln_eps
    # linear stochastic-depth ramp over ALL blocks (timm convnext.py dp_rates)
    total = sum(depths)
    ramp = np.linspace(0.0, cfg.drop_path, total) if cfg.drop_path else np.zeros(total)
    use_dp = train and cfg.drop_path > 0 and rng is not None

    p = params["stem"]
    x = _conv(images, p["conv_w"], p["conv_b"], 4, 0, dtype)
    x = layer_norm(x, p["norm_scale"], p["norm_bias"], eps=eps).astype(dtype)

    done = 0
    for s, stage in enumerate(params["stages"]):
        if s > 0:
            d = stage["down"]
            x = layer_norm(x, d["norm_scale"], d["norm_bias"], eps=eps).astype(dtype)
            x = _conv(x, d["conv_w"], d["conv_b"], 2, 0, dtype)
        rates = jnp.asarray(ramp[done:done + depths[s]], dtype=jnp.float32)
        done += depths[s]
        if use_dp:
            stage_rng = jax.random.fold_in(rng, s)
            block_rngs = jax.random.split(stage_rng, depths[s])
        else:
            block_rngs = None

        def body(h, scanned):
            if use_dp:
                bp, rate, brng = scanned
            else:
                (bp, rate), brng = scanned, None
            h = _block(h, bp, eps, dtype, rate, brng)
            return h, None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        scanned = (stage["blocks"], rates, block_rngs) if use_dp else (stage["blocks"], rates)
        x, _ = jax.lax.scan(body, x, scanned)

    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    h = params["head"]
    pooled = layer_norm(pooled, h["norm_scale"], h["norm_bias"], eps=eps)
    if cfg.proj == "linear":
        out = pooled.astype(dtype) @ h["proj_w"].astype(dtype)
    elif cfg.proj == "mlp":
        y = pooled.astype(dtype) @ h["mlp_fc1_w"].astype(dtype) + h["mlp_fc1_b"].astype(dtype)
        y = gelu(y)
        out = y @ h["mlp_fc2_w"].astype(dtype)
    else:  # 'none'
        out = pooled
    return out.astype(jnp.float32)
