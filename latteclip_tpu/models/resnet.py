"""ModifiedResNet vision tower (OpenAI CLIP RN50 family), NHWC.

Numerics match the reference ``ModifiedResNet``
(``src/open_clip/modified_resnet.py``): 3-conv stem with avgpool,
anti-aliased strided bottlenecks (avgpool before the stride-1 conv3 /
downsample conv), and the ``AttentionPool2d`` head whose query is the
spatial mean token. TPU choices: NHWC layout, ``lax.conv_general_dilated``
with HWIO kernels, inference-mode BatchNorm (running statistics; CLIP's RN
checkpoints ship them, and the LatteCLIP fine-tune recipes all use ViTs —
train-mode batch statistics are intentionally unsupported), and the
attention pool computes only the class-token query (mathematically identical
to the reference's full-matrix form, reference ``modified_resnet.py:68-92``,
at 1/(HW+1) of the attention cost).
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from latteclip_tpu.models.layers import Params

BN_EPS = 1e-5


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding: int = 0,
           dtype: jnp.dtype = jnp.bfloat16) -> jnp.ndarray:
    """NHWC conv with HWIO kernel."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def batch_norm(x: jnp.ndarray, p: Params, prefix: str) -> jnp.ndarray:
    """Inference-mode BN from running statistics (f32 math)."""
    scale = p[f"{prefix}_scale"].astype(jnp.float32)
    bias = p[f"{prefix}_bias"].astype(jnp.float32)
    mean = p[f"{prefix}_mean"].astype(jnp.float32)
    var = p[f"{prefix}_var"].astype(jnp.float32)
    inv = scale * jax.lax.rsqrt(var + BN_EPS)
    return (x.astype(jnp.float32) * inv + (bias - mean * inv)).astype(x.dtype)


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 1:
        return x
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, k, k, 1), (1, k, k, 1), "VALID",
    )
    return (summed / (k * k)).astype(x.dtype)


def bottleneck(x: jnp.ndarray, p: Params, stride: int, dtype: jnp.dtype) -> jnp.ndarray:
    """Reference Bottleneck (modified_resnet.py:10-55)."""
    out = jax.nn.relu(batch_norm(conv2d(x, p["conv1_w"], dtype=dtype), p, "bn1"))
    out = jax.nn.relu(batch_norm(conv2d(out, p["conv2_w"], padding=1, dtype=dtype), p, "bn2"))
    out = avg_pool(out, stride)
    out = batch_norm(conv2d(out, p["conv3_w"], dtype=dtype), p, "bn3")
    if "down_conv_w" in p:
        identity = avg_pool(x, stride)
        identity = batch_norm(conv2d(identity, p["down_conv_w"], dtype=dtype), p, "down_bn")
    else:
        identity = x
    return jax.nn.relu(out + identity)


def attention_pool(x: jnp.ndarray, p: Params, num_heads: int, dtype: jnp.dtype) -> jnp.ndarray:
    """AttentionPool2d with a single (mean-token) query.

    x: [B, H, W, C] -> [B, output_dim].
    """
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C).astype(jnp.float32)
    mean_tok = tokens.mean(axis=1, keepdims=True)
    seq = jnp.concatenate([mean_tok, tokens], axis=1) + p["pos_embed"].astype(jnp.float32)
    seq = seq.astype(dtype)

    head_dim = C // num_heads
    q = (seq[:, :1] @ p["q_w"].astype(dtype).T + p["q_b"].astype(dtype))   # [B, 1, C]
    k = seq @ p["k_w"].astype(dtype).T + p["k_b"].astype(dtype)            # [B, L, C]
    v = seq @ p["v_w"].astype(dtype).T + p["v_b"].astype(dtype)

    q = q.reshape(B, 1, num_heads, head_dim) * (head_dim ** -0.5)
    k = k.reshape(B, -1, num_heads, head_dim)
    v = v.reshape(B, -1, num_heads, head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    out = out.reshape(B, C).astype(dtype)
    return (out @ p["c_w"].astype(dtype).T + p["c_b"].astype(dtype)).astype(jnp.float32)


def _init_bn(prefix: str, ch: int) -> Params:
    return {
        f"{prefix}_scale": jnp.ones((ch,)),
        f"{prefix}_bias": jnp.zeros((ch,)),
        f"{prefix}_mean": jnp.zeros((ch,)),
        f"{prefix}_var": jnp.ones((ch,)),
    }


def init_resnet_params(rng: jax.Array, cfg, embed_dim: int) -> Params:
    """Random init (he-normal convs; bn3 scale zeroed as in the reference
    init_parameters, modified_resnet.py:149-152)."""
    keys = iter(jax.random.split(rng, 128))

    def conv(h, w, i, o):
        fan_in = h * w * i
        return jax.random.normal(next(keys), (h, w, i, o)) * (2.0 / fan_in) ** 0.5

    w = cfg.width
    stem: Params = {
        "conv1_w": conv(3, 3, 3, w // 2), **_init_bn("bn1", w // 2),
        "conv2_w": conv(3, 3, w // 2, w // 2), **_init_bn("bn2", w // 2),
        "conv3_w": conv(3, 3, w // 2, w), **_init_bn("bn3", w),
    }
    stages: List[List[Params]] = []
    inplanes = w
    for stage_idx, blocks in enumerate(cfg.layers):
        planes = w * (2 ** stage_idx)
        stage: List[Params] = []
        for block_idx in range(blocks):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            p: Params = {
                "conv1_w": conv(1, 1, inplanes, planes), **_init_bn("bn1", planes),
                "conv2_w": conv(3, 3, planes, planes), **_init_bn("bn2", planes),
                "conv3_w": conv(1, 1, planes, planes * 4), **_init_bn("bn3", planes * 4),
            }
            p["bn3_scale"] = jnp.zeros((planes * 4,))
            if stride > 1 or inplanes != planes * 4:
                p["down_conv_w"] = conv(1, 1, inplanes, planes * 4)
                p.update(_init_bn("down_bn", planes * 4))
            stage.append(p)
            inplanes = planes * 4
        stages.append(stage)

    C = cfg.embed_width
    spacial = cfg.image_size // 32
    std = C ** -0.5
    attnpool: Params = {
        "pos_embed": jax.random.normal(next(keys), (spacial * spacial + 1, C)) / C ** 0.5,
        "q_w": jax.random.normal(next(keys), (C, C)) * std,
        "q_b": jnp.zeros((C,)),
        "k_w": jax.random.normal(next(keys), (C, C)) * std,
        "k_b": jnp.zeros((C,)),
        "v_w": jax.random.normal(next(keys), (C, C)) * std,
        "v_b": jnp.zeros((C,)),
        "c_w": jax.random.normal(next(keys), (embed_dim, C)) * std,
        "c_b": jnp.zeros((embed_dim,)),
    }
    return {"stem": stem, "stages": stages, "attnpool": attnpool}


def resnet_forward(
    params: Params,
    cfg,  # ResNetVisionConfig
    images: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    **_unused,
) -> jnp.ndarray:
    """Images [B, S, S, 3] -> pooled features [B, embed_dim] (f32)."""
    p = params["stem"]
    x = jax.nn.relu(batch_norm(conv2d(images, p["conv1_w"], stride=2, padding=1, dtype=dtype), p, "bn1"))
    x = jax.nn.relu(batch_norm(conv2d(x, p["conv2_w"], padding=1, dtype=dtype), p, "bn2"))
    x = jax.nn.relu(batch_norm(conv2d(x, p["conv3_w"], padding=1, dtype=dtype), p, "bn3"))
    x = avg_pool(x, 2)

    for stage_idx, stage in enumerate(params["stages"]):
        for block_idx, block in enumerate(stage):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            x = bottleneck(x, block, stride, dtype)

    return attention_pool(x, params["attnpool"], cfg.heads, dtype)
