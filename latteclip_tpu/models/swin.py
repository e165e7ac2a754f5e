"""Swin Transformer vision trunk — native JAX (windowed attention with
static reshapes, XLA-friendly shifted windows).

The reference reaches swin through timm
(``src/open_clip/timm_model.py:28-151``, config
``swin_base_patch4_window7_224.json``: ``timm_pool=''`` keeps the trunk's
default average pool, ``timm_proj='linear'`` adds an unbiased head Linear
to embed_dim). timm is absent, so this implements the published
architecture (Swin Transformer, arXiv 2103.14030; key layout per timm's
``swin_transformer.py``):

* patch embed: stride-4 conv (as a reshape+matmul, like models/vit.py) +
  LayerNorm;
* 4 stages of pre-LN blocks with window-7 MSA: relative-position-bias
  table ``[(2w-1)^2, heads]`` gathered by a precomputed [49, 49] index;
  every odd block shifts the grid by ``w//2`` (``jnp.roll``) with an
  additive mask that kills cross-region attention; no shift when the grid
  equals the window (stage 3 at 224px);
* patch merging between stages: 2x2 concat -> LayerNorm(4C) ->
  unbiased Linear(4C -> 2C), applied at stage INPUT (timm's modern stage
  layout; the MSRA end-of-stage layout is the same computation — the
  importer accepts both key placements);
* final LayerNorm + global average pool, then the TimmModel head Linear.

All window partitions are static reshapes/transposes; attention runs on
the shared ``xla_attention`` core (49-token windows are too small for the
flash kernel to win). Oracle: a from-published-architecture torch swin in
``tests/test_swin.py`` validating forward parity + the checkpoint mapping.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.models import layers
from latteclip_tpu.models.layers import Params

SWIN_TRUNKS: Dict[str, Dict[str, Any]] = {
    # published swin-B shapes (arXiv 2103.14030 Table 7)
    "swin_base_patch4_window7_224": dict(
        embed_dim=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32),
        window=7, patch_size=4, mlp_ratio=4.0,
    ),
}


def relative_position_index(w: int) -> np.ndarray:
    """timm/MSRA [w*w, w*w] index into the (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)                              # [2, w*w]
    rel = flat[:, :, None] - flat[:, None, :]                 # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)                                        # [N, N]


def shift_attn_mask(grid: int, w: int, shift: int) -> np.ndarray:
    """[nW, w*w, w*w] additive mask (0 / -1e9) for shifted windows: after
    rolling by ``shift``, tokens from different original regions share a
    window and must not attend to each other (Swin paper fig. 4)."""
    img = np.zeros((grid, grid), np.int32)
    cnt = 0
    # region labels are laid out directly in the ROLLED frame (the wrapped
    # content occupies the last `shift` rows/cols), exactly like the Swin
    # reference's img_mask construction — no roll of the mask itself
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    nw = grid // w
    wins = img.reshape(nw, w, nw, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    mask = wins[:, :, None] != wins[:, None, :]
    return np.where(mask, -1e9, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * (H // w) * (W // w), w * w, C)


def _window_merge(x: jnp.ndarray, w: int, B: int, H: int, W: int) -> jnp.ndarray:
    C = x.shape[-1]
    x = x.reshape(B, H // w, W // w, w, w, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def init_swin_params(rng: jax.Array, cfg, embed_dim: int) -> Params:
    t = SWIN_TRUNKS[cfg.trunk]
    D0, depths, heads = t["embed_dim"], t["depths"], t["heads"]
    w, P, mr = t["window"], t["patch_size"], t["mlp_ratio"]
    k = iter(jax.random.split(rng, 8 + 6 * sum(depths)))
    table_len = (2 * w - 1) ** 2

    stages = []
    dim = D0
    for si, depth in enumerate(depths):
        stage: Dict[str, Any] = {}
        if si > 0:
            stage["merge"] = {
                "norm_scale": jnp.ones((4 * (dim // 2),)),
                "norm_bias": jnp.zeros((4 * (dim // 2),)),
                "reduction_w": jax.random.normal(next(k), (4 * (dim // 2), dim)) * (dim ** -0.5),
            }
        blocks = []
        hidden = int(dim * mr)
        for _ in range(depth):
            scale = dim ** -0.5
            blocks.append({
                "ln_1_scale": jnp.ones((dim,)), "ln_1_bias": jnp.zeros((dim,)),
                "in_proj_w": jax.random.normal(next(k), (dim, 3 * dim)) * scale,
                "in_proj_b": jnp.zeros((3 * dim,)),
                "bias_table": jax.random.normal(next(k), (table_len, heads[si])) * 0.02,
                "out_proj_w": jax.random.normal(next(k), (dim, dim)) * scale,
                "out_proj_b": jnp.zeros((dim,)),
                "ln_2_scale": jnp.ones((dim,)), "ln_2_bias": jnp.zeros((dim,)),
                "c_fc_w": jax.random.normal(next(k), (dim, hidden)) * scale,
                "c_fc_b": jnp.zeros((hidden,)),
                "c_proj_w": jax.random.normal(next(k), (hidden, dim)) * (hidden ** -0.5),
                "c_proj_b": jnp.zeros((dim,)),
            })
        stage["blocks"] = blocks
        stages.append(stage)
        dim = dim * 2 if si < len(depths) - 1 else dim

    return {
        "patch_kernel": jax.random.normal(next(k), (P * P * 3, D0)) * (D0 ** -0.5),
        "patch_bias": jnp.zeros((D0,)),
        "patch_norm_scale": jnp.ones((D0,)), "patch_norm_bias": jnp.zeros((D0,)),
        "stages": stages,
        "norm_scale": jnp.ones((dim,)), "norm_bias": jnp.zeros((dim,)),
        "proj": jax.random.normal(next(k), (dim, embed_dim)) * (dim ** -0.5),
    }


def _swin_block(x, p, heads: int, w: int, shift: int, rel_index, dtype,
                ln_eps: float):
    from latteclip_tpu.kernels import xla_attention

    B, H, W, C = x.shape
    hd = C // heads
    shortcut = x
    h = layers.layer_norm(x, p["ln_1_scale"], p["ln_1_bias"], ln_eps).astype(dtype)
    if shift:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    win = _window_partition(h, w)                             # [B*nW, w*w, C]
    qkv = layers.dense(win, p["in_proj_w"], p["in_proj_b"], dtype)
    N = w * w
    BW = win.shape[0]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rel_bias = p["bias_table"][rel_index]                     # [N, N, heads]
    bias = rel_bias.transpose(2, 0, 1).astype(jnp.float32)[None]  # [1, h, N, N]
    if shift:
        mask = jnp.asarray(shift_attn_mask(H, w, shift))      # [nW, N, N]
        nW = mask.shape[0]
        bias = bias + jnp.tile(mask[:, None], (B, 1, 1, 1))   # [B*nW, 1|h, N, N]
    out = xla_attention(
        q.reshape(BW, N, heads, hd), k.reshape(BW, N, heads, hd),
        v.reshape(BW, N, heads, hd), dtype=dtype, bias=bias,
    ).reshape(BW, N, C)
    out = layers.dense(out, p["out_proj_w"], p["out_proj_b"], dtype)
    out = _window_merge(out, w, B, H, W)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    x = shortcut + out

    h = layers.layer_norm(x, p["ln_2_scale"], p["ln_2_bias"], ln_eps).astype(dtype)
    h = layers.gelu(layers.dense(h, p["c_fc_w"], p["c_fc_b"], dtype))
    return x + layers.dense(h, p["c_proj_w"], p["c_proj_b"], dtype)


def _patch_merge(x, p, dtype, ln_eps):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    # timm concat order: (0,0), (1,0), (0,1), (1,1) along channels
    x = jnp.concatenate([x[:, :, 0, :, 0], x[:, :, 1, :, 0],
                         x[:, :, 0, :, 1], x[:, :, 1, :, 1]], axis=-1)
    x = layers.layer_norm(x, p["norm_scale"], p["norm_bias"], ln_eps)
    return layers.dense(x, p["reduction_w"], None, dtype)


def swin_forward(
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
    from latteclip_tpu.models.vit import patchify

    t = SWIN_TRUNKS[cfg.trunk]
    w, depths, heads = t["window"], t["depths"], t["heads"]
    eps = cfg.ln_eps
    B = images.shape[0]
    grid = cfg.image_size // t["patch_size"]
    if (grid // (2 ** (len(depths) - 1))) % w:
        raise ValueError(
            f"image_size {cfg.image_size} gives a final-stage grid of "
            f"{grid // (2 ** (len(depths) - 1))}, not divisible by the "
            f"window size {w}")

    x = patchify(images, t["patch_size"])
    x = layers.dense(x, params["patch_kernel"], params["patch_bias"], dtype)
    x = layers.layer_norm(x, params["patch_norm_scale"], params["patch_norm_bias"], eps)
    x = x.reshape(B, grid, grid, -1).astype(dtype)

    rel_index = jnp.asarray(relative_position_index(w))
    for si, stage in enumerate(params["stages"]):
        if "merge" in stage:
            x = _patch_merge(x, stage["merge"], dtype, eps)
        g = x.shape[1]
        for bi, bp in enumerate(stage["blocks"]):
            shift = (w // 2) if (bi % 2 == 1 and g > w) else 0
            blk = _swin_block
            if remat:
                blk = jax.checkpoint(_swin_block, static_argnums=(2, 3, 4, 6, 7),
                                     prevent_cse=False)
            x = blk(x, bp, heads[si], w, shift, rel_index, dtype, eps)

    x = x.reshape(B, -1, x.shape[-1])
    x = layers.layer_norm(x, params["norm_scale"], params["norm_bias"], eps)
    pooled = x.mean(axis=1)
    pooled = layers.dense(pooled, params["proj"], None, dtype)
    return pooled.astype(jnp.float32)
