"""Checkpoint IO: OpenCLIP ``.pt`` state dicts ⇄ latteclip_tpu param pytrees.

Key-name mapping covers the fused-text-tower ``CLIP`` layout the reference
uses (``src/open_clip/model.py:355-468``): ``visual.*``,
``transformer.resblocks.{i}.*``, ``token_embedding``,
``positional_embedding``, ``ln_final``, ``text_projection``,
``logit_scale`` — plus the LatteCLIP additions ``memory_bank.<classname>``
(reference ``model.py:489-499``) and the ``module.`` / ``clip_model.``
prefixes produced by DDP and ``CustomCLIP`` wrapping. Vision positional
embeddings are resized bicubically on grid mismatch, mirroring reference
``model.py:778-809``.

Weight orientation: torch ``nn.Linear`` stores ``[out, in]``; our layers use
``[in, out]`` (``x @ W``), so linear weights are transposed in transit. The
patch conv ``[D, 3, P, P]`` becomes a ``[P*P*3, D]`` matmul kernel matching
``models.vit.patchify``'s ``(i, j, c)`` patch-vector layout.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.core.config import CLIPConfig
from latteclip_tpu.core.pt_io import load_pt, save_pt

_BLOCK_KEYS = {
    # our stacked name -> (torch suffix, transpose_last_two)
    "ln_1_scale": ("ln_1.weight", False),
    "ln_1_bias": ("ln_1.bias", False),
    "in_proj_w": ("attn.in_proj_weight", True),
    "in_proj_b": ("attn.in_proj_bias", False),
    "out_proj_w": ("attn.out_proj.weight", True),
    "out_proj_b": ("attn.out_proj.bias", False),
    "ln_2_scale": ("ln_2.weight", False),
    "ln_2_bias": ("ln_2.bias", False),
    "c_fc_w": ("mlp.c_fc.weight", True),
    "c_fc_b": ("mlp.c_fc.bias", False),
    "c_proj_w": ("mlp.c_proj.weight", True),
    "c_proj_b": ("mlp.c_proj.bias", False),
}


def _normalize_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip DDP / CustomCLIP wrapper prefixes (reference factory.py:139-141)."""
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items() if k.startswith("module.")}
    if any(k.startswith("clip_model.") for k in sd):
        # keep memory_bank.* which lives outside clip_model in CustomCLIP
        out = {}
        for k, v in sd.items():
            if k.startswith("clip_model."):
                out[k[len("clip_model."):]] = v
            elif k.startswith("memory_bank.") or not any(
                k.startswith(p) for p in ("visual.", "transformer.", "image_adapter.")
            ):
                out.setdefault(k, v)
        sd = {k: v for k, v in out.items() if not k.startswith("image_adapter.")}
    return sd


def _stack_blocks(sd: Dict[str, np.ndarray], prefix: str, layers: int) -> Dict[str, np.ndarray]:
    blocks: Dict[str, np.ndarray] = {}
    for ours, (suffix, transpose) in _BLOCK_KEYS.items():
        per_layer = []
        for i in range(layers):
            w = np.asarray(sd[f"{prefix}resblocks.{i}.{suffix}"], dtype=np.float32)
            per_layer.append(w.T if transpose else w)
        blocks[ours] = np.stack(per_layer)
    return blocks


def _unstack_blocks(blocks: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    layers = int(np.asarray(blocks["ln_1_scale"]).shape[0])
    for ours, (suffix, transpose) in _BLOCK_KEYS.items():
        arr = np.asarray(blocks[ours], dtype=np.float32)
        for i in range(layers):
            w = arr[i]
            out[f"{prefix}resblocks.{i}.{suffix}"] = w.T if transpose else w
    return out


def resize_vision_pos_embed(pos: np.ndarray, target_seq: int) -> np.ndarray:
    """Bicubic grid resize of [L, D] (1 class token + grid**2 patches)."""
    if pos.shape[0] == target_seq:
        return pos
    tok, grid_part = pos[:1], pos[1:]
    old_g = int(round(len(grid_part) ** 0.5))
    new_g = int(round((target_seq - 1) ** 0.5))
    img = grid_part.reshape(old_g, old_g, -1)
    resized = jax.image.resize(
        jnp.asarray(img, dtype=jnp.float32), (new_g, new_g, img.shape[-1]), method="bicubic"
    )
    return np.concatenate([tok, np.asarray(resized).reshape(new_g * new_g, -1)], axis=0)


def pt_state_dict_to_params(
    sd: Dict[str, np.ndarray], cfg: CLIPConfig
) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    """Map an OpenCLIP state dict to (params pytree, memory_bank dict)."""
    sd = _normalize_state_dict(dict(sd))
    memory_bank = {
        k[len("memory_bank."):]: np.asarray(v, dtype=np.float32)
        for k, v in sd.items()
        if k.startswith("memory_bank.")
    }

    P = cfg.vision.patch_size
    conv = np.asarray(sd["visual.conv1.weight"], dtype=np.float32)  # [D, 3, P, P]
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(P * P * 3, -1)

    vis_pos = resize_vision_pos_embed(
        np.asarray(sd["visual.positional_embedding"], dtype=np.float32), cfg.vision.seq_len
    )

    def f32(key):
        return np.asarray(sd[key], dtype=np.float32)

    visual = {
        "patch_kernel": patch_kernel,
        "class_embedding": f32("visual.class_embedding"),
        "pos_embed": vis_pos,
        "ln_pre_scale": f32("visual.ln_pre.weight"),
        "ln_pre_bias": f32("visual.ln_pre.bias"),
        "blocks": _stack_blocks(sd, "visual.transformer.", cfg.vision.layers),
        "ln_post_scale": f32("visual.ln_post.weight"),
        "ln_post_bias": f32("visual.ln_post.bias"),
        "proj": f32("visual.proj"),
    }
    text = {
        "token_embedding": f32("token_embedding.weight"),
        "pos_embed": f32("positional_embedding"),
        "blocks": _stack_blocks(sd, "transformer.", cfg.text.layers),
        "ln_final_scale": f32("ln_final.weight"),
        "ln_final_bias": f32("ln_final.bias"),
        "text_projection": f32("text_projection"),
    }
    params = {
        "visual": visual,
        "text": text,
        "logit_scale": np.asarray(sd["logit_scale"], dtype=np.float32).reshape(()),
    }
    params = jax.tree.map(jnp.asarray, params)
    return params, memory_bank


def params_to_pt_state_dict(
    params: Dict[str, Any],
    cfg: CLIPConfig,
    memory_bank: Optional[np.ndarray] = None,
    classnames: Optional[List[str]] = None,
) -> Dict[str, np.ndarray]:
    """Invert :func:`pt_state_dict_to_params` (incl. memory_bank.<name> keys)."""
    params = jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), params)
    v, t = params["visual"], params["text"]
    P = cfg.vision.patch_size
    D = cfg.vision.width
    conv = v["patch_kernel"].reshape(P, P, 3, D).transpose(3, 2, 0, 1)

    sd: Dict[str, np.ndarray] = {
        "logit_scale": params["logit_scale"].reshape(()),
        "visual.conv1.weight": np.ascontiguousarray(conv),
        "visual.class_embedding": v["class_embedding"],
        "visual.positional_embedding": v["pos_embed"],
        "visual.ln_pre.weight": v["ln_pre_scale"],
        "visual.ln_pre.bias": v["ln_pre_bias"],
        "visual.ln_post.weight": v["ln_post_scale"],
        "visual.ln_post.bias": v["ln_post_bias"],
        "visual.proj": v["proj"],
        "token_embedding.weight": t["token_embedding"],
        "positional_embedding": t["pos_embed"],
        "ln_final.weight": t["ln_final_scale"],
        "ln_final.bias": t["ln_final_bias"],
        "text_projection": t["text_projection"],
    }
    sd.update(_unstack_blocks(v["blocks"], "visual.transformer."))
    sd.update(_unstack_blocks(t["blocks"], "transformer."))
    if memory_bank is not None:
        assert classnames is not None and len(classnames) == len(memory_bank)
        for name, vec in zip(classnames, np.asarray(memory_bank, dtype=np.float32)):
            sd[f"memory_bank.{name}"] = vec
    return {k: np.ascontiguousarray(w) for k, w in sd.items()}


def load_clip_pt(path: str, cfg: CLIPConfig):
    """Load a ``.pt`` file that is either a bare state dict or a training
    checkpoint ``{"epoch", "state_dict", ...}`` (reference main.py:367-385)."""
    obj = load_pt(path)
    meta: Dict[str, Any] = {}
    if isinstance(obj, dict) and "state_dict" in obj:
        meta = {k: v for k, v in obj.items() if k != "state_dict"}
        sd = obj["state_dict"]
    else:
        sd = obj
    params, memory_bank = pt_state_dict_to_params(sd, cfg)
    return params, memory_bank, meta


def save_clip_pt(
    path: str,
    params: Dict[str, Any],
    cfg: CLIPConfig,
    *,
    epoch: Optional[int] = None,
    name: Optional[str] = None,
    memory_bank: Optional[np.ndarray] = None,
    classnames: Optional[List[str]] = None,
) -> None:
    sd = params_to_pt_state_dict(params, cfg, memory_bank=memory_bank, classnames=classnames)
    obj: Dict[str, Any] = {"state_dict": sd}
    if epoch is not None:
        obj["epoch"] = epoch
    if name is not None:
        obj["name"] = name
    tmp = path + ".tmp"
    save_pt(obj, tmp)
    os.replace(tmp, path)  # atomic, reference main.py:546-551
