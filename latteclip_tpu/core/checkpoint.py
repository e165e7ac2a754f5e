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

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

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
    """Strip DDP / CustomCLIP wrapper prefixes (reference factory.py:139-141)
    and fold the CustomTextCLIP separate-tower layout (``text.*`` keys) back
    into the fused layout (inverse of reference model.py:685-700)."""
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
    if (any(k.startswith("text.") for k in sd) and "text_projection" not in sd
            and not any(k.startswith("text_decoder.") for k in sd)):
        # CustomTextCLIP fold — but NOT for CoCa checkpoints, whose canonical
        # layout keeps the text tower under text.* next to text_decoder.*
        sd = {(k[len("text."):] if k.startswith("text.") else k): v for k, v in sd.items()}
    return sd


_LS_KEYS = {
    "ls_1_gamma": ("ls_1.gamma", False),
    "ls_2_gamma": ("ls_2.gamma", False),
}


def _stack_blocks(sd: Dict[str, np.ndarray], prefix: str, layers: int) -> Dict[str, np.ndarray]:
    blocks: Dict[str, np.ndarray] = {}
    keys = dict(_BLOCK_KEYS)
    if f"{prefix}resblocks.0.ls_1.gamma" in sd:
        keys.update(_LS_KEYS)
    for ours, (suffix, transpose) in keys.items():
        per_layer = []
        for i in range(layers):
            w = np.asarray(sd[f"{prefix}resblocks.{i}.{suffix}"], dtype=np.float32)
            per_layer.append(w.T if transpose else w)
        blocks[ours] = np.stack(per_layer)
    return blocks


def _unstack_blocks(blocks: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    layers = int(np.asarray(blocks["ln_1_scale"]).shape[0])
    keys = dict(_BLOCK_KEYS)
    if "ls_1_gamma" in blocks:
        keys.update(_LS_KEYS)
    for ours, (suffix, transpose) in keys.items():
        arr = np.asarray(blocks[ours], dtype=np.float32)
        for i in range(layers):
            w = arr[i]
            out[f"{prefix}resblocks.{i}.{suffix}"] = w.T if transpose else w
    return out


def resize_vision_pos_embed(
    pos: np.ndarray, target_seq: int, cls_token: bool = True
) -> np.ndarray:
    """Bicubic grid resize of a [L, D] pos embed. With ``cls_token`` row 0
    is carried through unresized (CLIP); ``cls_token=False`` treats every
    row as a patch (SigLIP/no-cls towers)."""
    if pos.shape[0] == target_seq:
        return pos
    n_tok = 1 if cls_token else 0
    tok, grid_part = pos[:n_tok], pos[n_tok:]
    old_g = int(round(len(grid_part) ** 0.5))
    new_g = int(round((target_seq - n_tok) ** 0.5))
    if old_g * old_g != len(grid_part) or new_g * new_g != target_seq - n_tok:
        raise ValueError(
            f"cannot grid-resize pos embed of {pos.shape[0]} rows "
            f"(cls_token={cls_token}) to {target_seq}: non-square grid"
        )
    img = grid_part.reshape(old_g, old_g, -1)
    resized = jax.image.resize(
        jnp.asarray(img, dtype=jnp.float32), (new_g, new_g, img.shape[-1]), method="bicubic"
    )
    return np.concatenate([tok, np.asarray(resized).reshape(new_g * new_g, -1)], axis=0)


def _bn_from_sd(sd, torch_prefix: str, ours_prefix: str) -> Dict[str, np.ndarray]:
    return {
        f"{ours_prefix}_scale": np.asarray(sd[f"{torch_prefix}.weight"], np.float32),
        f"{ours_prefix}_bias": np.asarray(sd[f"{torch_prefix}.bias"], np.float32),
        f"{ours_prefix}_mean": np.asarray(sd[f"{torch_prefix}.running_mean"], np.float32),
        f"{ours_prefix}_var": np.asarray(sd[f"{torch_prefix}.running_var"], np.float32),
    }


def _bn_to_sd(p, ours_prefix: str, torch_prefix: str) -> Dict[str, np.ndarray]:
    return {
        f"{torch_prefix}.weight": p[f"{ours_prefix}_scale"],
        f"{torch_prefix}.bias": p[f"{ours_prefix}_bias"],
        f"{torch_prefix}.running_mean": p[f"{ours_prefix}_mean"],
        f"{torch_prefix}.running_var": p[f"{ours_prefix}_var"],
    }


def _conv_hwio(sd, key) -> np.ndarray:
    return np.asarray(sd[key], np.float32).transpose(2, 3, 1, 0)


def _resnet_visual_from_sd(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """visual.* ResNet keys -> resnet param pytree (modified_resnet.py)."""
    stem = {
        "conv1_w": _conv_hwio(sd, "visual.conv1.weight"), **_bn_from_sd(sd, "visual.bn1", "bn1"),
        "conv2_w": _conv_hwio(sd, "visual.conv2.weight"), **_bn_from_sd(sd, "visual.bn2", "bn2"),
        "conv3_w": _conv_hwio(sd, "visual.conv3.weight"), **_bn_from_sd(sd, "visual.bn3", "bn3"),
    }
    stages = []
    for stage_idx, blocks in enumerate(cfg.layers):
        stage = []
        for i in range(blocks):
            prefix = f"visual.layer{stage_idx + 1}.{i}"
            p = {
                "conv1_w": _conv_hwio(sd, f"{prefix}.conv1.weight"),
                **_bn_from_sd(sd, f"{prefix}.bn1", "bn1"),
                "conv2_w": _conv_hwio(sd, f"{prefix}.conv2.weight"),
                **_bn_from_sd(sd, f"{prefix}.bn2", "bn2"),
                "conv3_w": _conv_hwio(sd, f"{prefix}.conv3.weight"),
                **_bn_from_sd(sd, f"{prefix}.bn3", "bn3"),
            }
            if f"{prefix}.downsample.0.weight" in sd:
                p["down_conv_w"] = _conv_hwio(sd, f"{prefix}.downsample.0.weight")
                p.update(_bn_from_sd(sd, f"{prefix}.downsample.1", "down_bn"))
            stage.append(p)
        stages.append(stage)
    attnpool = {
        "pos_embed": np.asarray(sd["visual.attnpool.positional_embedding"], np.float32),
        "q_w": np.asarray(sd["visual.attnpool.q_proj.weight"], np.float32),
        "q_b": np.asarray(sd["visual.attnpool.q_proj.bias"], np.float32),
        "k_w": np.asarray(sd["visual.attnpool.k_proj.weight"], np.float32),
        "k_b": np.asarray(sd["visual.attnpool.k_proj.bias"], np.float32),
        "v_w": np.asarray(sd["visual.attnpool.v_proj.weight"], np.float32),
        "v_b": np.asarray(sd["visual.attnpool.v_proj.bias"], np.float32),
        "c_w": np.asarray(sd["visual.attnpool.c_proj.weight"], np.float32),
        "c_b": np.asarray(sd["visual.attnpool.c_proj.bias"], np.float32),
    }
    return {"stem": stem, "stages": stages, "attnpool": attnpool}


def _resnet_visual_to_sd(v: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    def hwio_to_oihw(w):
        return np.ascontiguousarray(np.asarray(w, np.float32).transpose(3, 2, 0, 1))

    sd: Dict[str, np.ndarray] = {
        "visual.conv1.weight": hwio_to_oihw(v["stem"]["conv1_w"]),
        "visual.conv2.weight": hwio_to_oihw(v["stem"]["conv2_w"]),
        "visual.conv3.weight": hwio_to_oihw(v["stem"]["conv3_w"]),
        **_bn_to_sd(v["stem"], "bn1", "visual.bn1"),
        **_bn_to_sd(v["stem"], "bn2", "visual.bn2"),
        **_bn_to_sd(v["stem"], "bn3", "visual.bn3"),
    }
    for stage_idx, stage in enumerate(v["stages"]):
        for i, p in enumerate(stage):
            prefix = f"visual.layer{stage_idx + 1}.{i}"
            sd[f"{prefix}.conv1.weight"] = hwio_to_oihw(p["conv1_w"])
            sd[f"{prefix}.conv2.weight"] = hwio_to_oihw(p["conv2_w"])
            sd[f"{prefix}.conv3.weight"] = hwio_to_oihw(p["conv3_w"])
            sd.update(_bn_to_sd(p, "bn1", f"{prefix}.bn1"))
            sd.update(_bn_to_sd(p, "bn2", f"{prefix}.bn2"))
            sd.update(_bn_to_sd(p, "bn3", f"{prefix}.bn3"))
            if "down_conv_w" in p:
                sd[f"{prefix}.downsample.0.weight"] = hwio_to_oihw(p["down_conv_w"])
                sd.update(_bn_to_sd(p, "down_bn", f"{prefix}.downsample.1"))
    ap = v["attnpool"]
    sd["visual.attnpool.positional_embedding"] = np.asarray(ap["pos_embed"], np.float32)
    for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("c", "c_proj")):
        sd[f"visual.attnpool.{theirs}.weight"] = np.asarray(ap[f"{ours}_w"], np.float32)
        sd[f"visual.attnpool.{theirs}.bias"] = np.asarray(ap[f"{ours}_b"], np.float32)
    return sd


def _eva_visual_from_sd(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """timm Eva keys (``visual.trunk.*``; EVA01 giant = standard pre-norm
    ViT with fused qkv, learnable q/v bias and implicit-zero k bias, final
    norm, biased ``head`` Linear as the projection) -> native ViT pytree."""

    def f32(key):
        return np.asarray(sd[key], np.float32)

    P = cfg.patch_size
    conv = f32("visual.trunk.patch_embed.proj.weight")  # [D, 3, P, P]
    D = conv.shape[0]
    per = {k: [] for k in ("ln_1_scale", "ln_1_bias", "in_proj_w", "in_proj_b",
                           "out_proj_w", "out_proj_b", "ln_2_scale", "ln_2_bias",
                           "c_fc_w", "c_fc_b", "c_proj_w", "c_proj_b")}
    for i in range(cfg.layers):
        pre = f"visual.trunk.blocks.{i}"
        per["ln_1_scale"].append(f32(f"{pre}.norm1.weight"))
        per["ln_1_bias"].append(f32(f"{pre}.norm1.bias"))
        per["in_proj_w"].append(f32(f"{pre}.attn.qkv.weight").T)
        per["in_proj_b"].append(np.concatenate([
            f32(f"{pre}.attn.q_bias"), np.zeros(D, np.float32),
            f32(f"{pre}.attn.v_bias")]))
        per["out_proj_w"].append(f32(f"{pre}.attn.proj.weight").T)
        per["out_proj_b"].append(f32(f"{pre}.attn.proj.bias"))
        per["ln_2_scale"].append(f32(f"{pre}.norm2.weight"))
        per["ln_2_bias"].append(f32(f"{pre}.norm2.bias"))
        per["c_fc_w"].append(f32(f"{pre}.mlp.fc1.weight").T)
        per["c_fc_b"].append(f32(f"{pre}.mlp.fc1.bias"))
        per["c_proj_w"].append(f32(f"{pre}.mlp.fc2.weight").T)
        per["c_proj_b"].append(f32(f"{pre}.mlp.fc2.bias"))
    pos = resize_vision_pos_embed(
        f32("visual.trunk.pos_embed").reshape(-1, D), cfg.seq_len, cls_token=True)
    return {
        "patch_kernel": conv.transpose(2, 3, 1, 0).reshape(P * P * 3, D),
        "patch_bias": f32("visual.trunk.patch_embed.proj.bias"),
        "class_embedding": f32("visual.trunk.cls_token").reshape(D),
        "pos_embed": pos,
        # no ln_pre in Eva (cfg.no_ln_pre) — identity params keep the
        # pytree congruent with init_vit_params
        "ln_pre_scale": np.ones(D, np.float32),
        "ln_pre_bias": np.zeros(D, np.float32),
        "blocks": {k: np.stack(v) for k, v in per.items()},
        "ln_post_scale": f32("visual.trunk.norm.weight"),
        "ln_post_bias": f32("visual.trunk.norm.bias"),
        "proj": f32("visual.trunk.head.weight").T.copy(),
        "proj_b": f32("visual.trunk.head.bias"),
    }


def _eva_visual_to_sd(v: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    def t(w):
        return np.ascontiguousarray(np.asarray(w, np.float32).T)

    P, D = cfg.patch_size, cfg.width
    conv = np.asarray(v["patch_kernel"], np.float32).reshape(P, P, 3, D).transpose(3, 2, 0, 1)
    sd: Dict[str, np.ndarray] = {
        "visual.trunk.patch_embed.proj.weight": np.ascontiguousarray(conv),
        "visual.trunk.patch_embed.proj.bias": np.asarray(v["patch_bias"], np.float32),
        "visual.trunk.cls_token": np.asarray(v["class_embedding"], np.float32).reshape(1, 1, D),
        "visual.trunk.pos_embed": np.asarray(v["pos_embed"], np.float32)[None],
        "visual.trunk.norm.weight": np.asarray(v["ln_post_scale"], np.float32),
        "visual.trunk.norm.bias": np.asarray(v["ln_post_bias"], np.float32),
        "visual.trunk.head.weight": t(v["proj"]),
        "visual.trunk.head.bias": np.asarray(v["proj_b"], np.float32),
    }
    b = v["blocks"]
    for i in range(np.asarray(b["ln_1_scale"]).shape[0]):
        pre = f"visual.trunk.blocks.{i}"
        sd[f"{pre}.norm1.weight"] = np.asarray(b["ln_1_scale"][i], np.float32)
        sd[f"{pre}.norm1.bias"] = np.asarray(b["ln_1_bias"][i], np.float32)
        sd[f"{pre}.attn.qkv.weight"] = t(b["in_proj_w"][i])
        ipb = np.asarray(b["in_proj_b"][i], np.float32)
        sd[f"{pre}.attn.q_bias"] = ipb[:D].copy()
        sd[f"{pre}.attn.v_bias"] = ipb[2 * D:].copy()
        sd[f"{pre}.attn.proj.weight"] = t(b["out_proj_w"][i])
        sd[f"{pre}.attn.proj.bias"] = np.asarray(b["out_proj_b"][i], np.float32)
        sd[f"{pre}.norm2.weight"] = np.asarray(b["ln_2_scale"][i], np.float32)
        sd[f"{pre}.norm2.bias"] = np.asarray(b["ln_2_bias"][i], np.float32)
        sd[f"{pre}.mlp.fc1.weight"] = t(b["c_fc_w"][i])
        sd[f"{pre}.mlp.fc1.bias"] = np.asarray(b["c_fc_b"][i], np.float32)
        sd[f"{pre}.mlp.fc2.weight"] = t(b["c_proj_w"][i])
        sd[f"{pre}.mlp.fc2.bias"] = np.asarray(b["c_proj_b"][i], np.float32)
    return sd


def _eva02_rope_qk_perm(ipw: np.ndarray, ipb: np.ndarray, cfg,
                        inverse: bool = False):
    """Permute q/k output channels between timm's interleaved rope pairing
    and models/eva02.py's rotate-half convention (exact conjugation — see
    ``eva02.rope_perm_interleaved_to_half``). v channels untouched; no-op
    when the trunk doesn't use rope (the E variant)."""
    if not cfg.use_rope:
        return ipw, ipb
    from latteclip_tpu.models.eva02 import rope_perm_interleaved_to_half

    D, Dh = cfg.width, cfg.head_width
    perm = rope_perm_interleaved_to_half(Dh)
    if inverse:
        perm = np.argsort(perm)
    idx = np.arange(D).reshape(D // Dh, Dh)[:, perm].reshape(-1)
    full = np.concatenate([idx, D + idx, 2 * D + np.arange(D)])
    return ipw[:, full], ipb[full]


def _eva02_visual_from_sd(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """timm EVA02 keys (``visual.trunk.*``; see models/eva02.py) -> pytree.

    Attention import is KEY-DRIVEN: fused ``attn.qkv.weight`` + q/v bias
    (implicit-zero k) or separate ``attn.{q,k,v}_proj`` (biasless k) both
    pack into one ``in_proj``; the optional inner ``attn.norm`` and the
    SwiGLU ``mlp.{fc1_g,fc1_x,norm,fc2}`` vs plain ``mlp.{fc1,fc2}`` follow
    the config flags. Rope-bearing trunks additionally get their q/k
    channels permuted from timm's interleaved pairing to our rotate-half
    convention (``_eva02_rope_qk_perm``) so real EVA-CLIP checkpoints
    compute identically."""

    def f32(key):
        return np.asarray(sd[key], np.float32)

    P, D = cfg.patch_size, cfg.width
    conv = f32("visual.trunk.patch_embed.proj.weight")
    per: Dict[str, list] = {}

    def add(key, val):
        per.setdefault(key, []).append(val)

    for i in range(cfg.layers):
        pre = f"visual.trunk.blocks.{i}"
        add("ln_1_scale", f32(f"{pre}.norm1.weight"))
        add("ln_1_bias", f32(f"{pre}.norm1.bias"))
        if f"{pre}.attn.qkv.weight" in sd:
            ipw = f32(f"{pre}.attn.qkv.weight").T
            ipb = np.concatenate([
                f32(f"{pre}.attn.q_bias"), np.zeros(D, np.float32),
                f32(f"{pre}.attn.v_bias")])
        else:
            ipw = np.concatenate([
                f32(f"{pre}.attn.q_proj.weight").T,
                f32(f"{pre}.attn.k_proj.weight").T,
                f32(f"{pre}.attn.v_proj.weight").T], axis=1)
            ipb = np.concatenate([
                f32(f"{pre}.attn.q_proj.bias"), np.zeros(D, np.float32),
                f32(f"{pre}.attn.v_proj.bias")])
        ipw, ipb = _eva02_rope_qk_perm(ipw, ipb, cfg)
        add("in_proj_w", ipw)
        add("in_proj_b", ipb)
        if cfg.inner_attn_norm:
            add("attn_norm_scale", f32(f"{pre}.attn.norm.weight"))
            add("attn_norm_bias", f32(f"{pre}.attn.norm.bias"))
        add("out_proj_w", f32(f"{pre}.attn.proj.weight").T)
        add("out_proj_b", f32(f"{pre}.attn.proj.bias"))
        add("ln_2_scale", f32(f"{pre}.norm2.weight"))
        add("ln_2_bias", f32(f"{pre}.norm2.bias"))
        if cfg.swiglu:
            add("w1g", f32(f"{pre}.mlp.fc1_g.weight").T)
            add("b1g", f32(f"{pre}.mlp.fc1_g.bias"))
            add("w1x", f32(f"{pre}.mlp.fc1_x.weight").T)
            add("b1x", f32(f"{pre}.mlp.fc1_x.bias"))
            add("ln_sub_scale", f32(f"{pre}.mlp.norm.weight"))
            add("ln_sub_bias", f32(f"{pre}.mlp.norm.bias"))
            add("w2", f32(f"{pre}.mlp.fc2.weight").T)
            add("b2", f32(f"{pre}.mlp.fc2.bias"))
        else:
            add("c_fc_w", f32(f"{pre}.mlp.fc1.weight").T)
            add("c_fc_b", f32(f"{pre}.mlp.fc1.bias"))
            add("c_proj_w", f32(f"{pre}.mlp.fc2.weight").T)
            add("c_proj_b", f32(f"{pre}.mlp.fc2.bias"))
    pos = resize_vision_pos_embed(
        f32("visual.trunk.pos_embed").reshape(-1, D), cfg.seq_len, cls_token=True)
    return {
        "patch_kernel": conv.transpose(2, 3, 1, 0).reshape(P * P * 3, D),
        "patch_bias": f32("visual.trunk.patch_embed.proj.bias"),
        "class_embedding": f32("visual.trunk.cls_token").reshape(D),
        "pos_embed": pos,
        "blocks": {k: np.stack(v) for k, v in per.items()},
        "ln_post_scale": f32("visual.trunk.norm.weight"),
        "ln_post_bias": f32("visual.trunk.norm.bias"),
        "proj": f32("visual.trunk.head.weight").T.copy(),
        "proj_b": f32("visual.trunk.head.bias"),
    }


def _eva02_visual_to_sd(v: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    def t(w):
        return np.ascontiguousarray(np.asarray(w, np.float32).T)

    P, D = cfg.patch_size, cfg.width
    conv = np.asarray(v["patch_kernel"], np.float32).reshape(P, P, 3, D).transpose(3, 2, 0, 1)
    sd: Dict[str, np.ndarray] = {
        "visual.trunk.patch_embed.proj.weight": np.ascontiguousarray(conv),
        "visual.trunk.patch_embed.proj.bias": np.asarray(v["patch_bias"], np.float32),
        "visual.trunk.cls_token": np.asarray(v["class_embedding"], np.float32).reshape(1, 1, D),
        "visual.trunk.pos_embed": np.asarray(v["pos_embed"], np.float32)[None],
        "visual.trunk.norm.weight": np.asarray(v["ln_post_scale"], np.float32),
        "visual.trunk.norm.bias": np.asarray(v["ln_post_bias"], np.float32),
        "visual.trunk.head.weight": t(v["proj"]),
        "visual.trunk.head.bias": np.asarray(v["proj_b"], np.float32),
    }
    b = v["blocks"]
    for i in range(np.asarray(b["ln_1_scale"]).shape[0]):
        pre = f"visual.trunk.blocks.{i}"
        sd[f"{pre}.norm1.weight"] = np.asarray(b["ln_1_scale"][i], np.float32)
        sd[f"{pre}.norm1.bias"] = np.asarray(b["ln_1_bias"][i], np.float32)
        ipw = np.asarray(b["in_proj_w"][i], np.float32)
        ipb = np.asarray(b["in_proj_b"][i], np.float32)
        ipw, ipb = _eva02_rope_qk_perm(ipw, ipb, cfg, inverse=True)
        if cfg.qkv_fused:
            sd[f"{pre}.attn.qkv.weight"] = t(ipw)
            sd[f"{pre}.attn.q_bias"] = ipb[:D].copy()
            sd[f"{pre}.attn.v_bias"] = ipb[2 * D:].copy()
        else:
            sd[f"{pre}.attn.q_proj.weight"] = t(ipw[:, :D])
            sd[f"{pre}.attn.q_proj.bias"] = ipb[:D].copy()
            sd[f"{pre}.attn.k_proj.weight"] = t(ipw[:, D:2 * D])
            sd[f"{pre}.attn.v_proj.weight"] = t(ipw[:, 2 * D:])
            sd[f"{pre}.attn.v_proj.bias"] = ipb[2 * D:].copy()
        if cfg.inner_attn_norm:
            sd[f"{pre}.attn.norm.weight"] = np.asarray(b["attn_norm_scale"][i], np.float32)
            sd[f"{pre}.attn.norm.bias"] = np.asarray(b["attn_norm_bias"][i], np.float32)
        sd[f"{pre}.attn.proj.weight"] = t(b["out_proj_w"][i])
        sd[f"{pre}.attn.proj.bias"] = np.asarray(b["out_proj_b"][i], np.float32)
        sd[f"{pre}.norm2.weight"] = np.asarray(b["ln_2_scale"][i], np.float32)
        sd[f"{pre}.norm2.bias"] = np.asarray(b["ln_2_bias"][i], np.float32)
        if cfg.swiglu:
            sd[f"{pre}.mlp.fc1_g.weight"] = t(b["w1g"][i])
            sd[f"{pre}.mlp.fc1_g.bias"] = np.asarray(b["b1g"][i], np.float32)
            sd[f"{pre}.mlp.fc1_x.weight"] = t(b["w1x"][i])
            sd[f"{pre}.mlp.fc1_x.bias"] = np.asarray(b["b1x"][i], np.float32)
            sd[f"{pre}.mlp.norm.weight"] = np.asarray(b["ln_sub_scale"][i], np.float32)
            sd[f"{pre}.mlp.norm.bias"] = np.asarray(b["ln_sub_bias"][i], np.float32)
            sd[f"{pre}.mlp.fc2.weight"] = t(b["w2"][i])
            sd[f"{pre}.mlp.fc2.bias"] = np.asarray(b["b2"][i], np.float32)
        else:
            sd[f"{pre}.mlp.fc1.weight"] = t(b["c_fc_w"][i])
            sd[f"{pre}.mlp.fc1.bias"] = np.asarray(b["c_fc_b"][i], np.float32)
            sd[f"{pre}.mlp.fc2.weight"] = t(b["c_proj_w"][i])
            sd[f"{pre}.mlp.fc2.bias"] = np.asarray(b["c_proj_b"][i], np.float32)
    return sd


def _timm_vit_visual_from_sd(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """timm plain-ViT trunk keys (``visual.trunk.*``; standard fused qkv
    with full bias, fc_norm after pooling, no class token for gap models) +
    the TimmModel head Linear (``visual.head.proj.weight``, unbiased —
    reference timm_model.py:104-106) -> native ViT pytree."""

    def f32(key):
        return np.asarray(sd[key], np.float32)

    P = cfg.patch_size
    conv = f32("visual.trunk.patch_embed.proj.weight")
    D = conv.shape[0]
    per = {k: [] for k in ("ln_1_scale", "ln_1_bias", "in_proj_w", "in_proj_b",
                           "out_proj_w", "out_proj_b", "ln_2_scale", "ln_2_bias",
                           "c_fc_w", "c_fc_b", "c_proj_w", "c_proj_b")}
    for i in range(cfg.layers):
        pre = f"visual.trunk.blocks.{i}"
        per["ln_1_scale"].append(f32(f"{pre}.norm1.weight"))
        per["ln_1_bias"].append(f32(f"{pre}.norm1.bias"))
        per["in_proj_w"].append(f32(f"{pre}.attn.qkv.weight").T)
        per["in_proj_b"].append(f32(f"{pre}.attn.qkv.bias"))
        per["out_proj_w"].append(f32(f"{pre}.attn.proj.weight").T)
        per["out_proj_b"].append(f32(f"{pre}.attn.proj.bias"))
        per["ln_2_scale"].append(f32(f"{pre}.norm2.weight"))
        per["ln_2_bias"].append(f32(f"{pre}.norm2.bias"))
        per["c_fc_w"].append(f32(f"{pre}.mlp.fc1.weight").T)
        per["c_fc_b"].append(f32(f"{pre}.mlp.fc1.bias"))
        per["c_proj_w"].append(f32(f"{pre}.mlp.fc2.weight").T)
        per["c_proj_b"].append(f32(f"{pre}.mlp.fc2.bias"))
    pos = resize_vision_pos_embed(
        f32("visual.trunk.pos_embed").reshape(-1, D), cfg.seq_len,
        cls_token=not cfg.no_cls_token)
    return {
        "patch_kernel": conv.transpose(2, 3, 1, 0).reshape(P * P * 3, D),
        "patch_bias": f32("visual.trunk.patch_embed.proj.bias"),
        "pos_embed": pos,
        "ln_pre_scale": np.ones(D, np.float32),   # no pre-LN in the trunk
        "ln_pre_bias": np.zeros(D, np.float32),
        "blocks": {k: np.stack(v) for k, v in per.items()},
        "ln_post_scale": f32("visual.trunk.fc_norm.weight"),
        "ln_post_bias": f32("visual.trunk.fc_norm.bias"),
        "proj": f32("visual.head.proj.weight").T.copy(),
    }


def _timm_vit_visual_to_sd(v: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    def t(w):
        return np.ascontiguousarray(np.asarray(w, np.float32).T)

    P, D = cfg.patch_size, cfg.width
    conv = np.asarray(v["patch_kernel"], np.float32).reshape(P, P, 3, D).transpose(3, 2, 0, 1)
    sd: Dict[str, np.ndarray] = {
        "visual.trunk.patch_embed.proj.weight": np.ascontiguousarray(conv),
        "visual.trunk.patch_embed.proj.bias": np.asarray(v["patch_bias"], np.float32),
        "visual.trunk.pos_embed": np.asarray(v["pos_embed"], np.float32)[None],
        "visual.trunk.fc_norm.weight": np.asarray(v["ln_post_scale"], np.float32),
        "visual.trunk.fc_norm.bias": np.asarray(v["ln_post_bias"], np.float32),
        "visual.head.proj.weight": t(v["proj"]),
    }
    b = v["blocks"]
    for i in range(np.asarray(b["ln_1_scale"]).shape[0]):
        pre = f"visual.trunk.blocks.{i}"
        sd[f"{pre}.norm1.weight"] = np.asarray(b["ln_1_scale"][i], np.float32)
        sd[f"{pre}.norm1.bias"] = np.asarray(b["ln_1_bias"][i], np.float32)
        sd[f"{pre}.attn.qkv.weight"] = t(b["in_proj_w"][i])
        sd[f"{pre}.attn.qkv.bias"] = np.asarray(b["in_proj_b"][i], np.float32)
        sd[f"{pre}.attn.proj.weight"] = t(b["out_proj_w"][i])
        sd[f"{pre}.attn.proj.bias"] = np.asarray(b["out_proj_b"][i], np.float32)
        sd[f"{pre}.norm2.weight"] = np.asarray(b["ln_2_scale"][i], np.float32)
        sd[f"{pre}.norm2.bias"] = np.asarray(b["ln_2_bias"][i], np.float32)
        sd[f"{pre}.mlp.fc1.weight"] = t(b["c_fc_w"][i])
        sd[f"{pre}.mlp.fc1.bias"] = np.asarray(b["c_fc_b"][i], np.float32)
        sd[f"{pre}.mlp.fc2.weight"] = t(b["c_proj_w"][i])
        sd[f"{pre}.mlp.fc2.bias"] = np.asarray(b["c_proj_b"][i], np.float32)
    return sd


def _swin_visual_from_sd(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """timm swin keys (``visual.trunk.layers.{s}.blocks.{b}.*``) -> pytree.

    Accepts BOTH downsample placements: timm's modern stage-input layout
    (``layers.{s}.downsample`` for s >= 1) and the original MSRA
    end-of-stage layout (``layers.{s-1}.downsample``) — the computation
    sequence is identical. ``relative_position_index`` buffers are derived,
    not loaded."""
    from latteclip_tpu.models.swin import SWIN_TRUNKS

    def f32(key):
        return np.asarray(sd[key], np.float32)

    t = SWIN_TRUNKS[cfg.trunk]
    P = t["patch_size"]
    conv = f32("visual.trunk.patch_embed.proj.weight")
    D0 = conv.shape[0]
    stages = []
    for si, depth in enumerate(t["depths"]):
        stage: Dict[str, Any] = {}
        if si > 0:
            base = f"visual.trunk.layers.{si}.downsample"
            if f"{base}.norm.weight" not in sd:  # MSRA end-of-stage layout
                base = f"visual.trunk.layers.{si - 1}.downsample"
            stage["merge"] = {
                "norm_scale": f32(f"{base}.norm.weight"),
                "norm_bias": f32(f"{base}.norm.bias"),
                "reduction_w": f32(f"{base}.reduction.weight").T,
            }
        blocks = []
        for bi in range(depth):
            pre = f"visual.trunk.layers.{si}.blocks.{bi}"
            blocks.append({
                "ln_1_scale": f32(f"{pre}.norm1.weight"),
                "ln_1_bias": f32(f"{pre}.norm1.bias"),
                "in_proj_w": f32(f"{pre}.attn.qkv.weight").T,
                "in_proj_b": f32(f"{pre}.attn.qkv.bias"),
                "bias_table": f32(f"{pre}.attn.relative_position_bias_table"),
                "out_proj_w": f32(f"{pre}.attn.proj.weight").T,
                "out_proj_b": f32(f"{pre}.attn.proj.bias"),
                "ln_2_scale": f32(f"{pre}.norm2.weight"),
                "ln_2_bias": f32(f"{pre}.norm2.bias"),
                "c_fc_w": f32(f"{pre}.mlp.fc1.weight").T,
                "c_fc_b": f32(f"{pre}.mlp.fc1.bias"),
                "c_proj_w": f32(f"{pre}.mlp.fc2.weight").T,
                "c_proj_b": f32(f"{pre}.mlp.fc2.bias"),
            })
        stage["blocks"] = blocks
        stages.append(stage)
    return {
        "patch_kernel": conv.transpose(2, 3, 1, 0).reshape(P * P * 3, D0),
        "patch_bias": f32("visual.trunk.patch_embed.proj.bias"),
        "patch_norm_scale": f32("visual.trunk.patch_embed.norm.weight"),
        "patch_norm_bias": f32("visual.trunk.patch_embed.norm.bias"),
        "stages": stages,
        "norm_scale": f32("visual.trunk.norm.weight"),
        "norm_bias": f32("visual.trunk.norm.bias"),
        "proj": f32("visual.head.proj.weight").T.copy(),
    }


def _swin_visual_to_sd(v: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    from latteclip_tpu.models.swin import SWIN_TRUNKS

    def t_(w):
        return np.ascontiguousarray(np.asarray(w, np.float32).T)

    t = SWIN_TRUNKS[cfg.trunk]
    P = t["patch_size"]
    D0 = np.asarray(v["patch_norm_scale"]).shape[0]
    conv = np.asarray(v["patch_kernel"], np.float32).reshape(P, P, 3, D0).transpose(3, 2, 0, 1)
    sd: Dict[str, np.ndarray] = {
        "visual.trunk.patch_embed.proj.weight": np.ascontiguousarray(conv),
        "visual.trunk.patch_embed.proj.bias": np.asarray(v["patch_bias"], np.float32),
        "visual.trunk.patch_embed.norm.weight": np.asarray(v["patch_norm_scale"], np.float32),
        "visual.trunk.patch_embed.norm.bias": np.asarray(v["patch_norm_bias"], np.float32),
        "visual.trunk.norm.weight": np.asarray(v["norm_scale"], np.float32),
        "visual.trunk.norm.bias": np.asarray(v["norm_bias"], np.float32),
        "visual.head.proj.weight": t_(v["proj"]),
    }
    for si, stage in enumerate(v["stages"]):
        if "merge" in stage:
            base = f"visual.trunk.layers.{si}.downsample"
            sd[f"{base}.norm.weight"] = np.asarray(stage["merge"]["norm_scale"], np.float32)
            sd[f"{base}.norm.bias"] = np.asarray(stage["merge"]["norm_bias"], np.float32)
            sd[f"{base}.reduction.weight"] = t_(stage["merge"]["reduction_w"])
        for bi, b in enumerate(stage["blocks"]):
            pre = f"visual.trunk.layers.{si}.blocks.{bi}"
            sd[f"{pre}.norm1.weight"] = np.asarray(b["ln_1_scale"], np.float32)
            sd[f"{pre}.norm1.bias"] = np.asarray(b["ln_1_bias"], np.float32)
            sd[f"{pre}.attn.qkv.weight"] = t_(b["in_proj_w"])
            sd[f"{pre}.attn.qkv.bias"] = np.asarray(b["in_proj_b"], np.float32)
            sd[f"{pre}.attn.relative_position_bias_table"] = np.asarray(b["bias_table"], np.float32)
            sd[f"{pre}.attn.proj.weight"] = t_(b["out_proj_w"])
            sd[f"{pre}.attn.proj.bias"] = np.asarray(b["out_proj_b"], np.float32)
            sd[f"{pre}.norm2.weight"] = np.asarray(b["ln_2_scale"], np.float32)
            sd[f"{pre}.norm2.bias"] = np.asarray(b["ln_2_bias"], np.float32)
            sd[f"{pre}.mlp.fc1.weight"] = t_(b["c_fc_w"])
            sd[f"{pre}.mlp.fc1.bias"] = np.asarray(b["c_fc_b"], np.float32)
            sd[f"{pre}.mlp.fc2.weight"] = t_(b["c_proj_w"])
            sd[f"{pre}.mlp.fc2.bias"] = np.asarray(b["c_proj_b"], np.float32)
    return sd


def _relpos_visual_from_sd(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """timm VisionTransformerRelPos keys (``visual.trunk.blocks.{i}.*`` via
    the reference TimmModel wrapper, timm_model.py:73-108) -> relpos pytree.

    Shape-driven where the registry carries transcription assumptions (see
    models/vit_relpos.py docstring): the rel-pos MLP hidden dim comes from
    ``attn.rel_pos.mlp.fc1.weight``'s own shape, and LayerScale gammas
    default to ones when the checkpoint has no ``ls1.gamma`` (a trunk
    trained with ``init_values=None``). ``rel_coords_log`` /
    ``relative_position_index`` buffers are derived, not loaded."""
    from latteclip_tpu.models.vit_relpos import RELPOS_TRUNKS

    def f32(key):
        return np.asarray(sd[key], np.float32)

    t = RELPOS_TRUNKS[cfg.trunk]
    P, D = t["patch_size"], t["width"]
    conv = f32("visual.trunk.patch_embed.proj.weight")
    blocks = []
    for i in range(t["layers"]):
        pre = f"visual.trunk.blocks.{i}"
        blocks.append({
            "ln_1_scale": f32(f"{pre}.norm1.weight"),
            "ln_1_bias": f32(f"{pre}.norm1.bias"),
            "in_proj_w": f32(f"{pre}.attn.qkv.weight").T,
            "mlp_fc1_w": f32(f"{pre}.attn.rel_pos.mlp.fc1.weight").T,
            "mlp_fc1_b": f32(f"{pre}.attn.rel_pos.mlp.fc1.bias"),
            "mlp_fc2_w": f32(f"{pre}.attn.rel_pos.mlp.fc2.weight").T,
            "mlp_fc2_b": f32(f"{pre}.attn.rel_pos.mlp.fc2.bias"),
            "out_proj_w": f32(f"{pre}.attn.proj.weight").T,
            "out_proj_b": f32(f"{pre}.attn.proj.bias"),
            "ls_1": (f32(f"{pre}.ls1.gamma") if f"{pre}.ls1.gamma" in sd
                     else np.ones((D,), np.float32)),
            "ln_2_scale": f32(f"{pre}.norm2.weight"),
            "ln_2_bias": f32(f"{pre}.norm2.bias"),
            "c_fc_w": f32(f"{pre}.mlp.fc1.weight").T,
            "c_fc_b": f32(f"{pre}.mlp.fc1.bias"),
            "c_proj_w": f32(f"{pre}.mlp.fc2.weight").T,
            "c_proj_b": f32(f"{pre}.mlp.fc2.bias"),
            "ls_2": (f32(f"{pre}.ls2.gamma") if f"{pre}.ls2.gamma" in sd
                     else np.ones((D,), np.float32)),
        })
    return {
        "patch_kernel": conv.transpose(2, 3, 1, 0).reshape(P * P * 3, D),
        "patch_bias": f32("visual.trunk.patch_embed.proj.bias"),
        "class_embedding": f32("visual.trunk.cls_token").reshape(D),
        "blocks": blocks,
        "norm_scale": f32("visual.trunk.norm.weight"),
        "norm_bias": f32("visual.trunk.norm.bias"),
        "proj": f32("visual.head.proj.weight").T.copy(),
    }


def _relpos_visual_to_sd(v: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    from latteclip_tpu.models.vit_relpos import RELPOS_TRUNKS

    def t_(w):
        return np.ascontiguousarray(np.asarray(w, np.float32).T)

    t = RELPOS_TRUNKS[cfg.trunk]
    P = t["patch_size"]
    D = np.asarray(v["norm_scale"]).shape[0]
    conv = np.asarray(v["patch_kernel"], np.float32).reshape(P, P, 3, D).transpose(3, 2, 0, 1)
    sd: Dict[str, np.ndarray] = {
        "visual.trunk.patch_embed.proj.weight": np.ascontiguousarray(conv),
        "visual.trunk.patch_embed.proj.bias": np.asarray(v["patch_bias"], np.float32),
        "visual.trunk.cls_token": np.asarray(v["class_embedding"], np.float32).reshape(1, 1, D),
        "visual.trunk.norm.weight": np.asarray(v["norm_scale"], np.float32),
        "visual.trunk.norm.bias": np.asarray(v["norm_bias"], np.float32),
        "visual.head.proj.weight": t_(v["proj"]),
    }
    for i, b in enumerate(v["blocks"]):
        pre = f"visual.trunk.blocks.{i}"
        sd[f"{pre}.norm1.weight"] = np.asarray(b["ln_1_scale"], np.float32)
        sd[f"{pre}.norm1.bias"] = np.asarray(b["ln_1_bias"], np.float32)
        sd[f"{pre}.attn.qkv.weight"] = t_(b["in_proj_w"])
        sd[f"{pre}.attn.rel_pos.mlp.fc1.weight"] = t_(b["mlp_fc1_w"])
        sd[f"{pre}.attn.rel_pos.mlp.fc1.bias"] = np.asarray(b["mlp_fc1_b"], np.float32)
        sd[f"{pre}.attn.rel_pos.mlp.fc2.weight"] = t_(b["mlp_fc2_w"])
        sd[f"{pre}.attn.rel_pos.mlp.fc2.bias"] = np.asarray(b["mlp_fc2_b"], np.float32)
        sd[f"{pre}.attn.proj.weight"] = t_(b["out_proj_w"])
        sd[f"{pre}.attn.proj.bias"] = np.asarray(b["out_proj_b"], np.float32)
        sd[f"{pre}.ls1.gamma"] = np.asarray(b["ls_1"], np.float32)
        sd[f"{pre}.norm2.weight"] = np.asarray(b["ln_2_scale"], np.float32)
        sd[f"{pre}.norm2.bias"] = np.asarray(b["ln_2_bias"], np.float32)
        sd[f"{pre}.mlp.fc1.weight"] = t_(b["c_fc_w"])
        sd[f"{pre}.mlp.fc1.bias"] = np.asarray(b["c_fc_b"], np.float32)
        sd[f"{pre}.mlp.fc2.weight"] = t_(b["c_proj_w"])
        sd[f"{pre}.mlp.fc2.bias"] = np.asarray(b["c_proj_b"], np.float32)
        sd[f"{pre}.ls2.gamma"] = np.asarray(b["ls_2"], np.float32)
    return sd


def _convnext_visual_from_sd(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """``visual.trunk.*`` / ``visual.head.*`` ConvNeXt keys (timm layout via
    the reference TimmModel wrapper, timm_model.py:73-108) -> convnext
    pytree. Depthwise kernels [C,1,7,7] -> HWIO [7,7,1,C]; linears
    transposed to [in, out]."""

    def f32(key):
        return np.asarray(sd[key], np.float32)

    stem = {
        "conv_w": _conv_hwio(sd, "visual.trunk.stem.0.weight"),
        "conv_b": f32("visual.trunk.stem.0.bias"),
        "norm_scale": f32("visual.trunk.stem.1.weight"),
        "norm_bias": f32("visual.trunk.stem.1.bias"),
    }
    stages = []
    for s, depth in enumerate(cfg.depths):
        stage: Dict[str, Any] = {}
        if s > 0:
            pre = f"visual.trunk.stages.{s}.downsample"
            stage["down"] = {
                "norm_scale": f32(f"{pre}.0.weight"),
                "norm_bias": f32(f"{pre}.0.bias"),
                "conv_w": _conv_hwio(sd, f"{pre}.1.weight"),
                "conv_b": f32(f"{pre}.1.bias"),
            }
        per = {k: [] for k in ("dw_w", "dw_b", "norm_scale", "norm_bias",
                               "fc1_w", "fc1_b", "fc2_w", "fc2_b", "gamma")}
        for b in range(depth):
            pre = f"visual.trunk.stages.{s}.blocks.{b}"
            per["dw_w"].append(_conv_hwio(sd, f"{pre}.conv_dw.weight"))
            per["dw_b"].append(f32(f"{pre}.conv_dw.bias"))
            per["norm_scale"].append(f32(f"{pre}.norm.weight"))
            per["norm_bias"].append(f32(f"{pre}.norm.bias"))
            per["fc1_w"].append(f32(f"{pre}.mlp.fc1.weight").T)
            per["fc1_b"].append(f32(f"{pre}.mlp.fc1.bias"))
            per["fc2_w"].append(f32(f"{pre}.mlp.fc2.weight").T)
            per["fc2_b"].append(f32(f"{pre}.mlp.fc2.bias"))
            per["gamma"].append(f32(f"{pre}.gamma"))
        stage["blocks"] = {k: np.stack(v) for k, v in per.items()}
        stages.append(stage)
    head = {
        "norm_scale": f32("visual.trunk.head.norm.weight"),
        "norm_bias": f32("visual.trunk.head.norm.bias"),
    }
    if "visual.head.proj.weight" in sd:
        head["proj_w"] = f32("visual.head.proj.weight").T.copy()
    if "visual.head.mlp.fc1.weight" in sd:
        head["mlp_fc1_w"] = f32("visual.head.mlp.fc1.weight").T.copy()
        head["mlp_fc1_b"] = f32("visual.head.mlp.fc1.bias")
        head["mlp_fc2_w"] = f32("visual.head.mlp.fc2.weight").T.copy()
    return {"stem": stem, "stages": stages, "head": head}


def _convnext_visual_to_sd(v: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    def hwio_to_oihw(w):
        return np.ascontiguousarray(np.asarray(w, np.float32).transpose(3, 2, 0, 1))

    def t(w):
        return np.ascontiguousarray(np.asarray(w, np.float32).T)

    sd: Dict[str, np.ndarray] = {
        "visual.trunk.stem.0.weight": hwio_to_oihw(v["stem"]["conv_w"]),
        "visual.trunk.stem.0.bias": v["stem"]["conv_b"],
        "visual.trunk.stem.1.weight": v["stem"]["norm_scale"],
        "visual.trunk.stem.1.bias": v["stem"]["norm_bias"],
    }
    for s, stage in enumerate(v["stages"]):
        if s > 0:
            pre = f"visual.trunk.stages.{s}.downsample"
            sd[f"{pre}.0.weight"] = stage["down"]["norm_scale"]
            sd[f"{pre}.0.bias"] = stage["down"]["norm_bias"]
            sd[f"{pre}.1.weight"] = hwio_to_oihw(stage["down"]["conv_w"])
            sd[f"{pre}.1.bias"] = stage["down"]["conv_b"]
        blocks = stage["blocks"]
        for b in range(blocks["gamma"].shape[0]):
            pre = f"visual.trunk.stages.{s}.blocks.{b}"
            sd[f"{pre}.conv_dw.weight"] = hwio_to_oihw(blocks["dw_w"][b])
            sd[f"{pre}.conv_dw.bias"] = blocks["dw_b"][b]
            sd[f"{pre}.norm.weight"] = blocks["norm_scale"][b]
            sd[f"{pre}.norm.bias"] = blocks["norm_bias"][b]
            sd[f"{pre}.mlp.fc1.weight"] = t(blocks["fc1_w"][b])
            sd[f"{pre}.mlp.fc1.bias"] = blocks["fc1_b"][b]
            sd[f"{pre}.mlp.fc2.weight"] = t(blocks["fc2_w"][b])
            sd[f"{pre}.mlp.fc2.bias"] = blocks["fc2_b"][b]
            sd[f"{pre}.gamma"] = blocks["gamma"][b]
    h = v["head"]
    sd["visual.trunk.head.norm.weight"] = h["norm_scale"]
    sd["visual.trunk.head.norm.bias"] = h["norm_bias"]
    if "proj_w" in h:
        sd["visual.head.proj.weight"] = t(h["proj_w"])
    if "mlp_fc1_w" in h:
        sd["visual.head.mlp.fc1.weight"] = t(h["mlp_fc1_w"])
        sd["visual.head.mlp.fc1.bias"] = h["mlp_fc1_b"]
        sd["visual.head.mlp.fc2.weight"] = t(h["mlp_fc2_w"])
    return {k: np.ascontiguousarray(np.asarray(w, np.float32)) for k, w in sd.items()}


_CROSS_EXTRA = {
    "ln_1_kv_scale": ("ln_1_kv.weight", False),
    "ln_1_kv_bias": ("ln_1_kv.bias", False),
}


def _stack_named_blocks(sd, prefix: str, layers: int, extra=None) -> Dict[str, np.ndarray]:
    """Like _stack_blocks but for an explicit module list prefix (e.g.
    ``text_decoder.cross_attn``) with optional extra keys."""
    keys = dict(_BLOCK_KEYS)
    if extra:
        keys.update(extra)
    blocks: Dict[str, np.ndarray] = {}
    for ours, (suffix, transpose) in keys.items():
        per_layer = []
        for i in range(layers):
            w = np.asarray(sd[f"{prefix}.{i}.{suffix}"], dtype=np.float32)
            per_layer.append(w.T if transpose else w)
        blocks[ours] = np.stack(per_layer)
    return blocks


def _attn_pool_from_sd(sd, prefix: str) -> Dict[str, np.ndarray]:
    def f32(k):
        return np.asarray(sd[f"{prefix}.{k}"], np.float32)

    return {
        "query": f32("query"),
        "q_proj_w": f32("attn.q_proj_weight"),
        "k_proj_w": f32("attn.k_proj_weight"),
        "v_proj_w": f32("attn.v_proj_weight"),
        "in_proj_b": f32("attn.in_proj_bias"),
        "out_proj_w": f32("attn.out_proj.weight"),
        "out_proj_b": f32("attn.out_proj.bias"),
        "ln_q_scale": f32("ln_q.weight"),
        "ln_q_bias": f32("ln_q.bias"),
        "ln_k_scale": f32("ln_k.weight"),
        "ln_k_bias": f32("ln_k.bias"),
    }


def coca_state_dict_to_params(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Map a torch CoCa state dict (reference coca_model.py layout) to our
    param pytree: ``text.*`` tower with cls token, ``visual.*`` ViT with
    attentional pooling, ``text_decoder.*`` multimodal decoder."""
    sd = dict(sd)

    def f32(key):
        return np.asarray(sd[key], dtype=np.float32)

    P = cfg.vision.patch_size
    conv = f32("visual.conv1.weight")
    visual = {
        "patch_kernel": conv.transpose(2, 3, 1, 0).reshape(P * P * 3, -1),
        "class_embedding": f32("visual.class_embedding"),
        "pos_embed": f32("visual.positional_embedding"),
        "ln_pre_scale": f32("visual.ln_pre.weight"),
        "ln_pre_bias": f32("visual.ln_pre.bias"),
        "blocks": _stack_blocks(sd, "visual.transformer.", cfg.vision.layers),
        "ln_post_scale": f32("visual.ln_post.weight"),
        "ln_post_bias": f32("visual.ln_post.bias"),
        "proj": f32("visual.proj"),
    }
    if "visual.attn_pool.query" in sd:  # coca_roberta's ViT pools without one
        visual["attn_pool"] = _attn_pool_from_sd(sd, "visual.attn_pool")
    from latteclip_tpu.models.hf_text import HFTextConfig

    if isinstance(cfg.text, HFTextConfig):
        # coca_roberta-*: the text tower is an HF trunk under text.transformer.*
        # with the projection at text.proj[.N].weight (reference
        # coca_model.py:97-103 -> hf_model.py layout, same as CustomTextCLIP)
        from latteclip_tpu.models.hf_text import import_hf_state_dict

        hf_sd = {k[len("text.transformer."):]: v for k, v in sd.items()
                 if k.startswith("text.transformer.")}
        text = import_hf_state_dict(hf_sd, cfg.text)
        if "text.proj.weight" in sd:
            text["proj_w"] = f32("text.proj.weight").T
        elif "text.proj.0.weight" in sd:
            text["proj1_w"] = f32("text.proj.0.weight").T
            text["proj2_w"] = f32("text.proj.2.weight").T
    else:
        text = {
            "token_embedding": f32("text.token_embedding.weight"),
            "cls_emb": f32("text.cls_emb"),
            "pos_embed": f32("text.positional_embedding"),
            "blocks": _stack_blocks(sd, "text.transformer.", cfg.text.layers),
            "ln_final_scale": f32("text.ln_final.weight"),
            "ln_final_bias": f32("text.ln_final.bias"),
            "text_projection": f32("text.text_projection"),
        }
    decoder = {
        "blocks": _stack_named_blocks(sd, "text_decoder.resblocks", cfg.multimodal.layers),
        "cross": _stack_named_blocks(
            sd, "text_decoder.cross_attn", cfg.multimodal.layers, extra=_CROSS_EXTRA
        ),
        "ln_final_scale": f32("text_decoder.ln_final.weight"),
        "ln_final_bias": f32("text_decoder.ln_final.bias"),
        "text_projection": f32("text_decoder.text_projection"),
    }
    params = {
        "visual": visual,
        "text": text,
        "text_decoder": decoder,
        "logit_scale": f32("logit_scale").reshape(()),
    }
    return jax.tree.map(jnp.asarray, params)


def _unstack_named_blocks(blocks: Dict[str, Any], prefix: str, extra=None) -> Dict[str, np.ndarray]:
    """Inverse of :func:`_stack_named_blocks`."""
    keys = dict(_BLOCK_KEYS)
    if extra:
        keys.update(extra)
    layers = int(np.asarray(blocks["ln_1_scale"]).shape[0])
    out: Dict[str, np.ndarray] = {}
    for ours, (suffix, transpose) in keys.items():
        arr = np.asarray(blocks[ours], dtype=np.float32)
        for i in range(layers):
            w = arr[i]
            out[f"{prefix}.{i}.{suffix}"] = w.T if transpose else w
    return out


_ATTN_POOL_KEYS = {
    "query": "query",
    "q_proj_w": "attn.q_proj_weight",
    "k_proj_w": "attn.k_proj_weight",
    "v_proj_w": "attn.v_proj_weight",
    "in_proj_b": "attn.in_proj_bias",
    "out_proj_w": "attn.out_proj.weight",
    "out_proj_b": "attn.out_proj.bias",
    "ln_q_scale": "ln_q.weight",
    "ln_q_bias": "ln_q.bias",
    "ln_k_scale": "ln_k.weight",
    "ln_k_bias": "ln_k.bias",
}


def coca_params_to_state_dict(
    params: Dict[str, Any],
    cfg,
    memory_bank: Optional[np.ndarray] = None,
    classnames: Optional[List[str]] = None,
) -> Dict[str, np.ndarray]:
    """Invert :func:`coca_state_dict_to_params` (reference coca_model.py
    layout), so CoCa fine-tunes checkpoint in the OpenCLIP ``.pt`` format."""
    from latteclip_tpu.models.hf_text import HFTextConfig

    params = jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), params)
    v, t, d = params["visual"], params["text"], params["text_decoder"]
    P = cfg.vision.patch_size
    sd: Dict[str, np.ndarray] = {
        "logit_scale": params["logit_scale"].reshape(()),
        "visual.conv1.weight": np.ascontiguousarray(
            v["patch_kernel"].reshape(P, P, 3, -1).transpose(3, 2, 0, 1)),
        "visual.class_embedding": v["class_embedding"],
        "visual.positional_embedding": v["pos_embed"],
        "visual.ln_pre.weight": v["ln_pre_scale"],
        "visual.ln_pre.bias": v["ln_pre_bias"],
        "visual.ln_post.weight": v["ln_post_scale"],
        "visual.ln_post.bias": v["ln_post_bias"],
        "visual.proj": v["proj"],
    }
    sd.update(_unstack_blocks(v["blocks"], "visual.transformer."))
    if "attn_pool" in v:
        for ours, theirs in _ATTN_POOL_KEYS.items():
            sd[f"visual.attn_pool.{theirs}"] = v["attn_pool"][ours]
    if isinstance(cfg.text, HFTextConfig):
        from latteclip_tpu.models.hf_text import export_hf_state_dict

        for k, arr in export_hf_state_dict(t, cfg.text).items():
            sd[f"text.transformer.{k}"] = arr
        if "proj_w" in t:
            sd["text.proj.weight"] = np.ascontiguousarray(t["proj_w"].T)
        if "proj1_w" in t:
            sd["text.proj.0.weight"] = np.ascontiguousarray(t["proj1_w"].T)
            sd["text.proj.2.weight"] = np.ascontiguousarray(t["proj2_w"].T)
    else:
        sd.update({
            "text.token_embedding.weight": t["token_embedding"],
            "text.cls_emb": t["cls_emb"],
            "text.positional_embedding": t["pos_embed"],
            "text.ln_final.weight": t["ln_final_scale"],
            "text.ln_final.bias": t["ln_final_bias"],
            "text.text_projection": t["text_projection"],
        })
        sd.update(_unstack_blocks(t["blocks"], "text.transformer."))
    sd.update(_unstack_named_blocks(d["blocks"], "text_decoder.resblocks"))
    sd.update(_unstack_named_blocks(d["cross"], "text_decoder.cross_attn",
                                    extra=_CROSS_EXTRA))
    sd.update({
        "text_decoder.ln_final.weight": d["ln_final_scale"],
        "text_decoder.ln_final.bias": d["ln_final_bias"],
        "text_decoder.text_projection": d["text_projection"],
    })
    if memory_bank is not None:
        assert classnames is not None and len(classnames) == len(memory_bank)
        for name, vec in zip(classnames, np.asarray(memory_bank, dtype=np.float32)):
            sd[f"memory_bank.{name}"] = vec
    return {k: w if w.flags["C_CONTIGUOUS"] else np.asarray(w, order="C")
            for k, w in sd.items()}


def pt_state_dict_to_params(
    sd: Dict[str, np.ndarray], cfg: CLIPConfig
) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    """Map an OpenCLIP state dict to (params pytree, memory_bank dict)."""
    from latteclip_tpu.core.config import ConvNeXtVisionConfig, ResNetVisionConfig

    sd = _normalize_state_dict(dict(sd))
    memory_bank = {
        k[len("memory_bank."):]: np.asarray(v, dtype=np.float32)
        for k, v in sd.items()
        if k.startswith("memory_bank.")
    }

    from latteclip_tpu.core.config import CoCaConfig

    if isinstance(cfg, CoCaConfig):
        return coca_state_dict_to_params(sd, cfg), memory_bank

    from latteclip_tpu.core.config import Eva02VisionConfig

    trunk = getattr(cfg.vision, "timm_trunk", "")
    eva = trunk.startswith("eva")
    timm_vit = bool(trunk) and not eva
    eva2 = isinstance(cfg.vision, Eva02VisionConfig)
    from latteclip_tpu.core.config import RelPosVisionConfig, SwinVisionConfig

    swin = isinstance(cfg.vision, SwinVisionConfig)
    relpos = isinstance(cfg.vision, RelPosVisionConfig)
    if (isinstance(cfg.vision, (ResNetVisionConfig, ConvNeXtVisionConfig))
            or eva or eva2 or timm_vit or swin or relpos):
        if relpos:
            visual = _relpos_visual_from_sd(sd, cfg.vision)
        elif swin:
            visual = _swin_visual_from_sd(sd, cfg.vision)
        elif eva2:
            visual = _eva02_visual_from_sd(sd, cfg.vision)
        elif eva:
            visual = _eva_visual_from_sd(sd, cfg.vision)
        elif timm_vit:
            visual = _timm_vit_visual_from_sd(sd, cfg.vision)
        elif isinstance(cfg.vision, ConvNeXtVisionConfig):
            visual = _convnext_visual_from_sd(sd, cfg.vision)
        else:
            visual = _resnet_visual_from_sd(sd, cfg.vision)
        text = {
            "token_embedding": np.asarray(sd["token_embedding.weight"], np.float32),
            "pos_embed": np.asarray(sd["positional_embedding"], np.float32),
            "blocks": _stack_blocks(sd, "transformer.", cfg.text.layers),
            "ln_final_scale": np.asarray(sd["ln_final.weight"], np.float32),
            "ln_final_bias": np.asarray(sd["ln_final.bias"], np.float32),
            "text_projection": np.asarray(sd["text_projection"], np.float32),
        }
        params = {
            "visual": visual,
            "text": text,
            "logit_scale": np.asarray(sd["logit_scale"], np.float32).reshape(()),
        }
        return jax.tree.map(jnp.asarray, params), memory_bank

    P = cfg.vision.patch_size
    conv = np.asarray(sd["visual.conv1.weight"], dtype=np.float32)  # [D, 3, P, P]
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(P * P * 3, -1)

    vis_pos = resize_vision_pos_embed(
        np.asarray(sd["visual.positional_embedding"], dtype=np.float32),
        cfg.vision.seq_len,
        cls_token=not getattr(cfg.vision, "no_cls_token", False),
    )

    def f32(key):
        return np.asarray(sd[key], dtype=np.float32)

    visual = {
        "patch_kernel": patch_kernel,
        "pos_embed": vis_pos,
        "ln_pre_scale": f32("visual.ln_pre.weight"),
        "ln_pre_bias": f32("visual.ln_pre.bias"),
        "blocks": _stack_blocks(sd, "visual.transformer.", cfg.vision.layers),
        "ln_post_scale": f32("visual.ln_post.weight"),
        "ln_post_bias": f32("visual.ln_post.bias"),
    }
    # SigLIP-family extras: no class token / final proj, conv bias, MAP head
    if "visual.class_embedding" in sd:
        visual["class_embedding"] = f32("visual.class_embedding")
    if "visual.proj" in sd:
        visual["proj"] = f32("visual.proj")
    if "visual.conv1.bias" in sd:
        visual["patch_bias"] = f32("visual.conv1.bias")
    map_head = {
        k[len("latteclip.visual.map_head."):]: np.asarray(v, np.float32)
        for k, v in sd.items() if k.startswith("latteclip.visual.map_head.")
    }
    if map_head:
        visual["map_head"] = map_head

    from latteclip_tpu.models.hf_text import HFTextConfig

    if isinstance(cfg.text, HFTextConfig):
        # CustomTextCLIP naming: HF weights under text.transformer.*, the
        # projection under text.proj[.N].weight (reference hf_model.py)
        from latteclip_tpu.models.hf_text import import_hf_state_dict

        # _normalize_state_dict has already folded the "text." prefix away
        # (CustomTextCLIP layout), leaving "transformer.*" + "proj*" keys
        prefix = "text.transformer." if any(k.startswith("text.transformer.") for k in sd) \
            else "transformer."
        pp = prefix[:len(prefix) - len("transformer.")]
        hf_sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
        text = import_hf_state_dict(hf_sd, cfg.text)
        if f"{pp}proj.weight" in sd:
            text["proj_w"] = f32(f"{pp}proj.weight").T.copy()
        if f"{pp}proj.0.weight" in sd:
            text["proj1_w"] = f32(f"{pp}proj.0.weight").T.copy()
            text["proj2_w"] = f32(f"{pp}proj.2.weight").T.copy()
    else:
        text = {
            "token_embedding": f32("token_embedding.weight"),
            "pos_embed": f32("positional_embedding"),
            "blocks": _stack_blocks(sd, "transformer.", cfg.text.layers),
            "ln_final_scale": f32("ln_final.weight"),
            "ln_final_bias": f32("ln_final.bias"),
            "text_projection": f32("text_projection"),
        }
        if "latteclip.text.text_projection_b" in sd:
            text["text_projection_b"] = f32("latteclip.text.text_projection_b")
    params = {
        "visual": visual,
        "text": text,
        "logit_scale": np.asarray(sd["logit_scale"], dtype=np.float32).reshape(()),
    }
    if "logit_bias" in sd:
        params["logit_bias"] = np.asarray(sd["logit_bias"], np.float32).reshape(())
    params = jax.tree.map(jnp.asarray, params)
    return params, memory_bank


def params_to_pt_state_dict(
    params: Dict[str, Any],
    cfg: CLIPConfig,
    memory_bank: Optional[np.ndarray] = None,
    classnames: Optional[List[str]] = None,
) -> Dict[str, np.ndarray]:
    """Invert :func:`pt_state_dict_to_params` (incl. memory_bank.<name> keys)."""
    from latteclip_tpu.core.config import CoCaConfig, ConvNeXtVisionConfig, ResNetVisionConfig

    if isinstance(cfg, CoCaConfig):
        return coca_params_to_state_dict(
            params, cfg, memory_bank=memory_bank, classnames=classnames)

    params = jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), params)
    v, t = params["visual"], params["text"]

    from latteclip_tpu.core.config import Eva02VisionConfig

    trunk = getattr(cfg.vision, "timm_trunk", "")
    eva = trunk.startswith("eva")
    timm_vit = bool(trunk) and not eva
    eva2 = isinstance(cfg.vision, Eva02VisionConfig)
    from latteclip_tpu.core.config import RelPosVisionConfig, SwinVisionConfig

    swin = isinstance(cfg.vision, SwinVisionConfig)
    relpos = isinstance(cfg.vision, RelPosVisionConfig)
    if (isinstance(cfg.vision, (ResNetVisionConfig, ConvNeXtVisionConfig))
            or eva or eva2 or timm_vit or swin or relpos):
        if relpos:
            sd = _relpos_visual_to_sd(v, cfg.vision)
        elif swin:
            sd = _swin_visual_to_sd(v, cfg.vision)
        elif eva2:
            sd = _eva02_visual_to_sd(v, cfg.vision)
        elif eva:
            sd = _eva_visual_to_sd(v, cfg.vision)
        elif timm_vit:
            sd = _timm_vit_visual_to_sd(v, cfg.vision)
        elif isinstance(cfg.vision, ConvNeXtVisionConfig):
            sd = _convnext_visual_to_sd(v, cfg.vision)
        else:
            sd = _resnet_visual_to_sd(v, cfg.vision)
        sd.update({
            "logit_scale": params["logit_scale"].reshape(()),
            "token_embedding.weight": t["token_embedding"],
            "positional_embedding": t["pos_embed"],
            "ln_final.weight": t["ln_final_scale"],
            "ln_final.bias": t["ln_final_bias"],
            "text_projection": t["text_projection"],
        })
        sd.update(_unstack_blocks(t["blocks"], "transformer."))
        if memory_bank is not None:
            assert classnames is not None and len(classnames) == len(memory_bank)
            for name, vec in zip(classnames, np.asarray(memory_bank, dtype=np.float32)):
                sd[f"memory_bank.{name}"] = vec
        return {k: w if w.flags["C_CONTIGUOUS"] else np.asarray(w, order="C")
            for k, w in sd.items()}

    P = cfg.vision.patch_size
    D = cfg.vision.width
    conv = v["patch_kernel"].reshape(P, P, 3, D).transpose(3, 2, 0, 1)

    sd: Dict[str, np.ndarray] = {
        "logit_scale": params["logit_scale"].reshape(()),
        "visual.conv1.weight": np.ascontiguousarray(conv),
        "visual.positional_embedding": v["pos_embed"],
        "visual.ln_pre.weight": v["ln_pre_scale"],
        "visual.ln_pre.bias": v["ln_pre_bias"],
        "visual.ln_post.weight": v["ln_post_scale"],
        "visual.ln_post.bias": v["ln_post_bias"],
    }
    if "class_embedding" in v:
        sd["visual.class_embedding"] = v["class_embedding"]
    if "proj" in v:
        sd["visual.proj"] = v["proj"]
    if "patch_bias" in v:
        sd["visual.conv1.bias"] = v["patch_bias"]
    if "map_head" in v:  # SigLIP MAP head: flat self-interop namespace
        for k, arr in v["map_head"].items():
            sd[f"latteclip.visual.map_head.{k}"] = arr
    if "logit_bias" in params:
        sd["logit_bias"] = params["logit_bias"].reshape(())
    sd.update(_unstack_blocks(v["blocks"], "visual.transformer."))

    from latteclip_tpu.models.hf_text import HFTextConfig

    if isinstance(cfg.text, HFTextConfig):
        from latteclip_tpu.models.hf_text import export_hf_state_dict

        for k, arr in export_hf_state_dict(t, cfg.text).items():
            sd[f"text.transformer.{k}"] = arr
        if "proj_w" in t:
            sd["text.proj.weight"] = np.ascontiguousarray(t["proj_w"].T)
        if "proj1_w" in t:
            sd["text.proj.0.weight"] = np.ascontiguousarray(t["proj1_w"].T)
            sd["text.proj.2.weight"] = np.ascontiguousarray(t["proj2_w"].T)
    else:
        sd.update({
            "token_embedding.weight": t["token_embedding"],
            "positional_embedding": t["pos_embed"],
            "ln_final.weight": t["ln_final_scale"],
            "ln_final.bias": t["ln_final_bias"],
            "text_projection": t["text_projection"],
        })
        if "text_projection_b" in t:
            sd["latteclip.text.text_projection_b"] = t["text_projection_b"]
        sd.update(_unstack_blocks(t["blocks"], "transformer."))
    if memory_bank is not None:
        assert classnames is not None and len(classnames) == len(memory_bank)
        for name, vec in zip(classnames, np.asarray(memory_bank, dtype=np.float32)):
            sd[f"memory_bank.{name}"] = vec
    return {k: w if w.flags["C_CONTIGUOUS"] else np.asarray(w, order="C")
            for k, w in sd.items()}


def flatten_opt_state(opt_state) -> Dict[str, np.ndarray]:
    """Flatten an optax state pytree to {tree-path: ndarray} for checkpoint
    storage — the parity of the reference's ``"optimizer": optimizer.
    state_dict()`` (reference main.py:525-526)."""
    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def restore_opt_state(template_opt_state, saved: Dict[str, np.ndarray],
                      allow_missing: Sequence[str] = ("logit_bias",)):
    """Rebuild an optax state from a flattened dict, using a freshly-created
    state as the structure template (the reference restores via
    ``optimizer.load_state_dict``, main.py:378-379). Raises KeyError on a
    structural mismatch so a silent partial restore can't happen — except
    for leaves named in ``allow_missing``: params injected after the
    checkpoint was written (e.g. ``--siglip`` adds a trainable logit_bias to
    a plain-CLIP checkpoint) keep their fresh zero moments with a log line
    instead of aborting the resume."""
    import logging

    flat, treedef = jax.tree_util.tree_flatten_with_path(template_opt_state)
    leaves = []
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        if key not in saved:
            if any(name in key for name in allow_missing):
                logging.getLogger(__name__).warning(
                    "optimizer leaf %s absent from checkpoint; keeping fresh "
                    "moments (param injected after the checkpoint was written)",
                    key,
                )
                leaves.append(jnp.asarray(leaf))
                continue
            raise KeyError(f"checkpoint optimizer state missing leaf {key}")
        arr = np.asarray(saved[key])
        tpl = np.asarray(leaf)
        if arr.shape != tpl.shape:
            # .pt storage is 1-d; 0-d counts come back as shape (1,)
            if arr.size != tpl.size:
                raise ValueError(
                    f"optimizer leaf {key}: checkpoint shape {arr.shape} != "
                    f"current {tpl.shape}"
                )
            arr = arr.reshape(tpl.shape)
        leaves.append(jnp.asarray(arr, dtype=tpl.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _is_torchscript_zip(path: str) -> bool:
    """OpenAI's original checkpoints are TorchScript archives (zip with
    constants.pkl + code/), not eager pickles (reference openai.py:24-91)."""
    import zipfile

    try:
        with zipfile.ZipFile(path) as z:
            names = z.namelist()
        return any(n.endswith("constants.pkl") for n in names)
    except Exception:
        return False


def load_clip_pt(path: str, cfg: CLIPConfig):
    """Load a checkpoint: torch ``.pt`` zip-pickle (bare state dict or
    ``{"epoch", "state_dict", ...}`` training checkpoint, reference
    main.py:367-385), a HF-hub ``.safetensors`` file, a big_vision SigLIP
    ``.npz``, or (with torch available) an OpenAI TorchScript archive."""
    if path.endswith(".npz"):
        from latteclip_tpu.core.big_vision import load_big_vision_npz

        return load_big_vision_npz(path, cfg), {}, {}
    if path.endswith(".safetensors"):
        from latteclip_tpu.core.pt_io import load_safetensors

        obj = load_safetensors(path)
    elif _is_torchscript_zip(path):
        try:
            import torch
        except ImportError as e:
            raise RuntimeError(
                f"{path} is an OpenAI TorchScript archive; convert it once "
                "with tools/convert_openai_jit.py (needs torch) and load the "
                "converted file"
            ) from e
        model = torch.jit.load(path, map_location="cpu")
        obj = {
            k: v.float().numpy()
            for k, v in model.state_dict().items()
            if k not in ("input_resolution", "context_length", "vocab_size")
            and hasattr(v, "numpy")
        }
    else:
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
    opt_state=None,
    step: Optional[int] = None,
) -> None:
    sd = params_to_pt_state_dict(params, cfg, memory_bank=memory_bank, classnames=classnames)
    obj: Dict[str, Any] = {"state_dict": sd}
    if epoch is not None:
        obj["epoch"] = epoch
    if name is not None:
        obj["name"] = name
    if opt_state is not None:
        # flattened optax state — reference checkpoints carry "optimizer"
        # (main.py:519-526); resume restores AdamW moments + schedule count
        obj["optimizer"] = flatten_opt_state(opt_state)
    if step is not None:
        obj["step"] = int(step)
    tmp = path + ".tmp"
    save_pt(obj, tmp)
    os.replace(tmp, path)  # atomic, reference main.py:546-551
