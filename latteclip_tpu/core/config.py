"""Model architecture configuration and JSON registry.

Mirrors the reference's config surface — ``embed_dim`` + ``vision_cfg`` +
``text_cfg`` JSON files scanned into a registry (reference
``src/open_clip/factory.py:31-52``, ``src/open_clip/model.py:146-203``) —
with a TPU-first twist: configs also carry the compute dtype policy and
expose derived static shapes (token counts) that the pallas kernels and the
pjit train step need at trace time.
"""
from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Dict, Tuple

_CONFIG_DIR = Path(__file__).resolve().parent / "model_configs"


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    head_width: int = 64
    mlp_ratio: float = 4.0
    pool_type: str = "tok"          # 'tok' | 'avg' | 'map' (big_vision MAPHead)
    final_ln_after_pool: bool = False
    no_ln_pre: bool = False
    no_cls_token: bool = False      # SigLIP/big_vision ViTs have no class token
    patch_dropout: float = 0.0      # train-time patch dropout probability
    pos_embed_type: str = "learnable"  # 'learnable' | 'sin_cos_2d'
    attentional_pool: bool = False  # learned-query pooling head (CoCa-style)
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    ls_init_value: float = None     # LayerScale init (None = disabled)
    ln_eps: float = 1e-5            # torch default; SigLIP/big_vision use 1e-6
    # set when the config reaches this native tower through a timm trunk name
    # (EVA01 giant: a standard pre-norm ViT). Selects the timm Eva checkpoint
    # layout (visual.trunk.*, q/v bias with implicit-zero k, head proj WITH
    # bias) and adds patch_bias/proj_b at init.
    timm_trunk: str = ""

    @property
    def heads(self) -> int:
        return self.width // self.head_width

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        """Token count incl. class token — static shape for kernels."""
        return self.grid * self.grid + (0 if self.no_cls_token else 1)


@dataclasses.dataclass(frozen=True)
class ResNetVisionConfig:
    """ModifiedResNet tower (reference model.py:251-259): ``layers`` is the
    per-stage block count tuple; feature dim is ``width * 32``."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    image_size: int = 224
    head_width: int = 64

    @property
    def embed_width(self) -> int:
        return self.width * 32

    @property
    def heads(self) -> int:
        # reference: vision_heads = width * 32 // head_width (model.py:252)
        return self.embed_width // self.head_width


@dataclasses.dataclass(frozen=True)
class ConvNeXtVisionConfig:
    """ConvNeXt tower — the reference reaches it via timm
    (``timm_model.py:28-108`` + the 11 ``convnext_*`` model configs, all of
    which set ``timm_pool=''`` → avg-pool trunk + head LayerNorm). Native
    implementation in models/convnext.py; ``trunk`` is the timm model name
    whose published depths/dims are resolved from CONVNEXT_TRUNKS."""

    trunk: str = "convnext_base"
    image_size: int = 224
    proj: str = "linear"            # timm_proj: 'linear' | 'mlp' | 'none'
    drop_path: float = 0.0          # timm_drop_path (stochastic depth ramp)
    ls_init_value: float = 1e-6     # LayerScale gamma init (timm default)
    ln_eps: float = 1e-6            # ConvNeXt uses 1e-6 everywhere

    @property
    def depths(self) -> Tuple[int, ...]:
        from latteclip_tpu.models.convnext import CONVNEXT_TRUNKS

        return CONVNEXT_TRUNKS[self.trunk][0]

    @property
    def dims(self) -> Tuple[int, ...]:
        from latteclip_tpu.models.convnext import CONVNEXT_TRUNKS

        return CONVNEXT_TRUNKS[self.trunk][1]

    @property
    def embed_width(self) -> int:
        return self.dims[-1]


@dataclasses.dataclass(frozen=True)
class Eva02VisionConfig:
    """EVA-02 TrV trunk (reference reaches it via timm ``eva02_*_clip_*``;
    native implementation in models/eva02.py — see its module docstring for
    the published-architecture sourcing and the rope-layout caveat)."""

    trunk: str = "eva02_base_patch16_clip_224"
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    head_width: int = 64
    swiglu_hidden: int = 2048       # int(width * 4*2/3) for TrV variants
    swiglu: bool = True             # SwiGLU + sub-LN MLP (plain gelu MLP if False)
    use_rope: bool = True           # 2-D axial rope on q/k
    inner_attn_norm: bool = True    # LN on merged heads pre-out-proj (scale_attn_inner)
    post_norm: bool = False         # E variant: post-norm blocks
    qkv_fused: bool = True          # fused qkv w/ q/v bias (B, E); L splits q/k/v
    ref_feat_shape: int = 16        # rope reference grid (224/16; timm ref_feat_shape)
    rope_temperature: float = 10000.0
    ln_eps: float = 1e-6

    @property
    def heads(self) -> int:
        return self.width // self.head_width

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1


@dataclasses.dataclass(frozen=True)
class SwinVisionConfig:
    """Swin Transformer trunk (reference reaches it via timm
    ``swin_base_patch4_window7_224``; native implementation in
    models/swin.py — windowed attention with static reshapes)."""

    trunk: str = "swin_base_patch4_window7_224"
    image_size: int = 224
    ln_eps: float = 1e-5

    @property
    def embed_width(self) -> int:
        from latteclip_tpu.models.swin import SWIN_TRUNKS

        t = SWIN_TRUNKS[self.trunk]
        return t["embed_dim"] * 2 ** (len(t["depths"]) - 1)


@dataclasses.dataclass(frozen=True)
class RelPosVisionConfig:
    """VisionTransformerRelPos trunk (reference reaches it via timm
    ``vit_relpos_medium_patch16_cls_224``; native implementation in
    models/vit_relpos.py — rel-pos-MLP attention bias, no absolute pos
    embed; see its module docstring for the transcription caveats)."""

    trunk: str = "vit_relpos_medium_patch16_cls_224"
    image_size: int = 224
    ln_eps: float = 1e-6

    @property
    def embed_width(self) -> int:
        from latteclip_tpu.models.vit_relpos import RELPOS_TRUNKS

        return RELPOS_TRUNKS[self.trunk]["width"]


# Published EVA02-CLIP trunk shapes (EVA-02 arXiv 2303.11331 Table 2;
# EVA-CLIP arXiv 2303.15389 Table 1). The enormous tower is EVA-CLIP's
# pre-TrV giant: plain MLP, no rope, post-norm.
EVA02_TRUNKS: Dict[str, Dict[str, Any]] = {
    "eva02_base_patch16_clip_224": dict(
        patch_size=16, width=768, layers=12, head_width=64,
        swiglu_hidden=2048, ref_feat_shape=16,
    ),
    "eva02_large_patch14_clip_224": dict(
        patch_size=14, width=1024, layers=24, head_width=64,
        swiglu_hidden=2730, ref_feat_shape=16, qkv_fused=False,
    ),
    "eva02_large_patch14_clip_336": dict(
        patch_size=14, width=1024, layers=24, head_width=64,
        swiglu_hidden=2730, ref_feat_shape=16, qkv_fused=False,
    ),
    "eva02_enormous_patch14_clip_224": dict(
        patch_size=14, width=1792, layers=64, head_width=112,
        swiglu_hidden=15360, swiglu=False, use_rope=False,
        inner_attn_norm=False, post_norm=True,
    ),
}


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    pool_type: str = "argmax"       # 'argmax' (EOT) | 'first' | 'last'
    pad_id: int = 0
    no_causal_mask: bool = False
    embed_cls: bool = False         # append a class token (CoCa text tower)
    ls_init_value: float = None     # LayerScale init (None = disabled)
    ln_eps: float = 1e-5            # reference norm_kwargs.eps; SigLIP 1e-6
    # non-CLIP vocab on the NATIVE tower (CLIPA: bert-base-uncased wordpiece,
    # reference factory.get_tokenizer + tokenizer.py HFTokenizer)
    hf_tokenizer_name: str = ""
    strip_sep_token: bool = False   # tokenizer_kwargs.strip_sep_token


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    name: str
    embed_dim: int
    vision: VisionConfig
    text: TextConfig
    quick_gelu: bool = False
    gelu_tanh: bool = False         # tanh-approx gelu (big_vision/SigLIP towers)
    init_logit_scale: float = 2.6592600369  # ln(1/0.07), reference model.py:364
    init_logit_bias: float = None   # SigLIP bias term (reference model.py:392-393)
    # per-model preprocessing (reference PreprocessCfg / pretrained tag
    # metadata): None -> OpenAI CLIP statistics; SigLIP uses (0.5,)*3 + squash
    image_mean: tuple = None
    image_std: tuple = None
    resize_mode: str = "shortest"   # 'shortest' | 'squash' | 'longest'
    # TPU precision policy: params + LayerNorm stats in f32, matmul inputs in
    # bf16 (replaces the reference's AMP fp16 + LayerNormFp32 arrangement,
    # reference src/open_clip/transformer.py:15-21).
    compute_dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class CoCaConfig:
    """CoCa: contrastive towers + a multimodal caption decoder (reference
    ``coca_model.py:79-185``). ``multimodal`` reuses TextConfig fields for
    the decoder (width/heads/layers/context_length)."""

    name: str
    embed_dim: int
    vision: VisionConfig
    text: TextConfig
    multimodal: TextConfig
    quick_gelu: bool = False
    init_logit_scale: float = 2.6592600369
    compute_dtype: str = "bfloat16"
    pad_id: int = 0
    # preprocessing metadata, same semantics as CLIPConfig (None = OpenAI
    # mean/std defaults; eval geometry mode)
    image_mean: tuple = None
    image_std: tuple = None
    resize_mode: str = "shortest"


def _filter_fields(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


# timm Eva trunks that are standard pre-norm ViTs (no rope/swiglu/sub-LN),
# expressible on the native tower. EVA02 trunks (rope + SwiGLU + sub-LN)
# live in EVA02_TRUNKS below with their own tower (models/eva02.py).
EVA_TRUNKS: Dict[str, Dict[str, Any]] = {
    "eva_giant_patch14_224": dict(
        width=1408, layers=40, head_width=88, mlp_ratio=6144 / 1408,
        patch_size=14,
    ),
}

# timm plain-ViT trunks expressible on the native tower (timm
# vision_transformer.py published shapes). vit_medium_gap: no class token,
# global average pool, fc_norm (LN after pooling), no pre-LN; reached via
# TimmModel with pool='' + proj='linear' (reference timm_model.py:57-108 —
# trunk classifier reset, separate unbiased head Linear to embed_dim).
TIMM_VIT_TRUNKS: Dict[str, Dict[str, Any]] = {
    "vit_medium_patch16_gap_256": dict(
        width=512, layers=12, head_width=64, mlp_ratio=4.0, patch_size=16,
        no_cls_token=True, pool_type="avg", final_ln_after_pool=True,
        no_ln_pre=True, ln_eps=1e-6,
    ),
}


def config_from_dict(name: str, raw: Dict[str, Any]) -> CLIPConfig:
    quick_gelu = bool(raw.get("quick_gelu", False)) or name.endswith("-quickgelu")
    vision_raw = dict(raw.get("vision_cfg", {}))
    text_raw = dict(raw.get("text_cfg", {}))
    # reference JSON spelling: text_cfg.norm_kwargs.eps (e.g. SigLIP 1e-6)
    for sub in (vision_raw, text_raw):
        nk = sub.get("norm_kwargs")
        if isinstance(nk, dict) and "eps" in nk and "ln_eps" not in sub:
            sub["ln_eps"] = float(nk["eps"])
    timm_name = vision_raw.get("timm_model_name")
    if timm_name in EVA_TRUNKS:
        # EVA01 giant is architecturally a standard pre-norm ViT (timm
        # eva.py with qkv_fused, no rope/swiglu) — expressed on the native
        # tower; timm_pool 'token' == 'tok', timm_proj null == the trunk's
        # own classifier head (a biased Linear to embed_dim)
        vision = VisionConfig(
            image_size=int(vision_raw.get("image_size", 224)),
            no_ln_pre=True, pool_type="tok", timm_trunk=timm_name,
            ln_eps=1e-6,  # timm Eva norm_layer eps
            **EVA_TRUNKS[timm_name],
        )
    elif timm_name in EVA02_TRUNKS:
        vision = Eva02VisionConfig(
            trunk=timm_name,
            image_size=int(vision_raw.get("image_size", 224)),
            **EVA02_TRUNKS[timm_name],
        )
    elif timm_name is not None and timm_name.startswith("vit_relpos"):
        from latteclip_tpu.models.vit_relpos import RELPOS_TRUNKS

        if timm_name not in RELPOS_TRUNKS:
            raise ValueError(f"unknown vit_relpos trunk '{timm_name}'")
        vision = RelPosVisionConfig(
            trunk=timm_name, image_size=int(vision_raw.get("image_size", 224)))
    elif timm_name is not None and timm_name.startswith("swin"):
        from latteclip_tpu.models.swin import SWIN_TRUNKS

        if timm_name not in SWIN_TRUNKS:
            raise ValueError(f"unknown swin trunk '{timm_name}'")
        vision = SwinVisionConfig(
            trunk=timm_name, image_size=int(vision_raw.get("image_size", 224)))
    elif timm_name in TIMM_VIT_TRUNKS:
        vision = VisionConfig(
            image_size=int(vision_raw.get("image_size", 224)),
            timm_trunk=timm_name,
            **TIMM_VIT_TRUNKS[timm_name],
        )
    elif timm_name is not None:
        from latteclip_tpu.models.convnext import CONVNEXT_TRUNKS

        if timm_name not in CONVNEXT_TRUNKS:
            raise ValueError(
                f"timm vision trunk '{timm_name}' has no native implementation "
                "(convnext_* trunks are implemented in models/convnext.py; "
                "others are gated — see GATED_CONFIGS)"
            )
        vision = ConvNeXtVisionConfig(
            trunk=timm_name,
            image_size=int(vision_raw.get("image_size", 224)),
            # reference CLIPVisionCfg.timm_proj defaults to 'linear'
            # (model.py); JSON 'none'/null → pass-through
            proj=str(vision_raw.get("timm_proj", "linear") or "none"),
            drop_path=float(vision_raw.get("timm_drop_path") or 0.0),
        )
    elif isinstance(vision_raw.get("layers"), (list, tuple)):
        # a per-stage layer list selects the ModifiedResNet tower
        # (reference model.py:251-259)
        fields = _filter_fields(ResNetVisionConfig, vision_raw)
        fields["layers"] = tuple(fields["layers"])
        vision = ResNetVisionConfig(**fields)
    else:
        vision = VisionConfig(**_filter_fields(VisionConfig, vision_raw))
    if "hf_model_name" in text_raw:
        # HF-architecture text tower (reference model.py:141-150 ->
        # hf_model.py); native JAX implementation in models/hf_text.py
        from latteclip_tpu.models.hf_text import hf_text_config

        text = hf_text_config(text_raw)
    else:
        # flatten tokenizer_kwargs (CLIPA: {"strip_sep_token": true})
        tk = text_raw.get("tokenizer_kwargs")
        if isinstance(tk, dict) and tk.get("strip_sep_token") and \
                "strip_sep_token" not in text_raw:
            text_raw["strip_sep_token"] = True
        text = TextConfig(**_filter_fields(TextConfig, text_raw))
    if "multimodal_cfg" in raw:
        return CoCaConfig(
            name=name,
            embed_dim=int(raw["embed_dim"]),
            vision=vision,
            text=text,
            multimodal=TextConfig(**_filter_fields(TextConfig, raw["multimodal_cfg"])),
            quick_gelu=quick_gelu,
        )
    kwargs = {}
    if raw.get("init_logit_bias") is not None:
        kwargs["init_logit_bias"] = float(raw["init_logit_bias"])
    if raw.get("init_logit_scale") is not None:
        kwargs["init_logit_scale"] = float(raw["init_logit_scale"])
    if raw.get("gelu_tanh"):
        kwargs["gelu_tanh"] = True
    if raw.get("compute_dtype"):
        kwargs["compute_dtype"] = str(raw["compute_dtype"])
    if raw.get("image_mean") is not None:
        kwargs["image_mean"] = tuple(raw["image_mean"])
    if raw.get("image_std") is not None:
        kwargs["image_std"] = tuple(raw["image_std"])
    if raw.get("resize_mode"):
        kwargs["resize_mode"] = str(raw["resize_mode"])
    return CLIPConfig(
        name=name,
        embed_dim=int(raw["embed_dim"]),
        vision=vision,
        text=text,
        quick_gelu=quick_gelu,
        **kwargs,
    )


# Reference model configs (src/open_clip/model_configs/) that are
# deliberately NOT shipped, with the gating reason. The completeness test
# (tests/test_config_registry.py) enforces that every reference config
# either resolves here or appears in this list — nothing goes missing
# silently. Re-check the gates each round (e.g. if timm lands in the image).
GATED_CONFIGS: Dict[str, str] = {
    # (empty since round 4: vit_relpos_medium_patch16_cls_224 — the last
    # gated config — is now implemented natively in models/vit_relpos.py.
    # SNIPPETS retrieval for timm's vision_transformer_relpos.py returned
    # nothing, so two registry values are transcribed-from-knowledge
    # assumptions; the checkpoint importer is shape-driven and
    # self-correcting — see the module docstring and PRODUCTION.md.)
}


def list_models() -> Tuple[str, ...]:
    return tuple(sorted(p.stem for p in _CONFIG_DIR.glob("*.json")))


def get_model_config(name: str) -> CLIPConfig:
    path = _CONFIG_DIR / f"{name}.json"
    if not path.exists():
        raise ValueError(f"unknown model config '{name}'; available: {list_models()}")
    with open(path) as f:
        raw = json.load(f)
    return config_from_dict(name, raw)


def config_from_file(path: str) -> CLIPConfig:
    with open(path) as f:
        raw = json.load(f)
    return config_from_dict(os.path.splitext(os.path.basename(path))[0], raw)
