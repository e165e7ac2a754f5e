"""CLIP model: param init + pure encode functions + a convenience wrapper.

API parity targets the reference ``CLIP`` class
(``src/open_clip/model.py:355-468``): ``encode_image`` / ``encode_text``
(with ``normalize``), ``logit_scale`` initialised to ``ln(1/0.07)``
(reference ``model.py:364,392``), and a forward returning normalized
features + exp(logit_scale). Everything is a pure function of a param
pytree, ready for jit/pjit; the ``CLIPModel`` wrapper just binds config and
params for ergonomic host-side use (eval loops, feature extraction).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import (
    CLIPConfig,
    ConvNeXtVisionConfig,
    Eva02VisionConfig,
    RelPosVisionConfig,
    ResNetVisionConfig,
    SwinVisionConfig,
    get_model_config,
)
from latteclip_tpu.models import text as text_mod
from latteclip_tpu.models import vit as vit_mod
from latteclip_tpu.models.layers import Params, l2_normalize
from latteclip_tpu.core.mesh import tpu_jit


def init_clip_params(rng: jax.Array, cfg: CLIPConfig) -> Params:
    kv, kt = jax.random.split(rng)
    if isinstance(cfg.vision, ResNetVisionConfig):
        from latteclip_tpu.models import resnet as resnet_mod

        visual = resnet_mod.init_resnet_params(kv, cfg.vision, cfg.embed_dim)
    elif isinstance(cfg.vision, ConvNeXtVisionConfig):
        from latteclip_tpu.models import convnext as convnext_mod

        visual = convnext_mod.init_convnext_params(kv, cfg.vision, cfg.embed_dim)
    elif isinstance(cfg.vision, Eva02VisionConfig):
        from latteclip_tpu.models import eva02 as eva02_mod

        visual = eva02_mod.init_eva02_params(kv, cfg.vision, cfg.embed_dim)
    elif isinstance(cfg.vision, SwinVisionConfig):
        from latteclip_tpu.models import swin as swin_mod

        visual = swin_mod.init_swin_params(kv, cfg.vision, cfg.embed_dim)
    elif isinstance(cfg.vision, RelPosVisionConfig):
        from latteclip_tpu.models import vit_relpos as relpos_mod

        visual = relpos_mod.init_relpos_params(kv, cfg.vision, cfg.embed_dim)
    else:
        visual = vit_mod.init_vit_params(kv, cfg.vision, cfg.embed_dim)
    from latteclip_tpu.models.hf_text import HFTextConfig, init_hf_text_params

    if isinstance(cfg.text, HFTextConfig):
        text_params = init_hf_text_params(kt, cfg.text, cfg.embed_dim)
    else:
        text_params = text_mod.init_text_params(kt, cfg.text, cfg.embed_dim)
    params = {
        "visual": visual,
        "text": text_params,
        "logit_scale": jnp.asarray(cfg.init_logit_scale, dtype=jnp.float32),
    }
    if cfg.init_logit_bias is not None:  # SigLIP (reference model.py:392-393)
        params["logit_bias"] = jnp.asarray(cfg.init_logit_bias, dtype=jnp.float32)
    return params


def _dtype(cfg: CLIPConfig) -> jnp.dtype:
    return jnp.dtype(cfg.compute_dtype)


def encode_image(
    params: Params,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    *,
    normalize: bool = False,
    remat: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    if isinstance(cfg.vision, ResNetVisionConfig):
        from latteclip_tpu.models import resnet as resnet_mod

        feats = resnet_mod.resnet_forward(
            params["visual"], cfg.vision, images, dtype=_dtype(cfg)
        )
    elif isinstance(cfg.vision, ConvNeXtVisionConfig):
        from latteclip_tpu.models import convnext as convnext_mod

        feats = convnext_mod.convnext_forward(
            params["visual"], cfg.vision, images,
            dtype=_dtype(cfg), remat=remat, train=train, rng=rng,
        )
    elif isinstance(cfg.vision, Eva02VisionConfig):
        from latteclip_tpu.models import eva02 as eva02_mod

        feats = eva02_mod.eva02_forward(
            params["visual"], cfg.vision, images,
            dtype=_dtype(cfg), remat=remat, train=train, rng=rng,
        )
    elif isinstance(cfg.vision, SwinVisionConfig):
        from latteclip_tpu.models import swin as swin_mod

        feats = swin_mod.swin_forward(
            params["visual"], cfg.vision, images,
            dtype=_dtype(cfg), remat=remat, train=train, rng=rng,
        )
    elif isinstance(cfg.vision, RelPosVisionConfig):
        from latteclip_tpu.models import vit_relpos as relpos_mod

        feats = relpos_mod.relpos_forward(
            params["visual"], cfg.vision, images,
            dtype=_dtype(cfg), remat=remat, train=train, rng=rng,
        )
    else:
        feats = vit_mod.vit_forward(
            params["visual"], cfg.vision, images,
            dtype=_dtype(cfg), quick_gelu=cfg.quick_gelu, remat=remat,
            train=train, rng=rng, gelu_tanh=getattr(cfg, "gelu_tanh", False),
        )
    return l2_normalize(feats) if normalize else feats


def encode_text(
    params: Params,
    cfg: CLIPConfig,
    tokens: jnp.ndarray,
    *,
    normalize: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    from latteclip_tpu.core.config import CoCaConfig
    from latteclip_tpu.models.hf_text import HFTextConfig, hf_text_forward

    if isinstance(cfg, CoCaConfig):
        # CoCa text tower: appended cls token + cls-aware mask + cls pooling
        # (reference coca_model.py:139-145) — NOT argmax pooling; route
        # through the CoCa tower so eval/bank/classifier builds are correct
        from latteclip_tpu.models import coca as coca_mod

        feats, _ = coca_mod.encode_text_tokens(params, cfg, tokens, dtype=_dtype(cfg))
    elif isinstance(cfg.text, HFTextConfig):
        feats = hf_text_forward(
            params["text"], cfg.text, tokens,
            embed_dim=cfg.embed_dim, dtype=_dtype(cfg), remat=remat,
        )
    else:
        feats = text_mod.text_forward(
            params["text"], cfg.text, tokens,
            dtype=_dtype(cfg), quick_gelu=cfg.quick_gelu, remat=remat,
            gelu_tanh=getattr(cfg, "gelu_tanh", False),
        )
    return l2_normalize(feats) if normalize else feats


def encode_text_packed(
    params: Params,
    cfg: CLIPConfig,
    tokens: jnp.ndarray,
    positions: jnp.ndarray,
    seg_ids: jnp.ndarray,
    eot_row: jnp.ndarray,
    eot_col: jnp.ndarray,
    *,
    normalize: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    """Variable-length PACKED text encode (data/packing.py layout).

    Numerically equivalent to :func:`encode_text` on the padded rows the
    reference always computes (pad-to-77, src/open_clip/tokenizer.py:250-258)
    while running the tower on ~sum(len) tokens — native argmax-pool CLIP
    text towers only (the packer pins EOT coordinates; HF towers pool
    differently and are not packable here).
    """
    from latteclip_tpu.models.hf_text import HFTextConfig

    if isinstance(cfg.text, HFTextConfig):
        raise NotImplementedError("packed text encode supports the native CLIP text tower only")
    feats = text_mod.text_forward_packed(
        params["text"], cfg.text, tokens, positions, seg_ids, eot_row, eot_col,
        dtype=_dtype(cfg), quick_gelu=cfg.quick_gelu, remat=remat,
        gelu_tanh=getattr(cfg, "gelu_tanh", False),
    )
    return l2_normalize(feats) if normalize else feats


def clip_forward(
    params: Params,
    cfg: CLIPConfig,
    images: Optional[jnp.ndarray] = None,
    tokens: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    out: Dict[str, jnp.ndarray] = {"logit_scale": jnp.exp(params["logit_scale"])}
    if images is not None:
        out["image_features"] = encode_image(params, cfg, images, normalize=True)
    if tokens is not None:
        out["text_features"] = encode_text(params, cfg, tokens, normalize=True)
    return out


@dataclasses.dataclass
class CLIPModel:
    """Config + params bundle with jitted encode methods (host-side helper)."""

    cfg: CLIPConfig
    params: Params

    def __post_init__(self):
        cfg = self.cfg
        self._encode_image = tpu_jit(
            lambda p, x, normalize: encode_image(p, cfg, x, normalize=normalize),
            static_argnames="normalize",
        )
        self._encode_text = tpu_jit(
            lambda p, t, normalize: encode_text(p, cfg, t, normalize=normalize),
            static_argnames="normalize",
        )

    @classmethod
    def from_config(cls, name_or_cfg, rng: Optional[jax.Array] = None) -> "CLIPModel":
        cfg = get_model_config(name_or_cfg) if isinstance(name_or_cfg, str) else name_or_cfg
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return cls(cfg=cfg, params=init_clip_params(rng, cfg))

    def encode_image(self, images, normalize: bool = False):
        return self._encode_image(self.params, jnp.asarray(images), normalize)

    def encode_text(self, tokens, normalize: bool = False):
        return self._encode_text(self.params, jnp.asarray(tokens), normalize)

    @property
    def logit_scale(self) -> jnp.ndarray:
        return self.params["logit_scale"]
