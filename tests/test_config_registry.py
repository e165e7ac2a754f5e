"""Registry completeness vs the reference's model_configs directory.

Every reference config (src/open_clip/model_configs/*.json) must either
resolve in our registry or appear in core.config.GATED_CONFIGS with an
explicit reason — absences are a recorded decision, never an accident.
"""
import os

import pytest

from latteclip_tpu.core.config import (
    GATED_CONFIGS,
    get_model_config,
    list_models,
)

REF_CONFIG_DIR = "/root/reference/src/open_clip/model_configs"


@pytest.mark.skipif(
    not os.path.isdir(REF_CONFIG_DIR), reason="reference checkout not present"
)
def test_every_reference_config_resolves_or_is_gated():
    shipped = set(list_models())
    ref = {os.path.splitext(f)[0] for f in os.listdir(REF_CONFIG_DIR) if f.endswith(".json")}
    missing = sorted(ref - shipped - set(GATED_CONFIGS))
    assert not missing, f"reference configs neither shipped nor gated: {missing}"
    # gated entries must not ALSO ship (stale gate) and must exist upstream
    stale = sorted(set(GATED_CONFIGS) & shipped)
    assert not stale, f"gated configs that are actually shipped: {stale}"
    unknown = sorted(set(GATED_CONFIGS) - ref)
    assert not unknown, f"gated configs that do not exist upstream: {unknown}"


def test_all_shipped_configs_parse():
    for name in list_models():
        cfg = get_model_config(name)
        assert cfg.embed_dim > 0, name


def test_clipa_configs_resolve_natively():
    """CLIPA was mis-gated as timm in round 2 — its towers are native
    (no_ln_pre + avg pool + final_ln_after_pool vision; 'last'-pool
    non-causal text with a bert vocab)."""
    for name, (ew, vw, tl) in {
        "ViT-L-14-CLIPA": (768, 1024, 12),
        "ViT-H-14-CLIPA-336": (1024, 1280, 24),
        "ViT-bigG-14-CLIPA": (1280, 1664, 32),
    }.items():
        cfg = get_model_config(name)
        assert cfg.embed_dim == ew and cfg.vision.width == vw, name
        assert cfg.text.layers == tl, name
        assert cfg.vision.no_ln_pre and cfg.vision.pool_type == "avg"
        assert cfg.vision.final_ln_after_pool
        assert cfg.text.pool_type == "last" and cfg.text.no_causal_mask
        assert cfg.text.vocab_size == 32000
        assert cfg.text.hf_tokenizer_name == "bert-base-uncased"
        assert cfg.text.strip_sep_token
    assert get_model_config("ViT-bigG-14-CLIPA").vision.heads == 16  # hw 104


def test_new_round3_configs_resolve():
    so = get_model_config("ViT-SO400M-14-SigLIP-384")
    assert so.vision.image_size == 384 and so.text.context_length == 64
    assert so.embed_dim == 1152 and so.init_logit_bias == -10.0
    xr = get_model_config("xlm-roberta-large-ViT-H-14")
    assert xr.embed_dim == 1024 and xr.vision.width == 1280
    assert xr.vision.heads == 16  # head_width 80
