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


def test_new_round3_configs_resolve():
    so = get_model_config("ViT-SO400M-14-SigLIP-384")
    assert so.vision.image_size == 384 and so.text.context_length == 64
    assert so.embed_dim == 1152 and so.init_logit_bias == -10.0
    xr = get_model_config("xlm-roberta-large-ViT-H-14")
    assert xr.embed_dim == 1024 and xr.vision.width == 1280
    assert xr.vision.heads == 16  # head_width 80
