"""Pretrained registry + cache-first resolver (core/pretrained.py) —
counterpart of reference pretrained.py tables + download_pretrained."""
import os

import pytest

from latteclip_tpu.core.pretrained import (
    HF_WEIGHTS_NAME,
    PRETRAINED,
    get_pretrained_cfg,
    list_pretrained,
    list_pretrained_tags_by_model,
    resolve_pretrained,
)


def test_registry_covers_shipped_configs():
    from latteclip_tpu.core.config import list_models

    # every registry model must have a shipped config, and the flagship
    # configs must have at least one tag
    for model in PRETRAINED:
        assert model in list_models(), model
    for must in ("ViT-B-32", "ViT-B-16", "RN50", "ViT-L-14"):
        assert list_pretrained_tags_by_model(must)


def test_reference_run_tag_present():
    # the tag every reference run script uses (dtd_fine_tune_multiclass.sh:33)
    cfg = get_pretrained_cfg("ViT-B-32", "laion2b_s34b_b79k")
    assert cfg and cfg["hf_hub"].startswith("laion/")
    assert ("ViT-B-32", "openai") in list_pretrained()
    # openai tags imply QuickGELU (reference model naming convention)
    assert get_pretrained_cfg("ViT-B-16", "openai").get("quick_gelu")


def test_resolver_cache_hit_and_miss(tmp_path, monkeypatch):
    monkeypatch.setenv("LATTECLIP_CACHE_DIR", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="openaipublic"):
        resolve_pretrained("ViT-B-32", "openai")
    with pytest.raises(ValueError, match="unknown pretrained tag"):
        resolve_pretrained("ViT-B-32", "nope")

    (tmp_path / "ViT-B-32.pt").write_bytes(b"x")
    assert resolve_pretrained("ViT-B-32", "openai") == str(tmp_path / "ViT-B-32.pt")

    repo_name = "laion_CLIP-ViT-B-32-laion2B-s34B-b79K_" + HF_WEIGHTS_NAME
    (tmp_path / repo_name).write_bytes(b"x")
    assert resolve_pretrained("ViT-B-32", "laion2b_s34b_b79k").endswith(repo_name)


def test_quickgelu_alias_and_siglip_npz_tag():
    # -quickgelu variants resolve to the base model's weights
    cfg = get_pretrained_cfg("ViT-B-32-quickgelu", "openai")
    assert cfg and cfg["url"].endswith("ViT-B-32.pt")
    # SigLIP tags point at official big_vision .npz files (the layout our
    # importer reads), not the timm-layout hf-hub re-upload
    sig = get_pretrained_cfg("ViT-B-16-SigLIP", "webli")
    assert sig["url"].endswith(".npz") and "big_vision" in sig["url"]
    assert sig["mean"] == (0.5, 0.5, 0.5) and sig["resize_mode"] == "squash"


def test_no_bare_name_cache_collisions(tmp_path, monkeypatch):
    monkeypatch.setenv("LATTECLIP_CACHE_DIR", str(tmp_path))
    # a bare open_clip weights file must NOT satisfy an hf-hub tag
    (tmp_path / HF_WEIGHTS_NAME).write_bytes(b"x")
    with pytest.raises(FileNotFoundError):
        resolve_pretrained("ViT-B-32", "laion2b_s34b_b79k")
