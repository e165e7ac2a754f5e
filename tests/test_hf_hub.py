"""HF-hub export (``core/hf_hub.py`` vs reference ``push_to_hf_hub.py``).

Validates the three artifact classes independently of any network:

* the safetensors file round-trips through the REAL ``safetensors`` package
  and ``torch.load`` reads the pickle weights — both match the source
  params bit-for-bit;
* the exported tokenizer files load with ``transformers.CLIPTokenizer`` and
  reproduce the native tokenizer's ids on text that exercises BPE merges,
  truncation, and specials;
* ``open_clip_config.json`` carries the registry JSON + preprocess stats,
  and the README generator matches the reference's section layout.
"""
import json
import os

import numpy as np
import pytest

import jax

from latteclip_tpu.core.config import get_model_config
from latteclip_tpu.core.hf_hub import (
    HF_CONFIG_NAME,
    HF_SAFE_WEIGHTS_NAME,
    HF_WEIGHTS_NAME,
    generate_readme,
    push_to_hf_hub,
    raw_model_config,
    save_for_hf,
    save_safetensors,
)
from latteclip_tpu.models.clip import init_clip_params
from latteclip_tpu.models.tokenizer import get_tokenizer

CFG = get_model_config("ViT-B-32")


def _tiny_cfg():
    from latteclip_tpu.core.config import config_from_dict

    return config_from_dict(
        "tiny-hub",
        {
            "embed_dim": 16,
            "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
            "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64,
                         "heads": 4, "layers": 2},
        },
    )


def test_safetensors_roundtrip(tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    tensors = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b/c": np.ones((2, 2), dtype=np.int64),
        "scale": np.asarray(1.5, dtype=np.float32).reshape(()),
        "half": np.arange(4, dtype=np.float16),
    }
    save_safetensors(tensors, tmp_path / "t.safetensors")
    back = st.load_file(str(tmp_path / "t.safetensors"))
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k])


def test_save_for_hf_artifacts(tmp_path):
    cfg = _tiny_cfg()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    save_for_hf(
        params, cfg, tok, model_config=raw_model_config("ViT-B-32"),
        save_directory=tmp_path, safe_serialization="both",
        image_interpolation="bicubic", image_resize_mode="shortest",
    )
    names = set(os.listdir(tmp_path))
    assert {HF_WEIGHTS_NAME, HF_SAFE_WEIGHTS_NAME, HF_CONFIG_NAME,
            "vocab.json", "merges.txt", "special_tokens_map.json",
            "tokenizer_config.json"} <= names

    with open(tmp_path / HF_CONFIG_NAME) as f:
        hf_cfg = json.load(f)
    assert hf_cfg["model_cfg"]["embed_dim"] == 512  # the registry JSON verbatim
    assert hf_cfg["preprocess_cfg"]["interpolation"] == "bicubic"
    assert hf_cfg["preprocess_cfg"]["resize_mode"] == "shortest"
    np.testing.assert_allclose(hf_cfg["preprocess_cfg"]["mean"],
                               (0.48145466, 0.4578275, 0.40821073))

    # pickle weights load with torch AND match safetensors content
    torch = pytest.importorskip("torch")
    st = pytest.importorskip("safetensors.numpy")
    sd_pt = torch.load(tmp_path / HF_WEIGHTS_NAME, map_location="cpu",
                       weights_only=True)
    sd_safe = st.load_file(str(tmp_path / HF_SAFE_WEIGHTS_NAME))
    assert set(sd_pt) == set(sd_safe)
    for k in sd_pt:
        np.testing.assert_array_equal(sd_pt[k].numpy(), sd_safe[k])
    assert "visual.conv1.weight" in sd_pt and "text_projection" in sd_pt

    # and the folder loads back through our own checkpoint reader
    from latteclip_tpu.core.checkpoint import load_clip_pt

    params2, _bank, _meta = load_clip_pt(str(tmp_path / HF_WEIGHTS_NAME), cfg)
    np.testing.assert_array_equal(
        np.asarray(params2["logit_scale"]), np.asarray(params["logit_scale"]))


def test_tokenizer_export_matches_transformers(tmp_path):
    transformers = pytest.importorskip("transformers")
    tok = get_tokenizer()
    save_for_hf(
        init_clip_params(jax.random.PRNGKey(1), _tiny_cfg()), _tiny_cfg(), tok,
        model_config=None, save_directory=tmp_path, skip_weights=True,
    )
    hf_tok = transformers.CLIPTokenizer(
        vocab_file=str(tmp_path / "vocab.json"),
        merges_file=str(tmp_path / "merges.txt"),
    )
    texts = [
        "a photo of a banded texture.",
        "The QUICK brown fox; jumps over 12 lazy dogs!!",
        "stripes " * 60,  # forces truncation at 77
        "",
    ]
    ours = np.asarray(tok(texts))
    for i, t in enumerate(texts):
        hf_ids = hf_tok(
            t, padding="max_length", truncation=True, max_length=77,
            return_tensors="np",
        )["input_ids"][0]
        # HF pads with eot (pad_token == <|endoftext|>); ours pads with 0 —
        # compare up to and including the first eot
        end = int(np.argmax(ours[i] == tok.eot_token_id)) + 1
        np.testing.assert_array_equal(ours[i][:end], hf_ids[:end],
                                      err_msg=f"text {i!r}")
        assert (ours[i][end:] == 0).all()


def test_generate_readme_sections():
    card = {
        "tags": ("clip", "latteclip"),
        "license": "apache-2.0",
        "description": "A fine-tuned CLIP.",
        "details": {"Dataset": "DTD", "Params": [1, 2], "Cfg": {"lr": 1e-5}},
        "usage": "import latteclip_tpu",
        "citation": "@inproceedings{latteclip}",
    }
    text = generate_readme(card, "my-model")
    assert text.startswith("---\ntags:\n- clip\n- latteclip\n")
    assert "library_name: open_clip\n" in text
    assert "pipeline_tag: zero-shot-image-classification\n" in text
    assert "license: apache-2.0\n" in text
    assert "datasets:\n- dtd\n" in text
    assert "# Model card for my-model" in text
    assert "## Model Details" in text and "- **Dataset:** DTD" in text
    assert "  - 1\n  - 2\n" in text and "  - lr: 1e-05" in text
    assert "## Model Usage" in text and "## Citation" in text
    assert "```bibtex\n@inproceedings{latteclip}\n```" in text
    # input dict is not mutated (the reference pops from it; we copy)
    assert "tags" in card


def test_push_builds_folder_and_fails_only_at_network(tmp_path, monkeypatch):
    cfg = _tiny_cfg()
    params = init_clip_params(jax.random.PRNGKey(2), cfg)
    tok = get_tokenizer()
    calls = {}

    import latteclip_tpu.core.hf_hub as hub

    def fake_create_repo(repo_id, **kw):
        calls["create_repo"] = repo_id

    def fake_upload_folder(*, repo_id, folder_path, **kw):
        calls["upload"] = sorted(os.listdir(folder_path))
        return f"https://huggingface.co/{repo_id}"

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "create_repo", fake_create_repo)
    monkeypatch.setattr(huggingface_hub, "upload_folder", fake_upload_folder)
    out = push_to_hf_hub(
        params, cfg, tok, model_config=None, repo_id="org/tiny",
        local_dir=str(tmp_path / "built"), safe_serialization=False,
        model_card={"description": "test"},
    )
    assert out == "https://huggingface.co/org/tiny"
    assert calls["create_repo"] == "org/tiny"
    assert "README.md" in calls["upload"] and HF_WEIGHTS_NAME in calls["upload"]
    # local_dir keeps the built folder
    assert (tmp_path / "built" / "README.md").exists()
