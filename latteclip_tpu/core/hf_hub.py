"""Hugging Face Hub export: save/push OpenCLIP-compatible model folders.

TPU-native counterpart of the reference ``src/open_clip/push_to_hf_hub.py``
(:40-209 ``save_for_hf``/``push_to_hf_hub``, :219-316 CLI + README
generator). The artifact layout is identical — a folder any OpenCLIP (or
this repo) can load as ``hf-hub:<repo>``:

* ``open_clip_pytorch_model.bin`` — torch zip-pickle state dict, written by
  the torch-free writer (``core/pt_io.py::save_pt``);
* ``open_clip_model.safetensors`` — same tensors in safetensors format;
* ``open_clip_config.json`` — ``{"model_cfg": <registry JSON>,
  "preprocess_cfg": {mean, std[, interpolation, resize_mode]}}``
  (reference ``save_config_for_hf``, push_to_hf_hub.py:40-60);
* HF ``CLIPTokenizer``-format tokenizer files (``vocab.json`` +
  ``merges.txt`` + special-token maps). The reference swaps non-HF
  tokenizers for a downloaded ``openai/clip-vit-large-patch14`` copy
  (push_to_hf_hub.py:104-107); this environment has no egress, so the
  native BPE tokenizer EXPORTS itself in the same format instead — the
  saved files load with ``transformers.CLIPTokenizer`` and produce the
  same token ids (tested);
* ``README.md`` model card (reference ``generate_readme``,
  push_to_hf_hub.py:219-259 — same section order and markdown shapes).

The actual network upload (``create_repo`` + ``upload_folder``) uses
``huggingface_hub`` when importable and reachable; everything up to the
upload is local and fully exercised by tests in this zero-egress
environment.
"""
from __future__ import annotations

import json
import os
import struct
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

HF_WEIGHTS_NAME = "open_clip_pytorch_model.bin"
HF_SAFE_WEIGHTS_NAME = "open_clip_model.safetensors"
HF_CONFIG_NAME = "open_clip_config.json"

# our special-token spellings -> the HF CLIPTokenizer ones (same ids)
_HF_SPECIALS = {
    "<start_of_text>": "<|startoftext|>",
    "<end_of_text>": "<|endoftext|>",
}


# ---------------------------------------------------------------------------
# safetensors (format spec: 8-byte LE header length + JSON header + data)
# ---------------------------------------------------------------------------

_SAFE_DTYPES = {
    np.dtype("float32"): "F32",
    np.dtype("float16"): "F16",
    np.dtype("float64"): "F64",
    np.dtype("int64"): "I64",
    np.dtype("int32"): "I32",
    np.dtype("int16"): "I16",
    np.dtype("int8"): "I8",
    np.dtype("uint8"): "U8",
    np.dtype("bool"): "BOOL",
}


def save_safetensors(tensors: Dict[str, np.ndarray], path: Union[str, Path]) -> None:
    """Minimal safetensors writer (huggingface/safetensors format v0.4).

    Dependency-free so export works even where the ``safetensors`` package
    is absent; when it IS installed the tests round-trip through it."""
    header: Dict[str, Any] = {}
    blobs = []
    offset = 0
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        if arr.dtype.name == "bfloat16":  # ml_dtypes
            dt = "BF16"
        else:
            dt = _SAFE_DTYPES.get(arr.dtype)
        if dt is None:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
        data = arr.tobytes()
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(data)],
        }
        blobs.append(data)
        offset += len(data)
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    pad = (8 - len(hjson) % 8) % 8  # spec: headers are 8-byte aligned
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)


# ---------------------------------------------------------------------------
# tokenizer export (HF CLIPTokenizer file format)
# ---------------------------------------------------------------------------

def save_tokenizer_for_hf(tokenizer, save_directory: Union[str, Path]) -> None:
    """Write the native BPE tokenizer as HF ``CLIPTokenizer`` files.

    ``vocab.json`` maps token string -> id with the HF special-token
    spellings (``<|startoftext|>``/``<|endoftext|>``) substituted at the
    same ids; ``merges.txt`` lists the BPE merges in rank order. Loading
    these with ``transformers.CLIPTokenizer`` reproduces the native
    tokenizer's ids exactly (tests/test_hf_hub.py)."""
    save_directory = Path(save_directory)
    save_directory.mkdir(parents=True, exist_ok=True)

    vocab = {
        _HF_SPECIALS.get(tok, tok): idx
        for tok, idx in tokenizer.encoder.items()
    }
    with open(save_directory / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)

    merges = sorted(tokenizer.merge_rank.items(), key=lambda kv: kv[1])
    with open(save_directory / "merges.txt", "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for (a, b), _rank in merges:
            f.write(f"{a} {b}\n")

    specials = {
        "bos_token": "<|startoftext|>",
        "eos_token": "<|endoftext|>",
        "unk_token": "<|endoftext|>",
        "pad_token": "<|endoftext|>",
    }
    with open(save_directory / "special_tokens_map.json", "w") as f:
        json.dump(specials, f, indent=2)
    with open(save_directory / "tokenizer_config.json", "w") as f:
        json.dump(
            {
                "tokenizer_class": "CLIPTokenizer",
                "model_max_length": tokenizer.context_length or 77,
                **specials,
            },
            f,
            indent=2,
        )


# ---------------------------------------------------------------------------
# config + weights
# ---------------------------------------------------------------------------

def raw_model_config(model_name: str) -> Dict[str, Any]:
    """The registry JSON for ``model_name`` verbatim (reference
    ``factory.get_model_config`` returns the same deep-copied dict)."""
    from latteclip_tpu.core.config import _CONFIG_DIR

    path = _CONFIG_DIR / f"{model_name}.json"
    if not path.exists():
        raise FileNotFoundError(f"unknown model config: {model_name}")
    with open(path) as f:
        return json.load(f)


def save_config_for_hf(
    cfg,
    config_path: Union[str, Path],
    model_config: Optional[dict],
    image_interpolation: Optional[str] = None,
    image_resize_mode: Optional[str] = None,
) -> None:
    from latteclip_tpu.data import transforms as T

    mean, std = T.model_mean_std(cfg)
    preprocess_cfg: Dict[str, Any] = {"mean": list(mean), "std": list(std)}
    if image_interpolation:
        preprocess_cfg["interpolation"] = image_interpolation
    if image_resize_mode:
        preprocess_cfg["resize_mode"] = image_resize_mode
    hf_config = {"model_cfg": model_config, "preprocess_cfg": preprocess_cfg}
    with open(config_path, "w") as f:
        json.dump(hf_config, f, indent=2)


def save_for_hf(
    params,
    cfg,
    tokenizer,
    model_config: Optional[dict],
    save_directory: Union[str, Path],
    safe_serialization: Union[bool, str] = "both",
    skip_weights: bool = False,
    memory_bank: Optional[np.ndarray] = None,
    class_names: Optional[list] = None,
    image_interpolation: Optional[str] = None,
    image_resize_mode: Optional[str] = None,
) -> None:
    """Reference ``save_for_hf`` (push_to_hf_hub.py:63-89): weights (pickle
    and/or safetensors), tokenizer files, ``open_clip_config.json``."""
    from latteclip_tpu.core.checkpoint import params_to_pt_state_dict
    from latteclip_tpu.core.pt_io import save_pt

    save_directory = Path(save_directory)
    save_directory.mkdir(parents=True, exist_ok=True)

    if not skip_weights:
        sd = {
            k: np.asarray(v)
            for k, v in params_to_pt_state_dict(
                params, cfg, memory_bank=memory_bank, classnames=class_names
            ).items()
        }
        if safe_serialization in (True, "both"):
            save_safetensors(sd, save_directory / HF_SAFE_WEIGHTS_NAME)
        if safe_serialization in (False, "both"):
            save_pt(sd, str(save_directory / HF_WEIGHTS_NAME))

    save_tokenizer_for_hf(tokenizer, save_directory)
    save_config_for_hf(
        cfg,
        save_directory / HF_CONFIG_NAME,
        model_config=model_config,
        image_interpolation=image_interpolation,
        image_resize_mode=image_resize_mode,
    )


# ---------------------------------------------------------------------------
# README model card (reference generate_readme, push_to_hf_hub.py:219-259)
# ---------------------------------------------------------------------------

def generate_readme(model_card: dict, model_name: str) -> str:
    model_card = dict(model_card)  # the reference pops from the caller's dict
    tags = model_card.pop("tags", ("clip",))
    pipeline_tag = model_card.pop("pipeline_tag", "zero-shot-image-classification")
    text = "---\n"
    if tags:
        text += "tags:\n" + "".join(f"- {t}\n" for t in tags)
    text += "library_name: open_clip\n"
    text += f"pipeline_tag: {pipeline_tag}\n"
    text += f"license: {model_card.get('license', 'mit')}\n"
    if "details" in model_card and "Dataset" in model_card["details"]:
        text += "datasets:\n"
        text += f"- {model_card['details']['Dataset'].lower()}\n"
    text += "---\n"
    text += f"# Model card for {model_name}\n"
    if "description" in model_card:
        text += f"\n{model_card['description']}\n"
    if "details" in model_card:
        text += "\n## Model Details\n"
        for k, v in model_card["details"].items():
            if isinstance(v, (list, tuple)):
                text += f"- **{k}:**\n"
                for vi in v:
                    text += f"  - {vi}\n"
            elif isinstance(v, dict):
                text += f"- **{k}:**\n"
                for ki, vi in v.items():
                    text += f"  - {ki}: {vi}\n"
            else:
                text += f"- **{k}:** {v}\n"
    if "usage" in model_card:
        text += "\n## Model Usage\n" + model_card["usage"] + "\n"
    if "comparison" in model_card:
        text += "\n## Model Comparison\n" + model_card["comparison"] + "\n"
    if "citation" in model_card:
        text += "\n## Citation\n"
        citations = model_card["citation"]
        if not isinstance(citations, (list, tuple)):
            citations = [citations]
        for c in citations:
            text += f"```bibtex\n{c}\n```\n"
    return text


# ---------------------------------------------------------------------------
# hub push (network part; requires huggingface_hub + egress)
# ---------------------------------------------------------------------------

def push_to_hf_hub(
    params,
    cfg,
    tokenizer,
    model_config: Optional[dict],
    repo_id: str,
    commit_message: str = "Add model",
    token: Optional[str] = None,
    revision: Optional[str] = None,
    private: bool = False,
    create_pr: bool = False,
    model_card: Optional[dict] = None,
    safe_serialization: Union[bool, str] = "both",
    local_dir: Optional[str] = None,
    **save_kwargs,
):
    """Build the model folder and upload it (reference
    push_to_hf_hub.py:92-157). ``local_dir`` keeps the folder on disk (and,
    when huggingface_hub is unavailable or the network is unreachable,
    provides the offline artifact to upload later)."""
    from tempfile import TemporaryDirectory

    try:
        from huggingface_hub import create_repo, upload_folder
    except ImportError:  # same failure mode as the reference's _has_hf_hub gate
        create_repo = upload_folder = None

    ctx = TemporaryDirectory() if local_dir is None else None
    tmpdir = ctx.name if ctx is not None else local_dir
    try:
        save_for_hf(
            params, cfg, tokenizer, model_config,
            save_directory=tmpdir, safe_serialization=safe_serialization,
            **save_kwargs,
        )
        readme_path = Path(tmpdir) / "README.md"
        if not readme_path.exists():
            readme_path.write_text(
                generate_readme(model_card or {}, repo_id.split("/")[-1])
            )
        if upload_folder is None:
            where = (f"folder kept at {tmpdir}" if local_dir is not None
                     else "pass local_dir= to keep the built folder")
            raise RuntimeError(
                "Please install huggingface_hub to push to the Hugging Face "
                f"Hub ({where})"
            )
        create_repo(repo_id, token=token, private=private, exist_ok=True)
        return upload_folder(
            repo_id=repo_id,
            folder_path=tmpdir,
            revision=revision,
            create_pr=create_pr,
            commit_message=commit_message,
            token=token,
        )
    finally:
        if ctx is not None:
            ctx.cleanup()


def push_pretrained_to_hf_hub(
    model_name: str,
    pretrained: str,
    repo_id: str,
    image_interpolation: Optional[str] = None,
    image_resize_mode: Optional[str] = None,
    local_dir: Optional[str] = None,
    **kwargs,
):
    """Reference ``push_pretrained_to_hf_hub`` (push_to_hf_hub.py:160-216):
    load a pretrained checkpoint through the registry, then push."""
    from latteclip_tpu.core.checkpoint import load_clip_pt
    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.core.pretrained import resolve_pretrained
    from latteclip_tpu.models.tokenizer import get_tokenizer

    cfg = get_model_config(model_name)
    ckpt_path = pretrained if os.path.exists(pretrained) else resolve_pretrained(model_name, pretrained)
    params, _bank, _meta = load_clip_pt(ckpt_path, cfg)
    tokenizer = get_tokenizer()
    return push_to_hf_hub(
        params, cfg, tokenizer,
        model_config=raw_model_config(model_name),
        repo_id=repo_id,
        image_interpolation=image_interpolation,
        image_resize_mode=image_resize_mode,
        local_dir=local_dir,
        **kwargs,
    )


def _main() -> int:
    import argparse

    p = argparse.ArgumentParser(description="Push to Hugging Face Hub")
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--pretrained", type=str, required=True)
    p.add_argument("--repo-id", type=str, required=True)
    p.add_argument("--image-interpolation", default=None,
                   choices=["bicubic", "bilinear", "random"])
    p.add_argument("--image-resize-mode", default=None,
                   choices=["shortest", "longest", "squash"])
    p.add_argument("--local-dir", default=None,
                   help="also keep the built folder at this path")
    args = p.parse_args()
    print(f"Saving model {args.model} ({args.pretrained}) to {args.repo_id}")
    push_pretrained_to_hf_hub(
        args.model, args.pretrained, args.repo_id,
        image_interpolation=args.image_interpolation,
        image_resize_mode=args.image_resize_mode,
        local_dir=args.local_dir,
    )
    print(f"{args.model} saved.")
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
