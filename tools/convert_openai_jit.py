#!/usr/bin/env python
"""Convert an OpenAI CLIP TorchScript archive to a plain state-dict ``.pt``.

OpenAI's original checkpoints (``ViT-B-32.pt`` from the CLIP repo) are
TorchScript zips, not eager pickles — the reference loads them via
``torch.jit.load`` + ``build_model_from_openai_state_dict`` (reference
``src/open_clip/openai.py:24-91``). This one-time converter extracts the
state dict and re-saves it through our torch-free writer, producing a file
both ``latteclip_tpu.core.checkpoint.load_clip_pt`` and ``torch.load`` read.
OpenAI models use QuickGELU — load with a ``-quickgelu`` config.

Usage: python tools/convert_openai_jit.py SRC.pt DST.pt
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def convert(src: str, dst: str) -> int:
    import torch

    from latteclip_tpu.core.pt_io import save_pt

    try:
        model = torch.jit.load(src, map_location="cpu")
        sd = model.state_dict()
    except RuntimeError:  # already an eager checkpoint
        obj = torch.load(src, map_location="cpu", weights_only=False)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj.state_dict()
    sd = {
        k: v.float().numpy()
        for k, v in sd.items()
        if k not in ("input_resolution", "context_length", "vocab_size")
        and hasattr(v, "numpy")
    }
    save_pt({"state_dict": sd}, dst)
    print(f"wrote {len(sd)} tensors -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(convert(sys.argv[1], sys.argv[2]))
