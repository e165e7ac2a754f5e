"""Optional test oracle: load the reference torch model for parity checks.

These helpers import the PUBLIC reference implementation mounted read-only at
``/root/reference`` purely as a *behavioral oracle* — our implementation is
independent; tests that use this module skip when the reference (or torch) is
unavailable. Missing optional deps of the reference (ftfy, torchvision) are
stubbed with inert modules.
"""
from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

REF_ROOT = "/root/reference/src"


def _stub_module(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    # give the stub a real-looking spec so importlib.util.find_spec works
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    return mod


def load_reference_open_clip():
    """Import the reference ``open_clip`` package with dep stubs; returns the
    package module or None if unavailable."""
    import os

    if not os.path.isdir(REF_ROOT):
        return None
    try:
        import torch  # noqa: F401
        import torch.nn as nn
    except ImportError:
        return None

    _stub_module("ftfy", fix_text=lambda s: s)
    if importlib.util.find_spec("torchvision") is None:
        tv = _stub_module("torchvision")
        ops = _stub_module("torchvision.ops")
        misc = _stub_module("torchvision.ops.misc", FrozenBatchNorm2d=nn.BatchNorm2d)
        tv.ops = ops
        ops.misc = misc
        class _AnyMeta(type):
            def __getattr__(cls, attr):  # e.g. InterpolationMode.BICUBIC
                if attr.startswith("__"):
                    raise AttributeError(attr)
                return f"{cls.__name__}.{attr}"

        def _class_getattr(name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _AnyMeta(name, (), {"__init__": lambda self, *a, **k: None})

        def _func_getattr(name):
            if name.startswith("__"):
                raise AttributeError(name)
            return lambda *a, **k: None

        transforms = _stub_module("torchvision.transforms")
        transforms.__getattr__ = _class_getattr  # any symbol -> dummy class
        _stub_module("torchvision.transforms.functional").__getattr__ = _func_getattr
        tv.transforms = transforms

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    try:
        import open_clip  # the reference package

        return open_clip
    except Exception:
        return None


def build_reference_clip(model_name: str, seed: int = 0):
    """Construct a randomly-initialised reference CLIP (torch, fp32, eval)."""
    oc = load_reference_open_clip()
    if oc is None:
        return None
    import json
    import torch

    with open(f"{REF_ROOT}/open_clip/model_configs/{model_name}.json") as f:
        cfg = json.load(f)
    torch.manual_seed(seed)
    model = oc.model.CLIP(
        embed_dim=cfg["embed_dim"],
        vision_cfg=cfg["vision_cfg"],
        text_cfg=cfg["text_cfg"],
        quick_gelu=cfg.get("quick_gelu", False),
    )
    # give every parameter non-degenerate values so parity is meaningful
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim >= 2:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
            else:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
    return model.eval()
