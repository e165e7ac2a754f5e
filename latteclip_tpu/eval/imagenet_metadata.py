"""OpenAI ImageNet prompt templates + classnames (reference
``zero_shot_metadata.py``). The 80-template ensemble and the 1000 classnames
are the standard public OpenAI CLIP evaluation metadata, shipped as JSON
assets and exposed as template callables compatible with
``build_zero_shot_classifier``.
"""
from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Callable, List

_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "assets")


@lru_cache()
def imagenet_classnames() -> List[str]:
    with open(os.path.join(_ASSET_DIR, "imagenet_classnames.json")) as f:
        return json.load(f)


@lru_cache()
def _template_strings() -> List[str]:
    with open(os.path.join(_ASSET_DIR, "openai_imagenet_templates.json")) as f:
        return json.load(f)


def openai_imagenet_templates() -> List[Callable[[str], str]]:
    """The 80-prompt ensemble as template callables."""
    return [lambda c, _t=t: _t.format(c) for t in _template_strings()]


def simple_imagenet_templates() -> List[Callable[[str], str]]:
    """The reduced 7-prompt set (reference SIMPLE_IMAGENET_TEMPLATES)."""
    strings = [
        "itap of a {}.",
        "a bad photo of the {}.",
        "a origami {}.",
        "a photo of the large {}.",
        "a {} in a video game.",
        "art of the {}.",
        "a photo of the small {}.",
    ]
    return [lambda c, _t=t: _t.format(c) for t in strings]
